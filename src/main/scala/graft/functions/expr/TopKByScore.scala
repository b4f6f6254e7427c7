package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as ONE buffer-based Catalyst aggregate: keep the k
  * (score, id) pairs ranked highest by (score DESC, id ASC) per group.
  *
  * This is the scale-correct alternative to the window idiom
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`): the window
  * plan must shuffle AND sort EVERY row of every group, while this
  * aggregate keeps a k-bounded buffer, combines map-side, and ships at
  * most k rows per group per map partition through the shuffle. At
  * 100 TB with millions of rows per group and k=3, the shuffle shrinks
  * by |group|/k.
  *
  * Buffer: k-bounded binary min-heap keyed worst-first (smallest score,
  * then largest id at equal score), so insert/evict is O(log k). Null
  * scores/ids are skipped (same visible result as the window form with
  * desc_nulls_last when groups have >= k non-null rows); NaN scores
  * rank greatest, matching Spark's desc sort order.
  *
  * Output: array<struct<score double, id long>> sorted best-first;
  * posexplode position + 1 = rank.
  */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = score :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = { a.absorb(b); a }

  override def eval(buf: TopKBuf): Any = {
    val rows = buf.sortedBestFirst.map { case (s, i) =>
      InternalRow(s, i)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** k-bounded min-heap of (score, id), heap-ordered worst-first:
  * the root is the entry that (score ASC, id DESC) ranks first, i.e.
  * the one a better entry evicts. */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** NaN-safe score compare with Spark's sort semantics (NaN greatest,
    * -0.0 == 0.0) so primitive `<` on NaN can't wedge the heap or make
    * sortWith non-transitive. */
  @inline private def cmp(sa: Double, sb: Double): Int =
    if (sa < sb) -1 else if (sa > sb) 1 else if (sa == sb) 0
    else { // at least one NaN: NaN ranks above everything (matches desc)
      val aN = java.lang.Double.isNaN(sa)
      val bN = java.lang.Double.isNaN(sb)
      if (aN && bN) 0 else if (aN) 1 else -1
    }

  /** a strictly worse than b under (score DESC, id ASC) ranking. */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = cmp(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  def offer(s: Double, i: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = i; size += 1
      var c = size - 1
      while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown()
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(): Unit = {
    var p = 0
    var done = false
    while (!done) {
      val l = 2 * p + 1
      val r = 2 * p + 2
      var w = p
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == p) done = true else { swap(p, w); p = w }
    }
  }

  def absorb(other: TopKBuf): Unit = {
    var i = 0
    while (i < other.size) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  def sortedBestFirst: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
}
