package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** [[TopKByScore]] with a LONG score key: keep the k (score, id) pairs
  * ranked highest by (score DESC, id ASC) per group, all-integer.
  *
  * Exists because the double-keyed heap silently loses exactness past
  * 2^53: the BM25 scorer ([[graft.operators.Retrieval]]) sums exact
  * micro-scaled integer contributions that reach ~1e14 per term at
  * corpus scale (N = 1e8, long documents), so a cast to double before
  * ranking can round two adjacent scores together and flip a
  * tie-break — breaking the bit-reproducible contract the integer
  * scorer exists to provide. Long compares are exact at every
  * magnitude; same k-bounded min-heap, same map-side combine, same
  * ≤ k rows per group per map task through the shuffle.
  *
  * Output: array<struct<score bigint, id bigint>> sorted best-first;
  * posexplode position + 1 = rank.
  */
case class TopKByLongScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKLongBuf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = score :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKLongBuf = new TopKLongBuf(k)

  override def update(buf: TopKLongBuf, input: InternalRow): TopKLongBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKLongBuf, b: TopKLongBuf): TopKLongBuf = {
    a.absorb(b); a
  }

  override def eval(buf: TopKLongBuf): Any = {
    val rows = buf.sortedBestFirst.map { case (s, i) => InternalRow(s, i) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKLongBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKLongBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKLongBuf(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByLongScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByLongScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByLongScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** k-bounded min-heap of long (score, id), heap-ordered worst-first
  * under (score DESC, id ASC) ranking — [[TopKBuf]] minus the NaN
  * cases (longs totally order). */
final class TopKLongBuf(val k: Int) {
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a strictly worse than b under (score DESC, id ASC) ranking. */
  @inline private def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def offer(s: Long, i: Long): Unit = {
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

  def absorb(other: TopKLongBuf): Unit = {
    var i = 0
    while (i < other.size) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  def sortedBestFirst: Array[(Long, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
}
