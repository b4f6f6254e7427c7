package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The k SMALLEST distinct-input longs per group, as a sorted-ascending
  * array — the bounded aggregate behind the hot-bucket guard
  * ([[graft.operators.Dedup.cappedBucketPairs]]).
  *
  * This replaces the window idiom (`row_number() over (partition by
  * bucket order by id) <= k`): the window must shuffle AND sort every
  * bucket row of the corpus even though almost all buckets are
  * singletons, while this aggregate keeps a k-bounded buffer per group,
  * combines map-side, and ships at most k longs per group per map
  * partition. A million-copy hot bucket costs k buffer slots, not a
  * million sorted rows in one reducer.
  *
  * Buffer: k-bounded binary MAX-heap (root = largest kept id), so a
  * smaller incoming id evicts in O(log k). Ties cannot occur within a
  * group in the dedup use (a doc appears once per band), but duplicate
  * ids are kept if fed — callers wanting set semantics dedupe upstream.
  * Null ids are skipped.
  */
case class BottomKLongs(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKBuf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_longs"

  override def createAggregationBuffer(): BottomKBuf = new BottomKBuf(k)

  override def update(buf: BottomKBuf, input: InternalRow): BottomKBuf = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BottomKBuf, b: BottomKBuf): BottomKBuf = { a.absorb(b); a }

  override def eval(buf: BottomKBuf): Any =
    new GenericArrayData(buf.sortedAscending)

  override def serialize(buf: BottomKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BottomKBuf(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): BottomKLongs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomKLongs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKLongs =
    copy(child = newChildren(0))
}

/** k-bounded max-heap of longs (root = largest, evicted first). */
final class BottomKBuf(val k: Int) {
  val ids = new Array[Long](k)
  var size = 0

  def offer(v: Long): Unit = {
    if (size < k) {
      ids(size) = v; size += 1
      var c = size - 1
      while (c > 0 && ids(c) > ids((c - 1) / 2)) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (v < ids(0)) {
      ids(0) = v
      siftDown()
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val t = ids(a); ids(a) = ids(b); ids(b) = t
  }

  private def siftDown(): Unit = {
    var p = 0
    var done = false
    while (!done) {
      val l = 2 * p + 1
      val r = 2 * p + 2
      var w = p
      if (l < size && ids(l) > ids(w)) w = l
      if (r < size && ids(r) > ids(w)) w = r
      if (w == p) done = true else { swap(p, w); p = w }
    }
  }

  def absorb(other: BottomKBuf): Unit = {
    var i = 0
    while (i < other.size) { offer(other.ids(i)); i += 1 }
  }

  def sortedAscending: Array[Long] = {
    val out = java.util.Arrays.copyOf(ids, size)
    java.util.Arrays.sort(out)
    out
  }
}
