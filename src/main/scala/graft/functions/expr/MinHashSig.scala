package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE buffer-based Catalyst aggregate
  * (`TypedImperativeAggregate[Array[Long]]`): for each input string,
  * hash once (xxhash64, seed 42 — identical to the `xxhash64(g)`
  * expression), derive `numHashes` views by hashing the base long with
  * the view index as seed chain (identical to `xxhash64(lit(i), h)`),
  * and keep the elementwise minimum.
  *
  * Same arithmetic as the composed 64-`min`-columns pipeline in
  * [[graft.operators.Dedup.minhashSignatures]] — signatures are
  * bit-identical (asserted in tests) — but the shuffle row is built by
  * one aggregate with a primitive long[] buffer instead of 64 separate
  * aggregate expressions, and partial aggregation (update/merge) works
  * the same way. At corpus scale this halves codegen size and GC churn
  * of the signature stage.
  */
case class MinHashSig(child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // xxhash64(g): hash the UTF-8 bytes with seed 42
      val h = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var i = 0
      while (i < numHashes) {
        // xxhash64(lit(i), h): seed 42 -> hashInt(i) -> hashLong(h)
        val hi = XXH64.hashLong(h, XXH64.hashInt(i, 42L))
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashSig =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashSig =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren.head)
}

/** [[MinHashSig]] over an ALREADY-HASHED gram (a long): same view
  * derivation (`xxhash64(lit(i), h)` seed chain), but the base hash
  * comes in as the child value instead of being computed from a gram
  * string. Lets the gram pipeline skip building gram STRINGS entirely —
  * tokens are hashed once and combined positionally with
  * `xxhash64(h1..hn)` — removing the dominant allocation of the
  * signature stage at corpus scale. */
case class MinHashSigLong(child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val hi = XXH64.hashLong(h, XXH64.hashInt(i, 42L))
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashSigLong =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashSigLong =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigLong =
    copy(child = newChildren.head)
}
