package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_signature(hash64, k)`: the whole k-wide MinHash signature in
  * ONE aggregate pass. Each input row contributes one 64-bit shingle
  * hash; the k salted hash functions are derived with a splitmix64 mixer
  * (3 multiplies + shifts) instead of re-hashing the shingle string k
  * times — at sf0.1 that string re-hashing was ~85% of the MinHash
  * pipeline's wall-clock. Buffer = k running minima (primitive longs).
  */
case class MinHashSignatureAgg(
    hashExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(k > 0 && k <= MinHashSignatureAgg.seeds.length,
    s"k must be in [1, ${MinHashSignatureAgg.seeds.length}]")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val v = MinHashSignatureAgg.mix(hv ^ MinHashSignatureAgg.seeds(i))
        if (v < buffer(i)) buffer(i) = v
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buffer(i)) buffer(i) = other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignatureAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignatureAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSignatureAgg =
    copy(hashExpr = newChildren(0))
}

object MinHashSignatureAgg {

  /** Fixed salts (seeded, engine-wide) — one per hash function. */
  private[graft] val seeds: Array[Long] = {
    val rng = new scala.util.Random(0x9E3779B97F4A7C15L)
    Array.fill(256)(rng.nextLong())
  }

  /** splitmix64 finalizer — a public-domain 64-bit mixer. */
  @inline private[graft] def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

object MinHashSignature {

  def minhash_signature(hash64: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashSignatureAgg(ExpressionUtils.expression(hash64), k).toAggregateExpression())

  /** Per-row signature of one document's shingle-hash set — the
    * streaming-safe scalar twin of [[minhash_signature]] (identical seeds
    * and mixer, so a doc gets bit-identical signatures on both paths;
    * parity is suite-pinned).
    */
  def signatureOf(hashes: Seq[Long], k: Int): Array[Long] = {
    require(k > 0 && k <= MinHashSignatureAgg.seeds.length,
      s"k must be in [1, ${MinHashSignatureAgg.seeds.length}]")
    val sig = Array.fill(k)(Long.MaxValue)
    hashes.foreach { hv =>
      var i = 0
      while (i < k) {
        val v = MinHashSignatureAgg.mix(hv ^ MinHashSignatureAgg.seeds(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Scala twin of the [[LongArraySliceHash]] banding fold (same splitmix
    * constants) — streaming banding buckets equal batch banding buckets.
    */
  def sliceHash(sig: Array[Long], start: Int, len: Int, seed: Long): Long = {
    val end = math.min(start + len, sig.length)
    var h = MinHashSignatureAgg.mix(seed)
    var i = start
    while (i < end) { h = MinHashSignatureAgg.mix(h ^ sig(i)); i += 1 }
    h
  }
}
