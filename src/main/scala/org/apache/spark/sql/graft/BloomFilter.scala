package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Shared Bloom-filter arithmetic: the aggregate that BUILDS a filter and
  * the probe that QUERIES one must set/test identical bit positions, so
  * both go through these helpers. Kirsch–Mitzenmacher double hashing
  * (h1 + i·h2 over `numHashes` probes) on a splitmix64-finalized 64-bit
  * input — k positions from two mixes instead of k independent hashes,
  * with the classic guarantee that the FPR bound is preserved.
  *
  * Everything is pure Long arithmetic on the JVM side; the filter's
  * correctness contract (NO false negatives, bounded false positives) is
  * what downstream operators rely on, not specific bit layouts.
  */
object BloomFilterOps {

  /** splitmix64 finalizer (public-domain constants — Steele et al.). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def requireSized(numBits: Int, numHashes: Int): Unit = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 32,
      s"numHashes must be in [1, 32], got $numHashes")
  }

  def set(words: Array[Long], numHashes: Int, x: Long): Unit = {
    val mask = words.length * 64 - 1
    val h1 = mix64(x)
    val h2 = mix64(x ^ 0x6a09e667f3bcc909L) | 1L // odd: full-period stride
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def contains(words: Array[Long], numHashes: Int, x: Long): Boolean = {
    val mask = words.length * 64 - 1
    val h1 = mix64(x)
    val h2 = mix64(x ^ 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}

/** `bloom_agg(hash_col, numBits, numHashes)` — build a Bloom filter over
  * a Long column as a first-class aggregate, returned as `binary`
  * (big-endian 64-bit words). The buffer is the m-bit array itself and
  * merge is a word-wise OR, so partial aggregation ships ONE m-bit
  * sketch per map task regardless of input volume, and the result is
  * bit-identical under any partitioning (OR is commutative/associative —
  * no float-summation-order caveats here).
  *
  * Sizing: FPR ≈ (1 − e^{−kn/m})^k; m = 10·n bits with k = 7 gives
  * ~0.8%. At m = 2^30 the sketch is 128 MiB — broadcast-able where a
  * 10^8-element exact Long set (800 MB + hash overhead) is not, which is
  * exactly the decontamination use case ([[graft.pipeline.Decontaminate]]).
  * Null inputs are skipped; an empty group is the empty filter (all
  * zeros), not null — OR-identity, so unioning with it is a no-op.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  BloomFilterOps.requireSized(numBits, numHashes)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilterOps.set(buffer, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) |= other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomFilterOps.toBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomFilterOps.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomFilterOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0))
}

object BloomFilter {

  def bloom_agg(hash: Column, numBits: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      BloomFilterAgg(
        ExpressionUtils.expression(hash.cast(LongType)),
        numBits, numHashes).toAggregateExpression())
}
