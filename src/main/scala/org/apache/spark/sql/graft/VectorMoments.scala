package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** `vec_moments(array<double>, scaleDigits)` — the one-pass fixed-point
  * first+second moment aggregate behind embedding covariance/PCA: for
  * vectors of dimension d it accumulates, as a single packed
  * `array<long>` of length `d(d+1)/2 + d + 1`,
  *
  *  - the upper-triangle second-moment sums
  *    `S_ij = Σ floor(x_i · x_j · 10^s + 0.5)` (row-major triangle,
  *    entry `(i,j)` at `i·d − i(i−1)/2 + (j−i)`),
  *  - the element sums `S_i = Σ floor(x_i · 10^s + 0.5)` (offset
  *    `d(d+1)/2 + i`), and
  *  - the vector count `n` (last slot).
  *
  * The fixed-point snap (floor-half-up, the same portable rounding the
  * int8 quantizer uses) makes the sums ORDER-INDEPENDENT integers:
  * partition layout, task retries, and engine cannot change a single
  * bit, whereas double accumulation of 10^11 products differs run to
  * run. The cost is a bounded quantization of each product (≤ 0.5/10^s)
  * — for covariance matrices consumed by PCA/whitening this is far
  * below estimation noise. Long capacity bounds the reach: with values
  * in [−1, 1] and s = 6, overflow needs n > ~9·10^12 rows — re-scale s
  * down for corpora beyond that.
  *
  * Scale shape: the d²/2-wide buffer exists once per map task, so the
  * single-group aggregation ships #partitions × d²/2 longs, never
  * n × d² — the same partial-aggregation collapse as `vec_sum`, one
  * dimension up. Null vectors are skipped; a dimension mismatch throws.
  */
case class VectorMomentsAgg(
    child: Expression,
    scaleDigits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  require(scaleDigits >= 0 && scaleDigits <= 18,
    s"scaleDigits must be in [0, 18], got $scaleDigits")

  private val scale: Double = math.pow(10.0, scaleDigits)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null = "no vector seen yet": the dimension is learned from the data
  override def createAggregationBuffer(): Array[Long] = null

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val tri = d * (d + 1) / 2
    val acc = if (buffer == null) new Array[Long](tri + d + 1) else buffer
    require(acc.length == tri + d + 1,
      s"vec_moments dimension mismatch: buffer for d=" +
        s"${(math.sqrt(8.0 * (acc.length - 1) + 9) - 3).toInt / 2} vs input d=$d")
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) { xs(i) = arr.getDouble(i); i += 1 }
    var k = 0
    i = 0
    while (i < d) {
      val xi = xs(i)
      var j = i
      while (j < d) {
        acc(k) += math.floor(xi * xs(j) * scale + 0.5).toLong
        k += 1
        j += 1
      }
      acc(tri + i) += math.floor(xi * scale + 0.5).toLong
      i += 1
    }
    acc(tri + d) += 1L
    acc
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other == null) return buffer
    if (buffer == null) return other
    require(buffer.length == other.length,
      s"vec_moments dimension mismatch: ${buffer.length} vs ${other.length}")
    var i = 0
    while (i < buffer.length) {
      buffer(i) += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val n = if (buffer == null) -1 else buffer.length
    val bb = java.nio.ByteBuffer.allocate(4 + math.max(n, 0) * 8)
    bb.putInt(n)
    if (n > 0) buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    if (n < 0) null
    else Array.fill(n)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMomentsAgg =
    copy(child = newChildren(0))
}

object VectorMoments {

  def vec_moments(v: Column, scaleDigits: Int): Column =
    ExpressionUtils.column(
      VectorMomentsAgg(
        ExpressionUtils.expression(v.cast(ArrayType(DoubleType))),
        scaleDigits).toAggregateExpression())
}
