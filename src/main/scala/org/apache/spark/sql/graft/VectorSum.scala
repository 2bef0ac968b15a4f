package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** `vec_sum(array<double>)` — element-wise sum of fixed-dimension
  * vectors as a first-class aggregate. The buffer is one double[] of the
  * vector dimension, so partial aggregation collapses each map task's
  * contribution to a single d-length row BEFORE the shuffle: a centroid
  * update over 10^11 embeddings moves #partitions x d doubles, not n x d
  * (the posexplode-by-dimension alternative shuffles every component of
  * every row). Null vectors are skipped; a dimension mismatch throws —
  * silently zero-padding ragged vectors would corrupt every downstream
  * mean. Empty groups evaluate to null.
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // null = "no vector seen yet": the dimension is learned from the data
  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buffer == null) new Array[Double](n) else buffer
    require(acc.length == n,
      s"vec_sum dimension mismatch: ${acc.length} vs $n")
    var i = 0
    while (i < n) {
      acc(i) += arr.getDouble(i)
      i += 1
    }
    acc
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other == null) return buffer
    if (buffer == null) return other
    require(buffer.length == other.length,
      s"vec_sum dimension mismatch: ${buffer.length} vs ${other.length}")
    var i = 0
    while (i < buffer.length) {
      buffer(i) += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val n = if (buffer == null) -1 else buffer.length
    val bb = java.nio.ByteBuffer.allocate(4 + math.max(n, 0) * 8)
    bb.putInt(n)
    if (n > 0) buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    if (n < 0) null
    else Array.fill(n)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren(0))
}

object VectorSum {

  def vec_sum(v: Column): Column =
    ExpressionUtils.column(
      VectorSumAgg(
        ExpressionUtils.expression(v.cast(ArrayType(DoubleType)))).toAggregateExpression())
}
