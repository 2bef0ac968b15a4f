package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** `weighted_median(value, weight)` as a first-class SQL aggregate
  * (TypedImperativeAggregate — the mutable-buffer rung for sketches and
  * order statistics). Semantics match GraftUtils.weightedMedian: the
  * smallest value whose cumulative weight reaches half the total
  * (reference: ensemble/Utils.scala:26-40, lifted from per-row voting into
  * a distributed aggregate).
  *
  * The buffer holds the raw (value, weight) pairs; for bounded-memory
  * behavior at extreme group cardinalities swap the buffer for a
  * weighted KLL/GK sketch — the aggregate contract stays identical.
  */
case class WeightedMedianAgg(
    valueExpr: Expression,
    weightExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]]
    with ImplicitCastInputTypes {

  // analyzer-inserted casts keep SQL-text callers (int/decimal columns)
  // from hitting the Double hard-casts in update()
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)

  override def children: Seq[Expression] = Seq(valueExpr, weightExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] =
    ArrayBuffer.empty

  override def update(
      buffer: ArrayBuffer[(Double, Double)],
      input: InternalRow): ArrayBuffer[(Double, Double)] = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null) {
      buffer += ((v.asInstanceOf[Double], w.asInstanceOf[Double]))
    }
    buffer
  }

  override def merge(
      buffer: ArrayBuffer[(Double, Double)],
      other: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] =
    buffer ++= other

  override def eval(buffer: ArrayBuffer[(Double, Double)]): Any = {
    if (buffer.isEmpty) return null
    val sorted = buffer.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    var cum = 0.0
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= 0.5 * total) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  override def serialize(buffer: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.length * 16)
    bb.putInt(buffer.length)
    buffer.foreach { case (v, w) => bb.putDouble(v); bb.putDouble(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new ArrayBuffer[(Double, Double)](n)
    var i = 0
    while (i < n) { out += ((bb.getDouble(), bb.getDouble())); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedMedianAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): WeightedMedianAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedMedianAgg =
    copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
}

object WeightedMedian {

  def weighted_median(value: Column, weight: Column): Column =
    ExpressionUtils.column(
      WeightedMedianAgg(
        ExpressionUtils.expression(value.cast("double")),
        ExpressionUtils.expression(weight.cast("double"))).toAggregateExpression())

  /** Register `weighted_median` for SQL text queries. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "weighted_median",
      exprs => WeightedMedianAgg(exprs(0), exprs(1)).toAggregateExpression(),
      "built-in")
}
