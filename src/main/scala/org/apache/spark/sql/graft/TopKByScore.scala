package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** `topk_by_score(id, score, k)`: bounded top-k aggregate ordered by
  * (score desc, id asc). The partial-aggregation property is the scale
  * win: each map task keeps at most k candidates, so a top-k-per-group
  * over an n x m similarity cross product shuffles O(groups x k) rows
  * instead of sorting the full product through a window (the
  * row_number() plan shuffles and sorts everything).
  */
case class TopKByScoreAgg(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Double)]]
    with ImplicitCastInputTypes {

  require(k > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))))

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(buffer: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    if (buffer.length > k) {
      val sorted = buffer.sortWith(better)
      buffer.clear()
      buffer ++= sorted.take(k)
    }
    buffer
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Double)] = ArrayBuffer.empty

  override def update(
      buffer: ArrayBuffer[(Long, Double)],
      input: InternalRow): ArrayBuffer[(Long, Double)] = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    // NaN scores (e.g. cosine of a zero vector) are dropped: they have no
    // meaningful rank and would break the strict-weak-ordering sort
    if (id != null && score != null && !score.asInstanceOf[Double].isNaN) {
      buffer += ((id.asInstanceOf[Long], score.asInstanceOf[Double]))
      // amortized trim: sort only when the buffer doubles past k
      if (buffer.length >= 2 * k + 8) trim(buffer)
    }
    buffer
  }

  override def merge(
      buffer: ArrayBuffer[(Long, Double)],
      other: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] =
    trim(buffer ++= other)

  override def eval(buffer: ArrayBuffer[(Long, Double)]): Any = {
    val sorted = buffer.sortWith(better).take(k)
    new GenericArrayData(sorted.map { case (id, s) =>
      InternalRow(id, s)
    }.toArray[Any])
  }

  override def serialize(buffer: ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val t = trim(buffer)
    val bb = java.nio.ByteBuffer.allocate(4 + t.length * 16)
    bb.putInt(t.length)
    t.foreach { case (id, s) => bb.putLong(id); bb.putDouble(s) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new ArrayBuffer[(Long, Double)](n)
    var i = 0
    while (i < n) { out += ((bb.getLong(), bb.getDouble())); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

object TopKByScore {

  def topk_by_score(id: Column, score: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScoreAgg(
        ExpressionUtils.expression(id.cast("long")),
        ExpressionUtils.expression(score.cast("double")),
        k).toAggregateExpression())
}
