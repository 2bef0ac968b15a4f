package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.types._

/** `topk_rows(row_struct, num_sort_keys, 'DDA', k)`: bounded top-k over
  * arbitrary rows — the multi-key generalization of
  * [[TopKByScoreAgg topk_by_score]]. The input struct's first
  * `numSortKeys` fields are the sort keys (one direction char each,
  * `D` = descending / `A` = ascending); the remaining fields ride along
  * as payload. Returns the k smallest rows under that order as
  * `array<struct<...>>`, already sorted, so `posexplode` yields the rank.
  *
  * Same scale contract as topk_by_score: each map task keeps at most ~2k
  * candidate rows, so a top-k-per-group shuffles O(groups x k) rows
  * instead of sorting every row through a `row_number()` window. Use it
  * whenever the ordering needs tie-breaks or a non-numeric key the
  * (long id, double score) fast path can't encode — e.g. TF-IDF's
  * (tfidf desc, tf desc, token asc).
  *
  * The order must be TOTAL over the group's rows (include a unique
  * tie-break key, as a window's `row_number` ordering would need anyway);
  * otherwise boundary ties are implementation-defined, exactly as with
  * `row_number`.
  */
case class TopKRowsAgg(
    rowExpr: Expression,
    numSortKeys: Int,
    descending: Seq[Boolean],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  require(k > 0, s"k must be positive, got $k")
  require(numSortKeys > 0 && descending.length == numSortKeys,
    s"need one direction per sort key: $numSortKeys keys, ${descending.length} directions")

  override def children: Seq[Expression] = Seq(rowExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(rowExpr.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    rowExpr.dataType match {
      case s: StructType if s.length >= numSortKeys =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_rows needs a struct with >= $numSortKeys fields, got $other")
    }

  @transient private lazy val rowType = rowExpr.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[InternalRow] = {
    val sortOrders = (0 until numSortKeys).map { i =>
      val f = rowType(i)
      SortOrder(
        BoundReference(i, f.dataType, f.nullable),
        if (descending(i)) Descending else Ascending)
    }
    new InterpretedOrdering(sortOrders)
  }

  private def trim(buffer: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (buffer.length > k) {
      val sorted = buffer.sorted(ordering)
      buffer.clear()
      buffer ++= sorted.take(k)
    }
    buffer
  }

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] = ArrayBuffer.empty

  override def update(
      buffer: ArrayBuffer[InternalRow],
      input: InternalRow): ArrayBuffer[InternalRow] = {
    val row = rowExpr.eval(input)
    if (row != null) {
      // copy: the evaluated row may be a reused mutable buffer
      buffer += row.asInstanceOf[InternalRow].copy()
      // amortized trim: sort only when the buffer doubles past k
      if (buffer.length >= 2 * k + 8) trim(buffer)
    }
    buffer
  }

  override def merge(
      buffer: ArrayBuffer[InternalRow],
      other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] =
    trim(buffer ++= other)

  override def eval(buffer: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buffer.sorted(ordering).take(k).toArray[Any])

  override def serialize(buffer: ArrayBuffer[InternalRow]): Array[Byte] = {
    val t = trim(buffer)
    val proj = UnsafeProjection.create(rowType)
    // proj reuses ONE target buffer across calls, and for all-fixed-width
    // schemas that buffer is exact-fit — UnsafeRow.getBytes then returns
    // the backing array itself (no copy), so every serialized row would
    // alias the same bytes and the last projection would win. copy()
    // first: the copied row owns a fresh exact-fit array, which getBytes
    // may safely return uncopied.
    val rows = t.map(r => proj(r).copy().getBytes)
    val bb = java.nio.ByteBuffer.allocate(4 + rows.map(4 + _.length).sum)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(rowType.length)
      row.pointTo(arr, len)
      out += row
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(rowExpr = newChildren(0))
}

object TopKRows {

  /** Column API: the first `descending.length` of `cols` are the sort
    * keys; all of `cols` appear in the output struct, field names taken
    * from the column names/aliases.
    */
  def topk_rows(k: Int, descending: Seq[Boolean], cols: Column*): Column = {
    require(cols.length >= descending.length,
      s"${descending.length} sort directions but only ${cols.length} columns")
    ExpressionUtils.column(
      TopKRowsAgg(
        ExpressionUtils.expression(struct(cols: _*)),
        descending.length,
        descending,
        k).toAggregateExpression())
  }

  /** Parse a SQL direction mask like "DDA" (descending, descending,
    * ascending) into the per-key flags.
    */
  private[graft] def parseMask(mask: String): Seq[Boolean] =
    mask.toUpperCase.map {
      case 'D' => true
      case 'A' => false
      case c => throw new IllegalArgumentException(
        s"direction mask must be D/A chars, got '$c' in '$mask'")
    }
}
