package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** `misra_gries(key, k)`: the classic k-counter heavy-hitters summary
  * (Misra & Gries 1982) as a partially-aggregating Spark aggregate over
  * 64-bit keys. Returns `array<struct<key: long, count: long>>` sorted by
  * (count desc, key asc), where `count` is the MG LOWER BOUND on the
  * key's true frequency: `true - n/(k+1) <= count <= true` for n input
  * rows, and — the useful guarantee — every key with true frequency
  * > n/(k+1) is PRESENT in the summary.
  *
  * Scale shape: each map task carries at most k counters regardless of
  * input size, and the merge (Agarwal et al. 2013, "Mergeable
  * Summaries") preserves the error bound: sum counters, then subtract
  * the (k+1)-largest count from the survivors and drop non-positives.
  * A global heavy-hitters pass over 100 TB of tokens shuffles k entries
  * per partition instead of the full vocabulary — the vocabulary-sized
  * groupBy this sketch replaces is exactly the shuffle that dies first
  * on web-scale token statistics.
  *
  * The summary CONTENT (which sub-threshold keys survive, and the exact
  * lower bounds) depends on partitioning and merge order — callers that
  * need deterministic output must re-verify candidates exactly
  * ([[graft.pipeline.CorpusStats.heavyTokens]] does; its gate pins the
  * composed determinism).
  */
case class MisraGriesAgg(
    keyExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
    with ImplicitCastInputTypes {

  require(k > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("count", LongType, nullable = false))))

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[Long, Long],
      input: InternalRow): mutable.HashMap[Long, Long] = {
    val key = keyExpr.eval(input)
    if (key != null) {
      val kk = key.asInstanceOf[Long]
      buffer.get(kk) match {
        case Some(c) => buffer.update(kk, c + 1L)
        case None =>
          if (buffer.size < k) buffer.update(kk, 1L)
          else decrementAll(buffer) // the MG eviction step
      }
    }
    buffer
  }

  /** Decrement every counter (the arriving key's +1 cancels against one
    * decrement, so it is simply not inserted), dropping zeros — O(k),
    * amortized O(1) per eviction per counter.
    */
  private def decrementAll(buffer: mutable.HashMap[Long, Long]): Unit = {
    val dead = mutable.ArrayBuffer.empty[Long]
    buffer.mapValuesInPlace((_, c) => c - 1L)
    buffer.foreach { case (key, c) => if (c <= 0L) dead += key }
    dead.foreach(buffer.remove)
  }

  override def merge(
      buffer: mutable.HashMap[Long, Long],
      other: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    other.foreach { case (key, c) =>
      buffer.update(key, buffer.getOrElse(key, 0L) + c)
    }
    if (buffer.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-largest count,
      // keep the survivors (all positive by construction)
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[Long]
      buffer.mapValuesInPlace((_, c) => c - cut)
      buffer.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[Long, Long]): Any = {
    val sorted = buffer.toArray.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    }
    new GenericArrayData(sorted.map { case (key, c) =>
      InternalRow(key, c)
    }.toArray[Any])
  }

  override def serialize(buffer: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    buffer.foreach { case (key, c) => bb.putLong(key); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { out.update(bb.getLong(), bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(keyExpr = newChildren(0))
}

object MisraGries {

  def misra_gries(key: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(key.cast("long")), k)
        .toAggregateExpression())
}
