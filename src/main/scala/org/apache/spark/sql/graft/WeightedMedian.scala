package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Bounded weighted-quantile buffer: raw (value, weight) pairs up to
  * `capacity` — every group below that size gets the EXACT weighted
  * median — then a one-way switch to sorted weight-capped centroids
  * (t-digest-style uniform compression): adjacent pairs merge into
  * weighted-mean centroids of at most totalWeight/`compressedSize` mass,
  * so the rank error of any quantile query is bounded by one centroid's
  * mass (~1/compressedSize of the group). Memory is O(capacity) no matter
  * how many rows a pathological group holds — the raw-pair buffer this
  * replaces grew linearly and was the acknowledged weak-at-extremes spot.
  */
private[spark] final class WeightedQuantileBuffer(
    val capacity: Int,
    val compressedSize: Int) {

  var pairs: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty
  // compressed sorted centroids (value, weight); null while still exact
  var centroids: Array[(Double, Double)] = null

  def isExact: Boolean = centroids == null

  def add(v: Double, w: Double): Unit = {
    pairs += ((v, w))
    if (pairs.length >= capacity) compress()
  }

  def mergeIn(other: WeightedQuantileBuffer): Unit = {
    pairs ++= other.pairs
    if (other.centroids != null) {
      if (centroids == null) centroids = other.centroids
      else pairs ++= other.centroids
    }
    if (pairs.length >= capacity || (centroids != null && pairs.nonEmpty)) compress()
  }

  private def compress(): Unit = {
    val all = new ArrayBuffer[(Double, Double)](
      pairs.length + (if (centroids == null) 0 else centroids.length))
    all ++= pairs
    if (centroids != null) all ++= centroids
    val sorted = all.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    if (total <= 0.0) {
      // degenerate all-zero-weight group: the exact path returns the
      // smallest value (cum 0 >= 0.5*0), so preserve that instead of
      // dropping everything and flipping the answer to null at the
      // capacity boundary
      centroids =
        if (sorted.isEmpty) Array.empty else Array((sorted.head._1, 0.0))
      pairs = ArrayBuffer.empty
      return
    }
    val maxMass = total / compressedSize
    val out = new ArrayBuffer[(Double, Double)](compressedSize + 1)
    var accW = 0.0
    var accVW = 0.0
    sorted.foreach { case (v, w) =>
      if (accW > 0 && accW + w > maxMass) {
        out += ((accVW / accW, accW))
        accW = 0.0
        accVW = 0.0
      }
      accW += w
      accVW += v * w
    }
    if (accW > 0) out += ((accVW / accW, accW))
    centroids = out.toArray
    pairs = ArrayBuffer.empty
  }

  /** Smallest value whose cumulative weight reaches `q` * total — exact
    * over raw pairs, centroid-resolution once compressed.
    */
  def quantile(q: Double): Any = {
    // ARRAY, not Seq: ArrayBuffer.toSeq materializes a List, and the
    // positional scan below made every sorted(i) an O(i) node walk —
    // O(n²) per eval, 83 s for a 240k-pair group (r14, surfaced the
    // moment the bench stopped letting Catalyst prune the aggregate)
    val sorted: Array[(Double, Double)] =
      if (isExact) pairs.toArray.sortBy(_._1)
      else {
        if (pairs.nonEmpty) compress()
        centroids // pre-sorted
      }
    if (sorted.isEmpty) return null
    var total = 0.0
    var i = 0
    while (i < sorted.length) { total += sorted(i)._2; i += 1 }
    var cum = 0.0
    i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= q * total) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    if (centroids != null && pairs.nonEmpty) compress()
    val n = pairs.length
    val m = if (centroids == null) -1 else centroids.length
    // capacity/compressedSize travel with the bytes: a deserialized
    // partial must follow the same bounds as the buffer that produced it,
    // not the defaults
    val bb = java.nio.ByteBuffer.allocate(16 + n * 16 + math.max(m, 0) * 16)
    bb.putInt(capacity)
    bb.putInt(compressedSize)
    bb.putInt(n)
    bb.putInt(m)
    pairs.foreach { case (v, w) => bb.putDouble(v); bb.putDouble(w) }
    if (m >= 0) centroids.foreach { case (v, w) => bb.putDouble(v); bb.putDouble(w) }
    bb.array()
  }
}

private[spark] object WeightedQuantileBuffer {
  // exact below 1M pairs per group (16 MiB serialized worst case — a
  // bounded buffer, and two orders of magnitude above the correctness
  // gate's group sizes so the hash-checked exact semantics hold at any
  // gate SF); compressed to 4k weighted centroids beyond (rank error
  // <= ~1/4096 of the group's weight)
  val DefaultCapacity = 1 << 20
  val DefaultCompressedSize = 4096

  def deserialize(bytes: Array[Byte]): WeightedQuantileBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val capacity = bb.getInt()
    val compressedSize = bb.getInt()
    val n = bb.getInt()
    val m = bb.getInt()
    val buf = new WeightedQuantileBuffer(capacity, compressedSize)
    var i = 0
    while (i < n) { buf.pairs += ((bb.getDouble(), bb.getDouble())); i += 1 }
    if (m >= 0) {
      val cs = new Array[(Double, Double)](m)
      i = 0
      while (i < m) { cs(i) = (bb.getDouble(), bb.getDouble()); i += 1 }
      buf.centroids = cs
    }
    buf
  }
}

/** `weighted_median(value, weight)` as a first-class SQL aggregate
  * (TypedImperativeAggregate — the mutable-buffer rung for sketches and
  * order statistics). Semantics match GraftUtils.weightedMedian: the
  * smallest value whose cumulative weight reaches half the total
  * (reference: ensemble/Utils.scala:26-40, lifted from per-row voting into
  * a distributed aggregate). Exact up to [[WeightedQuantileBuffer]]'s
  * capacity per group; bounded centroid approximation beyond it.
  */
case class WeightedMedianAgg(
    valueExpr: Expression,
    weightExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[WeightedQuantileBuffer]
    with ImplicitCastInputTypes {

  // analyzer-inserted casts keep SQL-text callers (int/decimal columns)
  // from hitting the Double hard-casts in update()
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)

  override def children: Seq[Expression] = Seq(valueExpr, weightExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): WeightedQuantileBuffer =
    new WeightedQuantileBuffer(
      WeightedQuantileBuffer.DefaultCapacity,
      WeightedQuantileBuffer.DefaultCompressedSize)

  override def update(
      buffer: WeightedQuantileBuffer,
      input: InternalRow): WeightedQuantileBuffer = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null) {
      buffer.add(v.asInstanceOf[Double], w.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(
      buffer: WeightedQuantileBuffer,
      other: WeightedQuantileBuffer): WeightedQuantileBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: WeightedQuantileBuffer): Any = buffer.quantile(0.5)

  override def serialize(buffer: WeightedQuantileBuffer): Array[Byte] =
    buffer.serialize()

  override def deserialize(bytes: Array[Byte]): WeightedQuantileBuffer =
    WeightedQuantileBuffer.deserialize(bytes)

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
