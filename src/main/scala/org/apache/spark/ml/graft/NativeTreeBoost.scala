package org.apache.spark.ml.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.ml.feature.Instance
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.tree.{DecisionTreeModel, Split}
import org.apache.spark.ml.tree.impl.{
  BaggedPoint, DecisionTreeMetadata, GraftTreeShim, RandomForest, TreePoint
}
import org.apache.spark.mllib.tree.configuration.{Strategy => OldStrategy}
import org.apache.spark.rdd.RDD
import org.apache.spark.rdd.util.PeriodicRDDCheckpointer
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared bin-once scaffolding for the AdaBoost fast paths (one copy of
  * the fragile Spark-internals plumbing; the estimators keep only their
  * own error/alpha/weight-update recursions).
  *
  * Weight scale: the instance weights are normalized to SUM 1 before
  * metadata/split building, because `DecisionTreeMetadata` bakes
  * `minWeightPerNode = minWeightFractionPerNode * weightedNumExamples` at
  * build time and every boosting round trains on weights re-normalized to
  * sum 1 — building metadata on the raw scale would make the fraction
  * threshold unsatisfiable (the generic loop rebuilds metadata per round
  * from the normalized weight column, so sum-1 is the scale that matches
  * it). Split candidates are weighted quantiles and therefore
  * scale-invariant; all boosting statistics (normalized losses, beta,
  * alpha) are scale-invariant too, so outputs are unchanged for the
  * default minWeightFractionPerNode = 0.
  */
private[graft] final class NativeTreeBoost(
    instances: DataFrame,
    strategy: OldStrategy,
    val dtSeed: Long,
    checkpointInterval: Int) {

  private val sc = instances.sparkSession.sparkContext

  private val raw: RDD[Instance] = instances.select("label", "weight", "features").rdd
    .map(r => Instance(r.getDouble(0), r.getDouble(1), r.getAs[Vector](2)))
  raw.persist(StorageLevel.MEMORY_AND_DISK)

  private val totalWeight = NativeTreeBoost.orderedSum(raw.map(_.weight))
  require(totalWeight > 0.0,
    s"boosting needs positive total instance weight, got $totalWeight")

  private val train: RDD[Instance] = {
    // local copy: closing over the member would serialize `this` (which
    // holds the DataFrame and SparkContext) into the task
    val tw = totalWeight
    raw.map(i => Instance(i.label, i.weight / tw, i.features))
  }

  val metadata: DecisionTreeMetadata =
    DecisionTreeMetadata.buildMetadata(train, strategy, numTrees = 1, "all")
  private val splits = GraftTreeShim.findSplits(train, metadata, dtSeed)
  val bcSplits: Broadcast[Array[Array[Split]]] = sc.broadcast(splits)
  val treePoints: RDD[TreePoint] = TreePoint.convertToTreeRDD(train, splits, metadata)
    .persist(StorageLevel.MEMORY_AND_DISK)

  val bwCk = new PeriodicRDDCheckpointer[Double](checkpointInterval, sc)

  /** Initial boost-weight state (normalized instance weights), registered
    * with the checkpointer and materialized.
    */
  def initialWeights(): RDD[Double] = {
    val bw = treePoints.map(_.weight)
    bwCk.update(bw)
    bw.count()
    bw
  }

  /** One boosted tree: relabel the cached binned points with the round's
    * sum-normalized weights (labels never change in AdaBoost — only the
    * weights), fix the round's sample, run the core induction.
    */
  def fitRound(bw: RDD[Double], sumW: Double, roundSeed: Long): DecisionTreeModel = {
    val relabeled = treePoints.zip(bw).map { case (tp, w) =>
      new TreePoint(tp.label, tp.binnedFeatures, w / sumW)
    }
    val bagged = BaggedPoint.convertToBaggedRDD(
      relabeled, 1.0, 1, false, (tp: TreePoint) => tp.weight, roundSeed)
    bagged.persist(StorageLevel.MEMORY_AND_DISK)
    try RandomForest.runBagged(
        bagged, metadata, bcSplits, strategy, 1, "all", dtSeed, None).head
    finally bagged.unpersist(blocking = false)
  }

  /** Register + materialize the next round's weight state. */
  def advance(newBw: RDD[Double]): RDD[Double] = {
    bwCk.update(newBw)
    newBw.count()
    newBw
  }

  /** Always runs (callers wrap their loop in try/finally): frees the
    * weight-state caches and checkpoint files, the binned table, the
    * instance cache, and the splits broadcast — a failed fit must not
    * leak reliable checkpoint directories (ContextCleaner never deletes
    * them) or corpus-sized cached RDDs into the surviving session.
    */
  def close(): Unit = {
    bwCk.unpersistDataSet()
    bwCk.deleteAllCheckpoints()
    treePoints.unpersist(blocking = false)
    raw.unpersist(blocking = false)
    bcSplits.destroy()
  }
}

private[graft] object NativeTreeBoost {

  /** Deterministic distributed double sum: per-partition sums combined in
    * PARTITION ORDER on the driver. `RDD.sum` folds partition results in
    * task-completion order, which perturbs float sums by ulps run-to-run —
    * enough to flip a split choice and break the fast path's
    * same-seed-same-model guarantee.
    */
  def orderedSum(rdd: RDD[Double]): Double =
    rdd.mapPartitionsWithIndex { (i, it) =>
        var s = 0.0
        it.foreach(s += _)
        Iterator.single((i, s))
      }
      .collect()
      .sortBy(_._1)
      .foldLeft(0.0)(_ + _._2)
}
