package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means over an embedding column — corpus clustering for training-mix
  * construction (cluster-balanced sampling, semantic dedup buckets,
  * topic discovery) and the coarse quantizer behind [[Similarity]]'s IVF
  * index.
  *
  * Everything is expressed against Spark's aggregation machinery:
  * centroids live in the PLAN as literals (k x d doubles — broadcast-
  * sized by construction; k-means with corpus-sized k is a different
  * algorithm), assignment is a codegen'd per-row argmin projection, and
  * the Lloyd update aggregates per-cluster vector sums with the
  * [[org.apache.spark.sql.graft.VectorSumAgg vec_sum]] aggregate —
  * partial aggregation collapses each map task to k d-length rows before
  * the shuffle, so one iteration over 10^11 rows shuffles
  * #partitions x k x d doubles, never the corpus.
  *
  * Determinism contract: initial centroids are the vectors of the k
  * smallest ids (callers wanting k-means++ can pass their own via
  * `initial`), ties in the argmin break to the lowest centroid index,
  * empty clusters keep their previous centroid. Iteration count is
  * fixed, not convergence-tested — reproducibility beats adaptivity in
  * a data pipeline (a tolerance test makes output depend on float
  * summation order across cluster sizes).
  */
object Clustering {

  /** Squared L2 distance from `vec` to a literal centroid, as a left
    * fold in element order — the summation order is part of the operator
    * contract (an external oracle must be able to reproduce it term by
    * term).
    */
  private def dist2(vec: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(vec, array(centroid.map(lit): _*), (a, b) => (a - b) * (a - b)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Nearest-centroid index for `vec` (squared L2; ties -> lowest
    * centroid index, via the lexicographic struct min over (dist, idx)).
    */
  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(centroids.map(_.length).distinct.size == 1,
      s"centroids must share one dimension, got ${centroids.map(_.length).distinct}")
    array_min(
      array(centroids.zipWithIndex.map { case (c, i) =>
        struct(dist2(vec, c).as("d"), lit(i).as("c"))
      }: _*)).getField("c")
  }

  /** Add a `cluster` column: the nearest-centroid index for `vecCol`.
    * Pure projection — zero shuffles, composes with pushdown.
    */
  def assignClusters(
      points: DataFrame,
      vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame =
    points.withColumn("cluster", nearestCentroid(col(vecCol).cast("array<double>"), centroids))

  /** Deterministic default init: the vectors of the `k` smallest ids. */
  def initByMinId(points: DataFrame, idCol: String, vecCol: String, k: Int): Seq[Seq[Double]] =
    points
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(idCol)
      .limit(k)
      .collect()
      .map(_.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq

  /** `iters` full Lloyd iterations; returns the final centroids. One
    * aggregation job per iteration (assignment is fused into it — the
    * argmin is just a projection under the groupBy), each shuffling
    * k x d doubles per map partition. Each iteration re-scans `points`:
    * persist it (id + vector only, post-pruning) before a multi-
    * iteration fit, exactly like the ensemble estimators cache their
    * instance table.
    */
  def lloyd(
      points: DataFrame,
      vecCol: String,
      initial: Seq[Seq[Double]],
      iters: Int): Seq[Seq[Double]] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    import org.apache.spark.sql.graft.VectorSum.vec_sum
    var cents = initial
    for (_ <- 0 until iters) {
      val updated = assignClusters(points, vecCol, cents)
        .groupBy("cluster")
        .agg(vec_sum(col(vecCol)).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0) -> ((r.getSeq[Double](1), r.getLong(2))))
        .toMap
      cents = cents.zipWithIndex.map { case (old, i) =>
        updated.get(i) match {
          case Some((s, n)) if n > 0 => s.map(_ / n).toIndexedSeq
          case _ => old // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** Cluster-balanced sampling: assign to clusters, then downsample
    * each cluster toward `targetPerCluster` docs with the deterministic
    * LCG filter — the "equalize topics in the mix" operator (a crawl is
    * 40% boilerplate-cluster; the training mix shouldn't be). A cluster
    * at or under target keeps everything (rate caps at 1; upsampling is
    * epoch repetition, not a corpus operator — same contract as
    * [[Sampling.mixRates]]). One aggregation sizes the clusters (k
    * driver-side rows); the sample itself is [[Sampling]]'s map-side
    * id filter, so membership is a pure function of (id, centroids,
    * target) — reproducible across runs, engines, and layouts.
    */
  def clusterBalancedSample(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Double]],
      targetPerCluster: Long): DataFrame = {
    require(targetPerCluster > 0, s"targetPerCluster must be positive, got $targetPerCluster")
    val assigned = assignClusters(points, vecCol, centroids)
    val counts = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val rates = counts.map { case (c, n) =>
      c.toString -> math.min(1.0, targetPerCluster.toDouble / n)
    }.toMap
    Sampling.hashStratifiedSample(
        assigned.withColumn("__cluster_key", col("cluster").cast("string")),
        idCol, "__cluster_key", rates)
      .drop("__cluster_key")
  }

  /** End-to-end k-means: min-id init, `iters` Lloyd rounds, final
    * assignment. Returns the assigned frame and the centroids.
    */
  def kmeans(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): (DataFrame, Seq[Seq[Double]]) = {
    val cents = lloyd(points, vecCol, initByMinId(points, idCol, vecCol, k), iters)
    (assignClusters(points, vecCol, cents), cents)
  }
}
