package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact baseline — broadcast the (small) query set
  *   against the corpus, cosine as a codegen-friendly higher-order-function
  *   expression, per-query top-k via window. Linear in corpus x queries.
  * - `ivfTopK`: the scale path — KMeans coarse quantizer; corpus rows are
  *   bucketed by nearest centroid (one narrow pass), queries probe only
  *   their `nprobe` closest centroids, so the join fan-out is
  *   |corpus|/#centroids * nprobe per query instead of |corpus|. Ranking
  *   uses the bounded-heap `topk_by_score` aggregate (see [[rankTopK]]).
  */
object Similarity {

  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
      .filter(!isnan(col("cos"))) // zero-vector pairs have no rank
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Same result as [[bruteForceTopK]] via the bounded-heap
    * `topk_by_score` aggregate: map tasks keep <= k candidates per query,
    * so the shuffle carries O(queries x k) rows instead of sorting the
    * whole cross product through a window — the plan that survives a
    * billion-row corpus.
    */
  def bruteForceTopKAgg(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graft.TopKByScore.topk_by_score
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
      .filter(!isnan(col("cos"))) // match the window variant's NaN policy
      .groupBy("query_id")
      .agg(topk_by_score(col("neighbor_id"), col("cos"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(
        col("query_id"),
        col("n.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"))
  }

  /** Persisted IVF index: build once (KMeans quantizer + assignments
    * written as parquet partitioned by inverted list), query many. At
    * corpus scale the partitioned layout means a probe reads only
    * `nprobe` list partitions — partition pruning does the work of an
    * index seek.
    */
  def buildIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      numCentroids: Int = 16,
      seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("feat", array_to_vector(col("cv")))
    val model = new KMeans().setK(numCentroids).setSeed(seed).setFeaturesCol("feat").fit(c)
    model.transform(c)
      .withColumnRenamed("prediction", "list_id")
      .select("neighbor_id", "cv", "list_id")
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    import spark.implicits._
    model.clusterCenters.map(_.toArray.toSeq).zipWithIndex.toSeq
      .toDF("centroid", "list_id")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Shared nprobe-nearest-centroid probe. Queries are always cast to
    * `array<double>` BEFORE this UDF (a `Seq[Float]`-typed variant used to
    * crash at runtime on double-typed inputs — the cast makes both IVF
    * paths accept float or double embedding columns).
    */
  private def probeLists(
      centroids: Array[(Int, Array[Double])],
      nprobe: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Double]) =>
      centroids.map { case (i, cen) =>
        var d = 0.0
        var j = 0
        while (j < cen.length) { val x = cen(j) - v(j); d += x * x; j += 1 }
        (i, d)
      }.sortBy(_._2).take(nprobe).map(_._1)
    }

  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val centroids: Array[(Int, Array[Double])] = spark.read
      .parquet(s"$indexPath/centroids")
      .collect()
      .map(r => (r.getInt(1), r.getSeq[Double](0).toArray))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("list_id", explode(probeLists(centroids, nprobe)(col("qv"))))
    val lists = spark.read.parquet(s"$indexPath/lists")
    // the list_id equi-join prunes the scan to the probed partitions
    val scored = lists.join(broadcast(q),
        lists("list_id") === q("list_id") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** Shared IVF ranking stage: per-query top-k via the bounded-heap
    * `topk_by_score` aggregate (map-side partial top-k, NaN cosines
    * dropped inside the aggregate), so the rank shuffle carries
    * O(queries x k) rows — a `row_number()` window here would sort every
    * scored candidate pair through one shuffle, the plan that dies first
    * at corpus scale. Candidate (query, neighbor) pairs are unique
    * because each corpus row lives in exactly one inverted list.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.TopKByScore.topk_by_score
    scored
      .groupBy("query_id")
      .agg(topk_by_score(col("neighbor_id"), col("cos"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(
        col("query_id"),
        col("n.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"),
        round(col("n.score"), 6).as("cos"))
  }

  /** IVF: coarse-quantize the corpus with KMeans, probe nprobe lists.
    *
    * Centroid sizing: the classic IVF balance point is
    * `numCentroids ~ sqrt(n)` (n = corpus rows) — each inverted list then
    * holds ~sqrt(n) rows, so a probe scans `nprobe * sqrt(n)` candidates
    * instead of n, and the quantizer fit (k-means over numCentroids
    * centers) stays tractable. The default of 16 suits the tiny test
    * corpora; at 1e9 rows plan for ~3e4 centroids and fit the quantizer
    * on a sample (KMeans cost grows with n x k). `nprobe` then trades
    * recall for scan cost along the usual IVF curve.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("feat", array_to_vector(col("cv").cast("array<double>")))
    val km = new KMeans().setK(numCentroids).setSeed(seed).setFeaturesCol("feat")
    val model = km.fit(c)
    val centroids: Array[Array[Double]] = model.clusterCenters.map(_.toArray)

    val assigned = model.transform(c).withColumnRenamed("prediction", "list_id")
      .select("neighbor_id", "cv", "list_id")

    // queries probe their nprobe nearest centroids (tiny driver-free UDF,
    // shared with the persisted-index path)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn(
        "list_id",
        explode(probeLists(centroids.zipWithIndex.map(_.swap), nprobe)(col("qv"))))

    val scored = assigned.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          assigned("list_id") === q("list_id"))
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }
}
