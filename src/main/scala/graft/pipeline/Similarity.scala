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

  /** Deterministic seeded coarse quantizer: centroids are the embeddings
    * of the `numCentroids` smallest ids, `list_id` = 0-based rank in id
    * order. No KMeans fit, so assignment, probe, and therefore the whole
    * approximate result are exactly re-derivable by another SQL engine —
    * which is what makes an EXACT recall oracle possible (gate
    * `p_ann_recall`). The collect is `numCentroids` rows (capped), never
    * the corpus; at scale the seed set rides a broadcast like any other
    * centroid table.
    */
  def seedCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int): Array[(Int, Array[Double])] = {
    require(numCentroids > 0 && numCentroids <= 65536,
      s"seedCentroids collects $numCentroids rows to the driver (cap 65536)")
    corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy("id")
      .limit(numCentroids)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
  }

  /** IVF over the seeded quantizer of [[seedCentroids]]: same pruned
    * probe join as [[ivfTopK]] (corpus rows assigned to their argmin
    * centroid — distance ties break to the lower list id — queries probe
    * `nprobe` lists, bounded-heap rank), but every stage is deterministic
    * and engine-replayable. At `nprobe < numCentroids` recall < 1 by
    * construction — this is the variant the exact recall gate measures;
    * at `nprobe = numCentroids` it reproduces [[bruteForceTopKAgg]]
    * exactly (each corpus row lives in exactly one list and all lists are
    * probed — suite-pinned).
    */
  def ivfTopKSeeded(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val centroids = seedCentroids(corpus, idCol, vecCol, numCentroids)
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("list_id", element_at(probeLists(centroids, 1)(col("cv")), 1))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("list_id", explode(probeLists(centroids, nprobe)(col("qv"))))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && c("list_id") === q("list_id"))
      .withColumn("cos", Dedup.cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** Recall@k evaluation harness: per-query overlap between an
    * approximate top-k and the exact top-k, both as (query_id,
    * neighbor_id) row sets — the output contract every `*TopK` in this
    * file shares, so any ANN variant plugs in. Inputs are O(queries x k)
    * rows: the evaluation never touches the corpus, and the overlap join
    * is trivially broadcastable at any corpus scale. All-integer output
    * (comparator discipline); recall = n_hits / n_exact.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.select("query_id", "neighbor_id")
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
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

  /** Symmetric int8 absmax quantization: per-vector `scale = max|x|/127`,
    * `code_i = floor(x_i/scale + 0.5)` (half-up via floor — bit-portable
    * across engines, unlike banker's rounding), codes in [-127, 127].
    * The 4x storage cut (float32 -> int8) is the standard first step of
    * a memory-resident vector index; compose with [[pqTopK]] (codes
    * re-quantize) or rescale on read (`code * scale`). Zero vectors get
    * `scale = 0` and all-zero codes. Pure higher-order-function
    * expressions — map-side, zero shuffle, no UDF.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val am = array_max(transform(v, x => abs(x)))
    val codes = when(am === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => floor(x / (am / lit(127.0)) + lit(0.5)).cast("int")))
    df.select(col(idCol), (am / lit(127.0)).as("scale"), codes.as("codes"))
  }

  /** Rademacher (±1) random projection — Johnson–Lindenstrauss dimension
    * reduction: `y_j = (1/√m) Σ_i x_i · s_ij` with `s_ij ∈ {+1, −1}`.
    * The sign matrix is never materialized: `s_ij = +1 iff
    * LCG(i·m + j) < 2^31` (the [[Sampling]] LCG — deterministic,
    * engine-portable, layout- and retry-invariant; Achlioptas 2003
    * showed ±1 entries satisfy the JL guarantee, no Gaussians needed).
    * Output `(id, dim, y)` long-format, `y` snapped 6 dp.
    *
    * Why: at 100 TB the embedding SCAN dominates ANN cost — projecting
    * 64-dim floats to m=8..16 before LSH/IVF cuts the candidate-scoring
    * byte volume ~4-8x while approximately preserving distances. Pure
    * higher-order-function expressions — map-side, zero shuffle, no UDF,
    * streaming-safe. Each term `x_i·(±1)` is an exact double (float32
    * inputs), so the fixed i=0..d−1 summation order makes the sum
    * reproducible across engines before the snap.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String, outDim: Int): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val m = outDim.toLong
    // `x / sqrt(m)` on BOTH engines — NOT `x * (1/sqrt(m))`, which
    // rounds differently; sqrt of an integer is correctly rounded on both
    val norm = lit(math.sqrt(outDim.toDouble))
    val v = col(vecCol)
    // null/empty guard: sequence(0, -1) is DESCENDING in Spark, and
    // size(null) is -1 — null/empty vectors emit NO rows (posexplode of
    // the null array)
    val proj = when(v.isNotNull && size(v) > 0,
      transform(sequence(lit(0L), lit(m - 1)), j =>
        round(
          aggregate(
            sequence(lit(0), size(v) - 1),
            lit(0.0),
            (acc, i) => acc + element_at(v, i + 1).cast("double") *
              when(Sampling.lcgBucket(i.cast("long") * m + j) < 2147483648L,
                lit(1.0)).otherwise(lit(-1.0))) / norm,
          6)))
    df.select(col(idCol), posexplode(proj).as(Seq("dim", "y")))
      .select(col(idCol), col("dim").cast("long").as("dim"), col("y"))
  }

  // ------------------------------------------------------------------- PQ

  /** Product-quantization codebooks from the corpus rows with
    * `idCol < ksub` (the [[graft.pipeline.Clustering.initByMinId]]
    * convention — deterministic, engine-portable, and a reasonable
    * spread on shuffled data; swap in per-subspace k-means centroids for
    * production recall). Shape: `[numSubspaces][ksub][dim/numSubspaces]`.
    * The collect is bounded by construction: ksub vectors (<= 256 for
    * byte codes) of `dim` doubles.
    */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numSubspaces: Int,
      ksub: Int): Array[Array[Array[Double]]] = {
    val rows = corpus
      .filter(col(idCol) < ksub)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.length == ksub, s"need ids 0..${ksub - 1} for codebooks, got ${rows.length}")
    val dim = rows.head._2.length
    require(dim % numSubspaces == 0, s"dim=$dim not divisible by m=$numSubspaces")
    val dsub = dim / numSubspaces
    Array.tabulate(numSubspaces, ksub) { (s, j) =>
      java.util.Arrays.copyOfRange(rows(j)._2, s * dsub, (s + 1) * dsub)
    }
  }

  /** Encode vectors to PQ codes: per subspace, the index of the nearest
    * codebook entry by L2 (ties to the lowest index). The encoded corpus
    * is `numSubspaces` small ints per row — at m=8 that is 8 bytes
    * replacing a 256-byte float[64] vector, the 32x compression that
    * lets a billion-row index live in cluster memory. Map-side only.
    */
  def pqEncode(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(codebooks)
    df.select(
      col(idCol).as("neighbor_id"),
      pqEncodeUdf(bc).asNondeterministic()(col(vecCol).cast("array<double>")).as("codes"))
  }

  /** Marked nondeterministic ON PURPOSE (it is semantically
    * deterministic): project-collapse otherwise merges the encode
    * projection into the query join, re-encoding every corpus row once
    * PER QUERY (the full m x ksub x dsub argmin plus a 64-double
    * deserialization, |queries|-fold) — measured as ~2.5 s of the PQ
    * gates' fixed cost. The flag pins the projection below the join, so
    * each corpus row encodes exactly once.
    */
  private def pqEncodeUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Double]) =>
      val cbs = bc.value
      val dsub = cbs(0)(0).length
      Array.tabulate(cbs.length) { s =>
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < cbs(s).length) {
          val cb = cbs(s)(j)
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val x = v(s * dsub + i) - cb(i)
            d += x * x
            i += 1
          }
          // strict less-than keeps the lowest index on exact ties
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        best
      }
    }

  /** ANN top-k by product quantization with asymmetric distance
    * computation (ADC): each query precomputes its distance table
    * `dt[s][j] = ||q_sub_s - codebook[s][j]||^2` once, and every corpus
    * candidate scores as `sum_s dt[s][code_s]` — m table lookups, no
    * float-vector reads. Returns `(query_id, neighbor_id, rank, ad2)`
    * with rank ascending by approximate distance (ties to the lower id)
    * and `ad2` rounded 1e-6.
    *
    * 100 TB shape: the corpus pass reads only the m-byte code column
    * (encode once, store as its own table/column); queries + their
    * (m x ksub)-double tables are broadcast; ranking is the bounded-heap
    * `topk_by_score` aggregate, so the shuffle carries O(queries x k)
    * rows. Compose with [[ivfTopK]] for IVF-PQ: probe lists first, score
    * the probed candidates with ADC.
    */
  /** One query's ADC distance table, flattened
    * (`dt[s * ksub + j] = ||q_sub_s - cb[s][j]||^2`). Computed DRIVER
    * side: the query set is broadcast-small by contract, and carrying a
    * per-row `dt` column through the scored join instead cost a stable
    * ~2.5 s of per-row array deserialization on the sf0.1 gates — the
    * table rides a broadcast Map keyed by query id, so a scored row
    * deserializes only its m codes.
    */
  private def distTable(v: Array[Double], cb: Array[Array[Array[Double]]]): Array[Double] = {
    val m = cb.length
    val ksub = cb(0).length
    val dsub = cb(0)(0).length
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = v(s * dsub + i) - cb(s)(j)(i)
          d += x * x
          i += 1
        }
        out(s * ksub + j) = d
        j += 1
      }
      s += 1
    }
    out
  }

  /** Driver-computed tables for every query id (collect bounded by the
    * broadcast-small query-set contract), ready to broadcast.
    */
  private def queryDistTables(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cbs: Array[Array[Array[Double]]]): Map[Long, Array[Double]] =
    queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> distTable(r.getSeq[Double](1).toArray, cbs))
      .toMap

  /** Fixed s = 0..m-1 summation order: bit-identical to any re-derivation
    * that sums the lookups left to right.
    */
  private def adcUdf(
      bcDt: org.apache.spark.broadcast.Broadcast[Map[Long, Array[Double]]])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (queryId: Long, codes: Seq[Int]) =>
      val dt = bcDt.value(queryId)
      val ksub = dt.length / codes.length
      var acc = 0.0
      var s = 0
      while (s < codes.length) { acc += dt(s * ksub + codes(s)); s += 1 }
      acc
    }

  /** Shared ADC ranking stage: nearest-first per-query top-k via the
    * bounded-heap aggregate (negated score gives the (ad2 asc, id asc)
    * order), `ad2` rounded 1e-6 on output.
    */
  private def rankTopKAdc(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.TopKByScore.topk_by_score
    scored
      .groupBy("query_id")
      .agg(topk_by_score(col("neighbor_id"), -col("ad2"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(
        col("query_id"),
        col("n.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"),
        round(-col("n.score"), 6).as("ad2"))
  }

  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numSubspaces: Int = 8,
      ksub: Int = 16): DataFrame = {
    val cbs = pqCodebooks(corpus, idCol, vecCol, numSubspaces, ksub)
    val bcDt = corpus.sparkSession.sparkContext.broadcast(
      queryDistTables(queries, idCol, vecCol, cbs))
    val encoded = pqEncode(corpus, idCol, vecCol, cbs)
    val q = queries.select(col(idCol).cast("long").as("query_id"))
    val scored = encoded
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ad2", adcUdf(bcDt)(col("query_id"), col("codes")))
    rankTopKAdc(scored, k)
  }

  /** IVF-PQ: the coarse quantizer prunes WHICH candidates are scored
    * (nprobe inverted lists instead of the whole corpus) and PQ prunes
    * WHAT is read per candidate (m code bytes instead of the float
    * vector) — composed, a billion-vector index is both memory-resident
    * and probe-bounded, the standard large-scale ANN shape. This variant
    * encodes raw vectors against corpus-global codebooks (IVF-Flat-PQ);
    * production systems often encode per-list RESIDUALS for tighter
    * quantization — same dataflow, centroid-subtracted inputs.
    *
    * At `nprobe = numCentroids` no candidate is pruned, so the result is
    * exactly [[pqTopK]]'s — the full-probe gate pins the whole composed
    * machinery against the PQ oracle, while pruned-probe recall is
    * measured in PipelineSuite (approximation is the point there).
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      numSubspaces: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L): DataFrame = {
    val cbs = pqCodebooks(corpus, idCol, vecCol, numSubspaces, ksub)
    val bc = corpus.sparkSession.sparkContext.broadcast(cbs)
    val bcDt = corpus.sparkSession.sparkContext.broadcast(
      queryDistTables(queries, idCol, vecCol, cbs))
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("feat", array_to_vector(col("cv")))
    val km = new KMeans().setK(numCentroids).setSeed(seed).setFeaturesCol("feat")
    val model = km.fit(c)
    val centroids: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
    val encoded = model.transform(c)
      .withColumnRenamed("prediction", "list_id")
      .select(col("neighbor_id"), col("list_id"),
        pqEncodeUdf(bc).asNondeterministic()(col("cv")).as("codes"))
    val q = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn(
        "list_id",
        explode(probeLists(centroids.zipWithIndex.map(_.swap), nprobe)(col("qv"))))
      .select("query_id", "list_id")
    val scored = encoded.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          encoded("list_id") === q("list_id"))
      .withColumn("ad2", adcUdf(bcDt)(col("query_id"), col("codes")))
    rankTopKAdc(scored, k)
  }
}
