package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * the published recipe for tilting a raw web corpus toward a small
  * high-quality target corpus without training a classifier: estimate
  * bag-of-n-gram unigram distributions p (target) and q (raw), weight
  * every raw document by `log w(x) = Σ_g [log p_g − log q_g]` over the
  * document's n-gram OCCURRENCES, and resample ∝ w via the Gumbel-max
  * trick.
  *
  * Engine-portability discipline (the [[LanguageModel]] contract): each
  * per-gram log-ratio is a SINGLE `ln` of an exactly-representable
  * rational (integer counts cross-multiplied — no intermediate division),
  * snapped to 6 dp and summed as `DECIMAL(18,6)`, so the document weight
  * is bit-identical regardless of summation order or engine.
  *
  * Feature space: raw n-gram strings (`numBuckets = 0`) keep the weight
  * table human-auditable and exactly SQL-derivable — the gate mode. At
  * web scale the vocabulary is unbounded, so production hashes grams
  * into `numBuckets` buckets (the paper's 10k-bucket configuration):
  * the weight table becomes a fixed-size broadcastable artifact and
  * [[scoreWithWeights]] scores map-side with zero shuffles.
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY §2.5).
  */
object ImportanceSampling {

  /** Positioned (non-distinct) n-gram strings of a text column — DSIR
    * counts occurrences, not types. Null or shorter-than-n texts yield
    * an EMPTY array (the doc still scores, with `n_grams = 0` and
    * `logw = 0`: no evidence either way — callers routing gram-less
    * docs differently should filter on `n_grams`).
    */
  def gramStrings(text: Column, n: Int): Column = {
    require(n > 0, s"n must be positive, got $n")
    val tk = TextFunctions.tokens(text)
    coalesce(
      when(size(tk) >= n,
        transform(sequence(lit(1), size(tk) - n + 1),
          i => array_join(slice(tk, i, lit(n)), " "))),
      array().cast("array<string>"))
  }

  /** Hashed-bucket key of a gram string (`numBuckets <= 0` keeps the raw
    * gram). Applied AFTER the explode — a generator cannot nest inside
    * an expression.
    */
  private def bucketed(g: Column, numBuckets: Int): Column =
    if (numBuckets > 0) pmod(xxhash64(g), lit(numBuckets.toLong)).cast("string")
    else g

  /** The smoothed log-importance table `(gram, cp, cq, logr)`: add-one
    * counts over the union feature space, `logr = round6(ln((cp+1)(Nq+V)
    * / ((cq+1)(Np+V))))` as `DECIMAL(18,6)`. `V` is the union vocabulary
    * size (`numBuckets` when hashing — the fixed feature space makes the
    * estimate independent of which grams happen to occur).
    *
    * Scale shape: two corpus-sized explodes each collapse to vocabulary
    * size via map-side partial aggregation before their one shuffle; the
    * outer join and scalar totals are vocabulary-sized. Nothing is
    * collected.
    */
  def weightTable(
      raw: DataFrame,
      rawTextCol: String,
      target: DataFrame,
      targetTextCol: String,
      n: Int,
      numBuckets: Int = 0): DataFrame = {
    val cq = raw.select(explode(gramStrings(col(rawTextCol), n)).as("g"))
      .select(bucketed(col("g"), numBuckets).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cq"))
    val cp = target.select(explode(gramStrings(col(targetTextCol), n)).as("g"))
      .select(bucketed(col("g"), numBuckets).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cp"))
    val vocab = cp.join(cq, Seq("gram"), "full_outer")
      .select(col("gram"),
        coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"))
    val totals = vocab.agg(
      (if (numBuckets > 0) lit(numBuckets.toLong) else count(lit(1))).as("v"),
      sum("cp").as("np"),
      sum("cq").as("nq"))
    vocab.crossJoin(broadcast(totals))
      .withColumn("logr",
        round(log(
          ((col("cp") + 1) * (col("nq") + col("v"))).cast("double") /
            ((col("cq") + 1) * (col("np") + col("v"))).cast("double")), 6)
          .cast("decimal(18,6)"))
      .select("gram", "cp", "cq", "logr")
  }

  /** Per-document DSIR log-importance weights `(id..., n_grams, logw)`.
    * Every raw doc keeps its row (gram-less docs score 0 over 0 grams).
    *
    * Scale shape: the raw side explodes once and hash-joins the weight
    * table on the gram key (vocabulary-keyed — ONE corpus-sized shuffle),
    * then partially aggregates per doc. With `numBuckets` set the weight
    * table is bucket-sized and the join side broadcasts; for fully
    * shuffle-free scoring against a persisted table use
    * [[scoreWithWeights]].
    */
  def importanceWeights(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      n: Int,
      numBuckets: Int = 0): DataFrame = {
    val w = weightTable(raw, textCol, target, targetTextCol, n, numBuckets)
    val grams = raw
      .select(col(idCol), explode(gramStrings(col(textCol), n)).as("g"))
      .select(col(idCol), bucketed(col("g"), numBuckets).as("gram"))
    val scored = grams.join(w.select("gram", "logr"), Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum("logr").cast("double").as("logw"))
    raw.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        round(coalesce(col("logw"), lit(0.0)), 6).as("logw"))
  }

  /** Map-side scoring against a COLLECTED weight table — the streaming-
    * deployable twin of [[importanceWeights]]'s join path, row-identical
    * by construction (same 6 dp snap, same decimal summation — here a
    * scale-6 long accumulator). Fail-loud bound: refuses tables beyond
    * `maxEntries` (hashed-bucket tables are ≤ numBuckets entries; raw-
    * gram tables at web scale belong on the join path).
    */
  def scoreWithWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      n: Int,
      numBuckets: Int = 0,
      maxEntries: Int = 4000000): DataFrame = {
    val rows = weights.select("gram", "logr").collect()
    require(rows.length <= maxEntries,
      s"weight table has ${rows.length} entries > maxEntries=$maxEntries — " +
        "use the importanceWeights join path for vocabulary-sized tables")
    val table = new java.util.HashMap[String, Long](rows.length * 2)
    rows.foreach { r =>
      table.put(r.getString(0),
        r.getDecimal(1).movePointRight(6).longValueExact())
    }
    val bc = docs.sparkSession.sparkContext.broadcast(table)
    val score = udf { (grams: Seq[String]) =>
      var sum = 0L
      var cnt = 0L
      grams.foreach { g =>
        val v = bc.value.get(g)
        if (v != null) { sum += v; cnt += 1 }
      }
      (cnt, sum / 1e6)
    }
    val keyed =
      if (numBuckets > 0)
        transform(gramStrings(col(textCol), n),
          g => pmod(xxhash64(g), lit(numBuckets.toLong)).cast("string"))
      else gramStrings(col(textCol), n)
    docs.withColumn("__s", score(keyed))
      .select(col(idCol),
        col("__s._1").as("n_grams"),
        round(col("__s._2"), 6).as("logw"))
  }

  /** Gumbel-max resampling: draw `k` docs without replacement with
    * probability ∝ exp(logw / temperature) by ranking on
    * `logw / temperature + g_i` where `g_i = −ln(−ln(u_i))` and `u_i`
    * derives from the doc id's LCG bucket — deterministic, layout- and
    * retry-invariant, engine-reproducible (two `ln`s and the
    * [[Sampling]] LCG; `u ∈ ((0,1))` by the +0.5/2^32 midpoint, so
    * neither log can hit ±∞). The Gumbel key is snapped at 6 dp; ties
    * break by id. Selection is the bounded-heap `topk_rows` aggregate —
    * O(k) per map task, never a global sort.
    */
  def gumbelTopK(
      weights: DataFrame,
      idCol: String,
      k: Int,
      temperature: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    import org.apache.spark.sql.graft.TopKRows.topk_rows
    val u = (Sampling.lcgBucket(col(idCol)).cast("double") + 0.5) / 4294967296.0
    val key = round(col("logw") / temperature - log(-log(u)), 6)
    weights
      .withColumn("gumbel_key", key)
      .groupBy()
      .agg(topk_rows(k, Seq(true, false),
        col("gumbel_key"), col(idCol), col("logw")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(s"t.$idCol").as(idCol), col("t.logw").as("logw"),
        col("t.gumbel_key").as("gumbel_key"),
        (col("pos") + 1).cast("long").as("rnk"))
  }
}
