package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExpressions.{codePointFnv32, opaque}
import org.apache.spark.storage.StorageLevel

import TextFunctions.tokens

/** FastText-style learned quality classifier — the "train a linear model
  * on hashed bag-of-tokens features, keep what scores like the reference
  * corpus" stage (CCNet's fastText filter; GPT-3/LLaMA's
  * classify-against-WebText/Wikipedia step). This is the LEARNED
  * complement of the heuristic quality stack: Gopher rules and
  * length/punctuation ratios catch structural garbage, the LM-perplexity
  * band catches non-language, and this classifier catches "well-formed
  * but not like the corpus you actually want".
  *
  * Feature space: the hashing trick — token → 32-bit codepoint FNV-1a →
  * bucket (mod `numBuckets`), mean-pooled per doc (`count/n_tokens`, the
  * fastText default). No vocabulary is ever built or shipped: the model
  * is a dense `numBuckets`-sized weight array that broadcasts, which is
  * the property that makes the scorer a map-side-only pass at corpus
  * scale.
  *
  * Cross-engine float contract (the gate discipline): per-bucket terms
  * are rounded in EXACT INTEGER micro space — `term_micro =
  * halfAway(w_micro·cnt / n)` via `(2·|w_micro·cnt| + n) div (2n)` —
  * not with a float `round(w·cnt/n, 6)`. The float round is genuinely
  * unsafe here, not just untidy: w is an exact 6-dp decimal and `cnt/n`
  * a small rational, so the product sits exactly ON a half-micro
  * boundary for many rows, where Spark (shortest-decimal-string
  * HALF_UP) and DuckDB (`rint(x·1e6)/1e6` — the multiply itself can
  * cross the boundary) disagree. Integer terms sum exactly and
  * order-independently; the sigmoid is the ONE float op, snapped to 6dp
  * right after the transcendental (`exp`), mirroring the BM25 `ln`
  * rule. The hash is codepoint-based precisely so the oracle can fold
  * it in plain BIGINT SQL arithmetic (see
  * [[org.apache.spark.sql.graft.CodePointFnv32]]).
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY
  * §2.5); the reference library has no text-classification surface.
  */
object QualityClassifier {

  /** A fitted (or synthetic) linear model over the hashed feature space. */
  case class LinearModel(weights: Array[Double], bias: Double) {
    require(weights.nonEmpty, "weights must be non-empty")
    def numBuckets: Int = weights.length
  }

  /** Token → feature bucket in [0, numBuckets). */
  def hashBucket(token: Column, numBuckets: Int): Column =
    pmod(codePointFnv32(token), lit(numBuckets.toLong))

  /** Distributed scoring against a weight TABLE `(bucket, w)` — the
    * join path for weight tables beyond broadcast or for oracle-pinned
    * synthetic weights. One corpus pass: tokenize once (the [[opaque]]
    * barrier — same reason as `Retrieval.docTokens`), bucket per token,
    * one (doc, bucket) partial-aggregated collapse, broadcast join
    * against the (numBuckets-sized) weight table, integer per-doc sum.
    * Output `(doc_id, n_tokens, z_micro, prob)` with `z_micro =
    * round(bias·10⁶) + Σ_b halfAway(w_micro·cnt_b / n)` — every term an
    * exact integer (see the class doc for why a float `round(·, 6)`
    * cannot be used here) — and
    * `prob = round(1/(1+exp(−z_micro/10⁶)), 6)` (exp is the one
    * transcendental — snapped immediately, the BM25 ln rule). Bias is
    * snapped to 6 dp by the contract. Null-text docs emit no row
    * (tokenize-and-explode of null is empty), matching the posting
    * builders' contract.
    */
  def scoreWithTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      bias: Double,
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val terms = docs
      .select(col(idCol).as("doc_id"), opaque(tokens(col(textCol))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        explode(col("toks")).as("token"))
      .select(col("doc_id"), col("n_tokens"),
        hashBucket(col("token"), numBuckets).as("bucket"))
      .groupBy("doc_id", "n_tokens", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(weights.select(col("bucket"),
        // w is an exact 6-dp decimal, so its double is within an ulp of
        // w_micro/1e6 and round recovers the integer micros exactly
        round(col("w") * lit(1e6), 0).cast("long").as("wm"))), Seq("bucket"))
      // halfAway(wm*cnt / n) in pure integer arithmetic: numerators are
      // bounded by |w|<=0.1 => |wm*cnt| <= 1e5 * n_tokens, far from
      // overflow, and (2|num|+n) div (2n) is floor of an exact rational
      .withColumn("num", col("wm") * col("cnt"))
      .withColumn("term_micro",
        signum(col("num")).cast("long") *
          expr("(2 * abs(num) + n_tokens) div (2 * n_tokens)"))
    val biasMicro = math.round(bias * 1e6)
    val zMicro = lit(biasMicro) + col("zsum")
    val z = zMicro.cast("double") / lit(1e6)
    terms
      .groupBy("doc_id", "n_tokens")
      .agg(sum(col("term_micro")).as("zsum"))
      .select(col("doc_id"), col("n_tokens"),
        zMicro.as("z_micro"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("prob"))
  }

  /** The oracle-pinned synthetic weight table: `w_b = round(u·0.2 − 0.1,
    * 6)` with `u = lcg(b)/2³²` (the repo's LCG convention — engine-
    * portable integer arithmetic). Exists so the SCORING dataflow can be
    * gate-pinned end to end without claiming bit-deterministic training
    * (see [[fitLogReg]]'s determinism note).
    */
  def lcgWeightTable(docs: DataFrame, numBuckets: Int): DataFrame = {
    val b = col("id")
    val u = pmod(b * lit(1103515245L) + lit(12345L), lit(4294967296L))
      .cast("double") / lit(4294967296.0)
    docs.sparkSession.range(numBuckets)
      .select(b.as("bucket"), round(u * lit(0.2) - lit(0.1), 6).as("w"))
  }

  /** Map-side-only scoring against a broadcast [[LinearModel]]: same
    * output contract and arithmetic as [[scoreWithTable]] (the suite
    * pins them row-identical) but zero joins and zero shuffles — one
    * scalar function per doc. This is the production scorer (fastText
    * models are a few MB dense) and the one that runs verbatim on a
    * document stream.
    */
  def scoreWithModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: LinearModel): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val score = udf { (text: String) =>
      if (text == null) None
      else {
        val m = bc.value
        val ts = {
          var a = 0; var z = text.length
          while (a < z && text.charAt(a) == ' ') a += 1
          while (z > a && text.charAt(z - 1) == ' ') z -= 1
          text.substring(a, z).toLowerCase.split("\\s+", -1)
        }
        val nb = m.numBuckets
        val cnt = new scala.collection.mutable.LongMap[Long]()
        ts.foreach { t =>
          val b = java.lang.Math.floorMod(
            org.apache.spark.sql.graft.CodePointFnv32.computeString(t), nb.toLong)
          cnt(b) = cnt.getOrElse(b, 0L) + 1L
        }
        val n = ts.length.toLong
        // exact-integer term rounding — the scalar twin of the
        // halfAway(wm*cnt / n) contract in scoreWithTable
        var zsumMicro = 0L
        cnt.foreach { case (b, c) =>
          val num = math.round(m.weights(b.toInt) * 1e6) * c
          val t = (2L * math.abs(num) + n) / (2L * n)
          zsumMicro += java.lang.Long.signum(num) * t
        }
        val zMicro = math.round(m.bias * 1e6) + zsumMicro
        val z = zMicro / 1e6
        Some((ts.length.toLong, zMicro,
          r6(1.0 / (1.0 + math.exp(-z)))))
      }
    }
    docs
      .select(col(idCol).as("doc_id"), score(col(textCol)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s._1").as("n_tokens"),
        col("s._2").as("z_micro"), col("s._3").as("prob"))
  }

  /** Persist a fitted [[LinearModel]] as the parquet weight-table
    * artifact every other model-shaped object here follows (the LM count
    * tables, the posting index, the dedup banding): `(bucket, w)` rows
    * for buckets 0..numBuckets−1 plus one `bucket = −1` row carrying the
    * bias. Doubles round-trip parquet bit-exactly, so
    * save → [[loadModel]] → score is row-identical to scoring the
    * in-memory model (suite-pinned), and the weight rows feed
    * [[scoreWithTable]] directly (filter `bucket >= 0`) — the artifact
    * IS the join-path weight table.
    */
  def saveModel(model: LinearModel, path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val rows = model.weights.zipWithIndex
      .map { case (w, b) => (b.toLong, w) }.toSeq :+ ((-1L, model.bias))
    rows.toDF("bucket", "w").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveModel]] artifact. Fails loud on a malformed table
    * (missing bias row or non-contiguous buckets) rather than scoring
    * with silently-shifted weights.
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): LinearModel = {
    val rows = spark.read.parquet(path).select("bucket", "w").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val bias = rows.collect { case (-1L, b) => b }
    require(bias.length == 1,
      s"loadModel: expected exactly one bias row (bucket = -1), got ${bias.length}")
    val ws = rows.filter(_._1 >= 0L).sortBy(_._1)
    require(ws.nonEmpty && ws.map(_._1).sameElements(ws.indices.map(_.toLong)),
      "loadModel: weight buckets are not contiguous 0..n-1")
    LinearModel(ws.map(_._2), bias.head)
  }

  /** Fit the logistic model by full-batch gradient descent: `iters`
    * passes, each ONE `treeAggregate` over the persisted hashed-feature
    * set (gradient is a dense numBuckets+1 array — 2 MB at 2¹⁸ buckets,
    * partial-merged up the tree exactly like the GBM line-search
    * objectives). L2-regularized, fixed step size — deliberately the
    * simplest convex recipe: every pass is a full barrier, so at corpus
    * scale `iters` IS the job count, and 30–50 passes of a convex
    * objective beat any fussier schedule that needs tuning.
    *
    * Determinism note: `treeAggregate` sums floats in partition order,
    * so trained weights are reproducible only to float-sum noise
    * (~1e-12), NOT bit-identical across layouts — which is why the gate
    * pins the SCORING dataflow with [[lcgWeightTable]] and the suite
    * pins training by accuracy bars, mirroring how the tree learners
    * are pinned (ReferenceDataSuite) rather than hash-gated.
    */
  def fitLogReg(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      numBuckets: Int = 1 << 18,
      iters: Int = 30,
      stepSize: Double = 0.5,
      l2: Double = 1e-6): LinearModel = {
    require(numBuckets > 0 && iters > 0 && stepSize > 0 && l2 >= 0,
      s"bad hyperparameters: buckets=$numBuckets iters=$iters step=$stepSize l2=$l2")
    val nb = numBuckets
    val feats = docs
      .select(col(labelCol).cast("double").as("y"), tokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
      .select(col("y"), col("toks"))
      .rdd.map { row =>
        val y = row.getDouble(0)
        val ts = row.getSeq[String](1)
        val cnt = new scala.collection.mutable.LongMap[Double]()
        ts.foreach { t =>
          val b = java.lang.Math.floorMod(
            org.apache.spark.sql.graft.CodePointFnv32.computeString(t), nb.toLong)
          cnt(b) = cnt.getOrElse(b, 0.0) + 1.0
        }
        val n = ts.size.toDouble
        (y, cnt.toArray.map { case (b, c) => (b.toInt, c / n) })
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val total = feats.count()
      require(total > 0, "fitLogReg: no non-empty docs to train on")
      val w = new Array[Double](nb)
      var bias = 0.0
      var iter = 0
      while (iter < iters) {
        val bcW = feats.sparkContext.broadcast(w)
        val bcB = bias
        try {
          // grad = [dW..., dBias] accumulated in one dense array
          val grad = feats.treeAggregate(new Array[Double](nb + 1))(
            seqOp = (g, p) => {
              val (y, xs) = p
              var z = bcB
              xs.foreach { case (b, v) => z += bcW.value(b) * v }
              val err = 1.0 / (1.0 + math.exp(-z)) - y
              xs.foreach { case (b, v) => g(b) += err * v }
              g(nb) += err
              g
            },
            combOp = (a, b2) => {
              var i = 0
              while (i < a.length) { a(i) += b2(i); i += 1 }
              a
            })
          var i = 0
          while (i < nb) {
            w(i) -= stepSize * (grad(i) / total + l2 * w(i))
            i += 1
          }
          bias -= stepSize * grad(nb) / total
        } finally bcW.destroy()
        iter += 1
      }
      LinearModel(w, bias)
    } finally feats.unpersist(blocking = false)
  }
}
