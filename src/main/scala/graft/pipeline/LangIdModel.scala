package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExpressions.{codePointFnv32, opaque}
import org.apache.spark.storage.StorageLevel

/** FastText-style LEARNED language identification — hashed char-n-gram
  * multinomial logistic regression. The stopword-argmax heuristic
  * ([[TextFunctions.langId]]) covers 4 languages and needs a curated
  * list per language; this classifier learns from labeled text over ANY
  * language set (fastText's lid.176 shape) with no vocabulary artifact:
  * the model is a dense `numBuckets x K` weight matrix that broadcasts,
  * so the production scorer is a map-side-only pass — the property that
  * matters at corpus scale.
  *
  * Feature space: the canonical token string (tokens joined by single
  * spaces — the repo's tokenizer convention, so whitespace runs never
  * produce distinct grams) sliced into overlapping char `n`-grams,
  * each hashed by the 32-bit codepoint FNV-1a
  * ([[org.apache.spark.sql.graft.CodePointFnv32]]) into `numBuckets`,
  * mean-pooled per doc. Codepoint-based precisely so a SQL oracle can
  * fold the hash in plain BIGINT arithmetic — the
  * `p_quality_classifier` seam, extended per class.
  *
  * Cross-engine integer contract (same as [[QualityClassifier]]):
  * per-class score `z_k_micro = round(bias_k·10⁶) +
  * Σ_b halfAway(wm_{b,k}·cnt_b / n)` — every term an exact integer
  * (float `round(w·c/n, 6)` sits exactly on half-micro boundaries where
  * engines disagree) — and the prediction is the argmax with the
  * DECLARED-ORDER tie rule (smallest class index wins ties, matching
  * [[TextFunctions.langId]]'s declared-order rule). No transcendental
  * at all in the argmax path: language ID needs the winner, not a
  * calibrated probability, so the gate result is integer-exact.
  *
  * Scale: the table path shuffles once on the (doc, bucket) collapse;
  * the model path is zero-shuffle. A dense 2¹⁶-bucket / 100-language
  * weight matrix is ~50 MB of micros — broadcastable; 2¹⁸ x 176
  * (lid.176 size) would be ~350 MB, at which point ship the table path
  * with a bucketed weight table instead.
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY
  * §2.5); the reference library has no text-classification surface.
  */
object LangIdModel {

  /** A fitted (or synthetic) multinomial model: `langs(k)` is class k's
    * label (DECLARED order = tie-break order), `weights(k)(b)` class
    * k's weight for bucket b, `biases(k)` its intercept.
    */
  case class Model(
      langs: Array[String],
      weights: Array[Array[Double]],
      biases: Array[Double],
      n: Int) {
    require(langs.nonEmpty && langs.length == weights.length
      && langs.length == biases.length,
      s"langs/weights/biases must align: ${langs.length}/${weights.length}/${biases.length}")
    require(weights.forall(_.length == weights.head.length),
      "per-class weight arrays must share one bucket count")
    require(n > 0, s"gram width n must be positive, got $n")
    def numBuckets: Int = weights.head.length
    def numClasses: Int = langs.length
  }

  /** Canonical char-gram source string: tokens joined by single spaces
    * (whitespace-run-insensitive; the oracle replays it as
    * `array_to_string(regexp_split_to_array(lower(trim(text)), '\s+'), ' ')`).
    */
  def canonicalText(text: Column): Column =
    array_join(TextFunctions.tokens(text), " ")

  /** Overlapping char n-grams of a MATERIALIZED canonical-string
    * attribute (pass a plain column reference, not an expression — a
    * lambda over an expression re-evaluates it per element, the
    * interpreted-HOF trap). Texts shorter than `n` chars yield the
    * whole string as their single gram (the shingle short-doc rule), so
    * every non-null doc has >= 1 gram and n_grams = max(len - n + 1, 1).
    */
  def charGrams(s: Column, n: Int): Column =
    when(length(s) <= n, array(s))
      .otherwise(transform(
        sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n))))

  /** Distributed scoring against a weight TABLE `(lang, idx, bucket,
    * w)` plus a bias table `(lang, idx, bias)` — the join path for
    * oracle-pinned synthetic weights or beyond-broadcast models. One
    * corpus pass: canonicalize + gram ONCE (behind [[opaque]]), explode,
    * bucket per gram, one partial-aggregated (doc, bucket) collapse,
    * broadcast join against the weight table, integer per-(doc, class)
    * sum. Output one row per (doc, class):
    * `(doc_id, n_grams, lang, z_micro, is_best)` with `is_best` true on
    * the argmax under the declared-order tie rule. Null-text docs emit
    * no row (the posting-builder contract).
    */
  def scoreWithTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      biases: DataFrame,
      n: Int,
      numBuckets: Int): DataFrame = {
    require(n > 0, s"gram width n must be positive, got $n")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val perClass = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        opaque(canonicalText(col(textCol))).as("s"))
      .select(col("doc_id"), opaque(charGrams(col("s"), n)).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
      .select(col("doc_id"), col("n_grams"),
        pmod(codePointFnv32(col("gram")), lit(numBuckets.toLong)).as("bucket"))
      .groupBy("doc_id", "n_grams", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(weights.select(col("bucket"), col("lang"), col("idx"),
        // w is an exact 6-dp decimal -> its double is within an ulp of
        // w_micro/1e6 and round recovers the integer micros exactly
        round(col("w") * lit(1e6), 0).cast("long").as("wm"))), Seq("bucket"))
      .withColumn("num", col("wm") * col("cnt"))
      .withColumn("term_micro",
        signum(col("num")).cast("long") *
          expr("(2 * abs(num) + n_grams) div (2 * n_grams)"))
      .groupBy(col("doc_id"), col("n_grams"), col("lang"), col("idx"))
      .agg(sum(col("term_micro")).as("zsum"))
      .join(broadcast(biases.select(col("lang"),
        round(col("bias") * lit(1e6), 0).cast("long").as("bm"))), Seq("lang"))
      .select(col("doc_id"), col("n_grams"), col("lang"), col("idx"),
        (col("bm") + col("zsum")).as("z_micro"))
    // argmax with the declared-order tie rule: highest z, then LOWEST
    // idx — struct max compares fields left to right, so negate idx
    val best = perClass
      .groupBy("doc_id")
      .agg(max(struct(col("z_micro"), (-col("idx")).as("nidx"))).as("b"))
      .select(col("doc_id"), col("b.z_micro").as("bz"), (-col("b.nidx")).as("bidx"))
    perClass.join(best, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("lang"), col("z_micro"),
        (col("z_micro") === col("bz") && col("idx") === col("bidx")).as("is_best"))
  }

  /** Map-side-only scoring against a broadcast [[Model]]: same integer
    * arithmetic and tie rule as [[scoreWithTable]] (suite-pinned
    * row-identical) but zero joins, zero shuffles — the production
    * scorer. Output one row per doc: `(doc_id, n_grams, lang, z_micro)`
    * — the winning class only (the serving shape; use the table path
    * when all K scores are wanted).
    */
  def scoreWithModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val score = udf { (text: String) =>
      if (text == null) None
      else {
        val m = bc.value
        val s = text.trim.toLowerCase.split("\\s+", -1).mkString(" ")
        // CODEPOINT indexing, not UTF-16: Spark's length()/substr()
        // count code points, so the scalar twin must too or the two
        // paths diverge on supplementary-plane text
        val cps = s.codePoints.toArray
        val nb = m.numBuckets
        val nGrams = math.max(cps.length - m.n + 1, 1)
        val cnt = new scala.collection.mutable.LongMap[Long]()
        var i = 0
        while (i < nGrams) {
          val g = if (cps.length <= m.n) s
            else new String(cps, i, m.n)
          val b = java.lang.Math.floorMod(
            org.apache.spark.sql.graft.CodePointFnv32.computeString(g), nb.toLong)
          cnt(b) = cnt.getOrElse(b, 0L) + 1L
          i += 1
        }
        val nG = nGrams.toLong
        var bestK = 0; var bestZ = Long.MinValue
        var k = 0
        while (k < m.numClasses) {
          var z = math.round(m.biases(k) * 1e6)
          cnt.foreach { case (b, c) =>
            val num = math.round(m.weights(k)(b.toInt) * 1e6) * c
            z += java.lang.Long.signum(num) * ((2L * math.abs(num) + nG) / (2L * nG))
          }
          // strict > keeps the SMALLEST index on ties — declared order
          if (z > bestZ) { bestZ = z; bestK = k }
          k += 1
        }
        Some((nG, m.langs(bestK), bestZ))
      }
    }
    docs
      .select(col(idCol).as("doc_id"), score(col(textCol)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("doc_id"), col("r._1").as("n_grams"),
        col("r._2").as("lang"), col("r._3").as("z_micro"))
  }

  /** The oracle-pinned synthetic weight/bias tables, one weight per
    * (bucket, class): `w = round(lcg(b·K + k)/2³²·0.2 − 0.1, 6)` and
    * `bias_k = round(lcg(B·K + k)/2³²·0.02 − 0.01, 6)` — the repo's LCG
    * convention, engine-portable integer arithmetic. Returns
    * `(weights, biases)` frames shaped for [[scoreWithTable]].
    */
  def lcgTables(
      spark: SparkSession,
      langs: Seq[String],
      numBuckets: Int): (DataFrame, DataFrame) = {
    val k = langs.length
    def u(seed: Column): Column =
      pmod(seed * lit(1103515245L) + lit(12345L), lit(4294967296L))
        .cast("double") / lit(4294967296.0)
    val langCase = langs.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (l, i)) => when(col("idx") === i, lit(l)).otherwise(acc)
    }
    val w = spark.range(numBuckets.toLong * k)
      .select(expr(s"id div $k").as("bucket"),
        pmod(col("id"), lit(k.toLong)).as("idx"))
      .select(col("bucket"), col("idx"),
        round(u(col("bucket") * k + col("idx")) * lit(0.2) - lit(0.1), 6).as("w"))
      .withColumn("lang", langCase)
    val b = spark.range(k.toLong)
      .select(col("id").as("idx"))
      .select(col("idx"),
        round(u(lit(numBuckets.toLong) * k + col("idx")) * lit(0.02) - lit(0.01), 6)
          .as("bias"))
      .withColumn("lang", langCase)
    (w, b)
  }

  /** Fit by full-batch softmax gradient descent: `iters` passes, each
    * ONE `treeAggregate` over the persisted hashed-gram feature set
    * (the gradient is a dense (numBuckets+1)·K array, partial-merged up
    * the tree — the [[QualityClassifier.fitLogReg]] recipe, K-class).
    * L2-regularized, fixed step. Labels = distinct `labelCol` values in
    * LEXICOGRAPHIC order (deterministic class indexing).
    *
    * Determinism note: treeAggregate sums floats in partition order, so
    * weights reproduce only to float-sum noise — training is pinned by
    * suite accuracy bars (the tree-learner discipline), scoring by the
    * `p_langid_model` gate with [[lcgTables]].
    */
  def fit(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      n: Int = 3,
      numBuckets: Int = 1 << 16,
      iters: Int = 30,
      stepSize: Double = 2.0,
      l2: Double = 1e-6): Model = {
    require(n > 0 && numBuckets > 0 && iters > 0 && stepSize > 0 && l2 >= 0,
      s"bad hyperparameters: n=$n buckets=$numBuckets iters=$iters step=$stepSize l2=$l2")
    val spark = docs.sparkSession
    val langs = docs.select(col(labelCol).cast("string"))
      .filter(col(labelCol).isNotNull)
      .distinct().collect().map(_.getString(0)).sorted
    require(langs.length >= 2, s"need >= 2 label classes, got ${langs.length}")
    val langIdx = langs.zipWithIndex.toMap
    val bcIdx = spark.sparkContext.broadcast(langIdx)
    val nb = numBuckets
    val gw = n
    val feats = docs
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("y"),
        canonicalText(col(textCol)).as("s"))
      .rdd.map { row =>
        val y = bcIdx.value(row.getString(0))
        val s = row.getString(1)
        val nGrams = math.max(s.length - gw + 1, 1)
        val cnt = new scala.collection.mutable.LongMap[Double]()
        var i = 0
        while (i < nGrams) {
          val g = if (s.length <= gw) s else s.substring(i, i + gw)
          val b = java.lang.Math.floorMod(
            org.apache.spark.sql.graft.CodePointFnv32.computeString(g), nb.toLong)
          cnt(b) = cnt.getOrElse(b, 0.0) + 1.0
          i += 1
        }
        (y, cnt.toArray.map { case (b, c) => (b.toInt, c / nGrams) })
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val total = feats.count()
      require(total > 0, "fit: no labeled non-null docs to train on")
      val kk = langs.length
      val w = Array.fill(kk)(new Array[Double](nb))
      val bias = new Array[Double](kk)
      var it = 0
      while (it < iters) {
        val bcW = spark.sparkContext.broadcast((w.map(_.clone()), bias.clone()))
        // gradient layout: grad(k)(b), gradBias(k)
        val (grad, gradBias) = feats.treeAggregate(
          (Array.fill(kk)(new Array[Double](nb)), new Array[Double](kk)))(
          seqOp = { case ((g, gb), (y, xs)) =>
            val (ww, bb) = bcW.value
            val z = new Array[Double](kk)
            var k = 0
            while (k < kk) {
              var s = bb(k)
              xs.foreach { case (b, v) => s += ww(k)(b) * v }
              z(k) = s; k += 1
            }
            val zmax = z.max
            var denom = 0.0
            k = 0
            while (k < kk) { z(k) = math.exp(z(k) - zmax); denom += z(k); k += 1 }
            k = 0
            while (k < kk) {
              val p = z(k) / denom
              val err = p - (if (k == y) 1.0 else 0.0)
              xs.foreach { case (b, v) => g(k)(b) += err * v }
              gb(k) += err
              k += 1
            }
            (g, gb)
          },
          combOp = { case ((g1, gb1), (g2, gb2)) =>
            var k = 0
            while (k < kk) {
              val a = g1(k); val b2 = g2(k)
              var i = 0
              while (i < nb) { a(i) += b2(i); i += 1 }
              gb1(k) += gb2(k)
              k += 1
            }
            (g1, gb1)
          })
        bcW.destroy()
        var k = 0
        while (k < kk) {
          var i = 0
          while (i < nb) {
            w(k)(i) -= stepSize * (grad(k)(i) / total + l2 * w(k)(i))
            i += 1
          }
          bias(k) -= stepSize * (gradBias(k) / total)
          k += 1
        }
        it += 1
      }
      Model(langs, w, bias, n)
    } finally { feats.unpersist(blocking = false); () }
  }

  /** Paragraph-level language mixture through the LEARNED scorer —
    * [[TextFunctions.langMixture]]'s exact output contract
    * `(doc_id, n_paras, n_langs, major_lang, major_frac_micro)` with
    * each paragraph language-ID'd by [[scoreWithModel]]'s
    * exact-integer argmax instead of the 4-language stopword vote:
    * same blank-paragraph filter, same majority rule (count desc, lang
    * asc), same exact micro share, docs with no non-blank paragraphs
    * report `(0, 0, "und", 0)`. One map-side scoring pass over
    * exploded paragraphs + the two small aggregates — the mixture adds
    * no shuffle beyond langMixture's own.
    */
  def langMixture(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      sep: String = "\n\n"): DataFrame = {
    require(sep.nonEmpty, "sep must be non-empty")
    val paras = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("para"))
      .filter(regexp_replace(col("para"), "\\s+", "") =!= "")
    val scored = scoreWithModel(paras, "doc_id", "para", model)
      .select(col("doc_id"), col("lang").as("plang"))
    val counts = scored.groupBy("doc_id", "plang").agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy("doc_id").agg(
      sum("c").as("n_paras"),
      count(lit(1)).as("n_langs"),
      min(struct((-col("c")).as("nc"), col("plang").as("l"))).as("m"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_langs"), lit(0L)).as("n_langs"),
        coalesce(col("m.l"), lit("und")).as("major_lang"),
        coalesce(
          floor((-col("m.nc")).cast("double") * lit(1e6) /
            col("n_paras").cast("double") + lit(0.5)).cast("long"),
          lit(0L)).as("major_frac_micro"))
  }

  /** Persist as the parquet weight-table artifact convention: `(lang,
    * idx, bucket, w)` rows for buckets 0..B−1 plus one `bucket = −1`
    * row per class carrying the bias, plus gram width as a `lang =
    * '__n'` / `bucket = −2` row. Doubles round-trip parquet
    * bit-exactly; the weight rows feed [[scoreWithTable]] directly.
    */
  def saveModel(model: Model, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    val rows = model.langs.zipWithIndex.flatMap { case (l, k) =>
      model.weights(k).zipWithIndex.map { case (wv, b) => (l, k.toLong, b.toLong, wv) } :+
        ((l, k.toLong, -1L, model.biases(k)))
    }.toSeq :+ (("__n", -1L, -2L, model.n.toDouble))
    rows.toDF("lang", "idx", "bucket", "w")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveModel]] artifact; fails loud on malformed tables. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("lang", "idx", "bucket", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nRow = rows.filter(_._3 == -2L)
    require(nRow.length == 1, s"loadModel: expected one gram-width row, got ${nRow.length}")
    val classes = rows.filter(_._3 >= -1L).groupBy(r => (r._2, r._1)).toSeq.sortBy(_._1._1)
    require(classes.nonEmpty && classes.map(_._1._1) == classes.indices.map(_.toLong),
      "loadModel: class idx not contiguous 0..K-1")
    val langs = classes.map(_._1._2).toArray
    val (ws, bs) = classes.map { case (_, rs) =>
      val bias = rs.filter(_._3 == -1L)
      require(bias.length == 1, "loadModel: expected one bias row per class")
      val wrows = rs.filter(_._3 >= 0L).sortBy(_._3)
      require(wrows.map(_._3).sameElements(wrows.indices.map(_.toLong)),
        "loadModel: weight buckets not contiguous 0..B-1")
      (wrows.map(_._4).toArray, bias.head._4)
    }.unzip
    require(ws.map(_.length).distinct.size == 1,
      "loadModel: classes disagree on bucket count")
    Model(langs, ws.toArray, bs.toArray, math.round(nRow.head._4).toInt)
  }
}
