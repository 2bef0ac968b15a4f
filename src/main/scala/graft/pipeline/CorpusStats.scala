package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKRows.topk_rows

import TextFunctions.tokens

/** Corpus-level term statistics — the TF-IDF view a training-data team
  * uses to characterize sub-corpora (what's distinctive about this
  * language / source / shard?) and to spot vocabulary skew before
  * training.
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY §2.5);
  * the reference library has no corpus analytics.
  */
object CorpusStats {

  /** Top-`k` TF-IDF terms per group (language, source, shard, ...):
    * `(group, token, tf, df, tfidf, rnk)`. `tf` counts the token's
    * occurrences inside the group, `df` the number of groups containing
    * it, and `tfidf = tf * ln(1 + nGroups/df)` (smoothed so corpus-wide
    * tokens still rank by raw frequency instead of collapsing to a
    * 0-score tie). Rounded 1e-6 for cross-engine hash stability; rank
    * ties break (tf desc, token asc), so output order is total.
    *
    * Scale shape: the only corpus-sized stage is the explode +
    * `groupBy(group, token)` — map-side partial aggregation collapses it
    * to vocabulary size before the shuffle. Everything after (df
    * aggregation, the df join, the per-group top-k) is vocabulary-sized,
    * shuffle-keyed on token or group; nothing is collected, nothing is
    * quadratic. The df join deliberately does NOT assume the vocabulary
    * is broadcast-able — at web scale it isn't. The top-k stage is the
    * bounded-heap `topk_rows` aggregate, not a window: map tasks keep at
    * most ~2k rows per group, so the final shuffle carries
    * O(groups x k) rows instead of sorting the whole vocabulary through
    * `row_number()`.
    */
  /** Per-source corpus health profile: doc count, token volume, mean
    * quality score, and the exact-duplicate ratio (1 − distinct
    * normalized texts / docs) — the table a data team reads before
    * deciding which crawl sources enter a training mix (C4/RefinedWeb
    * prune whole domains on aggregates like these, not per-doc).
    *
    * Scale shape: one corpus scan with map-side partial aggregation
    * down to #sources rows; the dup ratio rides the same aggregation as
    * `approx`=false exact `count_distinct` over the 64-bit text
    * fingerprint (exact per-source distinct is a second shuffle-free
    * partial path at #sources × distinct keys — switch `approx=true`
    * for HLL `approx_count_distinct` when sources × distincts is itself
    * web-scale).
    */
  def sourceStats(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      stopwords: Seq[String] = TextFunctions.LangStopwords.head._2,
      approx: Boolean = false): DataFrame = {
    val fp = xxhash64(lower(trim(org.apache.spark.sql.graft.GraftExpressions.collapseWs(col(textCol)))))
    val distinctTexts =
      if (approx) approx_count_distinct(fp) else count_distinct(fp)
    docs
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        round(avg(TextFunctions.qualityScore(col(textCol), stopwords)), 6)
          .as("mean_quality"),
        distinctTexts.as("n_distinct"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_distinct") / col("n_docs").cast("double"), 6))
  }

  /** Source-level filtering: keep only documents whose SOURCE passes
    * aggregate health thresholds (minimum mean quality, maximum
    * exact-duplicate ratio, minimum doc count). Two passes over the
    * corpus — the stats aggregation above, then a broadcast semi join
    * of the passing-source set against the corpus (sources/domains are
    * ~1e7 at web scale: 8-byte keys broadcast fine; the corpus itself
    * never shuffles).
    */
  def sourceFilter(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      minMeanQuality: Double = 0.0,
      maxDupRatio: Double = 1.0,
      minDocs: Long = 0L): DataFrame = {
    val passing = sourceStats(docs, sourceCol, textCol)
      .filter(
        col("mean_quality") >= minMeanQuality &&
          col("dup_ratio") <= maxDupRatio &&
          col("n_docs") >= minDocs)
      .select(col(sourceCol))
    docs.join(broadcast(passing), Seq(sourceCol), "left_semi")
  }

  /** Per-source EXACT quantiles of a per-doc metric (default: token
    * count) — the length-distribution profile behind context-length
    * planning and outlier-source detection (a source whose p99 is 100×
    * its p50 is concatenated pages, not documents). Uses Spark's exact
    * `percentile` aggregate ((n−1)·p rank interpolation, the same
    * formula as DuckDB's `quantile_cont` and NumPy's default): integer
    * inputs make the interpolation arithmetic engine-exact. Per-group
    * state is a sorted buffer of the group's values — fine for
    * per-SOURCE groups (docs/source values, bounded by the biggest
    * source); switch to `approx_percentile` when single groups outgrow
    * executor memory.
    */
  def sourceQuantiles(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      probabilities: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(probabilities.nonEmpty && probabilities.forall(p => p >= 0 && p <= 1),
      s"probabilities must be in [0,1], got $probabilities")
    val metric = TextFunctions.tokenCount(col(textCol)).cast("long")
    val qcols = probabilities.zipWithIndex.map { case (p, i) =>
      percentile(metric, lit(p)).as(s"q$i")
    }
    val aggs = count(lit(1)).as("n_docs") +: qcols
    docs
      .groupBy(col(sourceCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Adjacent-symbol pair statistics — the scoring table behind a BPE
    * tokenizer-training iteration (the highest-count pair is the next
    * merge). Counts each adjacent CHARACTER pair within words, weighted
    * by word frequency, and returns the top `k` with a total order
    * (count desc, pair asc).
    *
    * Scale shape: the corpus-sized explode collapses to vocabulary size
    * via partial aggregation (`groupBy(word)`); pair explosion and
    * scoring then run on the VOCABULARY (words × avg word length rows,
    * corpus-size-independent), and the top-k is the bounded-heap
    * `topk_rows` aggregate, never a global sort. Real BPE iterates —
    * re-run after applying each merge to the vocabulary (vocabulary-
    * sized work per iteration, the corpus is scanned once).
    */
  def bpePairStats(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wc"))
      .filter(length(col("word")) >= 2)
    val pairs = words
      .select(col("wc"),
        explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum("wc").as("n"))
    pairs
      .groupBy()
      .agg(topk_rows(k, Seq(true, false), col("n"), col("pair")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.pair").as("pair"), col("t.n").as("n"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** ITERATIVE BPE training — the real learn loop, not one statistics
    * pass: each round re-counts adjacent-symbol pairs over the
    * vocabulary AS ENCODED BY the merges learned so far (merged symbols
    * carried as private-use placeholder chars, exactly the
    * representation [[bpeEncodeStats]] applies), takes the single
    * highest-count pair (count desc, pair asc — binary string order on
    * both engines), and appends it. This is the classic Sennrich BPE
    * recursion: round k's winning pair can be one that DID NOT EXIST in
    * round k−1's symbol stream (e.g. a placeholder-placeholder pair) —
    * the property a single-pass merge list cannot have, and the reason
    * the loop must re-encode between counts (suite-pinned on a corpus
    * where round 2's winner only exists after round 1's merge).
    *
    * Returns the merge list in learned order with each round's winning
    * count — feed `.map(_._1)` to [[bpeEncodeStats]] to encode a corpus.
    *
    * Scale shape (the GBM driver-loop pattern): the corpus is scanned
    * ONCE (the word-frequency collapse, partial-aggregated to
    * vocabulary size and persisted); each round is one vocabulary-sized
    * aggregate — the k merges so far fold into a nested-replace chain
    * evaluated map-side on the cached vocab — and a single top-1 collect
    * (`TakeOrderedAndProject`, one row to the driver). Cost is
    * O(rounds × vocab), corpus-size-independent after the first scan.
    */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int): Seq[(String, Long)] = {
    require(rounds > 0 && rounds <= 256,
      s"rounds must be in [1, 256] (placeholder space), got $rounds")
    val vocab = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wc"))
      .persist()
    try {
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var r = 0
      while (r < rounds) {
        val enc = acc.zipWithIndex.foldLeft(col("word")) { case (c, ((m, _), i)) =>
          replace(c, lit(m), lit(String.valueOf((0xE000 + i).toChar)))
        }
        // words shrunk below 2 symbols have no pairs; filter BEFORE the
        // position explode (sequence(1, 0) is descending in Spark)
        val top = vocab
          .select(enc.as("w"), col("wc"))
          .filter(length(col("w")) >= 2)
          .select(col("wc"),
            explode(transform(
              sequence(lit(1), length(col("w")) - 1),
              i => col("w").substr(i, lit(2)))).as("pair"))
          .groupBy("pair")
          .agg(sum("wc").as("n"))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(1)
          .collect()
        require(top.nonEmpty,
          s"bpeTrain: vocabulary exhausted after $r merges (no pairs left)")
        acc += ((top(0).getString(0), top(0).getLong(1)))
        r += 1
      }
      acc.toSeq
    } finally vocab.unpersist(blocking = false)
  }

  /** Persist a learned merge list ([[bpeTrain]]'s output) as the parquet
    * tokenizer artifact — `(rnk, pair, n)` rows, 1-based rank; THE ORDER
    * IS THE MODEL (BPE merges apply in learned order), so the artifact
    * stores it explicitly rather than relying on row order. This is the
    * artifact every training pipeline actually ships: the tokenizer is
    * learned once on a corpus snapshot and applied verbatim to every
    * later batch — re-learning per batch would silently change the token
    * space under the packer and the budget planner.
    */
  def saveMerges(merges: Seq[(String, Long)], path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    require(merges.nonEmpty, "saveMerges: empty merge list")
    import spark.implicits._
    merges.zipWithIndex.map { case ((pair, n), i) => ((i + 1).toLong, pair, n) }
      .toDF("rnk", "pair", "n")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveMerges]] artifact in learned order. Fails loud on
    * non-contiguous ranks (a filtered or corrupted artifact would
    * otherwise silently re-number the merge chain, changing every
    * placeholder assignment downstream).
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, Long)] = {
    val rows = spark.read.parquet(path).select("rnk", "pair", "n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    require(rows.nonEmpty && rows.map(_._1).sameElements((1 to rows.length).map(_.toLong)),
      "loadMerges: ranks are not contiguous 1..n — corrupted tokenizer artifact")
    rows.map(r => (r._2, r._3)).toSeq
  }

  /** Greedy rank-ordered BPE merge APPLICATION — the encode side of
    * [[bpePairStats]]'s learn side: each merge pair is replaced across
    * every token in rank order (all occurrences, left-to-right — exactly
    * the BPE merge step), with merged symbols carried as private-use
    * placeholder chars so later merges see single symbols. Emits per-doc
    * `(id, n_tokens, n_chars, n_pieces)`: piece counts are what
    * token-budget planning ([[Sampling.mixToBudget]]) and cost models
    * consume. The merge list here is one learning round (pairs over raw
    * chars, by [[bpePairStats]] rank); full iterative BPE is the
    * standard driver-side loop — re-learn stats over the encoded corpus,
    * append merges, repeat.
    *
    * Scale shape: pure map-side expressions — the merge chain folds into
    * nested `replace` calls inside a `transform`/`aggregate` over the
    * token array (no explode, no shuffle, no UDF); the merge list itself
    * is tiny and rides the plan as literals.
    */
  def bpeEncodeStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[String]): DataFrame = {
    require(merges.size <= 256, s"merge list ${merges.size} > 256 placeholders")
    require(merges.distinct.size == merges.size, "duplicate merge pair")
    def pieces(t: Column): Column =
      length(merges.zipWithIndex.foldLeft(t) { case (c, (m, i)) =>
        replace(c, lit(m), lit(String.valueOf((0xE000 + i).toChar)))
      })
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol).as("id"),
      coalesce(size(toks).cast("long"), lit(0L)).as("n_tokens"),
      coalesce(aggregate(toks, lit(0L), (acc, t) => acc + length(t)), lit(0L))
        .as("n_chars"),
      coalesce(aggregate(toks, lit(0L), (acc, t) => acc + pieces(t)), lit(0L))
        .as("n_pieces"))
  }

  /** Zipf-law diagnostics + vocabulary head coverage — the table a
    * tokenizer-sizing / corpus-health decision reads: the log-log
    * least-squares slope of the frequency-rank curve over the top
    * `maxRank` words (natural text sits near −1; a collapsed slope
    * flags template/boilerplate corpora, a flat one flags shredded
    * text), plus what share of all token OCCURRENCES the top-k
    * vocabulary covers for each `coverageKs` (the classic
    * "how big must the vocab be" curve). Output is long-format
    * `(metric, value)` with every value an exact BIGINT: counts raw,
    * shares and regression coefficients in 1e-6 units.
    *
    * Cross-engine float contract: `ln(rank)`/`ln(freq)` are snapped to
    * 6 dp right after the transcendental (the BM25 `ln` rule) and
    * carried as exact micro-unit integers; the regression sums
    * (Σx, Σy, Σxy, Σx², Σy²) are INTEGER sums — exact and
    * order-independent, the property that makes the slope reproducible
    * across partitionings and engines (a float Σxy would drift with
    * partition order). The product sums run in DecimalType(38,0):
    * `ym = ln(freq)·1e6` reaches ~3e7 on a multi-trillion-token corpus,
    * so Σy² at maxRank 20000 can pass Long.MaxValue — int128 keeps the
    * sum exact (DuckDB's integer SUM is already HUGEINT, so this aligns
    * the engines rather than diverging them); the decimal→double
    * conversion at the end is bit-identical to the old long→double one
    * whenever the long didn't wrap. The closed-form slope/intercept/R²
    * then run a fixed sequence of IEEE double ops on identical inputs.
    *
    * Scale shape: one corpus scan collapses to vocabulary size
    * (partial-aggregated groupBy, persisted across its two consumers).
    * Ranking does NOT globally sort or window the vocabulary: rank =
    * (# words with higher freq) + row_number within the word's own freq
    * group, where the cumulative side is a window over DISTINCT
    * FREQUENCY VALUES (O(√corpus) rows by Zipf itself) and — the r14
    * hardening — the tie-break window only ever SEES words whose
    * frequency class STARTS inside the head (`n_above < max(maxRank,
    * coverageKs.max)`): a class beginning beyond the head cannot rank
    * inside it, so the hapax class (≈half the vocabulary at corpus
    * scale — the straggler that a naive partitionBy(freq) window sorts
    * for ranks nobody reads) is filtered out BEFORE the window.
    * `n_vocab`/`total_tokens` come from the unranked frequency
    * histogram, so no full-vocabulary aggregate rides the ranked side.
    * Head classes are broadcast back onto the vocabulary. One final
    * single-row aggregate carries the regression + coverage metrics.
    */
  def zipfStats(
      docs: DataFrame,
      textCol: String,
      maxRank: Int = 500,
      coverageKs: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    require(maxRank >= 2 && maxRank <= 20000,
      s"maxRank must be in [2, 20000], got $maxRank")
    require(coverageKs.nonEmpty && coverageKs.forall(_ > 0),
      s"coverageKs must be positive, got $coverageKs")
    val spark = docs.sparkSession
    val headK = math.max(maxRank, coverageKs.max)
    val vocab = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .persist()
    try {
      val fhist = vocab.groupBy("freq").agg(count(lit(1)).as("cnt"))
      // globals from the O(√corpus) histogram — never from ranked rows
      val globalRow = fhist.agg(
        sum(col("cnt")).as("n_vocab"),
        sum(col("freq") * col("cnt")).as("total_tokens")).head()
      val ranked = zipfRankedHead(vocab, fhist, headK)
      def micro6(c: Column): Column = floor(round(c, 6) * lit(1e6) + lit(0.5)).cast("long")
      val xm = micro6(log(col("rnk").cast("double")))
      val ym = micro6(log(col("freq").cast("double")))
      val inHead = col("rnk") <= maxRank
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val covAggs = coverageKs.map(kk =>
        sum(when(col("rnk") <= kk, col("freq")).otherwise(0L)).as(s"h$kk"))
      val aggs = Seq(
        sum(when(inHead, 1L).otherwise(0L)).as("n"),
        sum(when(inHead, xm).otherwise(0L)).as("sx"),
        sum(when(inHead, ym).otherwise(0L)).as("sy"),
        sum(when(inHead, xm * ym).otherwise(0L).cast(dec)).as("sxy"),
        sum(when(inHead, xm * xm).otherwise(0L).cast(dec)).as("sxx"),
        sum(when(inHead, ym * ym).otherwise(0L).cast(dec)).as("syy")) ++ covAggs
      val row = ranked.agg(aggs.head, aggs.tail: _*).head()
      val nVocab = globalRow.getLong(0); val total = globalRow.getLong(1)
      val n = row.getLong(0).toDouble
      val sx = row.getLong(1).toDouble; val sy = row.getLong(2).toDouble
      val sxy = row.getDecimal(3).doubleValue()
      val sxx = row.getDecimal(4).doubleValue()
      val syy = row.getDecimal(5).doubleValue()
      // fixed op order on identical integer inputs: engine-exact doubles.
      // Degenerate heads (all-equal x or y — never a real corpus) snap to
      // 0 rather than NaN so the oracle can mirror with a CASE.
      val num = n * sxy - sx * sy
      val denX = n * sxx - sx * sx
      val denY = n * syy - sy * sy
      val slope = if (denX == 0.0) 0.0 else num / denX
      val intercept = (sy - slope * sx) / (n * 1e6)
      val r2 = if (denX == 0.0 || denY == 0.0) 0.0 else (num * num) / (denX * denY)
      def snap(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
      val covRows = coverageKs.zipWithIndex.map { case (kk, i) =>
        val h = row.getLong(6 + i)
        (s"cov_$kk", math.floor(h.toDouble * 1e6 / total.toDouble + 0.5).toLong)
      }
      import spark.implicits._
      (Seq(
        ("n_vocab", nVocab),
        ("total_tokens", total),
        ("zipf_n", row.getLong(0)),
        ("zipf_slope_micro", snap(slope)),
        ("zipf_intercept_micro", snap(intercept)),
        ("zipf_r2_micro", snap(r2))) ++ covRows)
        .toDF("metric", "value")
    } finally vocab.unpersist(blocking = false)
  }

  /** The head-ranked vocabulary `(word, freq, rnk)` — exposed
    * package-private so the suite can pin the scale shape: the
    * `row_number` tie-break window's input is the inner join of the
    * vocabulary with the HEAD frequency classes only (`n_above <
    * headK`), so the window never sees a class that starts beyond the
    * head — in particular never the hapax class, which is ~half the
    * vocabulary at corpus scale and would otherwise be one giant
    * straggler partition sorted for ranks nobody consumes. Filtering
    * whole classes preserves every surviving word's `rnk` exactly
    * (`n_above` counts ALL higher-frequency words, filtered or not, and
    * row_number only ever numbers within one class). `ranks` ≤ headK +
    * (size of the class straddling the boundary).
    */
  private[graft] def zipfRankedHead(
      vocab: DataFrame,
      fhist: DataFrame,
      headK: Int): DataFrame = {
    val wcum = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val headClasses = fhist
      .withColumn("n_above", coalesce(sum("cnt").over(wcum), lit(0L)))
      .filter(col("n_above") < headK)
      .select("freq", "n_above")
    val wtie = org.apache.spark.sql.expressions.Window
      .partitionBy("freq").orderBy("word")
    vocab.join(broadcast(headClasses), Seq("freq"))
      .withColumn("rnk", col("n_above") + row_number().over(wtie))
  }

  /** One-call corpus report — the dataset-card summary a corpus release
    * ships: global volume (docs, tokens, chars, exact-dup ratio),
    * per-source doc counts and mean quality, per-predicted-language doc
    * counts — in long format `(metric, key, value)` so downstream
    * tooling diffs two reports with a join, not a schema migration.
    *
    * Composition gate rationale: every ingredient is individually
    * gated; the report pins their COMPOSITION (shared normalization,
    * shared tokenizer, one definition of "duplicate") so the card and
    * the pipeline cannot drift apart. All metrics are one scan +
    * partial-aggregated groupBys; output is O(sources + languages).
    */
  def corpusReport(docs: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val t = col(textCol)
    val norm = lower(trim(org.apache.spark.sql.graft.GraftExpressions.collapseWs(t)))
    val quality = TextFunctions.qualityScore(t, TextFunctions.LangStopwords.head._2)
    val global = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(TextFunctions.tokenCount(t)).cast("double").as("n_tokens"),
      sum(length(t)).cast("double").as("n_chars"),
      round(lit(1.0) - countDistinct(norm) / count(lit(1)), 6).as("dup_ratio"))
      .select(explode(array(
        struct(lit("n_docs").as("metric"), lit("all").as("key"), col("n_docs").as("value")),
        struct(lit("n_tokens").as("metric"), lit("all").as("key"), col("n_tokens").as("value")),
        struct(lit("n_chars").as("metric"), lit("all").as("key"), col("n_chars").as("value")),
        struct(lit("dup_ratio").as("metric"), lit("all").as("key"), col("dup_ratio").as("value")))).as("r"))
      .select("r.*")
    val bySource = docs.groupBy(col(srcCol).as("key"))
      .agg(count(lit(1)).cast("double").as("n"),
        round(avg(quality), 6).as("q"))
    val srcDocs = bySource.select(lit("source_docs").as("metric"), col("key"), col("n").as("value"))
    val srcQual = bySource.select(lit("source_mean_quality").as("metric"), col("key"), col("q").as("value"))
    val byLang = docs.groupBy(TextFunctions.langId(t).as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("lang_docs").as("metric"), col("key"), col("value"))
    global.unionByName(srcDocs).unionByName(srcQual).unionByName(byLang)
  }

  /** Exact heavy n-grams by sketch-then-verify: a Misra-Gries summary
    * ([[org.apache.spark.sql.graft.MisraGries]]) narrows the candidate
    * set in ONE pass with k counters per map task, then an exact count
    * over ONLY the candidate keys (map-side broadcast semi-filter)
    * produces `(gram, n)` for every n-gram with `n >= minCount`, sorted
    * (n desc, gram asc).
    *
    * Completeness is guaranteed — not heuristic — when
    * `minCount > totalGrams / (sketchK + 1)` (the MG bound: anything
    * more frequent survives the sketch); the operator THROWS if the
    * data violates that precondition rather than silently under-report.
    * The output is therefore deterministic (exact counts) even though
    * the sketch content depends on partitioning.
    *
    * 100 TB shape: pass one shuffles k counters per partition (the
    * vocabulary-sized token groupBy this replaces is the shuffle that
    * dies first on web-scale n-gram statistics); pass two re-scans but
    * aggregates only candidate keys — at most sketchK of them, so the
    * second shuffle is O(sketchK). Driver state is the candidate array
    * (<= sketchK entries, broadcast back).
    */
  def heavyTokens(
      docs: DataFrame,
      textCol: String,
      n: Int,
      minCount: Long,
      sketchK: Int): DataFrame = {
    import org.apache.spark.sql.graft.MisraGries.misra_gries
    import org.apache.spark.sql.graft.ShingleHashesFn.positioned_shingle_hashes
    require(n > 0 && minCount > 0 && sketchK > 0)
    val spark = docs.sparkSession
    // positioned (non-distinct) grams: heavy-hitter counting is over
    // OCCURRENCES, per-doc repeats included
    val grams = docs.select(
      explode(positioned_shingle_hashes(tokens(col(textCol)), n)).as("g"))
    val Array(summaryRow) = grams
      .groupBy()
      .agg(misra_gries(col("g"), sketchK).as("mg"), count(lit(1)).as("total"))
      .collect()
    val total = summaryRow.getLong(1)
    require(minCount > total / (sketchK + 1L),
      s"minCount=$minCount <= total/$sketchK+1 = ${total / (sketchK + 1L)}: " +
        "the sketch cannot guarantee completeness — raise minCount or sketchK")
    // MG bound: true count <= lower bound + total/(k+1); anything whose
    // UPPER bound clears minCount is a candidate, the rest provably fail
    val slack = total / (sketchK + 1L)
    val candidates = summaryRow.getSeq[org.apache.spark.sql.Row](0)
      .collect { case r if r.getLong(1) + slack >= minCount => r.getLong(0) }
      .toArray
    java.util.Arrays.sort(candidates)
    val bc = spark.sparkContext.broadcast(candidates)
    val isCandidate = udf { (g: Long) =>
      java.util.Arrays.binarySearch(bc.value, g) >= 0
    }
    // exact recount over candidate keys only: hash and string arrays are
    // built ONCE per doc and zipped, so no per-gram retokenization; the
    // survivors' display string is min(gram) (hash -> gram is 1:1 modulo
    // 64-bit collisions)
    val pairs = docs
      .select(tokens(col(textCol)).as("tk"))
      .select(
        positioned_shingle_hashes(col("tk"), n).as("h"),
        when(size(col("tk")) >= n,
          transform(sequence(lit(1), size(col("tk")) - n + 1),
            i => array_join(slice(col("tk"), i, lit(n)), " ")))
          .otherwise(array().cast("array<string>")).as("s"))
      .select(explode(arrays_zip(col("h"), col("s"))).as("z"))
      .select(col("z.h").as("g"), col("z.s").as("gram"))
    pairs
      .filter(isCandidate(col("g")))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), min(col("gram")).as("gram"))
      .filter(col("n") >= minCount)
      .select(col("gram"), col("n"))
      .orderBy(col("n").desc, col("gram").asc)
  }

  def tfidfTopTerms(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = docs
      .select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("token"))
      .groupBy("grp", "token")
      .agg(count(lit(1)).as("tf"))
    // one row per (group, token) above, so count(*) per token == the
    // number of groups containing it
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nGroups = docs.agg(countDistinct(col(groupCol)).as("n_groups"))
    val scored = tf
      .join(df, Seq("token"))
      .crossJoin(broadcast(nGroups))
      .withColumn("tfidf",
        round(col("tf") * log(lit(1.0) + col("n_groups").cast("double") / col("df")), 6))
    scored
      .groupBy("grp")
      .agg(topk_rows(k, Seq(true, true, false),
        col("tfidf"), col("tf"), col("token"), col("df")).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("grp"), col("t.token").as("token"), col("t.tf").as("tf"),
        col("t.df").as("df"), col("t.tfidf").as("tfidf"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Per-document n-gram novelty vs the EARLIER corpus (id order): of the
    * doc's distinct n-gram shingles, how many appear here for the first
    * time (no smaller-id doc contains them). The curation signal behind
    * "how much NEW text does each crawl slice add" — aggregated by
    * source/day it tells a data team which feeds still pay for themselves
    * and which only re-crawl what the corpus already holds (the
    * memorization literature's n-gram-novelty curve).
    *
    * Scale shape: `n_grams` is the shingle-array size — a pure map-side
    * projection, no explode. First-occurrence needs the corpus-wide
    * min-id per shingle, so the exploded shingle table shuffles ONCE,
    * partial-aggregated map-side down to (shingle, min_id) — never
    * sorted (a window `min` here plans a full sort of the token-volume
    * table: measured 8.3 s vs 0.19 s at sf0.1, ~40x). `n_novel` then
    * re-aggregates
    * the vocabulary-sized firsts by winner doc, and the final equi-join
    * touches only doc-sized tables. Nothing collected, no self-join.
    * Null-text docs keep their row with `n_grams = 0`.
    */
  def noveltyScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val base = shingleBase(docs, idCol, textCol, n)
    joinNovelCounts(base,
      explodeShingles(base)
        .groupBy("s").agg(min(col("id")).as("first_id"))
        .groupBy("first_id").agg(count(lit(1)).as("n_novel")))
  }

  /** The persistable first-occurrence artifact behind [[noveltyScore]]:
    * one `(s, first_id)` row per distinct corpus shingle. Store it
    * (parquet, ideally bucketed by `s`) and the daily loop never
    * re-shingles the corpus — see [[noveltyScoreIncremental]] /
    * [[extendFirstOccurrence]].
    */
  def shingleFirstOccurrence(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    explodeShingles(shingleBase(docs, idCol, textCol, n))
      .groupBy("s").agg(min(col("id")).as("first_id"))

  /** Daily-batch novelty: score TODAY's docs against a precomputed
    * [[shingleFirstOccurrence]] artifact. A batch shingle is novel iff
    * the artifact lacks it, and it is credited to the batch's min-id
    * holder — so when every artifact id precedes every batch id, the
    * result equals [[noveltyScore]] over corpus ∪ batch restricted to
    * batch docs (gate `p_novelty_incr` pins exactly that equivalence).
    * Work scales with the BATCH's token volume plus one shingle-keyed
    * equi-join against the artifact (bucket the stored artifact by `s`
    * to make that join shuffle-free); the corpus is never re-shingled.
    */
  def noveltyScoreIncremental(
      batch: DataFrame,
      artifact: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    requireHashArtifact(artifact)
    val base = shingleBase(batch, idCol, textCol, n)
    val batchFirsts = explodeShingles(base)
      .groupBy("s").agg(min(col("id")).as("batch_first"))
    val novel = batchFirsts
      .join(artifact.select(col("s"), lit(1L).as("seen")), Seq("s"), "left")
      .filter(col("seen").isNull)
      .groupBy(col("batch_first").as("first_id"))
      .agg(count(lit(1)).as("n_novel"))
    joinNovelCounts(base, novel)
  }

  /** Tomorrow's artifact = today's ∪ the batch's unseen shingles (their
    * first_id = the batch min-id holder). Append-only like the dedup
    * banding and posting artifacts: the stored corpus side is never
    * rewritten, only extended. Callers feed batches in id order — the
    * artifact's min-id semantics assume ids never decrease day over day.
    */
  def extendFirstOccurrence(
      artifact: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    requireHashArtifact(artifact)
    val batchFirsts = explodeShingles(shingleBase(batch, idCol, textCol, n))
      .groupBy("s").agg(min(col("id")).as("first_id"))
    artifact.unionByName(
      batchFirsts.join(artifact.select("s"), Seq("s"), "left_anti"))
  }

  /** Novelty shingle identity = the 64-bit `shingle_hashes` key (r14).
    * The string-shingle form (`TextFunctions.shingles`) paid the
    * interpreted-HOF trap — the lambda re-evaluated the token split per
    * array element, ~27 ms/doc at sf0.1 — while the dedup stack's
    * codegen one-pass expression is ~100× cheaper and 8 bytes/key on
    * the wire. Novelty only consumes shingle IDENTITY (distinct count
    * per doc, corpus-wide min-id per shingle), so the hash swap leaves
    * every count bit-identical short of a 64-bit collision — the same
    * accepted risk as the MinHash/Jaccard pipelines, and why the
    * string-replaying SQL oracles still pin these gates unchanged.
    * Distinctness (`array_distinct` semantics) and the short-doc
    * whole-sequence fallback are built into the expression.
    */
  /** Fail fast on a pre-r14 STRING-shingle [[shingleFirstOccurrence]]
    * artifact: since the r14 hash swap the persisted `s` column is a
    * 64-bit long, and feeding an old string artifact would silently
    * type-coerce on the join/anti-join and treat EVERY stored shingle
    * as unseen — the incremental novelty/extension would be quietly
    * wrong instead of loudly incompatible.
    */
  private def requireHashArtifact(artifact: DataFrame): Unit = {
    val sType = artifact.schema.apply("s").dataType
    require(sType == org.apache.spark.sql.types.LongType,
      s"shingleFirstOccurrence artifact column `s` must be LONG (64-bit " +
        s"shingle hash, format since the hash-identity change), got $sType — " +
        "a string-shingle artifact predates the format change; rebuild it " +
        "with shingleFirstOccurrence on the current version")
  }

  private def shingleBase(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.graft.ShingleHashesFn.shingle_hashes
    docs.select(
      col(idCol).as("id"),
      when(col(textCol).isNotNull,
        shingle_hashes(TextFunctions.tokens(col(textCol)), n))
        .as("arr"))
  }

  private def explodeShingles(base: DataFrame): DataFrame =
    base.select(col("id"), explode(col("arr")).as("s"))

  private def joinNovelCounts(base: DataFrame, novel: DataFrame): DataFrame = {
    val perDoc = base.select(
      col("id"),
      coalesce(size(col("arr")), lit(0)).cast("long").as("n_grams"))
    perDoc
      .join(novel, perDoc("id") === novel("first_id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }
}
