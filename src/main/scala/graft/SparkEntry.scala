package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is the per-operator correctness surface (verified vs DuckDB
  * at sf0.01 by the driver); `oracleSql` holds the matching ANSI SQL where
  * the operator is SQL-expressible (column names aligned on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q2RevenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    "q2_revenue_by_nation" -> (Queries.q2RevenueByNation _),
    "q3_running_qty_window" -> (Queries.q3RunningQty _),
    "q4_discounted_orders_semi" -> (Queries.q4DiscountedOrders _),
    "q5_segment_stats" -> (Queries.q5SegmentStats _),
    "q6_event_windows" -> (Queries.q6EventWindows _),
    "q7_rollup" -> (Queries.q7Rollup _),
    "q8_pivot" -> (Queries.q8Pivot _),
    "q9_monthly_orders" -> (Queries.q9MonthlyOrders _),
    "q10_string_funcs" -> (Queries.q10StringFuncs _),
    "q12_rolling_range" -> (Queries.q12RollingRange _),
    "q13_funnel" -> (Queries.q13Funnel _),
    "q14_cohort_retention" -> (Queries.q14CohortRetention _),
    "q15_json_extract" -> (Queries.q15JsonExtract _),
    "ml_dummy_mean" -> (Queries.dummyMean _),
    "ml_dummy_median" -> (Queries.dummyMedian _),
    "ml_dummy_quantile" -> (Queries.dummyQuantile _),
    "ml_dummy_prior" -> (Queries.dummyPrior _),
    "ml_dummy_uniform" -> (Queries.dummyUniform _),
    "ml_dummy_constant_cls" -> (Queries.dummyConstantCls _),
    "ml_dummy_constant_reg" -> (Queries.dummyConstantReg _),
    "ml_boosting_squared" -> (Queries.boostingRegressionSquared _),
    "ml_boosting_exponential" -> (Queries.boostingRegressionExponential _),
    "ml_bagging_regressor" -> (Queries.baggingRegression _),
    "ml_bagging_classifier" -> (Queries.baggingClassification _),
    "ml_stacking_regressor" -> (Queries.stackingRegression _),
    "ml_stacking_classifier" -> (Queries.stackingClassification _),
    "ml_boosting_regressor" -> (Queries.boostingRegression _),
    "ml_boosting_classifier" -> (Queries.boostingClassification _),
    "ml_gbm_regressor" -> (Queries.gbmRegression _),
    "ml_gbm_classifier" -> (Queries.gbmClassification _),
    "ml_gbm_multiclass" -> (Queries.gbmMulticlass _),
    "p_text_stats" -> (Queries.pTextStats _),
    "p_quality_score" -> (Queries.pQualityScore _),
    "p_langid" -> (Queries.pLangId _),
    "p_exact_dedup" -> (Queries.pExactDedup _),
    "p_ngram_jaccard" -> (Queries.pNgramJaccard _),
    "p_minhash_dedup" -> (Queries.pMinhashDedup _),
    "p_simhash_dedup" -> (Queries.pSimhashDedup _),
    "p_fingerprint" -> (Queries.pFingerprint _),
    "p_embedding_dedup" -> (Queries.pEmbeddingDedup _),
    "p_embedding_dedup_lsh" -> (Queries.pEmbeddingDedupLsh _),
    "p_token_vocab" -> (Queries.pTokenVocab _),
    "p_ann_brute_force" -> (Queries.pAnnBruteForce _),
    "p_ann_ivf" -> (Queries.pAnnIvf _),
    "p_ann_pq" -> (Queries.pAnnPq _),
    "p_ann_ivfpq" -> (Queries.pAnnIvfPq _),
    "p_ann_recall" -> (Queries.pAnnRecall _),
    "p_multimodal" -> (Queries.pMultimodal _),
    "p_media_decode" -> (Queries.pMediaDecode _),
    "p_media_decode_robust" -> (Queries.pMediaDecodeRobust _),
    "p_weighted_median" -> (Queries.pWeightedMedian _),
    "p_corpus_pipeline" -> (Queries.pCorpusPipeline _),
    "p_sessions" -> (Queries.pSessions _),
    "p_skew_join" -> (Queries.pSkewJoin _),
    "p_dedup_components" -> (Queries.pDedupComponents _),
    "p_dedup_survivors" -> (Queries.pDedupSurvivors _),
    "p_stratified_sample" -> (Queries.pStratifiedSample _),
    "p_hash_split" -> (Queries.pHashSplit _),
    "p_epoch_shard" -> (Queries.pEpochShard _),
    "p_temperature_mix" -> (Queries.pTemperatureMix _),
    "p_leakage_split" -> (Queries.pLeakageSplit _),
    "p_dedup_incremental" -> (Queries.pIncrementalDedup _),
    "p_dedup_incr_artifact" -> (Queries.pIncrementalDedupArtifact _),
    "p_daily_pipeline" -> (Queries.pDailyPipeline _),
    "p_daily_pipeline_full" -> (Queries.pDailyPipelineFull _),
    "p_repeated_spans" -> (Queries.pRepeatedSpans _),
    "p_span_removal" -> (Queries.pSpanRemoval _),
    "p_data_mixture" -> (Queries.pDataMixture _),
    "p_token_budget" -> (Queries.pTokenBudget _),
    "p_doc_chunks" -> (Queries.pDocChunks _),
    "p_paragraph_dedup" -> (Queries.pParagraphDedup _),
    "p_boilerplate_removal" -> (Queries.pBoilerplateRemoval _),
    "p_url_dedup" -> (Queries.pUrlDedup _),
    "p_html_extract" -> (Queries.pHtmlExtract _),
    "p_url_blocklist" -> (Queries.pUrlBlocklist _),
    "p_blocklist_filter" -> (Queries.pBlocklistFilter _),
    "p_dsir_weights" -> (Queries.pDsirWeights _),
    "p_dsir_resample" -> (Queries.pDsirResample _),
    "p_random_project" -> (Queries.pRandomProject _),
    "p_selection_pipeline" -> (Queries.pSelectionPipeline _),
    "p_image_phash" -> (Queries.pImagePhash _),
    "p_image_dedup" -> (Queries.pImageDedup _),
    "p_image_neardup" -> (Queries.pImageNearDup _),
    "p_fuzzy_join" -> (Queries.pFuzzyJoin _),
    "p_data_checks" -> (Queries.pDataChecks _),
    "p_scd2_merge" -> (Queries.pScd2 _),
    "p_outlier_mad" -> (Queries.pOutlierMad _),
    "p_gopher_filter" -> (Queries.pGopherFilter _),
    "p_heavy_tokens" -> (Queries.pHeavyTokens _),
    "p_asof_join" -> (Queries.pAsofJoin _),
    "p_interval_join" -> (Queries.pIntervalJoin _),
    "p_warc_roundtrip" -> (Queries.pWarcRoundtrip _),
    "p_jsonl_roundtrip" -> (Queries.pJsonlRoundtrip _),
    "p_curriculum" -> (Queries.pCurriculum _),
    "p_curriculum_cuts" -> (Queries.pCurriculumCuts _),
    "p_embedding_quantize" -> (Queries.pEmbeddingQuantize _),
    "p_embedding_cov" -> (Queries.pEmbeddingCov _),
    "p_embedding_pca" -> (Queries.pEmbeddingPca _),
    "p_quality_classifier" -> (Queries.pQualityClassifier _),
    "p_langid_model" -> (Queries.pLangidModel _),
    "p_corpus_report" -> (Queries.pCorpusReport _),
    "p_ingest_pipeline" -> (Queries.pIngestPipeline _),
    "p_corpus_diff" -> (Queries.pCorpusDiff _),
    "p_nfc_normalize" -> (Queries.pNfcNormalize _),
    "p_fix_encoding" -> (Queries.pFixEncoding _),
    "p_fix_encoding2x" -> (Queries.pFixEncoding2x _),
    "p_dup_provenance" -> (Queries.pDupProvenance _),
    "p_sample_k_per_group" -> (Queries.pSampleKPerGroup _),
    "p_seq_pack" -> (Queries.pSeqPack _),
    "p_kmeans" -> (Queries.pKmeans _),
    "p_cluster_sample" -> (Queries.pClusterSample _),
    "p_semdedup" -> (Queries.pSemDedup _),
    "p_source_stats" -> (Queries.pSourceStats _),
    "p_source_filter" -> (Queries.pSourceFilter _),
    "p_source_quantiles" -> (Queries.pSourceQuantiles _),
    "p_novelty" -> (Queries.pNovelty _),
    "p_novelty_incr" -> (Queries.pNoveltyIncr _),
    "p_range_shard" -> (Queries.pRangeShard _),
    "p_bpe_pairs" -> (Queries.pBpePairs _),
    "p_bpe_encode" -> (Queries.pBpeEncode _),
    "p_bpe_train" -> (Queries.pBpeTrain _),
    "p_bpe_pack" -> (Queries.pBpePack _),
    "p_winnow" -> (Queries.pWinnow _),
    "p_winnow_pairs" -> (Queries.pWinnowPairs _),
    "p_zipf" -> (Queries.pZipf _),
    "p_lang_mixture" -> (Queries.pLangMixture _),
    "p_zorder" -> (Queries.pZorder _),
    "p_ngram_repetition" -> (Queries.pNgramRepetition _),
    "p_pii_redaction" -> (Queries.pPiiRedaction _),
    "p_pii_redaction2" -> (Queries.pPiiRedaction2 _),
    "p_main_content" -> (Queries.pMainContent _),
    "p_tfidf_top_terms" -> (Queries.pTfidfTopTerms _),
    "p_bm25" -> (Queries.pBm25 _),
    "p_bm25_indexed" -> (Queries.pBm25Indexed _),
    "p_bm25_broadcast" -> (Queries.pBm25Broadcast _),
    "p_bm25_incr" -> (Queries.pBm25Incr _),
    "p_hybrid_broadcast" -> (Queries.pHybridBroadcast _),
    "p_rank_fusion" -> (Queries.pRankFusion _),
    "p_hybrid_dense" -> (Queries.pHybridDense _),
    "p_contrastive" -> (Queries.pContrastive _),
    "p_rank_metrics" -> (Queries.pRankMetrics _),
    "p_lm_score" -> (Queries.pLmScore _),
    "p_decontaminate" -> (Queries.pDecontaminate _),
    "p_decontaminate_neardup" -> (Queries.pNearDupDecontam _),
    "p_decontaminate_semantic" -> (Queries.pDecontaminateSemantic _),
    "p_decontaminate_bcast" -> (Queries.pDecontaminateBcast _),
    "p_decontaminate_bloom" -> (Queries.pDecontaminateBloom _),
    "p_quality_filter" -> (Queries.pQualityFilter _)
  )

  private val EN = "['the','and','of','to','in','is','a','that','it','for']"
  private val TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

  /** A DuckDB string-literal expression for `s`: printable runs as
    * quoted literals (single quotes doubled), control characters —
    * the C1 bytes the mojibake repair table carries — spliced via
    * `chr(n)` so the oracle SQL stays robust to any transport that
    * mangles raw control bytes.
    */
  private def sqlLit(s: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new StringBuilder
    def flush(): Unit =
      if (run.nonEmpty) { parts += "'" + run.result().replace("'", "''") + "'"; run.clear() }
    s.foreach { c =>
      if (c >= 0x20 && c != 0x7F && !(c >= 0x80 && c <= 0x9F)) run.append(c)
      else { flush(); parts += s"chr(${c.toInt})" }
    }
    flush()
    if (parts.isEmpty) "''" else parts.mkString(" || ")
  }

  /** The `p_pii_redaction2` oracle, generated: the fixture's 15 CC body
    * digits / Luhn check digit / 18 BBAN digits / mod-97 IBAN check
    * digits re-derived in integer SQL, then the tier-1 regex chain, the
    * SSN replace, and the checksum-VALIDATED candidate replacement
    * (regexp_extract_all → list_filter with the Luhn / mod-97 folds →
    * list_reduce literal replace) replayed over the same text.
    */
  private val piiRedaction2Sql: String = {
    def d(i: Int) = s"CAST(c_custkey * ${i + 2} % 10 AS BIGINT)"
    val luhnSum = (1 to 15).map { i =>
      if (i % 2 == 1) s"(2 * ${d(i)} - CASE WHEN ${d(i)} >= 5 THEN 9 ELSE 0 END)"
      else d(i)
    }.mkString(" + ")
    def grp(is: Seq[String]) = is.map(e => s"CAST($e AS VARCHAR)").mkString(" || ")
    val g1 = grp((1 to 4).map(d)); val g2 = grp((5 to 8).map(d))
    val g3 = grp((9 to 12).map(d))
    val g4 = grp((13 to 15).map(d) :+ "chk")
    val g4bad = grp((13 to 15).map(d) :+ "((chk + 1) % 10)")
    def b(i: Int) = s"CAST((c_custkey * ${i + 3} + 7) % 10 AS BIGINT)"
    val rem = ((1 to 18).map(b) ++ Seq("1", "3", "1", "4", "0", "0"))
      .foldLeft("CAST(0 AS BIGINT)") { (acc, dd) => s"(($acc) * 10 + $dd) % 97" }
    val bbanStr = grp((1 to 18).map(b))
    // 16-digit candidates: digit at i (1-based), doubled when i odd
    val luhnDigit =
      "(unicode(substr(regexp_replace(c, '[^0-9]', '', 'g'), CAST(i AS INT), 1)) - 48)"
    val luhnLambda =
      s"""c -> list_sum(list_transform(range(1, 17),
         |      i -> CASE WHEN i % 2 = 1
         |        THEN 2 * $luhnDigit - CASE WHEN $luhnDigit >= 5 THEN 9 ELSE 0 END
         |        ELSE $luhnDigit END)) % 10 = 0""".stripMargin
    val ibanRearr = "substr(c, 5) || substr(c, 1, 4)"
    val ibanLambda =
      s"""c -> list_reduce(
         |  list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, length(c) + 1),
         |      i -> CAST(unicode(substr($ibanRearr, CAST(i AS INT), 1)) AS BIGINT))),
         |  (acc, ch) -> CASE WHEN ch BETWEEN 48 AND 57
         |    THEN (acc * 10 + ch - 48) % 97
         |    ELSE (acc * 100 + ch - 55) % 97 END) = 1""".stripMargin
    s"""WITH f AS (
       |  SELECT c_custkey, c_mktsegment,
       |    (10 - ($luhnSum) % 10) % 10 AS chk,
       |    98 - ($rem) AS ibchk
       |  FROM customer),
       |built AS (
       |  SELECT c_custkey,
       |    'acct ' || $g1 || '-' || $g2 || '-' || $g3 || '-' || $g4
       |      || ' alt ' || $g1 || '-' || $g2 || '-' || $g3 || '-' || $g4bad
       |      || ' iban DE' || lpad(CAST(ibchk AS VARCHAR), 2, '0') || $bbanStr
       |      || ' old DE' || lpad(CAST(ibchk + 1 AS VARCHAR), 2, '0') || $bbanStr
       |      || ' ssn ' || CAST(c_custkey % 900 + 100 AS VARCHAR)
       |      || '-' || CAST(c_custkey % 90 + 10 AS VARCHAR)
       |      || '-' || CAST(c_custkey % 9000 + 1000 AS VARCHAR)
       |      || ' mail ops@example.com ' || c_mktsegment AS text
       |  FROM f),
       |r1 AS (
       |  SELECT c_custkey,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
       |      '\\b\\d{2,4}[-. ]\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g'),
       |      '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS t
       |  FROM built),
       |cc AS (
       |  SELECT c_custkey,
       |    list_reduce(
       |      list_prepend(t, list_filter(
       |        regexp_extract_all(t, '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b|\\b\\d{16}\\b'),
       |        $luhnLambda)),
       |      (acc, c) -> replace(acc, c, '<CC>')) AS t
       |  FROM r1),
       |ib AS (
       |  SELECT c_custkey,
       |    list_reduce(
       |      list_prepend(t, list_filter(
       |        regexp_extract_all(t, '\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b'),
       |        $ibanLambda)),
       |      (acc, c) -> replace(acc, c, '<IBAN>')) AS t
       |  FROM cc)
       |SELECT c_custkey, t AS redacted FROM ib ORDER BY c_custkey""".stripMargin
  }

  /** The [[graft.pipeline.TextFunctions.MojibakeRepairs]] chain as
    * staged SQL CTEs — the oracle replays the exact 128-entry repair
    * sequence the Spark operator folds, `passes` times over. Staged
    * because DuckDB's expression binder recurses at most 128 deep: the
    * 128-replace chain (let alone the 256 of the 2x pass) cannot nest
    * as ONE expression, so each CTE stage folds up to 64 replaces and
    * chains to the next. Expects an upstream CTE `raw(doc_id, raw)`;
    * emits `<prefix>1..<prefix>k` carrying `(doc_id, raw, t)` where the
    * last stage's `t` is the fully repaired text. Returns
    * `(cteClauses, lastCteName)`.
    */
  private def mojiChainCtes(prefix: String, passes: Int): (String, String) = {
    val chunks = Seq.fill(passes)(
      graft.pipeline.TextFunctions.MojibakeRepairs.grouped(64).toSeq).flatten
    val clauses = chunks.zipWithIndex.map { case (chunk, i) =>
      val src = if (i == 0) "raw" else s"$prefix$i"
      val inner = if (i == 0) "raw" else "t"
      val expr = chunk.foldLeft(inner) { case (acc, (moji, fixed)) =>
        s"replace($acc, ${sqlLit(moji)}, ${sqlLit(fixed)})"
      }
      s"$prefix${i + 1} AS (SELECT doc_id, raw, $expr AS t FROM $src)"
    }
    (clauses.mkString(",\n"), s"$prefix${chunks.size}")
  }

  // Shared DSIR estimator chain (expects `rawd`/`tgtd` CTEs with
  // (doc_id, tk) in scope): bigram features, add-one smoothing over the
  // union vocabulary, per-gram log-ratio = one ln of a cross-multiplied
  // exact rational snapped 6dp, decimal summation. Used by
  // p_dsir_weights / p_dsir_resample / p_selection_pipeline.
  private val DSIR_CHAIN =
    s"""rg AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS gram
       |  FROM rawd, LATERAL (SELECT unnest(range(1, len(tk))) AS i)),
       |tg AS (SELECT tk[i] || ' ' || tk[i+1] AS gram
       |  FROM tgtd, LATERAL (SELECT unnest(range(1, len(tk))) AS i)),
       |cqt AS (SELECT gram, CAST(count(*) AS BIGINT) AS cq FROM rg GROUP BY gram),
       |cpt AS (SELECT gram, CAST(count(*) AS BIGINT) AS cp FROM tg GROUP BY gram),
       |vocab AS (
       |  SELECT coalesce(cpt.gram, cqt.gram) AS gram,
       |    coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
       |  FROM cpt FULL OUTER JOIN cqt ON cpt.gram = cqt.gram),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(cp) AS BIGINT) AS np,
       |    CAST(sum(cq) AS BIGINT) AS nq FROM vocab),
       |w AS (
       |  SELECT gram,
       |    CAST(round(ln(CAST((cp+1)*(nq+v) AS DOUBLE) / CAST((cq+1)*(np+v) AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS logr
       |  FROM vocab, tot),
       |dsc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    round(CAST(sum(logr) AS DOUBLE), 6) AS logw
       |  FROM rg JOIN w USING (gram) GROUP BY doc_id),
       |wts AS (
       |  SELECT r.doc_id, coalesce(n_grams, 0) AS n_grams,
       |    coalesce(logw, 0.0) AS logw
       |  FROM (SELECT DISTINCT doc_id FROM rawd) r
       |  LEFT JOIN dsc USING (doc_id))""".stripMargin

  private val DSIR_CTE =
    s"""WITH rawd AS (SELECT doc_id, $TOKS AS tk FROM documents WHERE doc_id % 10 != 0),
       |tgtd AS (SELECT doc_id, $TOKS AS tk FROM documents WHERE doc_id % 10 = 0),
       |$DSIR_CHAIN""".stripMargin

  // aHash re-derived from the pixel RECIPE — no image decoding in the
  // oracle: integer luma, the exact block-mean grid (cell of x = the
  // largest c with floor(c*w/8) <= x), cross-multiplied mean threshold,
  // two 32-bit halves. Shared by p_image_phash / p_image_dedup.
  // grid/threshold/packing tail shared by the exact and perturbed heads
  private val IMG_HASH_TAIL =
    """cells AS (
      |  SELECT doc_id, g,
      |    len(list_filter(range(0, 8), c -> (c*w)//8 <= x)) - 1 AS cx,
      |    len(list_filter(range(0, 8), c -> (c*h)//8 <= y)) - 1 AS cy
      |  FROM px),
      |tot AS (SELECT doc_id, sum(g) AS s, count(*) AS n FROM cells GROUP BY doc_id),
      |cs AS (SELECT doc_id, cx, cy, sum(g) AS sc, count(*) AS nc
      |  FROM cells GROUP BY doc_id, cx, cy),
      |bits AS (
      |  SELECT cs.doc_id, cy*8 + cx AS p,
      |    CASE WHEN cs.sc * t.n > t.s * cs.nc THEN 1 ELSE 0 END AS b
      |  FROM cs JOIN tot t ON cs.doc_id = t.doc_id),
      |hashes AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN p >= 32 THEN b * (CAST(1 AS BIGINT) << (p - 32)) ELSE 0 END) AS BIGINT) AS hash_hi,
      |    CAST(sum(CASE WHEN p < 32 THEN b * (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS hash_lo
      |  FROM bits GROUP BY doc_id)""".stripMargin

  private val IMG_HASH_CTE =
    """WITH ids AS (SELECT doc_id, doc_id % 13 AS img FROM documents WHERE doc_id < 40),
      |dims AS (SELECT doc_id, img, 8 + img % 9 AS w, 8 + img % 7 AS h FROM ids),
      |px AS (
      |  SELECT doc_id, w, h, x, y,
      |    299*((img + 3*x + 5*y) % 256) + 587*((2*img + 7*x + y) % 256)
      |      + 114*((5*img + x + 11*y) % 256) AS g
      |  FROM dims,
      |    LATERAL (SELECT unnest(range(0, w)) AS x),
      |    LATERAL (SELECT unnest(range(0, h)) AS y)),
      |""".stripMargin + IMG_HASH_TAIL

  // perturbed head: corner pixels (x,y < 2) get `pert` added per channel
  // (mod 256) — mirrors MediaSynth.pixelRgbPerturbed exactly
  private val IMG_NEARDUP_CTE =
    """WITH ids AS (SELECT doc_id, doc_id % 13 AS img,
      |    (doc_id // 13) * 37 % 256 AS pert
      |  FROM documents WHERE doc_id < 52),
      |dims AS (SELECT doc_id, img, pert, 8 + img % 9 AS w, 8 + img % 7 AS h FROM ids),
      |px AS (
      |  SELECT doc_id, w, h, x, y,
      |    299*((img + 3*x + 5*y + CASE WHEN x < 2 AND y < 2 THEN pert ELSE 0 END) % 256)
      |      + 587*((2*img + 7*x + y + CASE WHEN x < 2 AND y < 2 THEN pert ELSE 0 END) % 256)
      |      + 114*((5*img + x + 11*y + CASE WHEN x < 2 AND y < 2 THEN pert ELSE 0 END) % 256) AS g
      |  FROM dims,
      |    LATERAL (SELECT unnest(range(0, w)) AS x),
      |    LATERAL (SELECT unnest(range(0, h)) AS y)),
      |""".stripMargin + IMG_HASH_TAIL

  // Gumbel-max perturbation + rank over `wts` (shared by
  // p_dsir_resample / p_selection_pipeline)
  private val DSIR_GUMBEL =
    """g AS (
      |  SELECT doc_id, logw,
      |    round(logw - ln(-ln((CAST(((((doc_id % 4294967296) * 1103515245
      |      + 12345) % 4294967296) + 4294967296) % 4294967296 AS DOUBLE)
      |      + 0.5) / 4294967296.0)), 6) AS gumbel_key
      |  FROM wts),
      |rk AS (
      |  SELECT doc_id, logw, gumbel_key,
      |    CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id) AS BIGINT) AS rnk
      |  FROM g)""".stripMargin

  /** Shared CTE for the repeated-substring oracles: 8-gram positional
    * strings over the %17-passage-enriched corpus, hot-gram guard (>64),
    * diagonal/island merge into maximal spans (`sp`). Both the span
    * report and the span-removal gate build on the same prefix so the
    * two oracles cannot drift.
    */
  private val REPEATED_SPANS_CTE: String = {
    val k = 8
    val gram = (0 until k).map(j => if (j == 0) "t[i]" else s"t[i+$j]")
      .mkString(" || ' ' || ")
    s"""WITH enriched AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 17 = 0 THEN text || ' zero one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo twentythree'
       |         ELSE text END AS text
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
       |  FROM enriched),
       |g AS (
       |  SELECT doc_id, i - 1 AS pos, $gram AS s
       |  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - ${k - 2})) AS i)
       |  WHERE len(t) >= $k),
       |hot AS (SELECT s FROM g GROUP BY s HAVING count(*) > 64),
       |gg AS (SELECT g.doc_id, g.pos, g.s FROM g ANTI JOIN hot USING (s)),
       |m AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.pos AS pa, b.pos AS pb
       |  FROM gg a JOIN gg b ON a.s = b.s AND a.doc_id < b.doc_id),
       |d AS (
       |  SELECT doc_a, doc_b, pa, pb, pa - pb AS diag,
       |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp
       |  FROM m),
       |sp AS (
       |  SELECT doc_a, doc_b, min(pa) AS start_a, min(pb) AS start_b,
       |    count(*) + ${k - 1} AS span_tokens
       |  FROM d GROUP BY doc_a, doc_b, diag, grp)""".stripMargin
  }

  /** Exact word-3-gram Jaccard pairs >= 0.5 — the shared oracle for the
    * exact inverted-index join and both verified-LSH pipelines (MinHash /
    * SimHash candidates + exact verification; banding recall is 1.0 on
    * this corpus's near-dup band, verified empirically and suite-pinned).
    */
  private val JACCARD_PAIRS_SQL =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
      |shing AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |         ELSE array_to_string(t, ' ') END AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 2))) AS i)),
      |dsh AS (SELECT DISTINCT doc_id, s FROM shing),
      |sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Distinct trigram overlap of each training doc (doc_id % 10 != 0)
    * against the eval set (doc_id % 10 = 0); every training doc keeps a
    * row (zero hits included). Shared by the join-based report and the
    * map-only broadcast-set path — both must match it exactly.
    */
  /** BM25 oracle: posting collapse, df, 6dp-snapped idf (ln snapped
    * immediately — the one transcendental), order-fixed tf-norm
    * arithmetic, per-term DECIMAL(18,6) snap+sum, (score desc, doc_id
    * asc) ranking. Shared by the corpus-scan and prebuilt-index gates.
    */
  // CTE body shared by the plain BM25 gates and the rank-fusion gate
  // (which fuses the `r` ranking with a term-overlap ranking over the
  // same `post`/`q` tables) — one ranking derivation, three gates.
  private val BM25_CTE =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS dl,
       |    unnest($TOKS) AS token
       |  FROM documents),
       |post AS (
       |  SELECT doc_id, dl, token, count(*) AS tf FROM toks GROUP BY 1, 2, 3),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |    sum(CAST(len($TOKS) AS BIGINT)) AS total_tokens
       |  FROM documents),
       |q AS (
       |  SELECT doc_id AS query_id, t AS token FROM (
       |    SELECT doc_id, unnest(list_slice($TOKS, 1, 5)) AS t
       |    FROM documents WHERE doc_id % 50 = 0)
       |  GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM post GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, p.doc_id,
       |    CAST(round(
       |      round(ln(CAST(1.0 AS DOUBLE)
       |          + ((s.n_docs - d.df) + CAST(0.5 AS DOUBLE))
       |            / (d.df + CAST(0.5 AS DOUBLE))), 6)
       |      * ((p.tf * CAST(2.2 AS DOUBLE))
       |          / (p.tf + CAST(1.2 AS DOUBLE)
       |              * (CAST(0.25 AS DOUBLE)
       |                 + (CAST(0.75 AS DOUBLE) * p.dl)
       |                   / (CAST(s.total_tokens AS DOUBLE)
       |                      / CAST(s.n_docs AS DOUBLE))))),
       |      6) AS DECIMAL(18,6)) AS term_score
       |  FROM post p JOIN q USING (token) JOIN df d USING (token), stats s),
       |agg AS (
       |  SELECT query_id, doc_id, CAST(sum(term_score) AS DOUBLE) AS score
       |  FROM scored GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM agg)""".stripMargin

  private val BM25_SQL =
    s"""$BM25_CTE
       |SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin

  /** RRF oracle: BM25 top-10 (the `r` ranking above) ∪ term-overlap
    * top-10 (distinct-term intersection counts over the same posting
    * table), per-list contribution = one double division snapped 6dp,
    * DECIMAL sum, (score desc, doc_id asc) fused rank.
    */
  private val RANK_FUSION_SQL =
    s"""$BM25_CTE,
       |bm AS (SELECT query_id, doc_id, rnk FROM r WHERE rnk <= 10),
       |ovl AS (
       |  SELECT query_id, doc_id, count(*) AS ov
       |  FROM post p JOIN q USING (token) GROUP BY 1, 2),
       |ovr AS (
       |  SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY ov DESC, doc_id ASC) AS rnk
       |  FROM ovl),
       |contrib AS (
       |  SELECT query_id, doc_id,
       |    CAST(round(CAST(1.0 AS DOUBLE) / (60 + rnk), 6)
       |      AS DECIMAL(18,6)) AS c
       |  FROM (SELECT * FROM bm
       |        UNION ALL
       |        SELECT query_id, doc_id, rnk FROM ovr WHERE rnk <= 10)),
       |fused AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS DOUBLE) AS score
       |  FROM contrib GROUP BY 1, 2),
       |fr AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM fused)
       |SELECT query_id, doc_id, score, rnk FROM fr WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin

  /** Shared single-round BPE learn+encode CTE chain (gates
    * `p_bpe_encode` and `p_bpe_pack`): rank ALL pairs, keep the global
    * top-30, filter to letter pairs, take the first 8 in rank order —
    * the exact selection rule `Queries.bpeLetterMerges` implements —
    * then apply the merges as the identical nested-replace chain
    * (placeholders chr(0xE000+rank)); chr(1) sentinels no-op unused
    * slots if fewer than 8 letter pairs survive the top-30 cut. Ends
    * with `enc(doc_id, n_tokens, n_chars, n_pieces)` over non-null-text
    * docs.
    */
  private val BPE_ENCODE_CTE =
    s"""WITH w AS (
       |  SELECT t AS word, count(*) AS wc
       |  FROM (SELECT unnest($TOKS) AS t FROM documents)
       |  GROUP BY 1),
       |p AS (
       |  SELECT substr(word, CAST(i AS INT), 2) AS pair, sum(wc) AS n
       |  FROM w, LATERAL (SELECT unnest(range(1, len(word))) AS i)
       |  WHERE len(word) >= 2 GROUP BY 1),
       |m0 AS (
       |  SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS rnk
       |  FROM p QUALIFY rnk <= 30),
       |m AS (
       |  SELECT pair, row_number() OVER (ORDER BY rnk) AS mi
       |  FROM m0 WHERE regexp_matches(pair, '^[a-z]{2}$$')
       |  QUALIFY mi <= 8),
       |mm AS (SELECT
       |  coalesce(max(CASE WHEN mi = 1 THEN pair END), chr(1)) AS m1,
       |  coalesce(max(CASE WHEN mi = 2 THEN pair END), chr(1)) AS m2,
       |  coalesce(max(CASE WHEN mi = 3 THEN pair END), chr(1)) AS m3,
       |  coalesce(max(CASE WHEN mi = 4 THEN pair END), chr(1)) AS m4,
       |  coalesce(max(CASE WHEN mi = 5 THEN pair END), chr(1)) AS m5,
       |  coalesce(max(CASE WHEN mi = 6 THEN pair END), chr(1)) AS m6,
       |  coalesce(max(CASE WHEN mi = 7 THEN pair END), chr(1)) AS m7,
       |  coalesce(max(CASE WHEN mi = 8 THEN pair END), chr(1)) AS m8
       |  FROM m),
       |toks AS (
       |  SELECT doc_id, $TOKS AS t FROM documents WHERE text IS NOT NULL),
       |enc AS (
       |  SELECT doc_id,
       |    CAST(len(t) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS n_chars,
       |    CAST(list_sum(list_transform(t, x -> length(
       |      replace(replace(replace(replace(replace(replace(replace(replace(x,
       |        m1, chr(57344)), m2, chr(57345)), m3, chr(57346)), m4, chr(57347)),
       |        m5, chr(57348)), m6, chr(57349)), m7, chr(57350)), m8, chr(57351))
       |    ))) AS BIGINT) AS n_pieces
       |  FROM toks, mm)""".stripMargin

  /** Iterative-BPE oracle: DuckDB re-runs the ENTIRE learn → apply →
    * re-learn recursion — six chained rounds, each counting adjacent
    * pairs over the vocabulary AS RE-ENCODED by every earlier round's
    * merge (placeholder chr(0xE000+round−1), binary-order tie-break,
    * top-1 per round) — then re-applies the learned chain per document.
    * Merge pairs are emitted as codepoints (placeholders are private-use
    * chars); each round's winning count pins that round's statistics to
    * the re-encoded vocabulary, which a single-pass merge list cannot
    * reproduce.
    */
  private val BPE_TRAIN_SQL: String = {
    val rounds = 6
    val chain = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT substr(word, CAST(i AS INT), 2) AS pair, sum(wc) AS n
         |  FROM w${r - 1}, LATERAL (SELECT unnest(range(1, len(word))) AS i)
         |  WHERE len(word) >= 2 GROUP BY 1),
         |m$r AS (SELECT pair, CAST(n AS BIGINT) AS n FROM p$r ORDER BY n DESC, pair LIMIT 1),
         |w$r AS (
         |  SELECT replace(word, (SELECT pair FROM m$r), chr(${57343 + r})) AS word, wc
         |  FROM w${r - 1})""".stripMargin
    }.mkString(",\n")
    val mergeScalars = (1 to rounds).map(r => s"(SELECT pair FROM m$r) AS q$r").mkString(", ")
    val encodeChain = (1 to rounds).foldLeft("x") { (acc, r) =>
      s"replace($acc, q$r, chr(${57343 + r}))"
    }
    val mergeUnion = (1 to rounds).map(r => s"SELECT $r AS mi, pair, n FROM m$r")
      .mkString("\n  UNION ALL ")
    s"""WITH w0 AS (
       |  SELECT t AS word, count(*) AS wc
       |  FROM (SELECT unnest($TOKS) AS t FROM documents)
       |  GROUP BY 1),
       |$chain,
       |mg AS (
       |  $mergeUnion),
       |ms AS (SELECT $mergeScalars),
       |toksd AS (
       |  SELECT doc_id, $TOKS AS t FROM documents WHERE text IS NOT NULL),
       |encd AS (
       |  SELECT doc_id,
       |    CAST(len(t) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS n_chars,
       |    CAST(list_sum(list_transform(t, x -> length($encodeChain))) AS BIGINT)
       |      AS n_pieces
       |  FROM toksd, ms)
       |SELECT CAST(0 AS BIGINT) AS sect, CAST(mi AS BIGINT) AS id,
       |  CAST(unicode(substr(pair, 1, 1)) AS BIGINT) AS v1,
       |  CAST(unicode(substr(pair, 2, 1)) AS BIGINT) AS v2,
       |  n AS v3
       |FROM mg
       |UNION ALL
       |SELECT CAST(1 AS BIGINT), d.doc_id,
       |  CAST(coalesce(e.n_tokens, 0) AS BIGINT),
       |  CAST(coalesce(e.n_chars, 0) AS BIGINT),
       |  CAST(coalesce(e.n_pieces, 0) AS BIGINT)
       |FROM documents d LEFT JOIN encd e ON d.doc_id = e.doc_id
       |ORDER BY sect, id""".stripMargin
  }

  /** Contrastive-triples oracle: crop boundaries, anchor query terms
    * (distinct tokens of the first 32), the full BM25 chain with the
    * standard constants, self-exclusion, and the survivor re-rank —
    * the hard-negative mining recipe end to end.
    */
  private val CONTRASTIVE_SQL =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS dl,
       |    unnest($TOKS) AS token
       |  FROM documents),
       |post AS (
       |  SELECT doc_id, dl, token, count(*) AS tf FROM toks GROUP BY 1, 2, 3),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |    sum(CAST(len($TOKS) AS BIGINT)) AS total_tokens
       |  FROM documents),
       |tk AS (SELECT doc_id, $TOKS AS t FROM documents),
       |anch AS (SELECT doc_id FROM tk WHERE doc_id % 50 = 0 AND len(t) > 32),
       |q AS (
       |  SELECT doc_id AS query_id, t2 AS token FROM (
       |    SELECT a.doc_id, unnest(tk.t[1:32]) AS t2
       |    FROM anch a JOIN tk ON a.doc_id = tk.doc_id)
       |  GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM post GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, p.doc_id,
       |    CAST(round(
       |      round(ln(CAST(1.0 AS DOUBLE)
       |          + ((s.n_docs - d.df) + CAST(0.5 AS DOUBLE))
       |            / (d.df + CAST(0.5 AS DOUBLE))), 6)
       |      * ((p.tf * CAST(2.2 AS DOUBLE))
       |          / (p.tf + CAST(1.2 AS DOUBLE)
       |              * (CAST(0.25 AS DOUBLE)
       |                 + (CAST(0.75 AS DOUBLE) * p.dl)
       |                   / (CAST(s.total_tokens AS DOUBLE)
       |                      / CAST(s.n_docs AS DOUBLE))))),
       |      6) AS DECIMAL(18,6)) AS term_score
       |  FROM post p JOIN q USING (token) JOIN df d USING (token), stats s),
       |agg AS (
       |  SELECT query_id, doc_id, CAST(sum(term_score) AS DOUBLE) AS score
       |  FROM scored GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM agg),
       |neg AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rnk) AS nrnk
       |  FROM r WHERE rnk <= 10 AND doc_id <> query_id),
       |pos AS (
       |  SELECT doc_id AS query_id,
       |    CAST(least(len(t) - 32, 32) AS BIGINT) AS pos_tokens
       |  FROM tk WHERE len(t) > 32)
       |SELECT n.query_id, p.pos_tokens, n.doc_id AS neg_id, n.score,
       |  CAST(n.nrnk AS BIGINT) AS rnk
       |FROM neg n JOIN pos p USING (query_id)
       |WHERE n.nrnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  /** Dense⊕lexical hybrid oracle: the BM25 `r` ranking (shared CTE
    * above) fused with a seeded-IVF dense ranking re-derived end to end
    * — rank-based centroid seed (the 16 smallest vec_ids), argmin list
    * assignment with lower-list tie-break, nprobe=4 probe, index-order
    * cosine top-10 — through the snapped 1/(60+rnk) DECIMAL RRF sum.
    * documents.doc_id and embeddings.vec_id share one id space, so the
    * fused doc universe is well-defined.
    */
  private val HYBRID_DENSE_SQL =
    s"""$BM25_CTE,
       |bm AS (SELECT query_id, doc_id, rnk FROM r WHERE rnk <= 10),
       |ep AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cen AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id, v AS cv
       |  FROM ep QUALIFY row_number() OVER (ORDER BY vec_id) <= 16),
       |dsq AS (
       |  SELECT ep.vec_id AS id, cen.list_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> (ep.v[i]-cen.cv[i])*(ep.v[i]-cen.cv[i]))) AS d2
       |  FROM ep, cen),
       |asg AS (
       |  SELECT id AS nid, list_id FROM (
       |    SELECT id, list_id,
       |      row_number() OVER (PARTITION BY id ORDER BY d2, list_id) AS rn FROM dsq)
       |  WHERE rn = 1),
       |pr AS (
       |  SELECT id AS qid, list_id FROM (
       |    SELECT id, list_id,
       |      row_number() OVER (PARTITION BY id ORDER BY d2, list_id) AS rn
       |    FROM dsq WHERE id % 50 = 0)
       |  WHERE rn <= 4),
       |qd AS (SELECT vec_id AS qid, v AS qv FROM ep WHERE vec_id % 50 = 0),
       |sc AS (
       |  SELECT qd.qid, a.nid,
       |    list_dot_product(qd.qv, c.v) /
       |      (sqrt(list_dot_product(qd.qv, qd.qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
       |  FROM qd JOIN pr ON qd.qid = pr.qid
       |    JOIN asg a ON a.list_id = pr.list_id
       |    JOIN ep c ON c.vec_id = a.nid
       |  WHERE qd.qid != a.nid),
       |dn AS (
       |  SELECT qid AS query_id, nid AS doc_id, rnk FROM (
       |    SELECT qid, nid,
       |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
       |    FROM sc WHERE NOT isnan(cos)) WHERE rnk <= 10),
       |contrib AS (
       |  SELECT query_id, doc_id,
       |    CAST(round(CAST(1.0 AS DOUBLE) / (60 + rnk), 6)
       |      AS DECIMAL(18,6)) AS c
       |  FROM (SELECT * FROM bm UNION ALL SELECT * FROM dn)),
       |fused AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS DOUBLE) AS score
       |  FROM contrib GROUP BY 1, 2),
       |fr AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM fused)
       |SELECT query_id, doc_id, score, rnk FROM fr WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin

  private val DECONTAM_SQL =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
      |shing AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |         ELSE array_to_string(t, ' ') END AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 2))) AS i)),
      |dsh AS (SELECT DISTINCT doc_id, s FROM shing),
      |ev AS (SELECT DISTINCT s FROM dsh WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, s FROM dsh WHERE doc_id % 10 <> 0),
      |agg AS (
      |  SELECT tr.doc_id, count(*) AS n_ngrams,
      |    CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      |  FROM tr LEFT JOIN ev ON tr.s = ev.s GROUP BY 1)
      |SELECT doc_id, n_ngrams, n_hits,
      |  round(n_hits * 1.0 / n_ngrams, 6) AS contamination,
      |  CAST(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Shared PQ / IVF-PQ oracle: min-id codebooks, per-subspace argmin
    * encoding, ADC tables, fixed-order lookup sums, (ad2, id) ranking.
    */
  private val ANN_PQ_SQL =
    """WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sub AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
        |cb AS (
        |  SELECT s, CAST(p.vec_id AS INT) AS j, v[s*8+1 : s*8+8] AS cv
        |  FROM p, sub WHERE p.vec_id < 16),
        |enc0 AS (
        |  SELECT p.vec_id, cb.s, cb.j,
        |    list_sum(list_transform(range(1, 9),
        |      i -> (v[cb.s*8+i]-cv[i])*(v[cb.s*8+i]-cv[i]))) AS d2
        |  FROM p, cb),
        |enc AS (
        |  SELECT vec_id, s, j FROM (
        |    SELECT vec_id, s, j,
        |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
        |    FROM enc0) WHERE rn = 1),
        |codes AS (SELECT vec_id, list(j ORDER BY s) AS cl FROM enc GROUP BY vec_id),
        |q AS (SELECT vec_id AS qid, v AS qv FROM p WHERE vec_id < 30),
        |dt0 AS (
        |  SELECT qid, cb.s, cb.j,
        |    list_sum(list_transform(range(1, 9),
        |      i -> (qv[cb.s*8+i]-cv[i])*(qv[cb.s*8+i]-cv[i]))) AS d2
        |  FROM q, cb),
        |dtr AS (SELECT qid, s, list(d2 ORDER BY j) AS rw FROM dt0 GROUP BY qid, s),
        |dt AS (SELECT qid, list(rw ORDER BY s) AS tab FROM dtr GROUP BY qid),
        |sc AS (
        |  SELECT qid, c.vec_id AS nid,
        |    list_sum(list_transform(range(1, 9), s -> tab[s][cl[s]+1])) AS ad2
        |  FROM dt, codes c WHERE qid != c.vec_id),
        |r AS (
        |  SELECT qid AS query_id, nid AS neighbor_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY ad2, nid) AS rnk, ad2
        |  FROM sc)
        |SELECT query_id, neighbor_id, rnk, round(ad2, 6) AS ad2
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** Exact brute-force cosine top-5 — oracle for both the bounded-heap
    * brute-force aggregate and the (full-recall-tuned) IVF path.
    */
  private val ANN_TOP5_SQL =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 30),
      |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
      |s AS (
      |  SELECT qid, nid,
      |    list_dot_product(qv, cv) /
      |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
      |  FROM q, c WHERE qid != nid),
      |r AS (
      |  SELECT qid AS query_id, nid AS neighbor_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
      |  FROM s WHERE NOT isnan(cos))
      |SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** Seeded-IVF recall@5 oracle: re-derives the approximate search itself
    * (centroids = 16 smallest-id embeddings; argmin assignment, ties to
    * the lower list; nprobe=4 probe; cosine top-5) AND the exact top-5,
    * then counts per-query hits. The squared-distance and dot-product
    * sums run in index order on both engines (the PQ/ANN-gate precedent),
    * so every comparison is bit-exact.
    */
  private val ANN_RECALL_SQL =
    """WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |cen AS (
      |  -- rank-based seed, matching seedCentroids (orderBy id, limit N)
      |  -- exactly even on id spaces with gaps or a nonzero minimum
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id, v AS cv
      |  FROM p QUALIFY row_number() OVER (ORDER BY vec_id) <= 16),
      |d AS (
      |  SELECT p.vec_id AS id, cen.list_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> (p.v[i]-cen.cv[i])*(p.v[i]-cen.cv[i]))) AS d2
      |  FROM p, cen),
      |asg AS (
      |  SELECT id AS nid, list_id FROM (
      |    SELECT id, list_id,
      |      row_number() OVER (PARTITION BY id ORDER BY d2, list_id) AS rn FROM d)
      |  WHERE rn = 1),
      |pr AS (
      |  SELECT id AS qid, list_id FROM (
      |    SELECT id, list_id,
      |      row_number() OVER (PARTITION BY id ORDER BY d2, list_id) AS rn
      |    FROM d WHERE id < 30)
      |  WHERE rn <= 4),
      |q AS (SELECT vec_id AS qid, v AS qv FROM p WHERE vec_id < 30),
      |sc AS (
      |  SELECT q.qid, a.nid,
      |    list_dot_product(q.qv, c.v) /
      |      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
      |  FROM q JOIN pr ON q.qid = pr.qid
      |    JOIN asg a ON a.list_id = pr.list_id
      |    JOIN p c ON c.vec_id = a.nid
      |  WHERE q.qid != a.nid),
      |approx AS (
      |  SELECT qid, nid FROM (
      |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
      |    FROM sc WHERE NOT isnan(cos)) WHERE rnk <= 5),
      |es AS (
      |  SELECT q.qid, c.vec_id AS nid,
      |    list_dot_product(q.qv, c.v) /
      |      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
      |  FROM q, p c WHERE q.qid != c.vec_id),
      |exact AS (
      |  SELECT qid, nid FROM (
      |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
      |    FROM es WHERE NOT isnan(cos)) WHERE rnk <= 5)
      |SELECT e.qid AS query_id, CAST(count(*) AS BIGINT) AS n_exact,
      |  CAST(count(a.nid) AS BIGINT) AS n_hits
      |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.nid = a.nid
      |GROUP BY e.qid ORDER BY query_id""".stripMargin

  /** Constant-prediction ensemble oracle: when the fitted ensemble's
    * prediction provably equals avg(label) (Dummy-mean bases, sampling
    * off), the per-flag RMSE and the constant itself are plain SQL.
    */
  private val CONSTANT_REGRESSION_SQL =
    """WITH m AS (SELECT avg(l_extendedprice) AS a FROM lineitem)
      |SELECT l_returnflag, count(*) AS n_rows,
      | round(sqrt(avg((l_extendedprice - m.a) * (l_extendedprice - m.a))), 2) AS rmse,
      | round(m.a, 4) AS pred
      |FROM lineitem, m
      |GROUP BY l_returnflag, m.a
      |ORDER BY l_returnflag""".stripMargin

  /** AdaBoost.R2 weight recursion over a constant-36000 predictor, with
    * the normalized per-row loss given by `lossExpr` (in scope: `err` =
    * absolute error, `me` = its max). Shared by the linear / squared /
    * exponential loss gates.
    */
  private def boostingR2Sql(lossExpr: String): String =
    s"""WITH base AS (
       |  SELECT abs(36000.0 - l_extendedprice) AS err FROM lineitem),
       |mx AS (SELECT max(err) AS me FROM base),
       |l AS (SELECT $lossExpr AS loss FROM base, mx),
       |e1 AS (SELECT sum(loss * (SELECT 1.0 / count(*) FROM lineitem)) AS e FROM l),
       |b1 AS (SELECT e / (1 - e) AS beta FROM e1),
       |w2 AS (SELECT loss, power((SELECT beta FROM b1), 1 - loss) AS bw FROM l),
       |s2 AS (SELECT sum(bw) AS sw FROM w2),
       |e2 AS (SELECT sum((bw / (SELECT sw FROM s2)) * loss) AS e FROM w2),
       |b2 AS (SELECT e / (1 - e) AS beta FROM e2),
       |w3 AS (SELECT loss, bw * power((SELECT beta FROM b2), 1 - loss) AS bw FROM w2),
       |s3 AS (SELECT sum(bw) AS sw FROM w3),
       |e3 AS (SELECT sum((bw / (SELECT sw FROM s3)) * loss) AS e FROM w3),
       |b3 AS (SELECT e / (1 - e) AS beta FROM e3)
       |SELECT CAST(0 AS BIGINT) AS model_idx, round(ln(1.0 / beta), 6) AS model_weight FROM b1
       |UNION ALL SELECT 1, round(ln(1.0 / beta), 6) FROM b2
       |UNION ALL SELECT 2, round(ln(1.0 / beta), 6) FROM b3
       |ORDER BY model_idx""".stripMargin

  /** Majority-class ensemble oracle: prior-base classifiers predict the
    * majority class for every row.
    */
  private val MAJORITY_CLASS_SQL =
    """WITH c AS (
      |  SELECT sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n1, count(*) AS n
      |  FROM lineitem)
      |SELECT CAST(CASE WHEN n1 * 2 > n THEN 1.0 ELSE 0.0 END AS DOUBLE) AS prediction,
      |       n AS n_rows
      |FROM c""".stripMargin

  /** Incremental-dedup oracle, shared by the recomputed-path and
    * precomputed-artifact-path gate queries: identical survivors are
    * exactly the artifact path's contract. Drop a batch doc
    * (doc_id % 3 = 0) iff a preceding doc — corpus doc, or batch doc
    * with smaller id — has exact trigram Jaccard >= 0.5 with it.
    */
  private val INCREMENTAL_DEDUP_SQL =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
      |shing AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |         ELSE array_to_string(t, ' ') END AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 2))) AS i)),
      |dsh AS (SELECT DISTINCT doc_id, s FROM shing),
      |sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      |  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT ia, ib FROM inter
      |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
      |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
      |ranked AS (
      |  SELECT doc_id, CASE WHEN doc_id % 3 <> 0 THEN 0 ELSE 1 END AS rk FROM documents),
      |victims AS (
      |  SELECT DISTINCT p.ib AS doc_id
      |  FROM pairs p JOIN ranked ra ON p.ia = ra.doc_id JOIN ranked rb ON p.ib = rb.doc_id
      |  WHERE rb.rk = 1 AND (ra.rk < rb.rk OR (ra.rk = rb.rk AND p.ia < p.ib)))
      |SELECT d.doc_id FROM documents d
      |WHERE d.doc_id % 3 = 0 AND d.doc_id NOT IN (SELECT doc_id FROM victims)
      |ORDER BY d.doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT n_name AS nation,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | count(*) AS line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY nation""".stripMargin,
    "q3_running_qty_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | sum(l_quantity) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem
        |WHERE l_suppkey < 10
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q4_discounted_orders_semi" ->
      """SELECT o_orderpriority AS priority, count(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.05)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q5_segment_stats" ->
      """SELECT c_mktsegment AS segment,
        | max(o_totalprice) AS max_price,
        | min(o_totalprice) AS min_price,
        | count(*) AS order_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q6_event_windows" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
        | event_type,
        | count(*) AS event_count,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q7_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
        | coalesce(l_linestatus, '(all)') AS status,
        | sum(l_quantity) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q8_pivot" ->
      """SELECT l_returnflag AS flag,
        | count(*) FILTER (l_linestatus = 'O') AS cnt_o,
        | count(*) FILTER (l_linestatus = 'F') AS cnt_f
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q9_monthly_orders" ->
      """SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start,
        | CAST(year(o_orderdate) AS BIGINT) AS order_year,
        | count(*) AS order_count,
        | CAST(sum(day(o_orderdate)) AS BIGINT) AS sum_dom
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY 1""".stripMargin,
    "q10_string_funcs" ->
      """SELECT p_partkey,
        | upper(substring(p_name, 1, 3)) AS name_prefix,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END::BIGINT AS is_brass,
        | concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q12_rolling_range" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |    CAST(value AS DECIMAL(18,2)) AS v FROM events)
        |SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(CAST(sum(v) OVER w AS DECIMAL(28,2)) AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q13_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |t1 AS (SELECT * FROM (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN tus END) AS t1
        |  FROM e GROUP BY user_id) WHERE t1 IS NOT NULL),
        |t2 AS (SELECT * FROM (SELECT e.user_id,
        |    min(CASE WHEN event_type = 'view' AND tus > t1 THEN tus END) AS t2
        |  FROM e JOIN t1 ON e.user_id = t1.user_id GROUP BY e.user_id, t1.t1)
        |  WHERE t2 IS NOT NULL),
        |t3 AS (SELECT * FROM (SELECT e.user_id,
        |    min(CASE WHEN event_type = 'purchase' AND tus > t2 THEN tus END) AS t3
        |  FROM e JOIN t2 ON e.user_id = t2.user_id GROUP BY e.user_id, t2.t2)
        |  WHERE t3 IS NOT NULL)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type, count(*) AS n FROM t1
        |  UNION ALL SELECT 2, 'view', count(*) FROM t2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM t3)
        |ORDER BY step""".stripMargin,
    "q14_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_d FROM e GROUP BY user_id)
        |SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', cohort_d, d) AS BIGINT) AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q15_json_extract" ->
      """WITH e AS (SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, k // 10 AS k_decile,
        |  count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM e WHERE k IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ml_dummy_mean" ->
      "SELECT round(avg(l_extendedprice), 4) AS prediction FROM lineitem",
    "ml_dummy_median" ->
      "SELECT quantile_disc(l_extendedprice, 0.5) AS prediction FROM lineitem",
    "ml_dummy_quantile" ->
      "SELECT quantile_disc(l_extendedprice, 0.9) AS prediction FROM lineitem",
    "ml_dummy_prior" ->
      """SELECT CAST(CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS BIGINT) AS class_label,
        | round(count(*) * 1.0 / (SELECT count(*) FROM lineitem), 10) AS probability
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "ml_dummy_uniform" ->
      """SELECT CAST(CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS BIGINT) AS class_label,
        | round(1.0 / (SELECT count(DISTINCT l_returnflag) FROM lineitem), 10) AS probability
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "ml_dummy_constant_cls" ->
      """SELECT CAST(k AS BIGINT) AS class_label,
        | CAST(CASE WHEN k = 2 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS probability,
        | CAST(CASE WHEN k = 2 THEN (SELECT count(*) FROM lineitem) ELSE 0 END AS BIGINT) AS n_pred
        |FROM (SELECT unnest([0, 1, 2]) AS k)
        |ORDER BY 1""".stripMargin,
    "ml_dummy_constant_reg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | round(sqrt(avg((l_extendedprice - 36000.0) * (l_extendedprice - 36000.0))), 2) AS rmse,
        | CAST(36000.0 AS DOUBLE) AS pred
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "ml_bagging_regressor" -> CONSTANT_REGRESSION_SQL,
    "ml_stacking_regressor" -> CONSTANT_REGRESSION_SQL,
    "ml_gbm_regressor" -> CONSTANT_REGRESSION_SQL,
    "ml_bagging_classifier" -> MAJORITY_CLASS_SQL,
    "ml_stacking_classifier" -> MAJORITY_CLASS_SQL,
    "ml_gbm_classifier" -> MAJORITY_CLASS_SQL,
    // AdaBoost.R2 over a constant predictor: the per-model ensemble weights
    // ln(1/beta_k) re-derived independently in SQL (same normalized-loss /
    // estimator-error / boost-weight recursion the Scala loop runs), once
    // per supported loss shape.
    "ml_boosting_regressor" -> boostingR2Sql("err / me"),
    "ml_boosting_squared" -> boostingR2Sql("power(err / me, 2)"),
    "ml_boosting_exponential" -> boostingR2Sql("1 - exp(-(err / me))"),
    // One SAMME round on the prior classifier: err = minority mass,
    // alpha = ln((1-err)/err), prediction = majority class.
    "ml_boosting_classifier" ->
      """WITH c AS (
        |  SELECT sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n1, count(*) AS n
        |  FROM lineitem),
        |e AS (SELECT least(n1, n - n1) * (1.0 / n) AS err, n1, n FROM c)
        |SELECT CAST(CASE WHEN n1 * 2 > n THEN 1.0 ELSE 0.0 END AS DOUBLE) AS prediction,
        |       n AS n_rows,
        |       round(ln((1 - err) / err), 6) AS alpha
        |FROM e""".stripMargin,
    "ml_gbm_multiclass" ->
      """WITH c AS (
        |  SELECT CASE l_returnflag WHEN 'A' THEN 0.0 WHEN 'N' THEN 1.0 ELSE 2.0 END AS cls,
        |         count(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT (SELECT cls FROM c ORDER BY cnt DESC, cls LIMIT 1) AS prediction,
        |       (SELECT count(*) FROM lineitem) AS n_rows""".stripMargin,
    "p_text_stats" ->
      s"""SELECT doc_id,
         | CAST(length(text) AS BIGINT) AS n_chars_calc,
         | CAST(len($TOKS) AS BIGINT) AS n_tokens,
         | CAST(len(list_distinct($TOKS)) AS BIGINT) AS n_distinct,
         | CAST(ceil(length(regexp_replace(text, '[^\\p{L}]', '', 'g')) / 4.0) AS BIGINT)
         |   + length(regexp_replace(text, '[\\p{L}\\s]', '', 'g')) AS n_subwords,
         | CAST(len(list_filter($TOKS, t -> list_contains($EN, t))) AS BIGINT) AS n_stopwords
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "p_quality_score" ->
      s"""SELECT doc_id,
         | round(
         |   least(len($TOKS) / 100.0, 1.0) * 0.5
         |   + (len(list_distinct($TOKS)) * 1.0 / len($TOKS)) * 0.3
         |   + least((len(list_filter($TOKS, t -> list_contains($EN, t))) * 1.0 / len($TOKS)) * 4.0, 1.0) * 0.2,
         |   6) AS quality
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "p_langid" ->
      s"""WITH s AS (
         | SELECT
         |  len(list_filter($TOKS, t -> list_contains($EN, t))) AS en,
         |  len(list_filter($TOKS, t -> list_contains(['der','die','und','das','ist','ein','nicht','mit','auf','zu'], t))) AS de,
         |  len(list_filter($TOKS, t -> list_contains(['le','la','et','les','des','est','une','dans','que','pour'], t))) AS fr,
         |  len(list_filter($TOKS, t -> list_contains(['el','la','que','de','los','una','es','por','con','para'], t))) AS es
         | FROM documents)
         |SELECT CASE
         |  WHEN greatest(en, de, fr, es) <= 0 THEN 'und'
         |  WHEN en = greatest(en, de, fr, es) THEN 'en'
         |  WHEN de = greatest(en, de, fr, es) THEN 'de'
         |  WHEN fr = greatest(en, de, fr, es) THEN 'fr'
         |  WHEN es = greatest(en, de, fr, es) THEN 'es'
         |  ELSE 'und' END AS lang_pred,
         | count(*) AS doc_count
         |FROM s
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,
    "p_exact_dedup" ->
      """SELECT count(*) AS total_docs,
        | count(DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS unique_texts
        |FROM documents""".stripMargin,
    "p_ngram_jaccard" -> JACCARD_PAIRS_SQL,
    "p_minhash_dedup" -> JACCARD_PAIRS_SQL,
    "p_simhash_dedup" -> JACCARD_PAIRS_SQL,
    // same LCG arithmetic as Sampling.lcgBucket; cutoffs are
    // Sampling.rateCutoff literals for en=1.0 de=0.5 fr=0.5 es=0.25 zh=0.1.
    // The trailing `+ m) % m` normalization matches Spark's pmod for
    // NEGATIVE ids too (SQL % is sign-preserving; without it every
    // negative-bucket row would pass any cutoff)
    "p_stratified_sample" ->
      """WITH s AS (
        |  SELECT lang, doc_id,
        |    ((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
        |      + 4294967296) % 4294967296 AS bucket
        |  FROM documents),
        |k AS (
        |  SELECT lang, doc_id FROM s WHERE bucket <
        |    CASE lang WHEN 'en' THEN 4294967296 WHEN 'de' THEN 2147483648
        |              WHEN 'fr' THEN 2147483648 WHEN 'es' THEN 1073741824
        |              WHEN 'zh' THEN 429496729 ELSE 0 END)
        |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    // train/val/test split on the same LCG bucket: the two interior
    // cutoffs are interpolated from Sampling.rateCutoff over the SAME
    // cumulative sums hashSplit computes (0.7, then 0.7+0.2 — NOT a
    // hand-written 0.9, whose double value differs from the sum), and the
    // final cut is the snapped-to-1 bucket bound, under which every
    // non-null id falls in split 2's ELSE branch
    "p_hash_split" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    ((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
         |      + 4294967296) % 4294967296 AS bucket
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket < ${pipeline.Sampling.rateCutoff(0.7)} THEN 0
         |         WHEN bucket < ${pipeline.Sampling.rateCutoff(0.7 + 0.2)} THEN 1
         |         ELSE 2 END AS split_idx
         |  FROM s)
         |SELECT split_idx, count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // epoch shards: portable LCG (sign-normalized mods), XOR epoch salt
    // (an additive salt would only rotate buckets — the LCG is affine),
    // high-bits shard extraction (integer // — low LCG bits cycle),
    // re-keyed within-shard sort hash. All BIGINT arithmetic; doc_id
    // reduced mod 2^32 first and XOR never overflows.
    "p_epoch_shard" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    ((doc_id % 4294967296) + 4294967296) % 4294967296 AS idm
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, idm,
        |    (((xor(idm, 0 * 2654435761) % 4294967296) * 1103515245 + 12345)
        |      % 4294967296 + 4294967296) % 4294967296 AS b0,
        |    (((xor(idm, 1 * 2654435761) % 4294967296) * 1103515245 + 12345)
        |      % 4294967296 + 4294967296) % 4294967296 AS b1
        |  FROM base)
        |SELECT doc_id,
        |  (b0 * 8) // 4294967296 AS shard_e0,
        |  ((((b0 + idm) % 4294967296) * 1103515245 + 12345)
        |    % 4294967296 + 4294967296) % 4294967296 AS key_e0,
        |  (b1 * 8) // 4294967296 AS shard_e1,
        |  ((((b1 + idm) % 4294967296) * 1103515245 + 12345)
        |    % 4294967296 + 4294967296) % 4294967296 AS key_e1
        |FROM s ORDER BY doc_id""".stripMargin,
    // temperature mix: count table -> 6dp-snapped pow weight -> DECIMAL
    // normalizer sum (order-independent) -> rate with the exact
    // (budget*q)/n association order -> integer Bernoulli threshold on
    // the fractional part via the portable sign-normalized LCG
    "p_temperature_mix" ->
      """WITH counts AS (
        |  SELECT lang AS grp, count(*) AS n_docs FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM counts),
        |wtab AS (
        |  SELECT grp, n_docs,
        |    CAST(round(power(CAST(n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE),
        |        CAST(0.3 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
        |  FROM counts, tot t),
        |ws AS (SELECT sum(w) AS w_sum FROM wtab),
        |rates AS (
        |  SELECT grp, n_docs,
        |    round((CAST(500 AS DOUBLE)
        |        * (CAST(w AS DOUBLE) / CAST(s.w_sum AS DOUBLE)))
        |      / CAST(n_docs AS DOUBLE), 6) AS rate
        |  FROM wtab, ws s)
        |SELECT d.doc_id, d.lang, r.rate,
        |  CAST(floor(r.rate) AS BIGINT)
        |  + CASE WHEN ((((d.doc_id % 4294967296) * 1103515245 + 12345)
        |        % 4294967296) + 4294967296) % 4294967296
        |      < CAST(floor((r.rate - floor(r.rate)) * 4294967296) AS BIGINT)
        |    THEN 1 ELSE 0 END AS n_copies
        |FROM documents d JOIN rates r ON d.lang = r.grp
        |ORDER BY d.doc_id""".stripMargin,
    // leakage-free split: recursive near-dup closure -> split key =
    // component (own id when unpaired) -> same LCG cutoffs as hash_split
    "p_leakage_split" ->
      s"""WITH RECURSIVE pr AS ($JACCARD_PAIRS_SQL),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pr
         |  UNION SELECT doc_b AS a, doc_a AS b FROM pr),
         |reach(src, dst) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src),
         |k AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS key
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |s AS (
         |  SELECT doc_id,
         |    ((((key % 4294967296) * 1103515245 + 12345) % 4294967296)
         |      + 4294967296) % 4294967296 AS bucket
         |  FROM k),
         |b AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket < ${pipeline.Sampling.rateCutoff(0.7)} THEN 0
         |         WHEN bucket < ${pipeline.Sampling.rateCutoff(0.7 + 0.2)} THEN 1
         |         ELSE 2 END AS split_idx
         |  FROM s)
         |SELECT split_idx, count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // incremental dedup: drop a batch doc (doc_id % 3 = 0) iff a
    // preceding doc — corpus doc, or batch doc with smaller id — has
    // exact trigram Jaccard >= 0.5 with it; survivors in id order.
    // The artifact variant runs the precomputed-banding path against the
    // SAME oracle: identical survivors are exactly the claim being gated.
    "p_dedup_incremental" -> INCREMENTAL_DEDUP_SQL,
    "p_dedup_incr_artifact" -> INCREMENTAL_DEDUP_SQL,
    // composed daily pipeline: incremental-dedup survivors (same rule as
    // INCREMENTAL_DEDUP_SQL) -> LCG train/val/test split (same cutoff
    // literals as p_hash_split) -> per-split count / id checksum / exact
    // token sum; VALUES(0..2) left join keeps empty splits as rows, like
    // Spark's global agg does
    "p_daily_pipeline" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents),
         |shing AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |         ELSE array_to_string(t, ' ') END AS s
         |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 2))) AS i)),
         |dsh AS (SELECT DISTINCT doc_id, s FROM shing),
         |sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
         |  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT ia, ib FROM inter
         |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
         |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
         |ranked AS (
         |  SELECT doc_id, CASE WHEN doc_id % 3 <> 0 THEN 0 ELSE 1 END AS rk FROM documents),
         |victims AS (
         |  SELECT DISTINCT p.ib AS doc_id
         |  FROM pairs p JOIN ranked ra ON p.ia = ra.doc_id JOIN ranked rb ON p.ib = rb.doc_id
         |  WHERE rb.rk = 1 AND (ra.rk < rb.rk OR (ra.rk = rb.rk AND p.ia < p.ib))),
         |surv AS (
         |  SELECT d.doc_id, d.text FROM documents d
         |  WHERE d.doc_id % 3 = 0 AND d.doc_id NOT IN (SELECT doc_id FROM victims)),
         |bkt AS (
         |  SELECT doc_id, text,
         |    ((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
         |      + 4294967296) % 4294967296 AS bucket
         |  FROM surv),
         |spl AS (
         |  SELECT doc_id, text,
         |    CASE WHEN bucket < ${pipeline.Sampling.rateCutoff(0.7)} THEN 0
         |         WHEN bucket < ${pipeline.Sampling.rateCutoff(0.7 + 0.2)} THEN 1
         |         ELSE 2 END AS split_idx
         |  FROM bkt),
         |agg AS (
         |  SELECT split_idx, count(*) AS n_docs, sum(doc_id) AS id_sum,
         |    sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS n_tokens
         |  FROM spl GROUP BY 1)
         |SELECT g.split_idx, coalesce(n_docs, 0) AS n_docs,
         |  CAST(id_sum AS BIGINT) AS id_sum, CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM (VALUES (0), (1), (2)) g(split_idx) LEFT JOIN agg USING (split_idx)
         |ORDER BY g.split_idx""".stripMargin,
    // mixture balancing: per-source token totals -> identical double
    // rate arithmetic -> truncated 2^32 cutoff -> LCG keep filter
    "p_data_mixture" ->
      """WITH tc AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(lower(trim(text)), '\s+')) AS ntok
        |  FROM documents),
        |totals AS (SELECT source, CAST(sum(ntok) AS DOUBLE) AS tok FROM tc GROUP BY 1),
        |rates AS (
        |  SELECT source,
        |    CASE source
        |      WHEN 'src0' THEN least(1.0, (0.25 * 4000.0) / tok)
        |      WHEN 'src1' THEN least(1.0, (0.25 * 4000.0) / tok)
        |      WHEN 'src2' THEN least(1.0, (0.25 * 4000.0) / tok)
        |      WHEN 'src3' THEN least(1.0, (0.125 * 4000.0) / tok)
        |      WHEN 'src4' THEN least(1.0, (0.125 * 4000.0) / tok)
        |      ELSE 0.0 END AS rate
        |  FROM totals),
        |kept AS (
        |  SELECT tc.* FROM tc JOIN rates USING (source)
        |  WHERE ((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
        |          + 4294967296) % 4294967296
        |        < CAST(floor(rate * 4294967296.0) AS BIGINT))
        |SELECT source, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,
    // max-min-fair waterfill: weighted demands, prefix-closed
    // cross-multiplied saturation test, div/mod residual split with the
    // leftover going to the largest demands — all-integer
    "p_token_budget" ->
      s"""WITH d AS (
         |  SELECT source,
         |    CAST(sum(len($TOKS) *
         |      (1 + (CAST(substr(source, 4, 10) AS BIGINT) % 7)
         |         * (CAST(substr(source, 4, 10) AS BIGINT) % 7))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY source),
         |b AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) * 2 // 5 AS budget,
         |    CAST(count(*) AS BIGINT) AS m
         |  FROM d),
         |o AS (
         |  SELECT source, n_tokens,
         |    CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS idx,
         |    CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
         |  FROM d),
         |sat AS (
         |  SELECT o.*, b.budget, b.m,
         |    CAST(CASE WHEN n_tokens * (m - idx + 1) <= budget - (prefix - n_tokens)
         |      THEN 1 ELSE 0 END AS BIGINT) AS saturated
         |  FROM o, b),
         |agg AS (
         |  SELECT CAST(sum(saturated) AS BIGINT) AS s,
         |    CAST(coalesce(sum(CASE WHEN saturated = 1 THEN n_tokens END), 0)
         |      AS BIGINT) AS ps
         |  FROM sat)
         |SELECT source, n_tokens,
         |  CAST(CASE WHEN saturated = 1 THEN n_tokens
         |    ELSE (budget - ps) // (m - s)
         |      + (CASE WHEN idx > m - ((budget - ps) % (m - s)) THEN 1 ELSE 0 END)
         |    END AS BIGINT) AS alloc,
         |  saturated
         |FROM sat, agg ORDER BY source""".stripMargin,
    // sliding-window chunking: window starts + list slices re-derived
    // over the same normalized token array (48-token windows, stride 32)
    "p_doc_chunks" ->
      s"""WITH toks AS (SELECT doc_id, $TOKS AS t FROM documents),
         |n AS (
         |  SELECT doc_id, t,
         |    greatest(CAST(ceil((len(t) - 48) / 32.0) AS INT) + 1, 1) AS nc
         |  FROM toks),
         |c AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
         |    array_to_string(t[i*32+1 : i*32+48], ' ') AS chunk_text,
         |    CAST(len(t[i*32+1 : i*32+48]) AS BIGINT) AS n_tokens
         |  FROM n, LATERAL (SELECT unnest(range(0, nc)) AS i))
         |SELECT doc_id, chunk_id, chunk_text, n_tokens FROM c
         |ORDER BY doc_id, chunk_id""".stripMargin,
    // sequence packing: LCG stream hash, per-stream running sum with one
    // EOS token per doc, floor-division sequence indices — all integer
    "p_seq_pack" ->
      s"""WITH tc AS (
         |  SELECT doc_id,
         |    CAST((((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
         |          + 4294967296) % 4294967296) % 4 AS BIGINT) AS stream,
         |    CAST(len($TOKS) AS BIGINT) AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, stream, n_tokens,
         |    CAST(coalesce(sum(n_tokens + 1) OVER (
         |      PARTITION BY stream ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_off
         |  FROM tc)
         |SELECT doc_id, stream, n_tokens, start_off,
         |  CAST(floor(start_off / 64) AS BIGINT) AS first_seq,
         |  CAST(floor((start_off + n_tokens - 1) / 64) AS BIGINT) AS last_seq
         |FROM o ORDER BY doc_id""".stripMargin,
    // cluster-balanced sampling: raw min-id centroid assignment, cluster
    // sizing, double rate arithmetic, truncated cutoff, LCG keep filter
    "p_cluster_sample" ->
      """WITH c0 AS (
        |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |d1 AS (
        |  SELECT p.vec_id, cid,
        |    list_sum(list_transform(range(1, len(v)+1),
        |      i -> (v[i]-cv[i])*(v[i]-cv[i]))) AS d2
        |  FROM p, c0),
        |a1 AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM d1),
        |asg AS (SELECT vec_id, cid AS cluster FROM a1 WHERE rn = 1),
        |sz AS (SELECT cluster, count(*) AS n FROM asg GROUP BY 1),
        |rates AS (
        |  SELECT cluster,
        |    CAST(floor(least(1.0, 60.0 / n) * 4294967296.0) AS BIGINT) AS cutoff
        |  FROM sz),
        |kept AS (
        |  SELECT asg.vec_id, asg.cluster
        |  FROM asg JOIN rates USING (cluster)
        |  WHERE ((((vec_id % 4294967296) * 1103515245 + 12345) % 4294967296)
        |          + 4294967296) % 4294967296 < cutoff)
        |SELECT CAST(cluster AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(vec_id) AS BIGINT) AS id_sum
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,
    // SemDeDup: min-id centroid assignment over the dup-augmented base,
    // within-cluster pair scan, exists-smaller-id prune rule — cosine
    // re-derived with the same left-fold dot product (bit-exact IEEE)
    "p_semdedup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 1.1)
        |  FROM embeddings WHERE vec_id % 25 = 0
        |  UNION ALL
        |  SELECT vec_id + 2000000, embedding::DOUBLE[]
        |  FROM embeddings WHERE vec_id % 40 = 0),
        |c0 AS (
        |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |d1 AS (
        |  SELECT base.vec_id, v, cid,
        |    list_sum(list_transform(range(1, len(v)+1),
        |      i -> (v[i]-cv[i])*(v[i]-cv[i]))) AS d2
        |  FROM base, c0),
        |a1 AS (
        |  SELECT vec_id, v, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM d1),
        |asg AS (SELECT vec_id, v, cid AS cluster FROM a1 WHERE rn = 1),
        |dup AS (
        |  SELECT DISTINCT a.vec_id
        |  FROM asg a JOIN asg b
        |    ON a.cluster = b.cluster AND b.vec_id < a.vec_id
        |   AND list_dot_product(a.v, b.v) /
        |       (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |       >= 0.95)
        |SELECT asg.vec_id, CAST(cluster AS INT) AS cluster,
        |  CAST(CASE WHEN dup.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_semdup
        |FROM asg LEFT JOIN dup USING (vec_id)
        |ORDER BY asg.vec_id""".stripMargin,
    // per-source health profile: quality formula + distinct normalized
    // texts re-derived (Spark counts distinct 64-bit fingerprints)
    "p_source_stats" ->
      s"""WITH enr AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 7 = 3
         |      THEN 'the shared boilerplate page that is in every crawl of it'
         |      ELSE text END AS text
         |  FROM documents),
         |toks AS (SELECT doc_id, source, text, $TOKS AS tk FROM enr),
         |s AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(tk)) AS BIGINT) AS n_tokens,
         |    round(avg(round(least(len(tk) / 100.0, 1.0) * 0.5
         |      + (len(list_distinct(tk)) * 1.0 / len(tk)) * 0.3
         |      + least((len(list_filter(tk, t -> list_contains($EN, t)))
         |               * 1.0 / len(tk)) * 4.0, 1.0) * 0.2, 6)), 6) AS mean_quality,
         |    CAST(count(DISTINCT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
         |      AS BIGINT) AS n_distinct
         |  FROM toks GROUP BY 1)
         |SELECT source, n_docs, n_tokens, mean_quality, n_distinct,
         |  round(1.0 - n_distinct / (n_docs * 1.0), 6) AS dup_ratio
         |FROM s ORDER BY source""".stripMargin,
    // exact per-source token-length quantiles: (n-1)*p interpolation on
    // both engines, integer inputs
    "p_source_quantiles" ->
      s"""WITH tc AS (
         |  SELECT source, CAST(len($TOKS) AS BIGINT) AS nt FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(quantile_cont(nt, 0.5), 6) AS p50,
         |  round(quantile_cont(nt, 0.9), 6) AS p90,
         |  round(quantile_cont(nt, 0.99), 6) AS p99
         |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    // per-doc trigram novelty: distinct shingles (whole-text fallback
    // below 3 tokens, matching TextFunctions.shingles), first occurrence
    // = min doc_id per shingle; null-text docs keep a 0/0 row
    "p_novelty" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $TOKS AS t FROM documents WHERE text IS NOT NULL),
         |g AS (
         |  SELECT DISTINCT doc_id,
         |    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |         ELSE array_to_string(t, ' ') END AS s
         |  FROM toks, LATERAL (SELECT unnest(range(1,
         |    CASE WHEN len(t) >= 3 THEN len(t) - 1 ELSE 2 END)) AS i)),
         |f AS (SELECT s, min(doc_id) AS first_id FROM g GROUP BY s),
         |n AS (
         |  SELECT g.doc_id, count(*) AS n_grams,
         |    sum(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END) AS n_novel
         |  FROM g JOIN f USING (s) GROUP BY g.doc_id)
         |SELECT d.doc_id, CAST(coalesce(n.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel
         |FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // incremental novelty == full-corpus novelty restricted to batch
    // docs (corpus ids all precede batch ids): the oracle is the full
    // recompute, pinning the artifact path's contract
    "p_novelty_incr" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $TOKS AS t FROM documents WHERE text IS NOT NULL),
         |g AS (
         |  SELECT DISTINCT doc_id,
         |    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |         ELSE array_to_string(t, ' ') END AS s
         |  FROM toks, LATERAL (SELECT unnest(range(1,
         |    CASE WHEN len(t) >= 3 THEN len(t) - 1 ELSE 2 END)) AS i)),
         |f AS (SELECT s, min(doc_id) AS first_id FROM g GROUP BY s),
         |n AS (
         |  SELECT g.doc_id, count(*) AS n_grams,
         |    sum(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END) AS n_novel
         |  FROM g JOIN f USING (s) GROUP BY g.doc_id)
         |SELECT d.doc_id, CAST(coalesce(n.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel
         |FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id
         |WHERE d.doc_id >= 250
         |ORDER BY d.doc_id""".stripMargin,
    // range sharding: exact (n-1)*p percentile boundaries over integer
    // token counts, shard = count of boundaries strictly below the key
    "p_range_shard" ->
      s"""WITH tc AS (
         |  SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS nt FROM documents),
         |b AS (SELECT quantile_cont(nt,
         |  [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS qs FROM tc),
         |s AS (SELECT nt, len(list_filter(qs, x -> nt > x)) AS shard_id
         |  FROM tc, b)
         |SELECT CAST(shard_id AS BIGINT) AS shard_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  min(nt) AS min_key, max(nt) AS max_key
         |FROM s GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    // BPE merge APPLICATION: the merge list mirrors the impl's exact
    // selection RULE — rank ALL pairs, keep the global top-30, THEN
    // filter to letter pairs and take the first 8 in rank order (r12's
    // oracle ranked within letter pairs over all pairs, which only
    // happened to agree on this corpus) — applied as the identical
    // nested-replace chain (placeholders chr(0xE000+rank)); chr(1)
    // sentinels no-op the unused slots if fewer than 8 letter pairs
    // survive the top-30 cut
    "p_bpe_encode" ->
      s"""$BPE_ENCODE_CTE
         |SELECT d.doc_id,
         |  CAST(coalesce(e.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(e.n_chars, 0) AS BIGINT) AS n_chars,
         |  CAST(coalesce(e.n_pieces, 0) AS BIGINT) AS n_pieces
         |FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // tokenizer-aware sequence packing: the SAME learned-merge encode
    // chain produces per-doc piece counts, which then feed the seq-pack
    // arithmetic (LCG stream hash, running sum with one EOS per doc,
    // floor-division sequence indices) — widths in learned-token space,
    // null for null-text docs (zero stream width, null coordinates)
    "p_bpe_pack" ->
      s"""$BPE_ENCODE_CTE,
         |wd AS (
         |  SELECT d.doc_id, e.n_pieces
         |  FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id),
         |tc AS (
         |  SELECT doc_id,
         |    CAST((((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
         |          + 4294967296) % 4294967296) % 4 AS BIGINT) AS stream,
         |    CAST(n_pieces AS BIGINT) AS n_pieces
         |  FROM wd),
         |o AS (
         |  SELECT doc_id, stream, n_pieces,
         |    CAST(coalesce(sum(n_pieces + 1) OVER (
         |      PARTITION BY stream ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_off
         |  FROM tc)
         |SELECT doc_id, stream, n_pieces, start_off,
         |  CAST(floor(start_off / 64) AS BIGINT) AS first_seq,
         |  CAST(floor((start_off + n_pieces - 1) / 64) AS BIGINT) AS last_seq
         |FROM o ORDER BY doc_id""".stripMargin,
    // iterative BPE training: the full 6-round learn->apply->re-learn
    // chain re-run in SQL (see BPE_TRAIN_SQL's scaladoc)
    "p_bpe_train" -> BPE_TRAIN_SQL,
    // z-order keys: the 16-bit Morton interleave re-derived bit for bit
    // (generated OR chain), then the gated percentile range-shard rule
    // over the keys; null text -> null key/shard on both sides
    "p_zorder" -> {
      val interleave = (0 until 16).map(i =>
        s"(((tn >> $i) & 1) << ${2 * i}) | (((nc >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH k AS (
         |  SELECT doc_id,
         |    CAST(len($TOKS) AS BIGINT) AS tn,
         |    CAST(n_chars AS BIGINT) AS nc
         |  FROM documents),
         |z AS (SELECT doc_id, CAST($interleave AS BIGINT) AS zkey FROM k),
         |b AS (SELECT quantile_cont(zkey::DOUBLE,
         |  [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS qs
         |  FROM z WHERE zkey IS NOT NULL),
         |s AS (
         |  SELECT doc_id, zkey,
         |    CASE WHEN zkey IS NULL THEN NULL
         |      ELSE CAST(len(list_filter(qs, x -> zkey > x)) AS BIGINT) END AS shard_id
         |  FROM z, b)
         |SELECT doc_id, zkey, shard_id FROM s ORDER BY doc_id""".stripMargin
    },
    // paragraph-level language mixture: enrichment CASE, blank-line
    // split, whitespace-removal emptiness filter, per-paragraph
    // stopword-argmax langid, (count desc, lang asc) majority, exact
    // micro share, 0/0/'und'/0 rows for null text
    "p_lang_mixture" ->
      s"""WITH enr AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 4 = 1 THEN text || chr(10) || chr(10) ||
         |           'der die und das ist ein nicht mit auf zu'
         |         WHEN doc_id % 4 = 2 THEN text || chr(10) || chr(10) ||
         |           'le la et les des est une dans que pour' || chr(10) || chr(10) ||
         |           'el la que de los una es por con para' || chr(10) || chr(10) || '   '
         |         ELSE text END AS text
         |  FROM documents),
         |p0 AS (
         |  SELECT doc_id, unnest(string_split(text, chr(10) || chr(10))) AS para
         |  FROM enr),
         |p1 AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(para)), '\\s+') AS ptk
         |  FROM p0 WHERE regexp_replace(para, '\\s+', '', 'g') <> ''),
         |sc AS (
         |  SELECT doc_id,
         |    len(list_filter(ptk, t -> list_contains($EN, t))) AS en,
         |    len(list_filter(ptk, t -> list_contains(['der','die','und','das','ist','ein','nicht','mit','auf','zu'], t))) AS de,
         |    len(list_filter(ptk, t -> list_contains(['le','la','et','les','des','est','une','dans','que','pour'], t))) AS fr,
         |    len(list_filter(ptk, t -> list_contains(['el','la','que','de','los','una','es','por','con','para'], t))) AS es
         |  FROM p1),
         |pl AS (
         |  SELECT doc_id, CASE
         |    WHEN greatest(en, de, fr, es) <= 0 THEN 'und'
         |    WHEN en = greatest(en, de, fr, es) THEN 'en'
         |    WHEN de = greatest(en, de, fr, es) THEN 'de'
         |    WHEN fr = greatest(en, de, fr, es) THEN 'fr'
         |    WHEN es = greatest(en, de, fr, es) THEN 'es'
         |    ELSE 'und' END AS plang
         |  FROM sc),
         |c AS (
         |  SELECT doc_id, plang, CAST(count(*) AS BIGINT) AS c
         |  FROM pl GROUP BY 1, 2),
         |d AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_paras,
         |    CAST(count(*) AS BIGINT) AS n_langs
         |  FROM c GROUP BY 1),
         |mj AS (
         |  SELECT doc_id, plang, c FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY c DESC, plang) AS rn FROM c)
         |  WHERE rn = 1)
         |SELECT doc.doc_id,
         |  CAST(coalesce(d.n_paras, 0) AS BIGINT) AS n_paras,
         |  CAST(coalesce(d.n_langs, 0) AS BIGINT) AS n_langs,
         |  coalesce(mj.plang, 'und') AS major_lang,
         |  CAST(coalesce(
         |    floor(CAST(mj.c AS DOUBLE) * 1000000 / d.n_paras + 0.5), 0) AS BIGINT)
         |    AS major_frac_micro
         |FROM documents doc
         |LEFT JOIN d ON doc.doc_id = d.doc_id
         |LEFT JOIN mj ON doc.doc_id = mj.doc_id
         |ORDER BY doc.doc_id""".stripMargin,
    // Zipf diagnostics: naive global row_number rank (pinning the
    // impl's histogram-cumulative rank equals the total order), snapped
    // ln micro-integers, INTEGER regression sums, fixed-op-order
    // closed-form slope/intercept/R2, floor-half-up micro snaps
    "p_zipf" ->
      s"""WITH v AS (
         |  SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest($TOKS) AS t FROM documents) GROUP BY 1),
         |r AS (
         |  SELECT word, freq,
         |    CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT) AS rnk
         |  FROM v),
         |t AS (
         |  SELECT rnk, freq,
         |    CAST(floor(round(ln(CAST(rnk AS DOUBLE)), 6)
         |      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS xm,
         |    CAST(floor(round(ln(CAST(freq AS DOUBLE)), 6)
         |      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS ym
         |  FROM r),
         |a AS (
         |  SELECT
         |    CAST(count(*) AS BIGINT) AS n_vocab,
         |    CAST(sum(freq) AS BIGINT) AS total_tokens,
         |    CAST(sum(CASE WHEN rnk <= 10 THEN freq ELSE 0 END) AS BIGINT) AS h10,
         |    CAST(sum(CASE WHEN rnk <= 100 THEN freq ELSE 0 END) AS BIGINT) AS h100,
         |    CAST(sum(CASE WHEN rnk <= 1000 THEN freq ELSE 0 END) AS BIGINT) AS h1000,
         |    CAST(sum(CASE WHEN rnk <= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN rnk <= 500 THEN xm ELSE 0 END) AS BIGINT) AS sx,
         |    CAST(sum(CASE WHEN rnk <= 500 THEN ym ELSE 0 END) AS BIGINT) AS sy,
         |    CAST(sum(CASE WHEN rnk <= 500 THEN xm * ym ELSE 0 END) AS BIGINT) AS sxy,
         |    CAST(sum(CASE WHEN rnk <= 500 THEN xm * xm ELSE 0 END) AS BIGINT) AS sxx,
         |    CAST(sum(CASE WHEN rnk <= 500 THEN ym * ym ELSE 0 END) AS BIGINT) AS syy
         |  FROM t),
         |f AS (
         |  SELECT *,
         |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS num,
         |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS denx,
         |    CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS deny
         |  FROM a),
         |g AS (
         |  SELECT *,
         |    CASE WHEN denx = 0 THEN CAST(0 AS DOUBLE) ELSE num / denx END AS slope
         |  FROM f)
         |SELECT metric, value FROM (
         |  SELECT 'n_vocab' AS metric, n_vocab AS value FROM g
         |  UNION ALL SELECT 'total_tokens', total_tokens FROM g
         |  UNION ALL SELECT 'zipf_n', n FROM g
         |  UNION ALL SELECT 'zipf_slope_micro',
         |    CAST(floor(slope * 1000000 + 0.5) AS BIGINT) FROM g
         |  UNION ALL SELECT 'zipf_intercept_micro',
         |    CAST(floor(((sy - slope * sx) / (n * CAST(1000000 AS DOUBLE)))
         |      * 1000000 + 0.5) AS BIGINT) FROM g
         |  UNION ALL SELECT 'zipf_r2_micro',
         |    CAST(floor(CASE WHEN denx = 0 OR deny = 0 THEN CAST(0 AS DOUBLE)
         |      ELSE (num * num) / (denx * deny) END * 1000000 + 0.5) AS BIGINT) FROM g
         |  UNION ALL SELECT 'cov_10',
         |    CAST(floor(CAST(h10 AS DOUBLE) * 1000000 / total_tokens + 0.5) AS BIGINT) FROM g
         |  UNION ALL SELECT 'cov_100',
         |    CAST(floor(CAST(h100 AS DOUBLE) * 1000000 / total_tokens + 0.5) AS BIGINT) FROM g
         |  UNION ALL SELECT 'cov_1000',
         |    CAST(floor(CAST(h1000 AS DOUBLE) * 1000000 / total_tokens + 0.5) AS BIGINT) FROM g)
         |ORDER BY metric""".stripMargin,
    // winnowing (MOSS local fingerprints, k=3 w=4): codepoint-FNV gram
    // hashes, per-window min with the rightmost tie rule, distinct
    // selections — each doc's fingerprint SET pinned by count / sum /
    // bit_xor / position sum, all integer-exact BIGINT arithmetic
    "p_winnow" ->
      s"""WITH toksw AS (
         |  SELECT doc_id, $TOKS AS t FROM documents WHERE text IS NOT NULL),
         |gr AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS gpos,
         |    list_reduce(
         |      list_prepend(CAST(2166136261 AS BIGINT),
         |        list_transform(range(1, length(gs)+1),
         |          c -> CAST(unicode(substr(gs, CAST(c AS INT), 1)) AS BIGINT))),
         |      (acc, cp) -> (xor(acc, cp) * 16777619) % 4294967296) AS h
         |  FROM (
         |    SELECT doc_id, i,
         |      array_to_string(t[CAST(i+1 AS INT):CAST(i+3 AS INT)], ' ') AS gs
         |    FROM toksw, LATERAL (SELECT unnest(range(0, greatest(len(t) - 2, 0))) AS i)
         |  )),
         |gl AS (SELECT doc_id, count(*) AS ng FROM gr GROUP BY 1),
         |wins AS (
         |  SELECT doc_id, CAST(unnest(range(0, greatest(ng - 3, 1))) AS BIGINT) AS s
         |  FROM gl WHERE ng >= 1),
         |wm AS (
         |  SELECT w.doc_id, w.s, min(g.h) AS mh
         |  FROM wins w JOIN gr g
         |    ON g.doc_id = w.doc_id AND g.gpos BETWEEN w.s AND w.s + 3
         |  GROUP BY 1, 2),
         |sel AS (
         |  SELECT w.doc_id, max(g.gpos) AS pos, w.mh AS fp
         |  FROM wm w JOIN gr g
         |    ON g.doc_id = w.doc_id AND g.h = w.mh
         |    AND g.gpos BETWEEN w.s AND w.s + 3
         |  GROUP BY w.doc_id, w.s, w.mh),
         |ds AS (SELECT DISTINCT doc_id, pos, fp FROM sel),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
         |    CAST(sum(fp) AS BIGINT) AS fp_sum,
         |    CAST(bit_xor(fp) AS BIGINT) AS fp_xor,
         |    CAST(sum(pos) AS BIGINT) AS pos_sum
         |  FROM ds GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_fp, 0) AS BIGINT) AS n_fp,
         |  CAST(coalesce(a.fp_sum, 0) AS BIGINT) AS fp_sum,
         |  CAST(coalesce(a.fp_xor, 0) AS BIGINT) AS fp_xor,
         |  CAST(coalesce(a.pos_sum, 0) AS BIGINT) AS pos_sum
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // winnowing partial-copy pairs: the p_winnow CTE chain over the
    // enriched corpus (boilerplate on even ids — df-guard prey; a shared
    // 12-token passage on %37==5 — genuine copies), then ALL-PAIRS
    // fingerprint-set intersections with the df>50 guard. Equality with
    // the impl's inverted-index join proves the pair proposal exhaustive.
    "p_winnow_pairs" ->
      s"""WITH enr AS (
         |  SELECT doc_id,
         |    coalesce(text, '')
         |      || CASE WHEN doc_id % 2 = 0
         |           THEN ' subscribe to our newsletter for daily updates and offers today'
         |           ELSE '' END
         |      || CASE WHEN doc_id % 37 = 5
         |           THEN ' the quick brown fox jumps over the lazy dog near the river bank'
         |           ELSE '' END AS text
         |  FROM documents),
         |toksw AS (
         |  SELECT doc_id, $TOKS AS t FROM enr WHERE len($TOKS) >= 5),
         |gr AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS gpos,
         |    list_reduce(
         |      list_prepend(CAST(2166136261 AS BIGINT),
         |        list_transform(range(1, length(gs)+1),
         |          c -> CAST(unicode(substr(gs, CAST(c AS INT), 1)) AS BIGINT))),
         |      (acc, cp) -> (xor(acc, cp) * 16777619) % 4294967296) AS h
         |  FROM (
         |    SELECT doc_id, i,
         |      array_to_string(t[CAST(i+1 AS INT):CAST(i+5 AS INT)], ' ') AS gs
         |    FROM toksw, LATERAL (SELECT unnest(range(0, greatest(len(t) - 4, 0))) AS i)
         |  )),
         |gl AS (SELECT doc_id, count(*) AS ng FROM gr GROUP BY 1),
         |wins AS (
         |  SELECT doc_id, CAST(unnest(range(0, greatest(ng - 3, 1))) AS BIGINT) AS s
         |  FROM gl WHERE ng >= 1),
         |wm AS (
         |  SELECT w.doc_id, w.s, min(g.h) AS mh
         |  FROM wins w JOIN gr g
         |    ON g.doc_id = w.doc_id AND g.gpos BETWEEN w.s AND w.s + 3
         |  GROUP BY 1, 2),
         |fpset AS (SELECT DISTINCT doc_id, mh AS fp FROM wm),
         |dfreq AS (SELECT fp, count(*) AS df FROM fpset GROUP BY 1),
         |kept AS (
         |  SELECT f.doc_id, f.fp FROM fpset f JOIN dfreq d USING (fp)
         |  WHERE d.df <= 50)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 2
         |ORDER BY doc_a, doc_b""".stripMargin,
    // BPE merge candidates: vocabulary collapse, adjacent char pairs
    // weighted by word frequency, total-ordered top 30
    "p_bpe_pairs" ->
      s"""WITH w AS (
         |  SELECT t AS word, count(*) AS wc
         |  FROM (SELECT unnest($TOKS) AS t FROM documents)
         |  GROUP BY 1),
         |p AS (
         |  SELECT substr(word, CAST(i AS INT), 2) AS pair, sum(wc) AS n
         |  FROM w, LATERAL (SELECT unnest(range(1, len(word))) AS i)
         |  WHERE len(word) >= 2 GROUP BY 1),
         |r AS (
         |  SELECT pair, CAST(n AS BIGINT) AS n,
         |    row_number() OVER (ORDER BY n DESC, pair) AS rnk
         |  FROM p)
         |SELECT pair, n, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 30
         |ORDER BY rnk""".stripMargin,
    // source filter: aggregate thresholds then per-source membership
    "p_source_filter" ->
      s"""WITH enr AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 7 = 3
         |      THEN 'the shared boilerplate page that is in every crawl of it'
         |      ELSE text END AS text
         |  FROM documents),
         |toks AS (SELECT doc_id, source, text, $TOKS AS tk FROM enr),
         |s AS (
         |  SELECT source, count(*) AS n_docs,
         |    round(avg(round(least(len(tk) / 100.0, 1.0) * 0.5
         |      + (len(list_distinct(tk)) * 1.0 / len(tk)) * 0.3
         |      + least((len(list_filter(tk, t -> list_contains($EN, t)))
         |               * 1.0 / len(tk)) * 4.0, 1.0) * 0.2, 6)), 6) AS mean_quality,
         |    count(DISTINCT lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_distinct
         |  FROM toks GROUP BY 1),
         |pass AS (
         |  SELECT source FROM s
         |  WHERE mean_quality >= 0.49
         |    AND round(1.0 - n_distinct / (n_docs * 1.0), 6) <= 0.10
         |    AND n_docs >= 10)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM enr SEMI JOIN pass USING (source)
         |GROUP BY source ORDER BY source""".stripMargin,
    // k-means: min-id init, one Lloyd round, 6dp-rounded centroids,
    // final argmin re-derived with the same left-fold squared distance
    "p_kmeans" ->
      """WITH c0 AS (
        |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |d1 AS (
        |  SELECT p.vec_id, v, cid,
        |    list_sum(list_transform(range(1, len(v)+1),
        |      i -> (v[i]-cv[i])*(v[i]-cv[i]))) AS d2
        |  FROM p, c0),
        |a1 AS (
        |  SELECT vec_id, v, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM d1),
        |asg1 AS (SELECT vec_id, v, cid AS cluster FROM a1 WHERE rn = 1),
        |dims AS (
        |  SELECT cluster, dim, avg(v[dim]) AS m
        |  FROM asg1, LATERAL (SELECT unnest(range(1, 65)) AS dim) i(dim)
        |  GROUP BY cluster, dim),
        |c1 AS (
        |  SELECT cluster AS cid, list(round(m, 6) ORDER BY dim) AS cv
        |  FROM dims GROUP BY cluster),
        |dd AS (
        |  SELECT p.vec_id, cid,
        |    list_sum(list_transform(range(1, len(v)+1),
        |      i -> (v[i]-cv[i])*(v[i]-cv[i]))) AS d2
        |  FROM p, c1),
        |a2 AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM dd)
        |SELECT vec_id, CAST(cid AS INT) AS cluster FROM a2 WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,
    // paragraph dedup: synthesized 6-token paragraphs, first-occurrence
    // ranking, reassembly with blank-line separators — all re-derived
    "p_paragraph_dedup" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 17 = 0 THEN text || ' zero one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo twentythree'
         |         ELSE text END AS text
         |  FROM documents),
         |t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM aug),
         |paras AS (
         |  SELECT doc_id, CAST(i AS INT) AS pos,
         |    array_to_string(tk[i*6+1 : i*6+6], ' ') AS para
         |  FROM t, LATERAL (SELECT unnest(range(0,
         |    greatest(CAST(ceil(len(tk) / 6.0) AS INT), 1))) AS i)),
         |nz AS (SELECT * FROM paras WHERE trim(para) != ''),
         |r AS (
         |  SELECT doc_id, pos, para,
         |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
         |  FROM nz),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
         |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    string_agg(CASE WHEN rn = 1 THEN para END, chr(10) || chr(10)
         |               ORDER BY pos) AS text
         |  FROM r GROUP BY doc_id)
         |SELECT doc_id, text, n_paras, n_kept FROM agg
         |WHERE n_kept > 0 ORDER BY doc_id""".stripMargin,
    // boilerplate line removal: 8-token line wrap + keyed injection,
    // distinct-doc line frequency, >= 60 threshold, strip-everywhere
    // reassembly — all re-derived on the normalized line strings (Spark
    // keys the same normalized lines by xxhash64)
    "p_boilerplate_removal" ->
      s"""WITH base AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |body AS (
         |  SELECT doc_id,
         |    array_to_string(list_transform(
         |      range(0, greatest(CAST(ceil(len(tk) / 8.0) AS INT), 1)),
         |      i -> array_to_string(tk[i*8+1 : i*8+8], ' ')), chr(10)) AS b
         |  FROM base),
         |enr AS (
         |  SELECT doc_id,
         |    (CASE WHEN doc_id % 5 = 1 THEN 'subscribe to our newsletter for updates click here now' || chr(10) ELSE '' END)
         |    || b
         |    || (CASE WHEN doc_id % 7 = 2 THEN chr(10) || 'subscribe to our newsletter for updates click here now' ELSE '' END)
         |    || (CASE WHEN doc_id % 11 = 3 THEN chr(10) || 'copyright twenty twenty five all rights reserved worldwide' ELSE '' END)
         |    AS text
         |  FROM body),
         |lines AS (
         |  SELECT doc_id, CAST(i AS INT) AS pos, la[i] AS ln
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS la FROM enr),
         |    LATERAL (SELECT unnest(range(1, len(la)+1)) AS i)),
         |norm AS (
         |  SELECT doc_id, pos, ln,
         |    lower(trim(regexp_replace(ln, '\\s+', ' ', 'g'))) AS nm
         |  FROM lines),
         |rem AS (
         |  SELECT nm FROM norm WHERE nm != ''
         |  GROUP BY nm HAVING count(DISTINCT doc_id) >= 60),
         |flag AS (
         |  SELECT n.doc_id, n.pos, n.ln, n.nm,
         |    (n.nm != '' AND r.nm IS NOT NULL) AS kill
         |  FROM norm n LEFT JOIN rem r USING (nm)),
         |agg AS (
         |  SELECT doc_id,
         |    coalesce(string_agg(CASE WHEN NOT kill THEN ln END, chr(10)
         |      ORDER BY pos), '') AS text,
         |    CAST(sum(CASE WHEN nm != '' THEN 1 ELSE 0 END) AS BIGINT) AS n_lines,
         |    CAST(sum(CASE WHEN kill THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
         |  FROM flag GROUP BY doc_id)
         |SELECT doc_id, text, n_lines, n_removed FROM agg
         |ORDER BY doc_id""".stripMargin,
    // URL dedup: six synthesized raw-URL variants, the full
    // canonicalization regex chain (fragment, authority lowercase, www,
    // default port, tracking params, trailing slash), min-id survivors —
    // re-derived step for step (RE2 patterns, engine-local group syntax)
    "p_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 6
        |      WHEN 0 THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id % 25 AS VARCHAR)
        |      WHEN 1 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.COM/doc/' || CAST(doc_id % 25 AS VARCHAR)
        |      WHEN 2 THEN 'https://www.' || source || '.example.com/doc/' || CAST(doc_id % 25 AS VARCHAR)
        |      WHEN 3 THEN 'https://' || source || '.example.com:443/doc/' || CAST(doc_id % 25 AS VARCHAR)
        |      WHEN 4 THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id % 25 AS VARCHAR) || '/?utm_source=rss&utm_medium=feed'
        |      ELSE 'https://' || source || '.example.com/doc/' || CAST(doc_id % 25 AS VARCHAR) || '?ref=1&gclid=abc123#frag'
        |    END AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS u FROM u),
        |c2 AS (SELECT doc_id,
        |    lower(coalesce(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0), ''))
        |    || substr(u, length(coalesce(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0), '')) + 1) AS u
        |  FROM c1),
        |c3 AS (SELECT doc_id, regexp_replace(u, '^(https?://)www\.', '\1') AS u FROM c2),
        |c4 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
        |    '^(http://[^/?#:]*):80([/?#].*)?$', '\1\2'),
        |    '^(https://[^/?#:]*):443([/?#].*)?$', '\1\2') AS u FROM c3),
        |c5 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(u,
        |    '&(utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
        |    '\?(utm_[a-z]+|fbclid|gclid)=[^&]*&', '?'),
        |    '\?(utm_[a-z]+|fbclid|gclid)=[^&]*$', '') AS u FROM c4),
        |c6 AS (SELECT doc_id, regexp_replace(regexp_replace(u, '/+\?', '?'), '/+$', '') AS url_canon FROM c5)
        |SELECT min(doc_id) AS doc_id, url_canon, CAST(count(*) AS BIGINT) AS n_urls
        |FROM c6 GROUP BY url_canon ORDER BY url_canon""".stripMargin,
    // HTML extraction: synthesis + the full strip/decode chain re-derived
    // step for step (element removal, tag strip, entity decode order,
    // whitespace collapse) — exact extracted strings hash-pinned across
    // Java regex and RE2
    "p_html_extract" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        |    || '</title><style type="text/css">p { color: #fff; }</style>'
        |    || '<script>var n = 1; if (n < 2 && n > 0) { n = 3; }</script></head>'
        |    || '<body><!-- rendered page ' || CAST(doc_id AS VARCHAR)
        |    || ' --><h1>Title &amp;amp; &quot;quotes&quot;</h1><p>'
        |    || text
        |    || '</p><p>A &lt;tag&gt; isn&#39;t text&nbsp;here.</p></body></html>' AS html
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
        |      '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '<[^>]+>', ' ', 'g') AS t
        |  FROM synth),
        |decoded AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(t,
        |      '&nbsp;', ' ', 'g'),
        |      '&lt;', '<', 'g'),
        |      '&gt;', '>', 'g'),
        |      '&quot;', '"', 'g'),
        |      '&#39;|&apos;', '''', 'g'),
        |      '&amp;', '&', 'g') AS t
        |  FROM stripped)
        |SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted
        |FROM decoded ORDER BY doc_id""".stripMargin,
    "p_image_phash" ->
      s"""$IMG_HASH_CTE
         |SELECT doc_id, hash_hi, hash_lo FROM hashes ORDER BY doc_id""".stripMargin,
    "p_image_dedup" ->
      s"""$IMG_HASH_CTE
         |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, hash_hi, hash_lo,
         |  CAST(count(*) AS BIGINT) AS n_copies
         |FROM hashes GROUP BY hash_hi, hash_lo ORDER BY doc_id""".stripMargin,
    // ALL-pairs Hamming join on the re-derived perturbed hashes: equality
    // with Spark's banded path also proves banding exhaustive at <= 3
    "p_image_neardup" ->
      s"""$IMG_NEARDUP_CTE
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.hash_hi, b.hash_hi))
         |    + bit_count(xor(a.hash_lo, b.hash_lo)) AS BIGINT) AS hamming
         |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.hash_hi, b.hash_hi))
         |    + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    // DuckDB's NATIVE levenshtein over all pairs — independent metric
    // implementation + exhaustiveness check on the q-gram proposal
    "p_fuzzy_join" ->
      """WITH ids AS (SELECT doc_id, doc_id % 17 AS g, doc_id // 17 AS v
        |  FROM documents WHERE doc_id < 68),
        |strs AS (SELECT doc_id,
        |    'item-' || lpad(CAST(g * 7 AS VARCHAR), 3, '0') ||
        |    CASE v WHEN 0 THEN '-alpha-beta-gamma'
        |           WHEN 1 THEN '-alpia-beta-gamma'
        |           WHEN 2 THEN '-alpha-bta-gamma'
        |           ELSE '-alpha-beta-gammax' END AS s
        |  FROM ids)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM strs a JOIN strs b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // every check metric re-derived: one-scan aggregates for the
    // row-local checks, GROUP BY for uniqueness, NOT IN for the FK
    "p_data_checks" ->
      """WITH agg AS (SELECT count(*) AS n,
        |    sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS nulls,
        |    sum(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 ELSE 0 END) AS qv,
        |    sum(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.05) THEN 1 ELSE 0 END) AS dv,
        |    sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N') THEN 1 ELSE 0 END) AS av
        |  FROM lineitem),
        |uq1 AS (SELECT coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS m
        |  FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)),
        |uq2 AS (SELECT coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS m
        |  FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey)),
        |fk AS (SELECT count(*) AS m FROM lineitem
        |  WHERE l_orderkey IS NOT NULL
        |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |SELECT * FROM (
        |  SELECT 'not_null' AS "check", 'l_linestatus' AS target,
        |    round(CAST(nulls AS DOUBLE) / n, 6) AS metric, 0.0 AS threshold,
        |    round(CAST(nulls AS DOUBLE) / n, 6) <= 0.0 AS passed FROM agg
        |  UNION ALL SELECT 'in_range', 'l_quantity', round(CAST(qv AS DOUBLE), 6), 0.0, qv = 0 FROM agg
        |  UNION ALL SELECT 'in_range', 'l_discount', round(CAST(dv AS DOUBLE), 6), 0.0, dv = 0 FROM agg
        |  UNION ALL SELECT 'accepted_values', 'l_returnflag', round(CAST(av AS DOUBLE), 6), 0.0, av = 0 FROM agg
        |  UNION ALL SELECT 'min_rows', '*', round(CAST(n AS DOUBLE), 6), 1000.0, n >= 1000 FROM agg
        |  UNION ALL SELECT 'unique', 'l_orderkey,l_linenumber', round(CAST(m AS DOUBLE), 6), 0.0, m = 0 FROM uq1
        |  UNION ALL SELECT 'unique', 'l_orderkey', round(CAST(m AS DOUBLE), 6), 0.0, m = 0 FROM uq2
        |  UNION ALL SELECT 'foreign_key', 'l_orderkey->o_orderkey', round(CAST(m AS DOUBLE), 6), 0.0, m = 0 FROM fk
        |) ORDER BY "check", target""".stripMargin,
    // full SCD2 merge re-derived: null-safe change classification,
    // closes, opens, history passthrough
    "p_scd2_merge" ->
      """WITH cust AS (SELECT c_custkey AS key, c_mktsegment AS seg, c_acctbal AS bal FROM customer),
        |hist AS (SELECT key, 'OLD' AS seg, bal,
        |    CAST(-100 AS BIGINT) AS valid_from, CAST(0 AS BIGINT) AS valid_to,
        |    false AS is_current
        |  FROM cust WHERE key % 10 = 0),
        |cur AS (SELECT key, seg, bal, CAST(0 AS BIGINT) AS valid_from,
        |    CAST(NULL AS BIGINT) AS valid_to, true AS is_current FROM cust),
        |batch AS (
        |  SELECT key,
        |    CASE WHEN key % 3 = 0 THEN seg || '-X' ELSE seg END AS seg,
        |    CASE WHEN key % 3 <> 0 AND key % 4 = 1 THEN bal + 10.0 ELSE bal END AS bal
        |  FROM cust WHERE key % 3 = 0 OR key % 4 = 1 OR key % 2 = 0
        |  UNION ALL
        |  SELECT key + 1000000 AS key, 'NEW' AS seg, 0.0 AS bal
        |  FROM cust WHERE key % 7 = 0),
        |changed AS (SELECT b.key FROM batch b JOIN cur c USING (key)
        |  WHERE NOT (b.seg IS NOT DISTINCT FROM c.seg
        |         AND b.bal IS NOT DISTINCT FROM c.bal)),
        |newk AS (SELECT key FROM batch WHERE key NOT IN (SELECT key FROM cur))
        |SELECT * FROM (
        |  SELECT * FROM hist
        |  UNION ALL
        |  SELECT * FROM cur WHERE key NOT IN (SELECT key FROM changed)
        |  UNION ALL
        |  SELECT key, seg, bal, valid_from, CAST(86400 AS BIGINT), false
        |  FROM cur WHERE key IN (SELECT key FROM changed)
        |  UNION ALL
        |  SELECT key, seg, bal, CAST(86400 AS BIGINT), CAST(NULL AS BIGINT), true
        |  FROM batch WHERE key IN (SELECT key FROM changed)
        |     OR key IN (SELECT key FROM newk)
        |) ORDER BY key, valid_from, is_current""".stripMargin,
    // modified z-score re-derived: exact (n-1)p percentile interpolation
    // on integer inputs, multiply-then-divide order mirrored, 6dp snap
    "p_outlier_mad" ->
      """WITH med AS (SELECT source,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
        |  FROM documents GROUP BY source),
        |mad AS (SELECT d.source,
        |    quantile_cont(abs(CAST(n_chars AS DOUBLE) - med), 0.5) AS mad
        |  FROM documents d JOIN med USING (source) GROUP BY d.source)
        |SELECT d.doc_id, d.source, CAST(n_chars AS DOUBLE) AS v,
        |  med AS median, mad,
        |  CASE WHEN mad > 0
        |    THEN round(0.6745 * abs(CAST(n_chars AS DOUBLE) - med) / mad, 6)
        |  END AS score,
        |  coalesce(CASE WHEN mad > 0
        |    THEN round(0.6745 * abs(CAST(n_chars AS DOUBLE) - med) / mad, 6) > 3.0
        |  END, false) AS is_outlier
        |FROM documents d JOIN med USING (source) JOIN mad USING (source)
        |ORDER BY doc_id""".stripMargin,
    // DSIR: the full importance estimator re-derived — union vocabulary,
    // add-one smoothing, single-ln cross-multiplied ratio snapped 6dp,
    // decimal summation, gram-less docs restored at (0, 0.0)
    "p_dsir_weights" ->
      s"""$DSIR_CTE
         |SELECT doc_id, n_grams, logw FROM wts ORDER BY doc_id""".stripMargin,
    "p_dsir_resample" ->
      s"""$DSIR_CTE,
         |$DSIR_GUMBEL
         |SELECT doc_id, logw, gumbel_key, rnk FROM rk
         |WHERE rnk <= 40 ORDER BY rnk""".stripMargin,
    // composed selection pipeline: Gopher gate -> DSIR weights over the
    // SURVIVORS -> Gumbel top-100 -> per-language accounting; every
    // stage re-derived so the seams (survivor set feeding the estimator,
    // one shared tokenizer) are pinned, not just each stage
    "p_selection_pipeline" ->
      s"""WITH base AS (SELECT doc_id, lang, text, $TOKS AS tk FROM documents),
         |mraw AS (
         |  SELECT doc_id, tk, len(tk) AS n,
         |    list_sum(list_transform(tk, x -> length(x))) AS sumlen,
         |    len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS nalpha,
         |    (length(text) - length(replace(text, '#', '')))
         |      + (length(text) - length(replace(text, chr(8230), ''))) AS nsym,
         |    len(list_filter($EN,
         |        w -> list_contains(list_distinct(tk), w))) AS nstop
         |  FROM base WHERE doc_id % 10 != 0),
         |rawd AS (
         |  SELECT doc_id, tk FROM mraw
         |  WHERE NOT (n < 30 OR n > 1000 OR sumlen < n*3 OR sumlen > n*10
         |    OR nalpha*5 < n*4 OR nsym*10 > n OR nstop < 2)),
         |tgtd AS (SELECT doc_id, tk FROM base WHERE doc_id % 10 = 0),
         |$DSIR_CHAIN,
         |$DSIR_GUMBEL,
         |picked AS (SELECT doc_id FROM rk WHERE rnk <= 100)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(b.doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(len(b.tk)) AS BIGINT) AS n_tokens
         |FROM base b SEMI JOIN picked USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // Rademacher projection: LCG sign matrix + fixed-order exact-term
    // sum re-derived; x/sqrt(m) division mirrored (not *1/sqrt(m))
    "p_random_project" ->
      """WITH j AS (
        |  SELECT vec_id, embedding, unnest(range(0, 8)) AS j FROM embeddings),
        |y AS (
        |  SELECT vec_id, j,
        |    round(list_sum(list_transform(range(0, len(embedding)),
        |      i -> CAST(embedding[i+1] AS DOUBLE) *
        |        (CASE WHEN ((((i*8+j) % 4294967296) * 1103515245 + 12345)
        |          % 4294967296) < 2147483648 THEN 1.0 ELSE -1.0 END)))
        |      / sqrt(8.0), 6) AS y
        |  FROM j)
        |SELECT vec_id, CAST(j AS BIGINT) AS dim, y FROM y
        |ORDER BY vec_id, dim""".stripMargin,
    // URL blocklist: host re-extracted with the same regex; the suffix
    // match re-derived as ends_with over the domain list (the theta shape
    // whose equi-join replacement the Spark side implements)
    "p_url_blocklist" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    (CASE doc_id % 5
        |      WHEN 0 THEN 'news.example.com'
        |      WHEN 1 THEN 'www.ads.tracker-net.example'
        |      WHEN 2 THEN 'blog.example.org'
        |      WHEN 3 THEN 'win-big.example'
        |      ELSE 'docs.example.com' END)
        |    || '/page/' || CAST(doc_id AS VARCHAR)
        |    || (CASE WHEN doc_id % 7 = 0 THEN '?q=casino+night' ELSE '' END) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(url), '^(https?://)www\.', '\1') AS url_canon
        |  FROM u),
        |h AS (
        |  SELECT doc_id, url_canon,
        |    lower(regexp_extract(url_canon,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS url_host
        |  FROM c)
        |SELECT doc_id, url_host,
        |  CAST(len(list_filter(['tracker-net.example', 'win-big.example'],
        |    d -> url_host = d OR ends_with(url_host, '.' || d))) > 0 AS BIGINT) AS host_blocked,
        |  CAST(len(list_filter(['casino', 'poker'],
        |    w -> contains(lower(url_canon), w))) AS BIGINT) AS word_hits
        |FROM h ORDER BY doc_id""".stripMargin,
    // C4-style content blocklist: enrichment CASE mirrored from the
    // Scala gate, exact-token bad-word counts, whole-token-run phrase
    // position test, integer cross-multiplied rate rule (fail closed on
    // phrase hits)
    "p_blocklist_filter" ->
      s"""WITH enr AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0 THEN text || ' zzspam zzscam zzads zzspam zzscam zzads zzspam zzscam zzads zzspam'
         |         WHEN doc_id % 7 = 1 THEN text || ' zzspam'
         |         WHEN doc_id % 7 = 2 THEN text || ' zzspam zzscam zzads'
         |         WHEN doc_id % 7 = 3 THEN text || ' zzfree zzmoney'
         |         ELSE text END AS text
         |  FROM documents),
         |t AS (SELECT doc_id, $TOKS AS tk FROM enr),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(tk,
         |      x -> x IN ('zzspam', 'zzscam', 'zzads'))) AS BIGINT) AS n_bad,
         |    CAST(CASE WHEN contains(' ' || array_to_string(tk, ' ') || ' ',
         |      ' zzfree zzmoney ') THEN 1 ELSE 0 END AS BIGINT) AS phrase_hit
         |  FROM t)
         |SELECT doc_id, n_tokens, n_bad, phrase_hit,
         |  CAST(CASE WHEN n_bad * 1000 <= n_tokens * 40 AND phrase_hit = 0
         |    THEN 1 ELSE 0 END AS BIGINT) AS pass
         |FROM m ORDER BY doc_id""".stripMargin,
    // Gopher document rules: every ratio threshold integer
    // cross-multiplied, per-rule violation counts + survivor sums per
    // source; the enrichment CASE injects each violation class
    "p_gopher_filter" ->
      s"""WITH enr AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 29 = 7 THEN rtrim(repeat('spark ', 1200))
         |         WHEN doc_id % 19 = 0 THEN rtrim(repeat('a ', 40))
         |         WHEN doc_id % 23 = 5 THEN rtrim(repeat('7 ', 40))
         |         WHEN doc_id % 17 = 3 THEN text || ' # # # # # #'
         |         ELSE text END AS text
         |  FROM documents),
         |t AS (SELECT doc_id, source, text, $TOKS AS tk FROM enr),
         |m AS (
         |  SELECT doc_id, source, len(tk) AS n,
         |    list_sum(list_transform(tk, x -> length(x))) AS sumlen,
         |    len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS nalpha,
         |    (length(text) - length(replace(text, '#', '')))
         |      + (length(text) - length(replace(text, chr(8230), ''))) AS nsym,
         |    len(list_filter($EN,
         |        w -> list_contains(list_distinct(tk), w))) AS nstop
         |  FROM t),
         |f AS (
         |  SELECT doc_id, source,
         |    (n < 30) AS f1, (n > 1000) AS f2,
         |    (sumlen < n*3 OR sumlen > n*10) AS f3,
         |    (nalpha*5 < n*4) AS f4,
         |    (nsym*10 > n) AS f5,
         |    (nstop < 2) AS f6
         |  FROM m)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n_too_few,
         |  CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n_too_many,
         |  CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n_meanlen,
         |  CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
         |  CAST(sum(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol,
         |  CAST(sum(CASE WHEN f6 THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |  CAST(sum(CASE WHEN NOT (f1 OR f2 OR f3 OR f4 OR f5 OR f6) THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST(sum(CASE WHEN NOT (f1 OR f2 OR f3 OR f4 OR f5 OR f6) THEN doc_id ELSE 0 END) AS BIGINT) AS pass_id_sum
         |FROM f GROUP BY source ORDER BY source""".stripMargin,
    // heavy trigrams: the sketch-then-verify output is exact counts, so
    // the oracle is the plain trigram count over the enriched corpus —
    // a mismatch means the sketch pass dropped a qualifying candidate
    "p_heavy_tokens" ->
      s"""WITH enr AS (
         |  SELECT CASE WHEN doc_id % 3 = 0
         |    THEN text || ' click here now click here now click here now click here now click here now'
         |    ELSE text END AS text
         |  FROM documents),
         |t AS (SELECT $TOKS AS tk FROM enr),
         |g AS (
         |  SELECT tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
         |  FROM t, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i))
         |SELECT gram, CAST(count(*) AS BIGINT) AS n FROM g
         |GROUP BY gram HAVING count(*) >= 200
         |ORDER BY n DESC, gram""".stripMargin,
    // as-of join: DuckDB's NATIVE ASOF LEFT JOIN as an independent
    // oracle for the union+window composition (inclusive bound, per-key
    // recency, 24h tolerance null-out, unmatched passthrough)
    "p_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
        |v AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts_us AS cts, event_id AS cid, value AS cval
        |      FROM e WHERE event_type = 'click'),
        |j AS (
        |  SELECT v.event_id, v.user_id, v.ts_us, c.cts, c.cid, c.cval
        |  FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ts_us >= c.cts)
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN ts_us - cts <= 86400000000 THEN cts END AS click_ts,
        |  CASE WHEN ts_us - cts <= 86400000000 THEN cid END AS click_event_id,
        |  CASE WHEN ts_us - cts <= 86400000000 THEN cval END AS click_value
        |FROM j ORDER BY event_id""".stripMargin,
    // int8 quantization: same floor-half-up formula, exact scale in the
    // code math, 6dp scale only on the output column
    "p_embedding_quantize" ->
      """WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS am FROM p),
        |c AS (SELECT vec_id, am,
        |  CASE WHEN am = 0 THEN list_transform(v, x -> 0)
        |       ELSE list_transform(v, x -> CAST(floor(x / (am/127.0) + 0.5) AS INT))
        |  END AS codes
        |  FROM m)
        |SELECT vec_id, round(am/127.0, 6) AS scale,
        |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
        |  CAST(len(list_filter(codes, c -> abs(c) = 127)) AS BIGINT) AS n_sat
        |FROM c ORDER BY vec_id""".stripMargin,
    // embedding covariance: fixed-point floor-half-up second moments
    // re-derived by the explode shape the one-pass aggregate replaces;
    // the covariance double formula is fed integers only
    "p_embedding_cov" ->
      """WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |ij AS (
        |  SELECT a.i, b.j
        |  FROM (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS i) a,
        |       (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS j) b
        |  WHERE b.j >= a.i),
        |prods AS (
        |  SELECT i, j,
        |    CAST(sum(CAST(floor(v[i+1] * v[j+1] * CAST(1000000 AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sxy
        |  FROM p, ij GROUP BY i, j),
        |els AS (
        |  SELECT i,
        |    CAST(sum(CAST(floor(v[i+1] * CAST(1000000 AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sx
        |  FROM p, (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS i) GROUP BY i),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
        |SELECT pr.i, pr.j, pr.sxy,
        |  CAST(floor((CAST(pr.sxy AS DOUBLE) / n / CAST(1000000 AS DOUBLE)
        |      - (CAST(ex.sx AS DOUBLE) / n / CAST(1000000 AS DOUBLE))
        |        * (CAST(ey.sx AS DOUBLE) / n / CAST(1000000 AS DOUBLE)))
        |      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS cov_micro
        |FROM prods pr
        |JOIN els ex ON pr.i = ex.i
        |JOIN els ey ON pr.j = ey.i, nn
        |ORDER BY pr.i, pr.j""".stripMargin,
    // PCA gate: DuckDB has no eigensolve, so the eigen-specific columns
    // are the INVARIANT CONTRACT — every integer-snapped residual the
    // Spark side emits (orthonormality at 1e-9, eigen-residual against
    // the p_embedding_cov-pinned matrix at 1e-6, trace/Frobenius
    // conservation, projection mean-zero and variance=λ round-trip)
    // must be EXACTLY zero. Since r13 three columns are additionally
    // GENUINE two-engine checks, re-derived here from the embeddings
    // table itself via the p_embedding_cov CTE chain: the per-axis
    // covariance diagonal (cov_diag_micro), its sum (trace_micro = tr C
    // in exact micro units), and the snapped-matrix Frobenius norm
    // (frob_m2 = Σ m_ij² with off-diagonals twice, exact micro²
    // integers). The zero residuals tie the eigenvalues to the SAME
    // matrix these columns pin, so conservation is now cross-engine,
    // not self-referential.
    "p_embedding_pca" ->
      """WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |ij AS (
        |  SELECT a.i, b.j
        |  FROM (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS i) a,
        |       (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS j) b
        |  WHERE b.j >= a.i),
        |prods AS (
        |  SELECT i, j,
        |    CAST(sum(CAST(floor(v[i+1] * v[j+1] * CAST(1000000 AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sxy
        |  FROM p, ij GROUP BY i, j),
        |els AS (
        |  SELECT i,
        |    CAST(sum(CAST(floor(v[i+1] * CAST(1000000 AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sx
        |  FROM p, (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS i) GROUP BY i),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
        |cv AS (
        |  SELECT pr.i, pr.j,
        |    CAST(floor((CAST(pr.sxy AS DOUBLE) / n / CAST(1000000 AS DOUBLE)
        |        - (CAST(ex.sx AS DOUBLE) / n / CAST(1000000 AS DOUBLE))
        |          * (CAST(ey.sx AS DOUBLE) / n / CAST(1000000 AS DOUBLE)))
        |        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS cm
        |  FROM prods pr
        |  JOIN els ex ON pr.i = ex.i
        |  JOIN els ey ON pr.j = ey.i, nn),
        |tot AS (
        |  SELECT
        |    CAST(sum(CASE WHEN i = j THEN cm ELSE 0 END) AS BIGINT) AS trace_micro,
        |    CAST(sum(CASE WHEN i = j THEN cm * cm ELSE 2 * cm * cm END) AS BIGINT)
        |      AS frob_m2
        |  FROM cv)
        |SELECT cv.i AS r,
        |  CAST(0 AS BIGINT) AS ortho_nano,
        |  CAST(0 AS BIGINT) AS eig_resid_micro,
        |  CAST(0 AS BIGINT) AS proj_mean_e4,
        |  CAST(0 AS BIGINT) AS var_gap_e3,
        |  cv.cm AS cov_diag_micro,
        |  tot.trace_micro,
        |  tot.frob_m2,
        |  CAST(0 AS BIGINT) AS trace_gap_e4,
        |  CAST(0 AS BIGINT) AS frob_gap_e3
        |FROM cv, tot WHERE cv.i = cv.j
        |ORDER BY r""".stripMargin,
    // learned quality classifier: the oracle folds the 32-bit
    // codepoint-FNV hash per token in plain BIGINT arithmetic (32-bit
    // state x 24-bit prime < 2^57 -- the reason the hash is codepoint-
    // based), re-derives the LCG bucket weights as integer micros, the
    // per-term halfAway(wm*c / n) EXACT-INTEGER rounding (a float
    // round(w*c/n, 6) sits exactly on half-micro boundaries here and the
    // engines disagree on those -- see QualityClassifier's contract
    // note), and the 6dp-snapped sigmoid (exp is the one
    // transcendental -- snapped immediately, the BM25 ln rule).
    "p_quality_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tok AS (SELECT doc_id, len(tk) AS n, unnest(tk) AS token FROM t),
        |h AS (
        |  SELECT doc_id, n,
        |    list_reduce(
        |      list_prepend(CAST(2166136261 AS BIGINT),
        |        list_transform(range(1, length(token)+1),
        |          i -> CAST(unicode(substr(token, i, 1)) AS BIGINT))),
        |      (acc, cp) -> (xor(acc, cp) * 16777619) % 4294967296) % 1024
        |      AS bucket
        |  FROM tok),
        |cnt AS (SELECT doc_id, n, bucket, count(*) AS c FROM h GROUP BY 1, 2, 3),
        |wt AS (
        |  SELECT CAST(b AS BIGINT) AS bucket,
        |    CAST(round(round(CAST((b * 1103515245 + 12345) % 4294967296 AS DOUBLE)
        |        / CAST(4294967296 AS DOUBLE) * CAST(0.2 AS DOUBLE)
        |      - CAST(0.1 AS DOUBLE), 6) * 1000000, 0) AS BIGINT) AS wm
        |  FROM (SELECT unnest(range(0, 1024)) AS b)),
        |terms AS (
        |  SELECT doc_id, n,
        |    CAST(sign(wm * c) AS BIGINT)
        |      * ((2 * abs(wm * c) + n) // (2 * n)) AS term_micro
        |  FROM cnt JOIN wt USING (bucket)),
        |zz AS (
        |  SELECT doc_id, n AS n_tokens,
        |    CAST(37000 + sum(term_micro) AS BIGINT) AS z_micro
        |  FROM terms GROUP BY 1, 2)
        |SELECT doc_id, n_tokens, z_micro,
        |  round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
        |    + exp(-(CAST(z_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)))), 6)
        |    AS prob
        |FROM zz ORDER BY doc_id""".stripMargin,
    // learned language-ID scoring dataflow: canonical token string ->
    // char trigrams (short-text whole-string fallback) -> codepoint-FNV
    // fold -> 256 buckets -> per-(bucket, class) LCG weights as integer
    // micros -> exact-integer halfAway terms -> per-class z_micro ->
    // declared-order argmax tie rule. Zero transcendentals: the winner
    // is integer-exact.
    "p_langid_model" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    array_to_string(regexp_split_to_array(lower(trim(text)), '\s+'), ' ') AS s
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN length(s) <= 3 THEN [s]
        |         ELSE list_transform(range(1, length(s) - 1),
        |                i -> substr(s, CAST(i AS INT), 3)) END AS grams
        |  FROM t),
        |gr AS (
        |  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |    unnest(grams) AS gram
        |  FROM g),
        |h AS (
        |  SELECT doc_id, n_grams,
        |    list_reduce(
        |      list_prepend(CAST(2166136261 AS BIGINT),
        |        list_transform(range(1, length(gram)+1),
        |          c -> CAST(unicode(substr(gram, CAST(c AS INT), 1)) AS BIGINT))),
        |      (acc, cp) -> (xor(acc, cp) * 16777619) % 4294967296) % 256 AS bucket
        |  FROM gr),
        |cnt AS (SELECT doc_id, n_grams, bucket, count(*) AS c FROM h GROUP BY 1, 2, 3),
        |wt AS (
        |  SELECT CAST(b AS BIGINT) AS bucket, CAST(k AS BIGINT) AS idx,
        |    CAST(round(round(CAST(((b * 4 + k) * 1103515245 + 12345) % 4294967296 AS DOUBLE)
        |        / CAST(4294967296 AS DOUBLE) * CAST(0.2 AS DOUBLE)
        |      - CAST(0.1 AS DOUBLE), 6) * 1000000, 0) AS BIGINT) AS wm
        |  FROM (SELECT unnest(range(0, 256)) AS b), (SELECT unnest(range(0, 4)) AS k)),
        |bt AS (
        |  SELECT CAST(k AS BIGINT) AS idx,
        |    CAST(round(round(CAST(((1024 + k) * 1103515245 + 12345) % 4294967296 AS DOUBLE)
        |        / CAST(4294967296 AS DOUBLE) * CAST(0.02 AS DOUBLE)
        |      - CAST(0.01 AS DOUBLE), 6) * 1000000, 0) AS BIGINT) AS bm
        |  FROM (SELECT unnest(range(0, 4)) AS k)),
        |terms AS (
        |  SELECT doc_id, n_grams, idx,
        |    CAST(sign(wm * c) AS BIGINT)
        |      * ((2 * abs(wm * c) + n_grams) // (2 * n_grams)) AS term_micro
        |  FROM cnt JOIN wt USING (bucket)),
        |zz AS (
        |  SELECT doc_id, n_grams, idx,
        |    CAST(bm + sum(term_micro) AS BIGINT) AS z_micro
        |  FROM terms JOIN bt USING (idx)
        |  GROUP BY doc_id, n_grams, idx, bm),
        |best AS (
        |  SELECT doc_id, first(idx ORDER BY z_micro DESC, idx ASC) AS bidx
        |  FROM zz GROUP BY doc_id)
        |SELECT zz.doc_id, zz.n_grams,
        |  CASE zz.idx WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr' ELSE 'es' END AS lang,
        |  zz.z_micro,
        |  zz.idx = best.bidx AS is_best
        |FROM zz JOIN best USING (doc_id)
        |ORDER BY doc_id, lang""".stripMargin,
    // composed crawl-ingest chain: the p_url_dedup canonicalization CTE
    // feeding min-id survivors, the p_gopher_filter integer rules (no
    // enrichment — organic violations only), one shared tokenizer
    "p_ingest_pipeline" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    CASE doc_id % 6
         |      WHEN 0 THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id % 25 AS VARCHAR)
         |      WHEN 1 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.COM/doc/' || CAST(doc_id % 25 AS VARCHAR)
         |      WHEN 2 THEN 'https://www.' || source || '.example.com/doc/' || CAST(doc_id % 25 AS VARCHAR)
         |      WHEN 3 THEN 'https://' || source || '.example.com:443/doc/' || CAST(doc_id % 25 AS VARCHAR)
         |      WHEN 4 THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id % 25 AS VARCHAR) || '/?utm_source=rss&utm_medium=feed'
         |      ELSE 'https://' || source || '.example.com/doc/' || CAST(doc_id % 25 AS VARCHAR) || '?ref=1&gclid=abc123#frag'
         |    END AS url
         |  FROM documents),
         |c1 AS (SELECT doc_id, regexp_replace(trim(url), '#.*$$', '') AS uu FROM u),
         |c2 AS (SELECT doc_id,
         |    lower(coalesce(regexp_extract(uu, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0), ''))
         |    || substr(uu, length(coalesce(regexp_extract(uu, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0), '')) + 1) AS uu
         |  FROM c1),
         |c3 AS (SELECT doc_id, regexp_replace(uu, '^(https?://)www\\.', '\\1') AS uu FROM c2),
         |c4 AS (SELECT doc_id, regexp_replace(regexp_replace(uu,
         |    '^(http://[^/?#:]*):80([/?#].*)?$$', '\\1\\2'),
         |    '^(https://[^/?#:]*):443([/?#].*)?$$', '\\1\\2') AS uu FROM c3),
         |c5 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(uu,
         |    '&(utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
         |    '\\?(utm_[a-z]+|fbclid|gclid)=[^&]*&', '?'),
         |    '\\?(utm_[a-z]+|fbclid|gclid)=[^&]*$$', '') AS uu FROM c4),
         |c6 AS (SELECT doc_id, regexp_replace(regexp_replace(uu, '/+\\?', '?'), '/+$$', '') AS url_canon FROM c5),
         |surv AS (SELECT min(doc_id) AS doc_id FROM c6 GROUP BY url_canon),
         |t AS (
         |  SELECT d.doc_id, d.source, d.text, $TOKS AS tk
         |  FROM documents d SEMI JOIN surv USING (doc_id)),
         |m AS (
         |  SELECT doc_id, source, tk, len(tk) AS n,
         |    list_sum(list_transform(tk, x -> length(x))) AS sumlen,
         |    len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS nalpha,
         |    (length(text) - length(replace(text, '#', '')))
         |      + (length(text) - length(replace(text, chr(8230), ''))) AS nsym,
         |    len(list_filter($EN,
         |        w -> list_contains(list_distinct(tk), w))) AS nstop
         |  FROM t),
         |f AS (
         |  SELECT doc_id, source, n FROM m
         |  WHERE NOT (n < 30 OR n > 1000
         |    OR sumlen < n*3 OR sumlen > n*10
         |    OR nalpha*5 < n*4
         |    OR nsym*10 > n
         |    OR nstop < 2))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(n) AS BIGINT) AS n_tokens
         |FROM f GROUP BY source ORDER BY source""".stripMargin,
    // NFC normalization: java.text.Normalizer vs DuckDB nfc_normalize —
    // two independent Unicode implementations must agree byte-for-byte
    // (chr() codepoints mirror the Scala \\u escapes; all BMP, so
    // DuckDB's codepoint length == Spark's UTF-16 length)
    "p_nfc_normalize" ->
      """WITH enr AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 1 THEN text || ' cafe' || chr(769)
        |         WHEN doc_id % 4 = 2 THEN text || ' caf' || chr(233)
        |         WHEN doc_id % 4 = 3 THEN text || ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
        |         ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS len_raw,
        |  nfc_normalize(text) AS text_nfc,
        |  CAST(length(nfc_normalize(text)) AS BIGINT) AS len_nfc
        |FROM enr ORDER BY doc_id""".stripMargin,
    // encoding repair -> NFC (the ingest chain order): the full
    // 128-entry CP1252-in-UTF-8 replace chain replayed literal by
    // literal (C1 bytes via chr()), then DuckDB's independent
    // nfc_normalize composes the deliberately-uncorrupted decomposed
    // tail — repair semantics, chain order, AND the repair-before-NFC
    // composition pinned in one gate
    "p_fix_encoding" ->
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 1
         |      THEN coalesce(text, '') || ${sqlLit(Queries.MojiSnippet)}
         |      ELSE text END AS raw
         |  FROM documents),
         |${mojiChainCtes("m", passes = 1)._1},
         |f AS (SELECT doc_id, raw, t AS fixed FROM ${mojiChainCtes("m", passes = 1)._2})
         |SELECT doc_id,
         |  coalesce(nfc_normalize(fixed), '') AS text_clean,
         |  CAST(coalesce(length(raw), -1) AS BIGINT) AS raw_chars,
         |  CAST(coalesce(length(fixed), -1) AS BIGINT) AS fixed_chars,
         |  CAST(coalesce(length(nfc_normalize(fixed)), -1) AS BIGINT) AS clean_chars
         |FROM f ORDER BY doc_id""".stripMargin,
    // two-layer encoding repair: the SAME 128-replace chain replayed
    // TWICE over a corpus carrying doubly-encoded (%3==1), singly-
    // encoded (%3==2), and clean docs — peeling depth AND single-layer
    // idempotence pinned by one oracle
    "p_fix_encoding2x" ->
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 1
         |      THEN coalesce(text, '') || ${sqlLit(Queries.MojiSnippet2x)}
         |    WHEN doc_id % 3 = 2
         |      THEN coalesce(text, '') || ${sqlLit(Queries.MojiSnippet)}
         |      ELSE text END AS raw
         |  FROM documents),
         |${mojiChainCtes("m", passes = 2)._1},
         |f AS (SELECT doc_id, raw, t AS fixed FROM ${mojiChainCtes("m", passes = 2)._2})
         |SELECT doc_id,
         |  coalesce(nfc_normalize(fixed), '') AS text_clean,
         |  CAST(coalesce(length(raw), -1) AS BIGINT) AS raw_chars,
         |  CAST(coalesce(length(fixed), -1) AS BIGINT) AS fixed_chars
         |FROM f ORDER BY doc_id""".stripMargin,
    // corpus diff: full-outer classification over normalized text —
    // added/removed/changed/unchanged all present by construction
    "p_corpus_diff" ->
      """WITH o AS (
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 1 THEN text || ' v1' ELSE text END AS t
        |  FROM documents WHERE doc_id % 7 <> 2),
        |n AS (SELECT doc_id, text AS t FROM documents WHERE doc_id % 11 <> 4),
        |j AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    o.doc_id IS NOT NULL AS has_o, n.doc_id IS NOT NULL AS has_n,
        |    lower(trim(regexp_replace(o.t, '\s+', ' ', 'g'))) AS ot,
        |    lower(trim(regexp_replace(n.t, '\s+', ' ', 'g'))) AS nt
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT doc_id,
        |  CASE WHEN NOT has_o THEN 'added' WHEN NOT has_n THEN 'removed'
        |       WHEN ot = nt THEN 'unchanged' ELSE 'changed' END AS status
        |FROM j ORDER BY doc_id""".stripMargin,
    // corpus report: dataset-card metrics in long format — the shared
    // normalization/tokenizer/quality/langId definitions composed once
    "p_corpus_report" ->
      s"""WITH t AS (SELECT doc_id, source, text, $TOKS AS tk FROM documents),
         |q AS (
         |  SELECT source,
         |    round(least(len(tk) / 100.0, 1.0) * 0.5
         |      + (len(list_distinct(tk)) * 1.0 / len(tk)) * 0.3
         |      + least((len(list_filter(tk, x -> list_contains($EN, x))) * 1.0 / len(tk)) * 4.0, 1.0) * 0.2,
         |      6) AS quality
         |  FROM t),
         |lang AS (
         |  SELECT CASE
         |    WHEN greatest(en, de, fr, es) <= 0 THEN 'und'
         |    WHEN en = greatest(en, de, fr, es) THEN 'en'
         |    WHEN de = greatest(en, de, fr, es) THEN 'de'
         |    WHEN fr = greatest(en, de, fr, es) THEN 'fr'
         |    WHEN es = greatest(en, de, fr, es) THEN 'es'
         |    ELSE 'und' END AS key
         |  FROM (
         |    SELECT
         |      len(list_filter(tk, x -> list_contains($EN, x))) AS en,
         |      len(list_filter(tk, x -> list_contains(['der','die','und','das','ist','ein','nicht','mit','auf','zu'], x))) AS de,
         |      len(list_filter(tk, x -> list_contains(['le','la','et','les','des','est','une','dans','que','pour'], x))) AS fr,
         |      len(list_filter(tk, x -> list_contains(['el','la','que','de','los','una','es','por','con','para'], x))) AS es
         |    FROM t)),
         |rows_ AS (
         |  SELECT 'n_docs' AS metric, 'all' AS key, count(*)::DOUBLE AS value FROM t
         |  UNION ALL
         |  SELECT 'n_tokens', 'all', sum(len(tk))::DOUBLE FROM t
         |  UNION ALL
         |  SELECT 'n_chars', 'all', sum(length(text))::DOUBLE FROM t
         |  UNION ALL
         |  SELECT 'dup_ratio', 'all',
         |    round(1.0 - count(DISTINCT lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) * 1.0 / count(*), 6) FROM t
         |  UNION ALL
         |  SELECT 'source_docs', source, count(*)::DOUBLE FROM t GROUP BY source
         |  UNION ALL
         |  SELECT 'source_mean_quality', source, round(avg(quality), 6) FROM q GROUP BY source
         |  UNION ALL
         |  SELECT 'lang_docs', key, count(*)::DOUBLE FROM lang GROUP BY key)
         |SELECT metric, key, value FROM rows_ ORDER BY metric, key""".stripMargin,
    // curriculum: ntile octiles over the (rounded quality, id) total
    // order + the within-bucket LCG position — standard-SQL ntile
    // distribution semantics shared by both engines
    "p_curriculum" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    round(
         |      least(len($TOKS) / 100.0, 1.0) * 0.5
         |      + (len(list_distinct($TOKS)) * 1.0 / len($TOKS)) * 0.3
         |      + least((len(list_filter($TOKS, t -> list_contains($EN, t))) * 1.0 / len($TOKS)) * 4.0, 1.0) * 0.2,
         |      6) AS q
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    CAST(ntile(8) OVER (ORDER BY q, doc_id) - 1 AS BIGINT) AS bucket,
         |    ((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
         |      + 4294967296) % 4294967296 AS lcg
         |  FROM s)
         |SELECT doc_id, bucket,
         |  CAST(row_number() OVER (PARTITION BY bucket ORDER BY lcg, doc_id) - 1 AS BIGINT) AS pos_in_bucket
         |FROM b ORDER BY doc_id""".stripMargin,
    // map-side curriculum: bucket = count of fixed ascending cuts below
    // the rounded quality score (no window — the 100 TB shape), plus the
    // LCG shuffle key re-derived
    "p_curriculum_cuts" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    round(
         |      least(len($TOKS) / 100.0, 1.0) * 0.5
         |      + (len(list_distinct($TOKS)) * 1.0 / len($TOKS)) * 0.3
         |      + least((len(list_filter($TOKS, t -> list_contains($EN, t))) * 1.0 / len($TOKS)) * 4.0, 1.0) * 0.2,
         |      6) AS q
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(
         |    (CASE WHEN q > 0.4 THEN 1 ELSE 0 END)
         |    + (CASE WHEN q > 0.5 THEN 1 ELSE 0 END)
         |    + (CASE WHEN q > 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS bucket,
         |  ((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
         |    + 4294967296) % 4294967296 AS shuffle_key
         |FROM s ORDER BY doc_id""".stripMargin,
    // WARC round trip: writer bytes -> streaming parser -> per-URL
    // stats; the oracle derives the same stats from the documents table
    // directly, so framing + header/body split + UTF-8 are all pinned
    "p_warc_roundtrip" ->
      s"""SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS body_bytes,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens
         |FROM documents ORDER BY url""".stripMargin,
    // JSONL round trip: per-doc stats derived from the documents table
    // directly — whatever JSON escaping/framing the sink chose, the
    // reader must restore the exact text (null text -> -1 sentinel,
    // JSONL omits null fields and the schema restores them)
    "p_jsonl_roundtrip" ->
      """SELECT doc_id,
        |  CAST(coalesce(length(text), -1) AS BIGINT) AS text_chars,
        |  lang, source
        |FROM documents ORDER BY doc_id""".stripMargin,
    // interval join: DuckDB's native range join (IEJoin) as an
    // independent oracle for the bin-explode + equi-join + exact-filter
    // composition; half-open [start, end), one row per hit
    "p_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |v AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'view'),
        |o AS (SELECT user_id, event_id AS outage_id, ts_us AS os, ts_us + 7200000000 AS oe
        |      FROM e WHERE event_type = 'error')
        |SELECT v.event_id, v.user_id, v.ts_us, o.outage_id, o.os AS outage_start
        |FROM v JOIN o
        |ON v.user_id = o.user_id AND v.ts_us >= o.os AND v.ts_us < o.oe
        |ORDER BY v.event_id, o.outage_id""".stripMargin,
    // cross-source dup provenance: normalized-text groups, min-(id, src)
    // canonical copy, per-(src_first, src_dup) copy counts + id sums
    "p_dup_provenance" ->
      """WITH enr AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 9 = 2 THEN 'every crawl mirrors this exact syndicated article body'
        |         ELSE text END AS text
        |  FROM documents),
        |d AS (SELECT doc_id AS id, source AS src,
        |  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS key FROM enr),
        |g AS (
        |  SELECT key, id, src,
        |    count(*) OVER (PARTITION BY key) AS n,
        |    row_number() OVER (PARTITION BY key ORDER BY id, src) AS rn,
        |    first_value(src) OVER (PARTITION BY key ORDER BY id, src) AS src_first
        |  FROM d)
        |SELECT src_first, src AS src_dup, CAST(count(*) AS BIGINT) AS n_dups,
        |  CAST(sum(id) AS BIGINT) AS dup_id_sum
        |FROM g WHERE n > 1 AND rn > 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // exact-k-per-group sampling: the identical LCG literals re-ranked
    // through a window — pick-set equality pins the bounded heap's
    // (score desc, id asc) rule against (bucket asc, id asc)
    "p_sample_k_per_group" ->
      """WITH s AS (
        |  SELECT source, doc_id,
        |    ((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
        |      + 4294967296) % 4294967296 AS b
        |  FROM documents),
        |r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY b, doc_id) AS rn FROM s)
        |SELECT source, doc_id FROM r WHERE rn <= 7 ORDER BY source, doc_id""".stripMargin,
    // repeated-substring spans: positional 8-grams, hot-gram guard,
    // diagonal/island merge — the full pipeline re-derived on string
    // grams (Spark joins 64-bit hashes of the same grams)
    "p_repeated_spans" ->
      s"""$REPEATED_SPANS_CTE
         |SELECT doc_a, doc_b, CAST(start_a AS BIGINT) AS start_a,
         |  CAST(start_b AS BIGINT) AS start_b, CAST(span_tokens AS BIGINT) AS span_tokens
         |FROM sp WHERE span_tokens >= 20
         |ORDER BY 1, 2, 3, 4""".stripMargin,
    // span removal: the same span pipeline, then position-explode the
    // b-side ranges, cut them from the affected docs, and rebuild
    "p_span_removal" ->
      s"""$REPEATED_SPANS_CTE,
         |spans AS (SELECT * FROM sp WHERE span_tokens >= 20),
         |rm AS (
         |  SELECT DISTINCT doc_b AS doc_id, CAST(start_b + u.i AS BIGINT) AS pos
         |  FROM spans, LATERAL (SELECT unnest(range(0, span_tokens)) AS i) u),
         |affected AS (SELECT DISTINCT doc_id FROM rm),
         |ex AS (
         |  SELECT doc_id, CAST(p.i - 1 AS BIGINT) AS pos, t[p.i] AS tok
         |  FROM toks SEMI JOIN affected USING (doc_id),
         |    LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) p),
         |keep AS (SELECT e.* FROM ex e ANTI JOIN rm USING (doc_id, pos)),
         |reb AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
         |  FROM keep GROUP BY doc_id),
         |cnt AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
         |  FROM rm GROUP BY doc_id),
         |aff_out AS (
         |  SELECT c.doc_id, coalesce(r.text, '') AS text, c.n_removed
         |  FROM cnt c LEFT JOIN reb r USING (doc_id)),
         |unt AS (
         |  SELECT doc_id, array_to_string(t, ' ') AS text,
         |    CAST(0 AS BIGINT) AS n_removed
         |  FROM toks ANTI JOIN affected USING (doc_id))
         |SELECT doc_id, text, n_removed
         |FROM (SELECT * FROM aff_out UNION ALL SELECT * FROM unt)
         |ORDER BY doc_id""".stripMargin,
    // the five-stage production chain: decontaminate -> quality filter ->
    // artifact dedup -> split -> stats, each stage re-derived in SQL
    "p_daily_pipeline_full" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents),
         |shing AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |         ELSE array_to_string(t, ' ') END AS s
         |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 2))) AS i)),
         |dsh AS (SELECT DISTINCT doc_id, s FROM shing),
         |evalg AS (SELECT DISTINCT s FROM dsh WHERE doc_id % 10 = 0),
         |decon AS (
         |  SELECT doc_id FROM (
         |    SELECT x.doc_id, count(*) AS n_ngrams,
         |      sum(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
         |    FROM dsh x LEFT JOIN evalg e ON x.s = e.s
         |    WHERE x.doc_id % 3 = 0
         |    GROUP BY 1)
         |  WHERE round(n_hits * 1.0 / n_ngrams, 6) <= 0.10),
         |rep AS (
         |  SELECT doc_id, sum(c) AS total, max(c) AS top,
         |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
         |  FROM (
         |    SELECT doc_id, s, count(*) AS c FROM (
         |      SELECT doc_id,
         |        CASE WHEN len(t) >= 2 THEN t[i] || ' ' || t[i+1]
         |             ELSE array_to_string(t, ' ') END AS s
         |      FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t), 2))) AS i))
         |    GROUP BY 1, 2)
         |  GROUP BY 1),
         |sig AS (
         |  SELECT b.doc_id,
         |    round(
         |      least(len(t) / 100.0, 1.0) * 0.5
         |      + (len(list_distinct(t)) * 1.0 / len(t)) * 0.3
         |      + least((len(list_filter(t, x -> list_contains($EN, x))) * 1.0 / len(t)) * 4.0, 1.0) * 0.2,
         |      6) AS q,
         |    round(top * 1.0 / total, 6) AS top2,
         |    round(dup * 1.0 / total, 6) AS dup2
         |  FROM toks b JOIN rep USING (doc_id)),
         |clean AS (
         |  SELECT doc_id FROM decon JOIN sig USING (doc_id)
         |  WHERE q >= 0.40 AND top2 <= 0.06 AND dup2 <= 0.12),
         |pool AS (
         |  SELECT doc_id FROM documents WHERE doc_id % 3 <> 0
         |  UNION ALL SELECT doc_id FROM clean),
         |psh AS (SELECT x.doc_id, x.s FROM dsh x JOIN pool p USING (doc_id)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM psh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
         |  FROM psh a JOIN psh b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT ia, ib FROM inter
         |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
         |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
         |ranked AS (
         |  SELECT doc_id, CASE WHEN doc_id % 3 <> 0 THEN 0 ELSE 1 END AS rk FROM documents),
         |victims AS (
         |  SELECT DISTINCT p.ib AS doc_id
         |  FROM pairs p JOIN ranked ra ON p.ia = ra.doc_id JOIN ranked rb ON p.ib = rb.doc_id
         |  WHERE rb.rk = 1 AND (ra.rk < rb.rk OR (ra.rk = rb.rk AND p.ia < p.ib))),
         |surv AS (
         |  SELECT c.doc_id, d.text FROM clean c JOIN documents d USING (doc_id)
         |  WHERE c.doc_id NOT IN (SELECT doc_id FROM victims)),
         |bkt AS (
         |  SELECT doc_id, text,
         |    ((((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296)
         |      + 4294967296) % 4294967296 AS bucket
         |  FROM surv),
         |spl AS (
         |  SELECT doc_id, text,
         |    CASE WHEN bucket < ${pipeline.Sampling.rateCutoff(0.7)} THEN 0
         |         WHEN bucket < ${pipeline.Sampling.rateCutoff(0.7 + 0.2)} THEN 1
         |         ELSE 2 END AS split_idx
         |  FROM bkt),
         |agg AS (
         |  SELECT split_idx, count(*) AS n_docs, sum(doc_id) AS id_sum,
         |    sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS n_tokens
         |  FROM spl GROUP BY 1)
         |SELECT g.split_idx, coalesce(n_docs, 0) AS n_docs,
         |  CAST(id_sum AS BIGINT) AS id_sum, CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM (VALUES (0), (1), (2)) g(split_idx) LEFT JOIN agg USING (split_idx)
         |ORDER BY g.split_idx""".stripMargin,
    "p_fingerprint" ->
      """SELECT count(*) AS n_docs,
        | count(DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS n_distinct_fp
        |FROM documents""".stripMargin,
    "p_ann_ivf" -> ANN_TOP5_SQL,
    // product quantization: min-id codebooks, per-subspace argmin
    // encoding (ties to the lowest index), query ADC tables, and the
    // fixed-order lookup sum — fully re-derived, bit-exact double math.
    // The IVF-PQ gate runs at full probe, so the identical oracle pins
    // the composed coarse-quantizer + ADC pipeline too.
    "p_ann_pq" -> ANN_PQ_SQL,
    "p_ann_ivfpq" -> ANN_PQ_SQL,
    "p_ann_recall" -> ANN_RECALL_SQL,
    // frame arithmetic: 64-byte frames, every 2nd sampled, ragged last
    // frame — all integer math on the UTF-8 payload size, exact in SQL
    "p_multimodal" ->
      """WITH d AS (
        |  SELECT doc_id, source, octet_length(encode(text)) AS nb FROM documents),
        |f AS (
        |  SELECT source, nb,
        |    CAST(ceil(nb / 64.0) AS BIGINT) AS nf,
        |    CAST(ceil(ceil(nb / 64.0) / 2.0) AS BIGINT) AS ns
        |  FROM d),
        |g AS (
        |  SELECT source, nb, ns,
        |    CASE WHEN (nf - 1) % 2 = 0 THEN 64 * (ns - 1) + (nb - 64 * (nf - 1))
        |         ELSE 64 * ns END AS fb
        |  FROM f WHERE ns > 0)
        |SELECT source,
        |  count(*) AS n_docs,
        |  CAST(sum(ns) AS BIGINT) AS n_frames,
        |  round(sum(nb * ns) * 1.0 / sum(ns), 2) AS avg_bytes,
        |  CAST(sum(fb) AS BIGINT) AS sum_frame_bytes
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    // REAL media decode: Spark builds WAV/BMP containers from integer
    // recipes (MediaSynth), decodes them with javax.sound / javax.imageio,
    // and this oracle recomputes the expected decoded statistics from the
    // SAME recipes purely arithmetically — encode and decode cannot share
    // a canceling error with the oracle
    "p_media_decode" ->
      """WITH a AS (
        |  SELECT d.lang, ((31 * d.doc_id + 7 * s.i) % 65521) - 32760 AS smp
        |  FROM documents d,
        |    LATERAL (SELECT unnest(range(0, 64 + d.doc_id % 129)) AS i) s),
        |ast AS (
        |  SELECT lang, count(*) AS n, sum(smp) AS sm, sum(smp * smp) AS sq,
        |         min(smp) AS mn, max(smp) AS mx
        |  FROM a GROUP BY 1),
        |px AS (
        |  SELECT d.lang,
        |    (d.doc_id + 3 * (s.i % (8 + d.doc_id % 9)) + 5 * (s.i // (8 + d.doc_id % 9))) % 256 AS r,
        |    (2 * d.doc_id + 7 * (s.i % (8 + d.doc_id % 9)) + (s.i // (8 + d.doc_id % 9))) % 256 AS g,
        |    (5 * d.doc_id + (s.i % (8 + d.doc_id % 9)) + 11 * (s.i // (8 + d.doc_id % 9))) % 256 AS b
        |  FROM documents d,
        |    LATERAL (SELECT unnest(range(0, (8 + d.doc_id % 9) * (8 + d.doc_id % 7))) AS i) s),
        |ist AS (
        |  SELECT lang, count(*) AS np, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb
        |  FROM px GROUP BY 1),
        |nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT nd.lang, n_docs,
        |  CAST(n AS BIGINT) AS a_n_samples, CAST(sm AS BIGINT) AS a_sum,
        |  CAST(sq AS BIGINT) AS a_sum_sq, CAST(mn AS BIGINT) AS a_min,
        |  CAST(mx AS BIGINT) AS a_max,
        |  CAST(np AS BIGINT) AS i_n_pixels, CAST(sr AS BIGINT) AS i_sum_r,
        |  CAST(sg AS BIGINT) AS i_sum_g, CAST(sb AS BIGINT) AS i_sum_b
        |FROM nd JOIN ast USING (lang) JOIN ist USING (lang)
        |ORDER BY lang""".stripMargin,
    // Malformed-media tolerance: doc_id % 5 == 0 carries garbage bytes,
    // % 5 == 1 a stereo WAV the mono-only codec rejects — both must
    // decode to the zero vector (job survives), counted via the
    // n_samples == 0 contract; stats cover only the decodable remainder
    "p_media_decode_robust" ->
      """WITH a AS (
        |  SELECT d.lang, ((31 * d.doc_id + 7 * s.i) % 65521) - 32760 AS smp
        |  FROM documents d,
        |    LATERAL (SELECT unnest(range(0, 64 + d.doc_id % 129)) AS i) s
        |  WHERE d.doc_id % 5 >= 2),
        |ast AS (
        |  SELECT lang, count(*) AS n, sum(smp) AS sm, sum(smp * smp) AS sq,
        |         min(smp) AS mn, max(smp) AS mx
        |  FROM a GROUP BY 1),
        |nd AS (
        |  SELECT lang, count(*) AS n_docs,
        |    count(*) FILTER (WHERE doc_id % 5 <= 1) AS n_undec
        |  FROM documents GROUP BY 1)
        |SELECT nd.lang, n_docs, CAST(n_undec AS BIGINT) AS n_undecodable,
        |  CAST(n AS BIGINT) AS a_n_samples, CAST(sm AS BIGINT) AS a_sum,
        |  CAST(sq AS BIGINT) AS a_sum_sq, CAST(mn AS BIGINT) AS a_min,
        |  CAST(mx AS BIGINT) AS a_max
        |FROM nd JOIN ast USING (lang)
        |ORDER BY lang""".stripMargin,
    "p_embedding_dedup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 1.1)
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |  FROM base a JOIN base b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b FROM p WHERE cos >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,
    "p_embedding_dedup_lsh" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 1.1)
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |  FROM base a JOIN base b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b FROM p WHERE cos >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,
    "p_token_vocab" ->
      """SELECT count(DISTINCT t) AS n_distinct_tokens, count(*) AS n_tokens
        |FROM (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |  FROM documents)""".stripMargin,
    // Non-distinct bigram occurrence counts per doc; total = len-1
    // (short docs: the whole token sequence is the one n-gram). top =
    // max count, dup = occurrences of any gram seen more than once —
    // the Gopher repetition-filter quantities.
    "p_ngram_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 2 THEN t[i] || ' ' || t[i+1]
        |         ELSE array_to_string(t, ' ') END AS s
        |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t), 2))) AS i)),
        |cnt AS (SELECT doc_id, s, count(*) AS c FROM g GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, sum(c) AS total, max(c) AS top,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
        |  FROM cnt GROUP BY 1)
        |SELECT doc_id,
        |  round(top * 1.0 / total, 6) AS top_frac,
        |  round(dup * 1.0 / total, 6) AS dup_frac
        |FROM agg ORDER BY doc_id""".stripMargin,
    // Same deterministic synthesized-PII text on both engines; the gate
    // compares exact redacted strings, pinning Java-regex == RE2
    // behavior for the three (deliberately RE2-compatible) patterns.
    "p_pii_redaction" ->
      """WITH t AS (
        |  SELECT c_custkey,
        |    concat_ws(' ', c_name, 'contact',
        |      lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
        |        || '@corp-' || c_nationkey || '.example.com',
        |      'from',
        |      '10.' || (c_custkey % 256) || '.' || (c_custkey % 100)
        |        || '.' || (c_custkey % 7 + 1),
        |      'tel',
        |      (c_custkey % 90 + 10) || '-' || (c_custkey % 900 + 100) || '-'
        |        || (c_custkey * 7 % 900 + 100) || '-' || (c_custkey * 13 % 9000 + 1000),
        |      c_mktsegment) AS text
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{2,4}[-. ]\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM t ORDER BY c_custkey""".stripMargin,
    // tier-2 PII: fixture check digits (Luhn + ISO 7064 mod-97) AND the
    // candidate-extraction + checksum-validated replacement replayed —
    // valid cards/IBANs redact, the check+1 twins must survive
    "p_pii_redaction2" -> piiRedaction2Sql,
    // main-content extraction: raw block split, per-block tag strip,
    // anchor-char sums, word/stopword counts, the three cross-multiplied
    // integer verdicts, and the per-doc good-block join — all re-derived
    "p_main_content" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<div><a href="/">Home</a> <a href="/about">About pages</a>'
         |      || ' <a href="/contact">Contact</a></div><p>'
         |      || coalesce(text, '')
         |      || ' the data is a good run and it is the best of all for it'
         |      || '</p><ul><li><a href="/1">first link here</a></li>'
         |      || '<li><a href="/2">second link</a></li></ul>'
         |      || '<p>short note</p>'
         |      || '<div>Copyright 2099 Example Corp rights reserved</div>' AS html
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    regexp_split_to_array(html,
         |      '(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|br|hr|section|article|aside|header|footer|nav|blockquote|pre|form)\\b[^>]*>') AS bl
         |  FROM h),
         |e AS (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, bl[CAST(i AS INT)] AS blk
         |  FROM b, LATERAL (SELECT unnest(range(1, len(bl) + 1)) AS i)),
         |f AS (
         |  SELECT doc_id, idx,
         |    trim(regexp_replace(regexp_replace(blk, '<[^>]+>', ' ', 'g'),
         |      '\\s+', ' ', 'g')) AS txt,
         |    CAST(coalesce(list_sum(list_transform(
         |      regexp_extract_all(blk, '(?i)<a\\b[^>]*>([^<]*)</a>', 1),
         |      x -> length(x))), 0) AS BIGINT) AS link_chars
         |  FROM e),
         |g AS (
         |  SELECT doc_id, idx, txt, link_chars,
         |    CAST(len(list_filter(string_split(lower(txt), ' '),
         |      t -> length(t) > 0)) AS BIGINT) AS n_words,
         |    CAST(len(list_filter(string_split(lower(txt), ' '),
         |      t -> list_contains($EN, t))) AS BIGINT) AS n_stop,
         |    CAST(length(txt) AS BIGINT) AS text_chars
         |  FROM f WHERE length(txt) > 0),
         |v AS (
         |  SELECT doc_id, idx, txt, n_words, n_stop, link_chars, text_chars,
         |    (n_words >= 5 AND link_chars * 3 <= text_chars
         |      AND n_stop * 10 >= n_words * 1) AS good
         |  FROM g),
         |mc AS (
         |  SELECT doc_id,
         |    coalesce(string_agg(txt, chr(10) ORDER BY idx) FILTER (WHERE good), '') AS text_main
         |  FROM v GROUP BY doc_id)
         |SELECT v.doc_id, v.idx, v.n_words, v.n_stop, v.link_chars,
         |  v.text_chars, v.good, mc.text_main
         |FROM v JOIN mc USING (doc_id)
         |ORDER BY doc_id, idx""".stripMargin,
    "p_tfidf_top_terms" ->
      """WITH toks AS (
        |  SELECT lang AS grp, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT grp, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT lang) AS ng FROM documents),
        |scored AS (
        |  SELECT grp, token, tf, df,
        |    round(tf * ln(1 + ng * 1.0 / df), 6) AS tfidf
        |  FROM tf JOIN df USING (token), n),
        |r AS (
        |  SELECT grp, token, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY grp
        |      ORDER BY tfidf DESC, tf DESC, token ASC) AS rnk
        |  FROM scored)
        |SELECT grp, token, tf, df, tfidf, rnk FROM r WHERE rnk <= 5
        |ORDER BY grp, rnk""".stripMargin,
    // BM25: the oracle re-derives posting collapse, df, the 6dp-snapped
    // idf (ln is the one transcendental — snapped immediately on both
    // engines), the order-fixed tf-norm arithmetic ((tf*2.2)/(tf+1.2*
    // (0.25+(0.75*dl)/avgdl)) exactly as the Scala Column tree
    // associates), the per-term DECIMAL(18,6) snap+sum (exact,
    // order-independent), and the (score desc, doc_id asc) ranking.
    // Shared by all three plans: corpus-scan (p_bm25), prebuilt-index
    // (p_bm25_indexed), and collected-broadcast-index map-side scoring
    // (p_bm25_broadcast) — one contract, so the paths cannot drift.
    "p_bm25" -> BM25_SQL,
    "p_bm25_indexed" -> BM25_SQL,
    "p_bm25_broadcast" -> BM25_SQL,
    // incrementally-extended artifact == full rebuild: same oracle
    "p_bm25_incr" -> BM25_SQL,
    "p_rank_fusion" -> RANK_FUSION_SQL,
    "p_hybrid_dense" -> HYBRID_DENSE_SQL,
    "p_contrastive" -> CONTRASTIVE_SQL,
    // ranking-metrics harness: the shared BM25 CTE plus the graded qrel
    // rule, the 6dp-snapped rel*ln2/ln(rank+1) discount terms (ln2 as
    // the fixed double literal on both engines), exact micro sums, and
    // the rr/p@k/ndcg ratios; queries with no hit keep a null-best_rank
    // zero-metric row
    "p_rank_metrics" ->
      s"""$BM25_CTE,
         |qrel AS (
         |  SELECT a.query_id, b.doc_id,
         |    CASE WHEN a.query_id = b.doc_id THEN CAST(2.0 AS DOUBLE)
         |         ELSE CAST(1.0 AS DOUBLE) END AS rel
         |  FROM (SELECT doc_id AS query_id FROM documents WHERE doc_id % 50 = 0) a,
         |       (SELECT doc_id FROM documents WHERE doc_id % 50 = 0) b),
         |h AS (
         |  SELECT r.query_id, CAST(count(*) AS BIGINT) AS n_hits,
         |    CAST(min(r.rnk) AS BIGINT) AS best_rank,
         |    CAST(sum(CAST(floor(round(
         |      q2.rel * CAST(0.6931471805599453 AS DOUBLE) / ln(r.rnk + 1), 6)
         |      * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS dcg_micro
         |  FROM r JOIN qrel q2 ON r.query_id = q2.query_id AND r.doc_id = q2.doc_id
         |  WHERE r.rnk <= 10 GROUP BY 1),
         |idl AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel,
         |    CAST(sum(CASE WHEN irank <= 10 THEN
         |      CAST(floor(round(
         |        rel * CAST(0.6931471805599453 AS DOUBLE) / ln(irank + 1), 6)
         |        * 1000000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS idcg_micro
         |  FROM (
         |    SELECT query_id, rel,
         |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC) AS irank
         |    FROM qrel)
         |  GROUP BY 1)
         |SELECT idl.query_id, idl.n_rel,
         |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  h.best_rank,
         |  CAST(coalesce(floor(1000000.0 / h.best_rank + 0.5), 0) AS BIGINT)
         |    AS rr_micro,
         |  CAST(floor(coalesce(h.n_hits, 0) * 1000000.0 / 10 + 0.5) AS BIGINT)
         |    AS p_at_k_micro,
         |  CAST(coalesce(h.dcg_micro, 0) AS BIGINT) AS dcg_micro,
         |  idl.idcg_micro,
         |  CAST(coalesce(
         |    floor(CAST(h.dcg_micro AS DOUBLE) * 1000000
         |      / CAST(idl.idcg_micro AS DOUBLE) + 0.5), 0) AS BIGINT) AS ndcg_micro
         |FROM idl LEFT JOIN h ON idl.query_id = h.query_id
         |ORDER BY idl.query_id""".stripMargin,
    // map-side collected-index hybrid == distributed hybrid: same oracle
    "p_hybrid_broadcast" -> RANK_FUSION_SQL,
    // stupid-backoff bigram LM (Brants 2007): count tables, vocab-side
    // probability enrichment with the exact association order the Scala
    // Column tree uses (c2/c_prev; (0.4*c1)/N; (0.4*0.4)/N), log10
    // snapped to 6dp the moment it is computed (DuckDB log() IS log10),
    // DECIMAL(18,6) per-position sums, and ppl = 10^-avg snapped at 4dp
    // right after each engine's pow. Every input doc keeps a row:
    // sub-two-token docs via the final LEFT JOIN (n_scored = 0).
    "p_lm_score" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $TOKS AS t FROM documents),
         |pos0 AS (
         |  SELECT doc_id, unnest(generate_series(1, len(t) - 1)) AS i, t
         |  FROM toks),
         |pos AS (
         |  SELECT doc_id, t[i] AS prev, t[i + 1] AS cur FROM pos0),
         |uni AS (
         |  SELECT token, count(*) AS c1
         |  FROM (SELECT unnest(t) AS token FROM toks) GROUP BY 1),
         |big AS (
         |  SELECT prev, cur, count(*) AS c2 FROM pos GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM uni),
         |cond AS (
         |  SELECT b.prev, b.cur,
         |    CAST(b.c2 AS DOUBLE) / CAST(u.c1 AS DOUBLE) AS p_cond
         |  FROM big b JOIN uni u ON b.prev = u.token),
         |back AS (
         |  SELECT token AS cur,
         |    (CAST(0.4 AS DOUBLE) * c1) / CAST(t.n_total AS DOUBLE) AS p_back
         |  FROM uni, tot t),
         |scored AS (
         |  SELECT p.doc_id,
         |    CAST(round(log(
         |      CASE WHEN c.p_cond IS NOT NULL THEN c.p_cond
         |           WHEN bk.p_back IS NOT NULL THEN bk.p_back
         |           ELSE (CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE))
         |                / CAST(t.n_total AS DOUBLE) END), 6)
         |      AS DECIMAL(18,6)) AS term_lp
         |  FROM pos p
         |  LEFT JOIN cond c ON p.prev = c.prev AND p.cur = c.cur
         |  LEFT JOIN back bk ON p.cur = bk.cur, tot t),
         |agg AS (
         |  SELECT doc_id, count(term_lp) AS n_scored,
         |    round(CAST(sum(term_lp) AS DOUBLE)
         |      / CAST(count(term_lp) AS DOUBLE), 6) AS avg_logp
         |  FROM scored GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(a.n_scored, 0) AS BIGINT) AS n_scored,
         |  a.avg_logp,
         |  round(power(CAST(10 AS DOUBLE), -a.avg_logp), 4) AS ppl
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "p_decontaminate" -> DECONTAM_SQL,
    // near-dup decontamination: the Spark side proposes with MinHash
    // banding and verifies with exact shingle Jaccard, so the oracle is
    // the FULL exact cross-corpus Jaccard report (propose/verify makes
    // the output exact whenever banding recall is 1 at the threshold,
    // which holds for this corpus's planted dup structure). String
    // shingles here vs 64-bit shingle hashes there — agreement also
    // pins the hash path collision-free on this corpus.
    // semantic decontamination: EXACT cross-corpus cosine oracle — every
    // corpus x eval dot product (eval = x1.1-scaled %25 vectors under
    // +1000000 ids), 6dp snap, threshold, per-doc count + max, left
    // join to the full corpus (clean docs: 0 matches, null max)
    "p_decontaminate_semantic" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ev AS (
        |  SELECT vec_id + 1000000 AS eval_id,
        |    list_transform(embedding::DOUBLE[], x -> x * 1.1) AS ev
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |p AS (
        |  SELECT c.vec_id AS doc_id, e.eval_id,
        |    round(list_dot_product(c.v, e.ev) /
        |      (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(e.ev, e.ev))), 6) AS cos
        |  FROM corpus c, ev e),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_eval_matches, max(cos) AS max_cos
        |  FROM p WHERE cos >= 0.95 GROUP BY doc_id)
        |SELECT c.vec_id AS doc_id,
        |  coalesce(h.n_eval_matches, 0) AS n_eval_matches,
        |  h.max_cos
        |FROM corpus c LEFT JOIN hits h ON c.vec_id = h.doc_id
        |ORDER BY doc_id""".stripMargin,
    "p_decontaminate_neardup" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |shing AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |         ELSE array_to_string(t, ' ') END AS s
        |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 2))) AS i)),
        |dsh AS (SELECT DISTINCT doc_id, s FROM shing),
        |sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id, b.doc_id AS eval_id, count(*) AS c
        |  FROM dsh a JOIN dsh b ON a.s = b.s
        |  WHERE a.doc_id % 10 != 0 AND b.doc_id % 10 = 0
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id, eval_id, c * 1.0 / (sa.n + sb.n - c) AS jaccard
        |  FROM inter
        |  JOIN sizes sa ON id = sa.doc_id
        |  JOIN sizes sb ON eval_id = sb.doc_id
        |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
        |agg AS (
        |  SELECT id AS doc_id, count(*) AS n_eval_matches,
        |    max(round(jaccard, 6)) AS max_jaccard
        |  FROM j GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(a.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
        |  a.max_jaccard
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |WHERE d.doc_id % 10 != 0
        |ORDER BY d.doc_id""".stripMargin,
    "p_decontaminate_bcast" -> DECONTAM_SQL,
    // bloom is propose-only: the verify stage makes the output exact, so
    // all three decontamination paths share ONE oracle
    "p_decontaminate_bloom" -> DECONTAM_SQL,
    // Composed Gopher-style filter: every threshold compares the same
    // 1e-6-rounded value its per-signal gate pins; sum_quality summed
    // as DECIMAL(18,6) on both engines (order-independent exact sum).
    "p_quality_filter" ->
      s"""WITH enriched AS (
         |  SELECT doc_id,
         |    CASE
         |      WHEN doc_id % 15 = 0 THEN 'alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega'
         |      WHEN doc_id % 5 = 1 THEN text || ' der die und das ist ein nicht mit auf zu zu auf mit nicht ein ist das und die der'
         |      WHEN doc_id % 5 = 2 THEN text || ' le la et les des est une dans que pour pour que dans une est des les et la le'
         |      WHEN doc_id % 5 = 3 THEN text || ' el la que de los una es por con para para con por es una los de que la el'
         |      WHEN doc_id % 5 = 4 THEN text || ' le el et de les los des una est es une por dans con pour para para pour con dans por une es est una des los les de et el le'
         |      ELSE text END AS text
         |  FROM documents),
         |base AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
         |  FROM enriched),
         |rep AS (
         |  SELECT doc_id, sum(c) AS total, max(c) AS top,
         |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
         |  FROM (
         |    SELECT doc_id, s, count(*) AS c FROM (
         |      SELECT doc_id,
         |        CASE WHEN len(t) >= 2 THEN t[i] || ' ' || t[i+1]
         |             ELSE array_to_string(t, ' ') END AS s
         |      FROM base, LATERAL (SELECT unnest(range(1, greatest(len(t), 2))) AS i))
         |    GROUP BY 1, 2)
         |  GROUP BY 1),
         |sig AS (
         |  SELECT b.doc_id,
         |    round(
         |      least(len(t) / 100.0, 1.0) * 0.5
         |      + (len(list_distinct(t)) * 1.0 / len(t)) * 0.3
         |      + least((len(list_filter(t, x -> list_contains($EN, x))) * 1.0 / len(t)) * 4.0, 1.0) * 0.2,
         |      6) AS q,
         |    round(top * 1.0 / total, 6) AS top2,
         |    round(dup * 1.0 / total, 6) AS dup2,
         |    len(list_filter(t, x -> list_contains($EN, x))) AS en,
         |    len(list_filter(t, x -> list_contains(['der','die','und','das','ist','ein','nicht','mit','auf','zu'], x))) AS de,
         |    len(list_filter(t, x -> list_contains(['le','la','et','les','des','est','une','dans','que','pour'], x))) AS fr,
         |    len(list_filter(t, x -> list_contains(['el','la','que','de','los','una','es','por','con','para'], x))) AS es
         |  FROM base b JOIN rep USING (doc_id))
         |SELECT
         |  CASE
         |    WHEN greatest(en, de, fr, es) <= 0 THEN 'und'
         |    WHEN en = greatest(en, de, fr, es) THEN 'en'
         |    WHEN de = greatest(en, de, fr, es) THEN 'de'
         |    WHEN fr = greatest(en, de, fr, es) THEN 'fr'
         |    WHEN es = greatest(en, de, fr, es) THEN 'es'
         |    ELSE 'und' END AS lang_pred,
         |  count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) AS sum_quality
         |FROM sig
         |WHERE q >= 0.40 AND top2 <= 0.06 AND dup2 <= 0.12
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p_ann_brute_force" -> ANN_TOP5_SQL,
    "p_corpus_pipeline" ->
      s"""WITH toks AS (
         | SELECT doc_id, source, text, $TOKS AS tk FROM documents),
         |scored AS (
         | SELECT doc_id, source, text, tk,
         |  round(least(len(tk) / 100.0, 1.0) * 0.5
         |    + (len(list_distinct(tk)) * 1.0 / len(tk)) * 0.3
         |    + least((len(list_filter(tk, t -> list_contains($EN, t))) * 1.0 / len(tk)) * 4.0, 1.0) * 0.2,
         |    6) AS q,
         |  len(list_filter(tk, t -> list_contains($EN, t))) AS en,
         |  len(list_filter(tk, t -> list_contains(['der','die','und','das','ist','ein','nicht','mit','auf','zu'], t))) AS de,
         |  len(list_filter(tk, t -> list_contains(['le','la','et','les','des','est','une','dans','que','pour'], t))) AS fr,
         |  len(list_filter(tk, t -> list_contains(['el','la','que','de','los','una','es','por','con','para'], t))) AS es
         | FROM toks),
         |cleaned AS (
         | SELECT * FROM scored
         | WHERE q >= 0.5 AND greatest(en, de, fr, es) > 0 AND en = greatest(en, de, fr, es)),
         |keep AS (
         | SELECT min(doc_id) AS doc_id FROM cleaned
         | GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))),
         |surv AS (SELECT c.* FROM cleaned c JOIN keep k ON c.doc_id = k.doc_id)
         |SELECT source, count(*) AS n_docs, CAST(sum(len(tk)) AS BIGINT) AS n_tokens
         |FROM surv
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,
    "p_weighted_median" ->
      """WITH w AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(l_quantity) OVER (PARTITION BY l_returnflag) AS total
        |  FROM lineitem)
        |SELECT l_returnflag, min(v) AS wm_price
        |FROM w
        |WHERE cum >= 0.5 * total
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "p_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |m AS (
        |  SELECT user_id,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |              OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT user_id,
        |  CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM m
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // the salted join must be indistinguishable from the plain join — the
    // salt only routes rows to reducers
    "p_skew_join" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_suppkey % 4 = 0 THEN -1 ELSE l_suppkey END AS skew_key,
        |         l_returnflag, l_quantity FROM lineitem),
        |s AS (
        |  SELECT CASE WHEN s_suppkey % 4 = 0 THEN -1 ELSE s_suppkey END AS skew_key,
        |         count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT l_returnflag,
        |       count(*) AS n_rows,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       CAST(sum(n_supp) AS BIGINT) AS sum_supp
        |FROM li JOIN s USING (skew_key)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // connected components over the exact-Jaccard pair graph: min
    // reachable id per vertex via a recursive closure — pins the Spark
    // min-label-propagation loop end to end
    "p_dedup_components" ->
      s"""WITH RECURSIVE pr AS ($JACCARD_PAIRS_SQL),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pr
        |  UNION SELECT doc_b AS a, doc_a AS b FROM pr),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (
        |  SELECT src AS id, least(src, min(dst)) AS component
        |  FROM reach GROUP BY src)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
        |       CAST(sum(CASE WHEN id <> component THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        |FROM comp""".stripMargin,

    // survivor-priority dedup: same recursive closure, then a window keeps
    // the longest doc (ties min id) per component; unpaired docs pass
    // through untouched
    "p_dedup_survivors" ->
      s"""WITH RECURSIVE pr AS ($JACCARD_PAIRS_SQL),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pr
        |  UNION SELECT doc_b AS a, doc_a AS b FROM pr),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (
        |  SELECT src AS id, least(src, min(dst)) AS component
        |  FROM reach GROUP BY src),
        |ranked AS (
        |  SELECT c.id,
        |    row_number() OVER (PARTITION BY c.component
        |      ORDER BY d.n_chars DESC, c.id ASC) AS rk
        |  FROM comp c JOIN documents d ON d.doc_id = c.id),
        |surv AS (
        |  SELECT * FROM documents
        |  WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rk > 1))
        |SELECT source,
        |       count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_id
        |FROM surv
        |GROUP BY 1
        |ORDER BY 1""".stripMargin
  )
}
