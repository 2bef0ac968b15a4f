package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusStats, Decontaminate, TextFunctions => TF}

/** Round-10 corpus operators: n-gram repetition signals, PII redaction,
  * TF-IDF corpus stats, benchmark decontamination.
  */
class CorpusOpsSuite extends SparkSpec {

  private def oneRow(df: DataFrame): org.apache.spark.sql.Row = df.head()

  // ------------------------------------------------------------- repetition

  test("ngram repetition: hand-computed fixtures") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b a b a"),    // bigrams: "a b"x2, "b a"x2 -> top 0.5, dup 1.0
      (2L, "a b c d"),      // 3 distinct bigrams -> top 1/3, dup 0
      (3L, "x"),            // short doc: whole seq is the one gram
      (4L, "t t t t")       // "t t"x3 -> top 1.0, dup 1.0
    ).toDF("doc_id", "text")
    val out = df.select(
        col("doc_id"),
        round(TF.topNgramFraction(col("text"), 2), 6).as("top"),
        round(TF.dupNgramFraction(col("text"), 2), 6).as("dup"))
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(1) === 0.5 && out(0).getDouble(2) === 1.0)
    assert(out(1).getDouble(1) === 0.333333 && out(1).getDouble(2) === 0.0)
    assert(out(2).getDouble(1) === 1.0 && out(2).getDouble(2) === 0.0)
    assert(out(3).getDouble(1) === 1.0 && out(3).getDouble(2) === 1.0)
  }

  test("ngram repetition: null text yields null, SQL twin matches Column API") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("u v u v w")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val viaCol = df.select(TF.repetitionSignals(col("text"), 2).as("r"))
      .orderBy(lit(1)).collect()
    assert(viaCol.exists(_.isNullAt(0)))
    org.apache.spark.sql.graft.GraftExpressions.register(s)
    df.createOrReplaceTempView("rep_docs")
    val viaSql = s.sql(
      """SELECT ngram_repetition(split(lower(trim(text)), '\\s+'), 2) AS r
        |FROM rep_docs WHERE text IS NOT NULL""".stripMargin).head().getSeq[Double](0)
    val expected = df.filter(col("text").isNotNull)
      .select(TF.repetitionSignals(col("text"), 2)).head().getSeq[Double](0)
    assert(viaSql === expected)
  }

  // -------------------------------------------------------------- redaction

  test("PII redaction: emails, IPv4s, phones replaced; lookalikes kept") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      ("contact john.doe+spam@mail.example.org now",
       "contact <EMAIL> now"),
      ("server 192.168.0.1 down", "server <IP> down"),
      ("call 123-456-789-0123 or 22.333.444.5555",
       "call <PHONE> or <PHONE>"),
      // embedded in a word: no boundary, must NOT redact
      ("release v1.2.3.4 shipped", "release v1.2.3.4 shipped"),
      // wrong group shape: not a phone
      ("code 12-34-56 stays", "code 12-34-56 stays"),
      ("mail a@b.co ip 8.8.8.8 tel 10-200-300-4000 end",
       "mail <EMAIL> ip <IP> tel <PHONE> end"))
    val out = cases.toDF("text", "expected")
      .select(TF.redactPii(col("text")).as("got"), col("expected"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("PII tier 2: SSN, Luhn-validated cards, mod-97-validated IBANs") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // SSN shape redacts; 3-2-4 inside other digit shapes does not fire
      ("ssn 123-45-6789 here", "ssn <SSN> here"),
      // the canonical Luhn-valid test PAN, grouped and contiguous
      ("pay 4111-1111-1111-1111 now", "pay <CC> now"),
      ("pay 4111 1111 1111 1111 now", "pay <CC> now"),
      ("pan 4111111111111111 ok", "pan <CC> ok"),
      // same digits, last one bumped: Luhn fails -> candidate KEPT
      ("pay 4111-1111-1111-1112 now", "pay 4111-1111-1111-1112 now"),
      ("id 1234567890123456 stays", "id 1234567890123456 stays"),
      // the canonical example IBAN (valid) and a one-digit mutation
      ("iban DE89370400440532013000 ok", "iban <IBAN> ok"),
      ("iban DE89370400440532013001 bad stays",
       "iban DE89370400440532013001 bad stays"),
      // tier-1 classes still redact through the tier-2 chain
      ("mail a@b.co ip 8.8.8.8 tel 10-200-300-4000 ssn 987-65-4320",
       "mail <EMAIL> ip <IP> tel <PHONE> ssn <SSN>"),
      // two valid cards in one doc: both literal-replaced
      ("cards 4111111111111111 and 5500-0000-0000-0004 both",
       "cards <CC> and <CC> both"))
    val out = cases.toDF("text", "expected")
      .select(TF.redactPii2(col("text")).as("got"), col("expected"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  // ------------------------------------------------------------------ tfidf

  test("tfidf top terms: hand-computed two-group fixture") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("g1", "apple banana apple"),
      ("g2", "banana cherry")
    ).toDF("grp_in", "text")
    val out = CorpusStats.tfidfTopTerms(docs, "grp_in", "text", 2)
      .orderBy("grp", "rnk").collect()
    // df: apple 1, banana 2, cherry 1; nGroups = 2; the product is
    // rounded (not the log), so expectations round tf * ln(...)
    val ln3 = math.round(math.log(3.0) * 1e6) / 1e6
    val ln2 = math.round(math.log(2.0) * 1e6) / 1e6
    val twoLn3 = math.round(2 * math.log(3.0) * 1e6) / 1e6
    assert(out.length === 4)
    val g1 = out.filter(_.getString(0) == "g1")
    assert(g1(0).getString(1) === "apple" && g1(0).getLong(2) === 2L &&
      g1(0).getLong(3) === 1L && g1(0).getDouble(4) === twoLn3 && g1(0).getLong(5) === 1L)
    assert(g1(1).getString(1) === "banana" && g1(1).getDouble(4) === ln2)
    val g2 = out.filter(_.getString(0) == "g2")
    assert(g2(0).getString(1) === "cherry" && g2(0).getDouble(4) === ln3)
    assert(g2(1).getString(1) === "banana" && g2(1).getDouble(4) === ln2)
  }

  test("tfidf top terms: k bounds output per group, ties break by token") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("a", "z y x w v"),
      ("b", "z y x w v")
    ).toDF("g", "text")
    val out = CorpusStats.tfidfTopTerms(docs, "g", "text", 3)
      .orderBy("grp", "rnk").collect()
    assert(out.length === 6)
    // all tf=1, df=2 -> identical tfidf; token asc breaks the tie
    assert(out.filter(_.getString(0) == "a").map(_.getString(1)).toSeq === Seq("v", "w", "x"))
  }

  // --------------------------------------------------------- decontaminate

  private lazy val decontFixture = {
    val s = spark
    import s.implicits._
    val train = Seq(
      (1L, "five one two three six"),   // shares trigram "one two three"
      (2L, "alpha beta gamma delta"),   // clean
      (3L, "one two"),                  // short, no eval overlap
      (4L, "tiny doc")                  // exact short-doc eval dup
    ).toDF("doc_id", "text")
    val evalDocs = Seq("one two three four", "tiny doc").toDF("text")
    (train, evalDocs)
  }

  test("contamination report: per-doc distinct-ngram hit accounting") {
    val (train, evalDocs) = decontFixture
    val rep = Decontaminate
      .contaminationReport(train, "doc_id", "text", evalDocs, "text", 3)
      .orderBy("doc_id").collect()
    assert(rep.length === 4)
    // (n_ngrams, n_hits, contaminated)
    assert(rep(0).getLong(1) === 3L && rep(0).getLong(2) === 1L && rep(0).getBoolean(4))
    assert(rep(1).getLong(1) === 2L && rep(1).getLong(2) === 0L && !rep(1).getBoolean(4))
    assert(rep(2).getLong(1) === 1L && rep(2).getLong(2) === 0L && !rep(2).getBoolean(4))
    assert(rep(3).getLong(1) === 1L && rep(3).getLong(2) === 1L && rep(3).getBoolean(4))
    assert(math.abs(rep(0).getDouble(3) - 0.333333) < 1e-9)
  }

  test("markContaminated: map-only path matches the join-based report, keeps columns") {
    val (train, evalDocs) = decontFixture
    val grams = Decontaminate.evalGramArray(evalDocs, "text", 3)
    val marked = Decontaminate.markContaminated(train, "text", 3, grams)
    assert(marked.columns.take(train.columns.length).toSeq === train.columns.toSeq)
    val viaMap = marked
      .select("doc_id", "n_ngrams", "n_hits", "contamination", "contaminated")
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaJoin = Decontaminate
      .contaminationReport(train, "doc_id", "text", evalDocs, "text", 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaMap.toSeq === viaJoin.toSeq)
    // map-only contract: no exchange anywhere in the marking plan
    val plan = marked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("null-text docs get a (0, 0, null, false) row on BOTH decontamination paths") {
    val s = spark
    import s.implicits._
    val (train, evalDocs) = decontFixture
    val withNull = train.unionByName(
      Seq((99L, null: String)).toDF("doc_id", "text"))
    val viaJoin = Decontaminate
      .contaminationReport(withNull, "doc_id", "text", evalDocs, "text", 3)
      .orderBy("doc_id").collect()
    // every input doc still gets a row
    assert(viaJoin.length === 5)
    val nullRow = viaJoin.last
    assert(nullRow.getLong(0) === 99L)
    assert(nullRow.getLong(1) === 0L && nullRow.getLong(2) === 0L)
    assert(nullRow.isNullAt(3), "contamination must be null (0/0) for gram-less docs")
    assert(!nullRow.getBoolean(4))
    // and the map-only path agrees exactly (this used to NPE)
    val grams = Decontaminate.evalGramArray(evalDocs, "text", 3)
    val viaMap = Decontaminate.markContaminated(withNull, "text", 3, grams)
      .select("doc_id", "n_ngrams", "n_hits", "contamination", "contaminated")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaMap.toSeq === viaJoin.map(_.toSeq).toSeq)
    // a null-text doc is never flagged, so decontamination keeps it
    val clean = Decontaminate
      .decontaminatedCorpus(withNull, "doc_id", "text", evalDocs, "text", 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(clean === Seq(2L, 3L, 99L))
  }

  test("contaminationReportBloom: propose/verify parity, even when the filter saturates") {
    val s = spark
    import s.implicits._
    val (train, evalDocs) = decontFixture
    val withNull = train.unionByName(Seq((99L, null: String)).toDF("doc_id", "text"))
    val viaJoin = Decontaminate
      .contaminationReport(withNull, "doc_id", "text", evalDocs, "text", 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    // 64-bit filter: essentially every probe is a false positive — the
    // verify stage must still deliver the exact report
    val saturated = Decontaminate.contaminationReportBloom(
        withNull, "doc_id", "text", evalDocs, "text", 3, numBits = 64, numHashes = 2)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(saturated.toSeq === viaJoin.toSeq)
    // properly-sized filter: same exact result through the pruned plan
    val sized = Decontaminate.contaminationReportBloom(
        withNull, "doc_id", "text", evalDocs, "text", 3, numBits = 1 << 16)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(sized.toSeq === viaJoin.toSeq)
  }

  test("bloom_agg: partitioning-invariant build, no false negatives, FPR in band") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.graft.BloomFilter.bloom_agg
    import org.apache.spark.sql.graft.{BloomFilterAgg, BloomFilterOps}
    val xs = (0L until 1000L).map(_ * 2654435761L)
    val df = xs.toDF("x")
    val b1 = df.agg(bloom_agg(col("x"), 1 << 14, 7)).collect()(0).getAs[Array[Byte]](0)
    // OR-merge is order/partitioning-independent: bit-identical filters
    val b2 = df.repartition(13).agg(bloom_agg(col("x"), 1 << 14, 7))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(b1, b2))
    val words = BloomFilterOps.fromBytes(b1)
    // the contract downstream pruning relies on: NO false negatives
    assert(xs.forall(BloomFilterOps.contains(words, 7, _)))
    // FPR sanity on a disjoint probe set: m/n ≈ 16.4 bits/elem, k=7 ->
    // theoretical ~0.2%; assert an order-of-magnitude band, not the exact
    // value (the band is deterministic here anyway — fixed hashes)
    val fp = (1000000L until 1010000L).count(i =>
      BloomFilterOps.contains(words, 7, i * 2654435761L))
    assert(fp < 200, s"false-positive count out of band: $fp / 10000")
    // null inputs are skipped, empty input is the all-zeros identity
    val withNullRow = df.unionByName(
      Seq.empty[Long].toDF("x").withColumn("x", lit(null).cast("long")).limit(0))
      .unionByName(Seq(Option.empty[java.lang.Long]).toDF("x"))
    val b3 = withNullRow.agg(bloom_agg(col("x"), 1 << 14, 7))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(b1, b3))
    val empty = df.filter(col("x") < 0).agg(bloom_agg(col("x"), 1 << 14, 7))
      .collect()(0).getAs[Array[Byte]](0)
    assert(empty.forall(_ == 0))
    // sizing contract fails loud
    intercept[IllegalArgumentException] { BloomFilterAgg(null, 100, 7) }
    intercept[IllegalArgumentException] { BloomFilterAgg(null, 1 << 14, 0) }
    // SQL path: same filter through the registered function
    org.apache.spark.sql.graft.GraftExpressions.register(s)
    df.createOrReplaceTempView("bloom_in")
    val viaSql = s.sql("SELECT bloom_agg(x, 16384, 7) FROM bloom_in")
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(b1, viaSql))
  }

  test("markContaminated runs verbatim on a streaming frame, parity with batch") {
    val s = spark
    import s.implicits._
    val (train, evalDocs) = decontFixture
    val grams = Decontaminate.evalGramArray(evalDocs, "text", 3)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    val query = Decontaminate.markContaminated(streamDf, "text", 3, grams)
      .writeStream.format("memory").queryName("decont_stream")
      .outputMode("append").start()
    try {
      val rows = train.collect().map(r => (r.getLong(0), r.getString(1)))
      val (a, b) = rows.splitAt(2)
      mem.addData(a.toSeq); query.processAllAvailable()
      mem.addData(b.toSeq); query.processAllAvailable()
      val streamed = s.sql(
        "SELECT doc_id, n_ngrams, n_hits, contamination, contaminated FROM decont_stream")
        .orderBy("doc_id").collect().map(_.toSeq)
      val batch = Decontaminate.markContaminated(train, "text", 3, grams)
        .select("doc_id", "n_ngrams", "n_hits", "contamination", "contaminated")
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(streamed.toSeq === batch.toSeq)
    } finally query.stop()
  }

  test("contentBlocklistReport: exact-token hits, phrase runs, integer rate rule") {
    val s = spark
    import s.implicits._
    import graft.pipeline.CrawlFilters
    val docs = Seq(
      (0L, "clean text with many fine words here"),             // 7 tokens, 0 bad
      (1L, "one zzspam in forty-nine padding " + Seq.fill(44)("w").mkString(" ")), // 49 tokens, 1 bad -> ~20/1000: pass at 40
      (2L, "zzspam zzscam zzads zzspam bad heavy"),             // 6 tokens, 4 bad -> fail
      (3L, "zzspammy is not a hit nor is azzspam"),             // substring carriers: 0 bad
      (4L, "text with zzfree zzmoney inside"),                  // phrase -> fail
      (5L, "zzmoney zzfree reversed order no phrase hit okay"), // reversed: no phrase
      (6L, null.asInstanceOf[String])                           // null text: fail closed
    ).toDF("doc_id", "text")
    val got = CrawlFilters.contentBlocklistReport(docs, "text",
        badWords = Seq("zzspam", "zzscam", "zzads"),
        badPhrases = Seq("zzfree zzmoney"), maxBadPer1000 = 40)
      .select("doc_id", "n_tokens", "n_bad", "phrase_hit", "pass")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) === ((7L, 0L, 0L, 1L)))
    assert(got(1L) === ((49L, 1L, 0L, 1L)))   // 1*1000 <= 49*40
    assert(got(2L) === ((6L, 4L, 0L, 0L)))
    assert(got(3L) === ((8L, 0L, 0L, 1L)))    // substrings never match
    assert(got(4L)._3 === 1L)                 // phrase as whole-token run
    assert(got(4L)._4 === 0L)                 // ... fails regardless of rate
    assert(got(5L) === ((8L, 0L, 0L, 1L)))    // reversed words: no phrase
    assert(got(6L) === ((0L, 0L, 0L, 0L)))    // null text fails closed
    // the filter form keeps exactly the pass=1 docs with original columns
    val kept = CrawlFilters.contentBlocklistFilter(docs, "text",
        Seq("zzspam", "zzscam", "zzads"), Seq("zzfree zzmoney"), 40)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 1L, 3L, 5L))
    // map-side only: no exchange anywhere in the report plan
    val plan = CrawlFilters.contentBlocklistReport(docs, "text",
        Seq("zzspam"), Seq("zzfree zzmoney"), 40)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"content blocklist must not shuffle:\n$plan")
  }

  test("contentBlocklistReport runs verbatim on a streaming frame, parity with batch") {
    val s = spark
    import s.implicits._
    import graft.pipeline.CrawlFilters
    implicit val sq = s.sqlContext
    val rows = Seq(
      (0L, "clean text here"),
      (1L, "zzspam zzscam zzads dense"),
      (2L, "has zzfree zzmoney phrase"),
      (3L, "a " + Seq.fill(48)("w").mkString(" ") + " zzspam"))
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    val query = CrawlFilters.contentBlocklistReport(streamDf, "text",
        Seq("zzspam", "zzscam", "zzads"), Seq("zzfree zzmoney"), 40)
      .writeStream.format("memory").queryName("blocklist_stream")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(2)
      mem.addData(a); query.processAllAvailable()
      mem.addData(b); query.processAllAvailable()
      val streamed = s.sql(
        "SELECT doc_id, n_tokens, n_bad, phrase_hit, pass FROM blocklist_stream")
        .orderBy("doc_id").collect().map(_.toSeq)
      val batch = CrawlFilters.contentBlocklistReport(rows.toDF("doc_id", "text"),
          "text", Seq("zzspam", "zzscam", "zzads"), Seq("zzfree zzmoney"), 40)
        .select("doc_id", "n_tokens", "n_bad", "phrase_hit", "pass")
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(streamed.toSeq === batch.toSeq)
    } finally query.stop()
  }

  test("decontaminated corpus: drops flagged docs, keeps all columns; eval side broadcast") {
    val (train, evalDocs) = decontFixture
    val clean = Decontaminate
      .decontaminatedCorpus(train, "doc_id", "text", evalDocs, "text", 3)
    assert(clean.columns.toSeq === train.columns.toSeq)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    // the 100 TB shape: the eval n-gram set joins broadcast, never shuffled
    val plan = Decontaminate
      .contaminationReport(train, "doc_id", "text", evalDocs, "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("removeBoilerplate runs verbatim on a streaming frame, parity with batch") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Dedup
    // the CCNet shape: the key set comes from a BATCH corpus pass, the
    // strip is map-only — so it applies unchanged to a continuous stream
    val batchCorpus = Seq(
      (1L, "alpha line\nsubscribe now\nbody a"),
      (2L, "subscribe now\nbody b"),
      (3L, "subscribe now\nbody c"),
      (4L, "free text only")
    ).toDF("doc_id", "text")
    val keys = Dedup.boilerplateLineSet(batchCorpus, "doc_id", "text", minDocs = 3)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    val query = Dedup.removeBoilerplate(streamDf, "text", keys)
      .writeStream.format("memory").queryName("boiler_stream")
      .outputMode("append").start()
    try {
      val rows = batchCorpus.collect().map(r => (r.getLong(0), r.getString(1)))
      val (a, b) = rows.splitAt(2)
      mem.addData(a.toSeq); query.processAllAvailable()
      mem.addData(b.toSeq); query.processAllAvailable()
      val streamed = s.sql("SELECT doc_id, text, n_lines, n_removed FROM boiler_stream")
        .orderBy("doc_id").collect().map(_.toSeq)
      val batch = Dedup.removeBoilerplate(batchCorpus, "text", keys)
        .select("doc_id", "text", "n_lines", "n_removed")
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(streamed.toSeq === batch.toSeq)
    } finally query.stop()
  }

  test("nfcNormalize: composes decomposed marks, fixpoint on NFC, null-safe") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "cafe\u0301"),   // decomposed -> precomposed
      (2L, "caf\u00e9"),    // already NFC: unchanged
      (3L, "A\u030a"),      // -> U+00C5
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = df.select(col("id"), TF.nfcNormalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("caf\u00e9"))
    assert(out(2L) === Some("caf\u00e9"))
    assert(out(3L) === Some("\u00c5"))
    assert(out(4L) === Some("plain ascii"))
    assert(out(5L) === None)
  }

  test("corpusReport: long-format card with exact dup ratio") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the and of to in is a big table", "s1"),
      (2L, "the and of to in is a big table", "s1"),   // exact dup of 1
      (3L, "der die und das ist ein nicht mit", "s2")
    ).toDF("doc_id", "text", "source")
    val rep = CorpusStats.corpusReport(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rep(("n_docs", "all")) === 3.0)
    assert(rep(("n_tokens", "all")) === 26.0)
    assert(rep(("dup_ratio", "all")) === math.rint((1.0 - 2.0 / 3.0) * 1e6) / 1e6)
    assert(rep(("source_docs", "s1")) === 2.0 && rep(("source_docs", "s2")) === 1.0)
    assert(rep(("lang_docs", "en")) === 2.0 && rep(("lang_docs", "de")) === 1.0)
    assert(rep.contains(("source_mean_quality", "s1")))
  }

  test("compressionRatio: redundancy orders, determinism, null/empty contract") {
    val s = spark
    import s.implicits._
    val rep = ("spam spam spam " * 50).trim
    val div = (0 until 150).map(i => s"w${i * 7919}").mkString(" ")
    val df = Seq(
      (1L, rep), (2L, div), (3L, null.asInstanceOf[String]), (4L, "")
    ).toDF("id", "text")
    val out = df.select(col("id"), TF.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(1L).get < out(2L).get, s"repetitive must compress better: $out")
    assert(out(1L).get < 0.2 && out(2L).get > 0.4)
    assert(out(3L).isEmpty && out(4L).isEmpty)
    // deterministic across evaluations
    val again = df.repartition(3)
      .select(col("id"), TF.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(again === out)
  }

  // ---------------------------------------------------------- heavy hitters

  test("misra_gries: completeness guarantee and lower-bound property") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.graft.MisraGries.misra_gries
    // skewed stream: key 1 x 400, key 2 x 150, keys 100..399 x 2 each
    // (n = 1150); with k = 20 anything above n/21 ~ 54 MUST survive
    val data = Seq.fill(400)(1L) ++ Seq.fill(150)(2L) ++
      (100L until 400L).flatMap(i => Seq(i, i))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size
    Seq(1, 13).foreach { parts =>
      val sketch = data.toDF("key").repartition(parts)
        .groupBy().agg(misra_gries($"key", 20).as("mg"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sketch.size <= 20)
      // guarantee: heavy keys present
      assert(sketch.contains(1L) && sketch.contains(2L), s"parts=$parts: $sketch")
      // lower bound: est <= true, and est >= true - n/(k+1)
      sketch.foreach { case (key, est) =>
        assert(est <= truth(key), s"parts=$parts key=$key")
        assert(est >= truth(key) - n / 21, s"parts=$parts key=$key est=$est")
      }
    }
  }

  test("heavyTokens: exact counts survive the sketch pass; precondition is fail-loud") {
    val s = spark
    import s.implicits._
    // "spark is fast" x 30 docs -> bigrams 'spark is' and 'is fast' x 30;
    // filler docs contribute unique bigrams only
    val docs = ((0 until 30).map(i => (i.toLong, "spark is fast")) ++
      (100 until 160).map(i => (i.toLong, s"unique$i filler$i tail$i")))
      .toDF("doc_id", "text")
    val out = CorpusStats.heavyTokens(docs, "text", n = 2, minCount = 20L, sketchK = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("spark is" -> 30L, "is fast" -> 30L))
    // minCount below the MG bound must throw, not under-report
    val e = intercept[IllegalArgumentException] {
      CorpusStats.heavyTokens(docs, "text", n = 2, minCount = 2L, sketchK = 3)
    }
    assert(e.getMessage.contains("completeness"))
  }

  // -------------------------------------------------------------- URL canon

  test("canonicalizeUrl: every normalization step, path case preserved") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // fragment dropped
      ("https://a.com/x#sec", "https://a.com/x"),
      // authority lowercased, PATH case preserved
      ("HTTPS://A.COM/KeepCase", "https://a.com/KeepCase"),
      // www + default https port stripped
      ("https://www.a.com:443/x", "https://a.com/x"),
      // http default port; non-default kept
      ("http://a.com:80/x", "http://a.com/x"),
      ("http://a.com:8080/x", "http://a.com:8080/x"),
      // https://host:80 is NOT a default port -> kept
      ("https://a.com:80/x", "https://a.com:80/x"),
      // tracking params: lone, leading-with-successor, trailing, multiple
      ("https://a.com/x?utm_source=t", "https://a.com/x"),
      ("https://a.com/x?utm_source=t&id=7", "https://a.com/x?id=7"),
      ("https://a.com/x?id=7&utm_medium=m", "https://a.com/x?id=7"),
      ("https://a.com/x?utm_a=1&utm_b=2&gclid=g", "https://a.com/x"),
      ("https://a.com/x?fbclid=f&id=7&utm_c=3", "https://a.com/x?id=7"),
      // real params survive untouched
      ("https://a.com/x?id=7&page=2", "https://a.com/x?id=7&page=2"),
      // trailing slashes, also before the query
      ("https://a.com/x/", "https://a.com/x"),
      ("https://a.com/x///?id=7", "https://a.com/x?id=7"),
      ("https://a.com/", "https://a.com"),
      // whitespace trim; scheme-less input passes through un-mangled
      ("  https://a.com/x  ", "https://a.com/x"),
      ("not a url", "not a url")
    )
    val out = cases.map(_._1).toDF("u")
      .select(TF.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0))
    cases.zip(out).foreach { case ((in, want), got) =>
      assert(got === want, s"canonicalizeUrl($in)")
    }
    // composition of everything at once
    val all = Seq("HTTPS://WWW.Site.COM:443//Path/To/Page/?utm_source=x&id=9&gclid=g#top")
      .toDF("u").select(TF.canonicalizeUrl(col("u")).as("c")).head().getString(0)
    assert(all === "https://site.com//Path/To/Page?id=9")
  }

  test("urlDedupSurvivors: min-id survivor per canonical group, zero extra shuffles") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Dedup
    val df = Seq(
      (10L, "https://a.com/p"),
      (3L, "HTTPS://WWW.A.COM/p/"),
      (7L, "https://a.com/p?utm_source=x"),
      (5L, "https://b.com/q")
    ).toDF("doc_id", "url")
    val out = Dedup.urlDedupSurvivors(df, "doc_id", "url")
      .collect().map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2)))).toMap
    assert(out === Map(
      "https://a.com/p" -> ((3L, 3L)),
      "https://b.com/q" -> ((5L, 1L))))
    // one aggregation exchange and nothing else
    val plan = Dedup.urlDedupSurvivors(df, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1, s"url dedup is one shuffle:\n$plan")
  }

  test("html extraction, URL filtering, and DSIR scoring run verbatim on streams") {
    val s = spark
    import s.implicits._
    import graft.pipeline.{CrawlFilters, ImportanceSampling}
    // all three are stateless map-side operators — the batch expression
    // applies unchanged to a continuous stream, parity by construction
    val batch = Seq(
      (1L, "<p>Hello &amp; world</p>", "https://ok.example/a"),
      (2L, "<script>var x=1;</script><b>kept</b>", "https://sub.bad.example/b"),
      (3L, "plain text", "https://ok.example/casino")
    ).toDF("doc_id", "html", "url")
    val weights = ImportanceSampling.weightTable(
      batch.select(col("doc_id"), col("html").as("text")), "text",
      batch.filter(col("doc_id") === 1L).select(col("html").as("text")), "text", 1)
    // extract -> URL-filter -> DSIR-score, one map-only chain
    def chain(df: org.apache.spark.sql.DataFrame) =
      ImportanceSampling.scoreWithWeights(
        CrawlFilters.urlFilterReport(df, "url", Seq("bad.example"), Seq("casino"))
          .filter(!col("host_blocked") && col("word_hits") === 0)
          .withColumn("text", TF.htmlToText(col("html"))),
        "doc_id", "text", weights, 1)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val query = chain(mem.toDF().toDF("doc_id", "html", "url"))
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      mem.addData(batch.collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))))
      query.processAllAvailable()
      val streamed = s.sql("SELECT doc_id, n_grams, logw FROM dsir_stream")
        .orderBy("doc_id").collect().map(_.toSeq)
      val batchOut = chain(batch).orderBy("doc_id").collect().map(_.toSeq)
      assert(streamed.toSeq === batchOut.toSeq)
      // only doc 1 survives the URL gate (2: blocked suffix, 3: keyword)
      assert(batchOut.map(_.head) === Seq(1L))
    } finally query.stop()
  }

  test("htmlToText: element removal, tag strip, entity decode order, null-safe") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "<html><head><style>p{color:red}</style>" +
        "<script>if (a < b && b > c) { alert(\"x\"); }</script></head>" +
        "<body><!-- hidden --><p>Hello &amp; welcome</p><p>bye</p></body></html>"),
      // double-decode trap: &amp;lt; must become the literal text "&lt;"
      (2L, "<p>A &amp;lt;b&amp;gt; isn&#39;t a tag; &quot;q&quot;&nbsp;end</p>"),
      // tags split words with a space; whitespace collapses
      (3L, "one<br/>two\n\n  three<div>four</div>"),
      (4L, null)
    ).toDF("doc_id", "html")
    val out = df.select(col("doc_id"), TF.htmlToText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "Hello & welcome bye",
      s"script/style/comment bodies must vanish, got '${out(1L)}'")
    assert(out(2L) === "A &lt;b&gt; isn't a tag; \"q\" end")
    assert(out(3L) === "one two three four")
    assert(out(4L) === null)
  }

  test("hostSuffixes and blocklist: suffix semantics, Seq == DF path") {
    val s = spark
    import s.implicits._
    import graft.pipeline.CrawlFilters
    val sfx = Seq(Tuple1("a.b.example.com")).toDF("h")
      .select(CrawlFilters.hostSuffixes(col("h")).as("s"))
      .collect().head.getSeq[String](0)
    assert(sfx === Seq("com", "example.com", "b.example.com", "a.b.example.com"))

    val df = Seq(
      (1L, "https://news.ok.example/a"),
      (2L, "https://sub.bad.example/b"),     // blocked via suffix
      (3L, "https://bad.example/c"),          // blocked exactly
      (4L, "https://notbad.example/d"),       // 'notbad.example' != '.bad.example'
      (5L, "https://ok.example/casino-poker-night"), // 2 word hits
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "url")
    val blocked = Seq("bad.example")
    val kept = CrawlFilters.blocklistFilter(df, "url", blocked,
        blockedWords = Seq("casino", "poker"), maxWordHits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L), s"got $kept")
    // keyword threshold: 2 hits pass at maxWordHits=3
    val kept3 = CrawlFilters.blocklistFilter(df, "url", blocked,
        blockedWords = Seq("casino", "poker"), maxWordHits = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept3 === Set(1L, 4L, 5L))
    // DataFrame blocklist path: same survivors on the host rule alone
    val keptSeq = CrawlFilters.blocklistFilter(df, "url", blocked)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptDf = CrawlFilters.blocklistFilterDF(df, "url",
        Seq(Tuple1("bad.example")).toDF("domain"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptDf === keptSeq, s"DF path $keptDf != Seq path $keptSeq")
  }

  test("noveltyScore: first occurrence wins, dup doc adds nothing, null text keeps a 0/0 row") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d"),  // shingles "a b c", "b c d" — both first here
      (2L, "a b c d"),  // exact dup — 2 shingles, 0 novel
      (3L, "b c d e"),  // "b c d" already seen, "c d e" novel
      (4L, "x y"),      // < 3 tokens — whole-text fallback shingle, novel
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CorpusStats.noveltyScore(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((2L, 2L)))
    assert(out(2L) === ((2L, 0L)))
    assert(out(3L) === ((2L, 1L)))
    assert(out(4L) === ((1L, 1L)))
    assert(out(5L) === ((0L, 0L)))
    // repeated shingles inside one doc count once (array_distinct)
    val rep = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val r1 = CorpusStats.noveltyScore(rep, "doc_id", "text", 3).head()
    // distinct shingles of the 9-token text: a b c / b c a / c a b
    assert(r1.getLong(1) === 3L && r1.getLong(2) === 3L)
  }

  test("incremental novelty == full recompute on batch docs; artifact extends to the full one") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "c d e f g"), (3L, "x y z w v")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c q r"),          // 'a b c' seen in corpus; rest novel
      (11L, "a b c q r"),          // dup of 10 -> nothing novel
      (12L, "x y z w v"),          // fully seen -> nothing novel
      (13L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val full = CorpusStats.noveltyScore(corpus.unionByName(batch), "doc_id", "text", 3)
      .filter(col("id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val artifact = CorpusStats.shingleFirstOccurrence(corpus, "doc_id", "text", 3)
    val incr = CorpusStats.noveltyScoreIncremental(batch, artifact, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr === full, s"incremental $incr != full $full")
    assert(incr.contains((11L, 3L, 0L)) && incr.contains((12L, 3L, 0L))
      && incr.contains((13L, 0L, 0L)))

    // day-over-day: extended artifact == a from-scratch rebuild
    val extended = CorpusStats
      .extendFirstOccurrence(artifact, batch, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = CorpusStats
      .shingleFirstOccurrence(corpus.unionByName(batch), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(extended === rebuilt)
  }

  test("bpeEncodeStats: rank order shadows later merges, overlap is left-greedy, null text zeros") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "abc"),     // ab fires first -> [AB, c]; bc never applies
      (2L, "aaa"),     // aa left-greedy -> [AA, a]
      (3L, "xbc yz"),  // bc -> [x, BC] + [y, z]
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CorpusStats.bpeEncodeStats(df, "doc_id", "text", Seq("ab", "bc", "aa"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((1L, 3L, 2L)), s"got ${out(1L)}")
    assert(out(2L) === ((1L, 3L, 2L)), s"got ${out(2L)}")
    assert(out(3L) === ((2L, 5L, 4L)), s"got ${out(3L)}")
    assert(out(4L) === ((0L, 0L, 0L)), s"got ${out(4L)}")
    // no merges = pieces == chars
    val plain = CorpusStats.bpeEncodeStats(df.filter($"text".isNotNull),
      "doc_id", "text", Seq.empty).collect()
    assert(plain.forall(r => r.getLong(2) === r.getLong(3)))
  }

  test("bpeTrain: round k counts pairs over round k-1's encoding, not the raw chars") {
    val s = spark
    import s.implicits._
    // "abab" x3: round 1 pairs over raw chars = {ab:6, ba:3} -> merge
    // "ab" -> X; the word becomes "XX", so round 2's winner is the
    // placeholder pair "XX" — a pair that DOES NOT EXIST in the raw
    // character stream. A single-pass learner (pair stats once, take
    // top-2) would pick "ba" instead: the test that separates the
    // iterative recursion from the one-shot merge list.
    val df = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    val learned = CorpusStats.bpeTrain(df, "text", 2)
    val ph0 = String.valueOf(0xE000.toChar)
    assert(learned(0) === (("ab", 6L)), s"round 1 learned ${learned(0)}")
    assert(learned(1) === ((ph0 + ph0, 3L)), s"round 2 learned ${learned(1)}")
    // the learned chain encodes each word to ONE piece
    val enc = CorpusStats.bpeEncodeStats(df, "doc_id", "text", learned.map(_._1))
      .collect().head
    assert(enc.getLong(1) === 3L && enc.getLong(3) === 3L,
      s"expected 3 tokens -> 3 pieces, got ${enc.mkString(",")}")
    // exhaustion fails loud rather than returning a short list
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusStats.bpeTrain(tiny, "text", 3)
    }
    assert(e.getMessage.contains("exhausted"))
  }

  test("BPE merge artifact round-trips parquet in learned order; reload fails loud on gaps") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abab abab abab"), (2L, "abc abc")).toDF("doc_id", "text")
    val learned = CorpusStats.bpeTrain(df, "text", 3)
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/merges"
    CorpusStats.saveMerges(learned, path, s)
    val loaded = CorpusStats.loadMerges(s, path)
    assert(loaded === learned)
    // the reloaded artifact encodes identically — the order IS the model
    val a = CorpusStats.bpeEncodeStats(df, "doc_id", "text", learned.map(_._1))
      .collect().map(_.toSeq).toSet
    val b = CorpusStats.bpeEncodeStats(df, "doc_id", "text", loaded.map(_._1))
      .collect().map(_.toSeq).toSet
    assert(a === b)
    // a rank gap (filtered/corrupted artifact) must not silently
    // re-number the merge chain
    val p2 = java.nio.file.Files.createTempDirectory("bpe").toString + "/bad"
    s.read.parquet(path).filter(col("rnk") =!= 2L)
      .write.parquet(p2)
    val e = intercept[IllegalArgumentException] { CorpusStats.loadMerges(s, p2) }
    assert(e.getMessage.contains("contiguous"))
  }
}
