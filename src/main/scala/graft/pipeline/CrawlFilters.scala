package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level crawl filtering — the cheapest and earliest gate of a web
  * pipeline (RefinedWeb/C4 drop whole fetches on the URL alone, before a
  * byte of body text is parsed): domain blocklists (the UT1-style lists
  * every production crawl applies) and URL keyword scoring.
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY §2.5);
  * the reference library has no crawl-hygiene operators.
  */
object CrawlFilters {

  /** All dot-suffixes of a host, shortest first:
    * `a.b.example.com → [com, example.com, b.example.com,
    * a.b.example.com]`.
    * A blocklist entry `example.com` must block every subdomain — that is
    * suffix matching, and materializing the (label-bounded, ≤ `maxLabels`)
    * suffix set turns it into an EQUI-join: the scale-correct shape, vs. a
    * `host LIKE '%.'||domain` theta-join that degenerates to a product at
    * any scale. Single-label hosts (`localhost`) yield just themselves.
    */
  def hostSuffixes(host: Column, maxLabels: Int = 6): Column = {
    val labels = split(host, "\\.")
    val nl = size(labels)
    when(host.isNotNull && nl >= 1,
      transform(
        sequence(lit(1), least(nl, lit(maxLabels))),
        k => array_join(slice(labels, nl - k + 1, k), ".")))
  }

  /** Per-URL filter report: `(canonical url, host, host_blocked,
    * word_hits)`. `host_blocked` is true when ANY dot-suffix of the host
    * appears in `blockedDomains` (exact registrable-domain semantics);
    * `word_hits` counts how many of `blockedWords` occur as substrings of
    * the lowercased canonical URL (RefinedWeb's soft URL score — callers
    * threshold it per-policy rather than this operator hard-coding one).
    *
    * Scale shape: the host's suffix array (≤ 6 entries) probes a
    * broadcast of the blocklist via `exists` over a sorted-array binary
    * search when `blockedDomains` is a driver-side Seq (UT1 lists are
    * ~4M domains ≈ tens of MB — broadcast territory), all map-side, zero
    * shuffle, streaming-safe. For blocklists beyond broadcast size, use
    * [[blocklistFilterDF]] — same semantics through an explode +
    * left-semi hash join on the 8-byte suffix hash.
    */
  def urlFilterReport(
      docs: DataFrame,
      urlCol: String,
      blockedDomains: Seq[String],
      blockedWords: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty || blockedWords.nonEmpty,
      "at least one of blockedDomains/blockedWords must be non-empty")
    val curl = TextFunctions.canonicalizeUrl(col(urlCol))
    val host = TextFunctions.urlHost(curl)
    val domains = array(blockedDomains.map(d => lit(d.toLowerCase)): _*)
    val hostBlocked =
      if (blockedDomains.isEmpty) lit(false)
      else exists(hostSuffixes(host), s => array_contains(domains, s))
    val wordHits =
      if (blockedWords.isEmpty) lit(0L)
      else size(filter(
        array(blockedWords.map(w => lit(w.toLowerCase)): _*),
        w => contains(lower(curl), w))).cast("long")
    docs.withColumn("url_canonical", curl)
      .withColumn("url_host", host)
      .withColumn("host_blocked", coalesce(hostBlocked, lit(false)))
      .withColumn("word_hits", wordHits)
  }

  /** Survivors of the URL gate: host not blocklisted AND fewer than
    * `maxWordHits` keyword hits. Null URLs are dropped (a crawl record
    * with no URL has no provenance — production pipelines quarantine,
    * not keep, such rows).
    */
  def blocklistFilter(
      docs: DataFrame,
      urlCol: String,
      blockedDomains: Seq[String],
      blockedWords: Seq[String] = Nil,
      maxWordHits: Int = 1): DataFrame =
    urlFilterReport(docs, urlCol, blockedDomains, blockedWords)
      .filter(col(urlCol).isNotNull && !col("host_blocked") &&
        col("word_hits") < maxWordHits)
      .drop("url_canonical", "url_host", "host_blocked", "word_hits")

  /** Blocklist filtering against a DataFrame blocklist (column `domain`),
    * for lists beyond comfortable broadcast size: explode the ≤ 6 host
    * suffixes and LEFT ANTI join on the suffix — one shuffle keyed on
    * short domain strings, no theta-join. Semantics identical to
    * [[blocklistFilter]]'s host check (suite-pinned).
    */
  def blocklistFilterDF(
      docs: DataFrame,
      urlCol: String,
      blocklist: DataFrame): DataFrame = {
    val curl = TextFunctions.canonicalizeUrl(col(urlCol))
    val host = TextFunctions.urlHost(curl)
    val withSuffix = docs
      .filter(col(urlCol).isNotNull)
      .withColumn("__suffixes", hostSuffixes(host))
    val blockedKeys = withSuffix
      .select(col("*"), explode(col("__suffixes")).as("__sfx"))
      .join(blocklist.select(lower(col("domain")).as("__sfx")), Seq("__sfx"),
        "left_semi")
      .drop("__sfx")
    withSuffix
      .join(blockedKeys.select(col(urlCol)).distinct(), Seq(urlCol), "left_anti")
      .drop("__suffixes")
  }

  /** C4-style CONTENT blocklist report — the page-text complement of the
    * URL gate above: per doc, `n_tokens`, `n_bad` (exact-token blocklist
    * hits, [[TextFunctions.badWordCount]]), `phrase_hit` (whole-token-run
    * banned phrases, [[TextFunctions.bannedPhraseHit]]), and `pass`.
    * A doc passes when its bad-token rate stays at or under
    * `maxBadPer1000` per thousand tokens AND no banned phrase appears;
    * the rate check is the integer cross-multiplication
    * `n_bad * 1000 <= n_tokens * maxBadPer1000` — no float division, so
    * the decision cannot drift across engines. Null text fails closed
    * (`pass = 0`, counts 0) — an unreadable page is not evidence of
    * clean content.
    *
    * Scale shape: every signal is a pure map-side expression against a
    * compile-time blocklist (real lists are ~400 entries — C4's — to a
    * few thousand; the literal array is codegen'd once per task). Zero
    * shuffle, streaming-safe verbatim.
    */
  def contentBlocklistReport(
      docs: DataFrame,
      textCol: String,
      badWords: Seq[String],
      badPhrases: Seq[String],
      maxBadPer1000: Int): DataFrame = {
    require(maxBadPer1000 >= 0, s"maxBadPer1000 must be >= 0, got $maxBadPer1000")
    val t = col(textCol)
    val nTok = coalesce(TextFunctions.tokenCount(t).cast("long"), lit(0L))
    val nBad = coalesce(TextFunctions.badWordCount(t, badWords), lit(0L))
    val phraseHit = TextFunctions.bannedPhraseHit(t, badPhrases)
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("n_bad", nBad)
      .withColumn("phrase_hit", phraseHit)
      .withColumn("pass",
        when(t.isNotNull &&
          col("n_bad") * 1000 <= col("n_tokens") * maxBadPer1000 &&
          col("phrase_hit") === 0, lit(1L)).otherwise(lit(0L)))
  }

  /** Survivors of the content gate: [[contentBlocklistReport]] rows with
    * `pass = 1`, report columns dropped — the form a pipeline chains.
    */
  def contentBlocklistFilter(
      docs: DataFrame,
      textCol: String,
      badWords: Seq[String],
      badPhrases: Seq[String],
      maxBadPer1000: Int): DataFrame =
    contentBlocklistReport(docs, textCol, badWords, badPhrases, maxBadPer1000)
      .filter(col("pass") === 1)
      .drop("n_tokens", "n_bad", "phrase_hit", "pass")
}
