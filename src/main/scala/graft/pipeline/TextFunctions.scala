package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * Everything here is a pure Column expression (codegen'd, no UDFs, no
  * shuffles) except the rolling-hash fingerprint — per-row compute that
  * scales embarrassingly across executors.
  */
object TextFunctions {

  /** Whitespace tokenizer over normalized text. Byte-identical to
    * `split(lower(trim(text)), "\\s+")` — the split is the codegen'd
    * byte-scan [[org.apache.spark.sql.graft.WsSplit]] (equivalence
    * pinned by TextKernelsSuite), which skips the per-row
    * Pattern.compile + UTF-16 round trip of the regex form on every
    * text gate's hot path.
    */
  def tokens(text: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.wsSplit(lower(trim(text)))

  /** `size(tokens(text))` without building the array: the byte-scan
    * count kernel (see [[org.apache.spark.sql.graft.WsTokenCount]]).
    * `lower()` is skipped because Unicode lowercasing never creates or
    * destroys an ASCII whitespace char, so the segment count is
    * invariant (pinned by TextKernelsSuite).
    */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.wsTokenCount(trim(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  def charCount(text: Column): Column = length(text)

  /** A BPE-ish subword count: runs of letters count ceil(len/4) subwords
    * (approximating ~4 chars/token), digits and punctuation one each.
    * Cheap, deterministic, expressible in plain SQL on both engines.
    */
  def subwordCount(text: Column): Column = {
    val letters = length(regexp_replace(text, "[^\\p{L}]", ""))
    val digitsPunct = length(regexp_replace(text, "[\\p{L}\\s]", ""))
    ceil(letters / lit(4.0)).cast("long") + digitsPunct
  }

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(sw, t)))
  }

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords) / tokenCount(text).cast("double")

  /** Composite quality score in [0,1]: length credit (saturating at 100
    * tokens), lexical diversity, and a stopword-presence signal — the
    * standard cheap heuristics used to pre-filter web corpora.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / lit(100.0), lit(1.0))
    val diversity = distinctTokenCount(text).cast("double") / nTok
    val stopSignal = least(stopwordRatio(text, stopwords) * lit(4.0), lit(1.0))
    round(lengthScore * lit(0.5) + diversity * lit(0.3) + stopSignal * lit(0.2), 6)
  }

  /** Tokens on the word blocklist (exact whitespace-token matches over
    * the normalized tokenizer) — the counting half of the C4-style
    * content "bad words" gate. Substring matching is deliberately NOT
    * used here: it flags innocent carriers ("class" contains "ass"),
    * which is the documented false-positive mode of naive blocklist
    * filters. Pure codegen'd expression, zero shuffle.
    */
  def badWordCount(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "badWordCount needs a non-empty blocklist")
    val bl = array(words.map(w => lit(w.toLowerCase(java.util.Locale.ROOT))): _*)
    size(filter(tokens(text), t => array_contains(bl, t))).cast("long")
  }

  /** 1 when the text contains any banned PHRASE as a whole-token run
    * (normalized: lowercased, whitespace collapsed to single spaces),
    * else 0. Multi-word entries are the half of real blocklists that
    * token matching cannot see ("bad phrase" where neither word alone is
    * listed). Null text → 0.
    */
  def bannedPhraseHit(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "bannedPhraseHit needs a non-empty phrase list")
    val norm = concat(lit(" "), array_join(tokens(text), " "), lit(" "))
    val hit = phrases
      .map(p => " " + p.toLowerCase(java.util.Locale.ROOT).trim + " ")
      .map(p => contains(norm, lit(p)))
      .reduce(_ || _)
    when(coalesce(hit, lit(false)), lit(1L)).otherwise(lit(0L))
  }

  /** Tiny per-language stopword lists for the n-gram-free language-ID
    * heuristic. Public knowledge (the usual top function words).
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "que", "de", "los", "una", "es", "por", "con", "para"))

  /** Language ID: the language whose stopword list hits the most tokens;
    * declared order breaks ties; "und" (undetermined) when nothing hits.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangStopwords.map { case (lang, words) =>
      val sw = array(words.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(sw, t)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val cases = scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }
    cases.otherwise(lit("und"))
  }

  /** 64-bit FNV-1a rolling fingerprint of the normalized text (lowercased,
    * whitespace collapsed). Deterministic across partitions/engines;
    * codegen'd with a JVM-wide precompiled whitespace pattern.
    */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.fnv1aFingerprint(text)

  /** DISTINCT n-gram shingle STRINGS of `text`. PERF WARNING (r14):
    * the transform lambda's `element_at(toks, …)` re-evaluates the
    * regex split per array element — the interpreted-HOF trap, ~27
    * ms/doc measured at sf0.1 — because a single-Column API has no way
    * to let-bind the token array. Production pipelines should use the
    * codegen `shingle_hashes` expression (8-byte keys, one pass — the
    * dedup/novelty stacks all do) or materialize `tokens(text)` in its
    * own projection first and build grams from the attribute (the
    * [[Winnowing.winnowFingerprints]] shape). Kept for string-shingle
    * callers where identity must stay human-readable.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val ngrams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    array_distinct(when(size(toks) >= n, ngrams).otherwise(array(concat_ws(" ", toks))))
  }

  /** Gopher-style repetition signals as `array(top_fraction, dup_fraction)`
    * — one per-row pass (see [[org.apache.spark.sql.graft.NgramRepetition]]).
    * Select the array ONCE and `element_at` both slots; calling the two
    * fraction helpers separately evaluates the expression twice.
    */
  def repetitionSignals(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.NgramRepetitionFn.ngram_repetition(tokens(text), n)

  /** Share of n-gram occurrences taken by the most frequent n-gram. */
  def topNgramFraction(text: Column, n: Int): Column =
    element_at(repetitionSignals(text, n), 1)

  /** Share of n-gram occurrences belonging to n-grams seen more than once. */
  def dupNgramFraction(text: Column, n: Int): Column =
    element_at(repetitionSignals(text, n), 2)

  /** Email addresses: local@domain.tld. Kept deliberately RE2-compatible
    * (no lookarounds/backrefs) so the same pattern runs under Java regex
    * (Spark) and RE2 (DuckDB/Go tooling) — redaction must be reproducible
    * across the engines that touch a corpus.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (unanchored beyond word boundaries). */
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Separator-grouped phone numbers (2-4 / 3 / 3 / 4 digit groups — the
    * TPC-H `c_phone` shape among others). Digit runs inside longer
    * numbers are NOT matched; redaction is pattern-, not digit-, based.
    */
  val PhonePattern: String = "\\b\\d{2,4}[-. ]\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII redaction for training corpora: emails, then IPv4s, then phone
    * numbers are replaced with typed placeholder tags. Order matters —
    * emails can embed digit groups and IPv4s are dotted digit groups, so
    * the more specific patterns must consume their text first. Pure
    * chained `regexp_replace` (codegen'd, map-side, zero shuffle); the
    * 100 TB cost is one regex scan per pattern per row.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  /** US Social Security numbers, dashed form (3-2-4). Cannot fire
    * inside phone/credit-card shapes: their group widths differ and
    * digit runs carry no internal word boundary.
    */
  val SsnPattern: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** 16-digit payment-card CANDIDATES — 4-4-4-4 groups (dash or space;
    * no backreference tying the separators, RE2 forbids them) or one
    * contiguous run. Candidates are only redacted when the Luhn check
    * passes ([[luhnValid]]) — pattern alone would eat random 16-digit
    * ids, the validator keeps the false-positive rate at 1-in-10.
    */
  val CreditCardPattern: String =
    "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b|\\b\\d{16}\\b"

  /** IBAN candidates, compact (unspaced) form: country alpha-2, two
    * check digits, 11-30 alphanumeric BBAN. Redacted only when the
    * ISO 7064 mod-97 residue is 1 ([[ibanValid]]).
    */
  val IbanPattern: String = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  /** Luhn checksum over a candidate's digits (separators stripped):
    * from the RIGHT, every second digit doubles (minus 9 when > 9);
    * valid iff the sum ≡ 0 (mod 10). Pure Column fold — ascii
    * arithmetic over a bounded candidate string, the same fold the
    * oracle replays with `list_sum`/`list_transform`.
    */
  def luhnValid(cand: Column): Column =
    // digits let-bound: inlining `ds` into the fold body re-runs the
    // regexp_replace once PER DIGIT (16x per candidate)
    letBound(regexp_replace(cand, "[^0-9]", ""), ds => {
      val n = length(ds)
      val total = aggregate(
        sequence(lit(1), n),
        lit(0),
        (acc, i) => {
          val d = ascii(ds.substr(i, lit(1))) - lit(48)
          val doubled = d * 2 - when(d >= 5, lit(9)).otherwise(lit(0))
          acc + when(pmod(n - i + 1, lit(2)) === 0, doubled).otherwise(d)
        })
      pmod(total, lit(10)) === 0
    })

  /** ISO 7064 mod-97 IBAN check: move the first four chars to the end,
    * then stream left to right — digits fold `acc·10 + d`, letters
    * (A=10..Z=35) fold `acc·100 + v` — reducing mod 97 each step so
    * the accumulator never leaves integer range; valid iff the residue
    * is 1. Same bounded Column fold shape as [[luhnValid]].
    */
  def ibanValid(cand: Column): Column =
    // rearranged string let-bound: inlined, the concat+substr rebuild
    // would re-run once per character of the fold
    letBound(
      concat(cand.substr(lit(5), length(cand) - 4), cand.substr(lit(1), lit(4))),
      r => {
        val res = aggregate(
          sequence(lit(1), length(r)),
          lit(0L),
          (acc, i) => {
            val ch = ascii(r.substr(i, lit(1)))
            when(ch.between(48, 57), pmod(acc * 10 + (ch - lit(48)), lit(97L)))
              .otherwise(pmod(acc * 100 + (ch - lit(55)), lit(97L)))
          })
        res === 1L
      })

  /** Tier-2 PII redaction: the [[redactPii]] chain (email / IPv4 /
    * phone), then SSNs, then Luhn-VALIDATED credit cards, then
    * mod-97-VALIDATED IBANs. The validated classes extract candidates
    * (`regexp_extract_all`), keep the ones whose checksum passes, and
    * literal-replace each — a failed checksum leaves the text
    * untouched, which is the point: a 16-digit order id or a mistyped
    * IBAN is data, not PII. Map-side, zero shuffle; per-row cost is
    * one regex scan per pattern plus a bounded fold per candidate.
    * Spaced IBANs (`DE89 3704 ...`) are out of scope for the compact
    * pattern — normalize upstream if a corpus carries them.
    */
  /** Let-bind `value` as a lambda variable so `f`'s body can reference
    * it twice without inlining (and re-evaluating) the whole upstream
    * expression tree per reference — a single-Column API has no other
    * let form. Measured on redactPii2: the naive tree inlined the
    * regex chain 4x (12.6 s -> ~3 s at sf0.1).
    */
  private def letBound(value: Column, f: Column => Column): Column =
    element_at(transform(array(value), f), 1)

  def redactPii2(text: Column): Column =
    letBound(regexp_replace(redactPii(text), SsnPattern, "<SSN>"), base =>
      letBound(
        aggregate(
          filter(regexp_extract_all(base, lit(CreditCardPattern), lit(0)), luhnValid(_)),
          base,
          (acc, c) => replace(acc, c, lit("<CC>"))),
        ccDone =>
          aggregate(
            filter(regexp_extract_all(ccDone, lit(IbanPattern), lit(0)), ibanValid(_)),
            ccDone,
            (acc, c) => replace(acc, c, lit("<IBAN>")))))

  /** Unicode NFC normalization — the canonical-composition pass a
    * multilingual ingest runs BEFORE any hashing/dedup (the same "café"
    * arrives precomposed U+00E9 from one crawler and decomposed
    * e+U+0301 from another; unnormalized, every downstream fingerprint
    * treats them as different documents). Spark has no built-in;
    * this wraps `java.text.Normalizer` (map-side, zero shuffle). The
    * gate pins it against DuckDB's `nfc_normalize` — two independent
    * Unicode implementations agreeing byte-for-byte.
    */
  val nfcNormalize: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }


  /** CP1252-in-UTF-8 mojibake repair table: `(mojibake, repaired)`
    * pairs, longest pattern first then lexicographic — a FIXED,
    * deterministic replace chain (the cross-engine contract; the
    * `p_fix_encoding` oracle replays the same chain in SQL). Covers the
    * two dominant real-corpus defects an ftfy-style pass repairs:
    *
    *  - Latin-1 supplement originals (U+00A0..U+00FF — all Western
    *    accented letters and punctuation): UTF-8 is `C2/C3 xx`, so a
    *    CP1252 mis-decode renders `Â·`/`Ã©`-style 2-char sequences;
    *  - CP1252's own smart-punctuation row (curly quotes, dashes,
    *    ellipsis, €, ™, Œ/œ, Š/š, Ž/ž, Ÿ, ƒ, ˆ, ˜): 2- or 3-byte UTF-8
    *    rendering as `â€™`/`â‚¬`-style sequences, including the bytes
    *    CP1252 leaves undefined (81/8D/8F/90/9D), which lenient
    *    decoders (Java's windows-1252, WHATWG, ftfy's sloppy-cp1252)
    *    pass through as C1 controls — e.g. the famous `â€\u009D` for a
    *    closing curly quote.
    *
    * One repair layer per pass — doubly-encoded text ("cafÃƒÂ©") peels
    * its outer layer here and the rest on a second application:
    * [[fixEncoding2x]] folds the chain twice for exactly that case. A
    * converge-loop is deliberately NOT offered — its iteration count is
    * data-dependent and an oracle cannot replay it. The five
    * `Â`+C1-control entries (C2 81/8D/8F/90/9D) are what makes the
    * second pass complete: double-encoding a CP1252-UNDEFINED byte's
    * control-char rendering produces `Â`+control, which no other row
    * covers (128 entries total).
    */
  val MojibakeRepairs: Seq[(String, String)] = Seq(
    ("\u00E2\u201A\u00AC", "\u20AC"),
    ("\u00E2\u201E\u00A2", "\u2122"),
    ("\u00E2\u20AC\u009D", "\u201D"),
    ("\u00E2\u20AC\u00A0", "\u2020"),
    ("\u00E2\u20AC\u00A1", "\u2021"),
    ("\u00E2\u20AC\u00A2", "\u2022"),
    ("\u00E2\u20AC\u00A6", "\u2026"),
    ("\u00E2\u20AC\u00B0", "\u2030"),
    ("\u00E2\u20AC\u00B9", "\u2039"),
    ("\u00E2\u20AC\u00BA", "\u203A"),
    ("\u00E2\u20AC\u0153", "\u201C"),
    ("\u00E2\u20AC\u0161", "\u201A"),
    ("\u00E2\u20AC\u017E", "\u201E"),
    ("\u00E2\u20AC\u02DC", "\u2018"),
    ("\u00E2\u20AC\u201C", "\u2013"),
    ("\u00E2\u20AC\u201D", "\u2014"),
    ("\u00E2\u20AC\u2122", "\u2019"),
    ("\u00C2\u0081", "\u0081"),
    ("\u00C2\u008D", "\u008D"),
    ("\u00C2\u008F", "\u008F"),
    ("\u00C2\u0090", "\u0090"),
    ("\u00C2\u009D", "\u009D"),
    ("\u00C2\u00A0", "\u00A0"),
    ("\u00C2\u00A1", "\u00A1"),
    ("\u00C2\u00A2", "\u00A2"),
    ("\u00C2\u00A3", "\u00A3"),
    ("\u00C2\u00A4", "\u00A4"),
    ("\u00C2\u00A5", "\u00A5"),
    ("\u00C2\u00A6", "\u00A6"),
    ("\u00C2\u00A7", "\u00A7"),
    ("\u00C2\u00A8", "\u00A8"),
    ("\u00C2\u00A9", "\u00A9"),
    ("\u00C2\u00AA", "\u00AA"),
    ("\u00C2\u00AB", "\u00AB"),
    ("\u00C2\u00AC", "\u00AC"),
    ("\u00C2\u00AD", "\u00AD"),
    ("\u00C2\u00AE", "\u00AE"),
    ("\u00C2\u00AF", "\u00AF"),
    ("\u00C2\u00B0", "\u00B0"),
    ("\u00C2\u00B1", "\u00B1"),
    ("\u00C2\u00B2", "\u00B2"),
    ("\u00C2\u00B3", "\u00B3"),
    ("\u00C2\u00B4", "\u00B4"),
    ("\u00C2\u00B5", "\u00B5"),
    ("\u00C2\u00B6", "\u00B6"),
    ("\u00C2\u00B7", "\u00B7"),
    ("\u00C2\u00B8", "\u00B8"),
    ("\u00C2\u00B9", "\u00B9"),
    ("\u00C2\u00BA", "\u00BA"),
    ("\u00C2\u00BB", "\u00BB"),
    ("\u00C2\u00BC", "\u00BC"),
    ("\u00C2\u00BD", "\u00BD"),
    ("\u00C2\u00BE", "\u00BE"),
    ("\u00C2\u00BF", "\u00BF"),
    ("\u00C3\u0081", "\u00C1"),
    ("\u00C3\u008D", "\u00CD"),
    ("\u00C3\u008F", "\u00CF"),
    ("\u00C3\u0090", "\u00D0"),
    ("\u00C3\u009D", "\u00DD"),
    ("\u00C3\u00A0", "\u00E0"),
    ("\u00C3\u00A1", "\u00E1"),
    ("\u00C3\u00A2", "\u00E2"),
    ("\u00C3\u00A3", "\u00E3"),
    ("\u00C3\u00A4", "\u00E4"),
    ("\u00C3\u00A5", "\u00E5"),
    ("\u00C3\u00A6", "\u00E6"),
    ("\u00C3\u00A7", "\u00E7"),
    ("\u00C3\u00A8", "\u00E8"),
    ("\u00C3\u00A9", "\u00E9"),
    ("\u00C3\u00AA", "\u00EA"),
    ("\u00C3\u00AB", "\u00EB"),
    ("\u00C3\u00AC", "\u00EC"),
    ("\u00C3\u00AD", "\u00ED"),
    ("\u00C3\u00AE", "\u00EE"),
    ("\u00C3\u00AF", "\u00EF"),
    ("\u00C3\u00B0", "\u00F0"),
    ("\u00C3\u00B1", "\u00F1"),
    ("\u00C3\u00B2", "\u00F2"),
    ("\u00C3\u00B3", "\u00F3"),
    ("\u00C3\u00B4", "\u00F4"),
    ("\u00C3\u00B5", "\u00F5"),
    ("\u00C3\u00B6", "\u00F6"),
    ("\u00C3\u00B7", "\u00F7"),
    ("\u00C3\u00B8", "\u00F8"),
    ("\u00C3\u00B9", "\u00F9"),
    ("\u00C3\u00BA", "\u00FA"),
    ("\u00C3\u00BB", "\u00FB"),
    ("\u00C3\u00BC", "\u00FC"),
    ("\u00C3\u00BD", "\u00FD"),
    ("\u00C3\u00BE", "\u00FE"),
    ("\u00C3\u00BF", "\u00FF"),
    ("\u00C3\u0152", "\u00CC"),
    ("\u00C3\u0153", "\u00DC"),
    ("\u00C3\u0160", "\u00CA"),
    ("\u00C3\u0161", "\u00DA"),
    ("\u00C3\u0178", "\u00DF"),
    ("\u00C3\u017D", "\u00CE"),
    ("\u00C3\u017E", "\u00DE"),
    ("\u00C3\u0192", "\u00C3"),
    ("\u00C3\u02C6", "\u00C8"),
    ("\u00C3\u02DC", "\u00D8"),
    ("\u00C3\u2013", "\u00D6"),
    ("\u00C3\u2014", "\u00D7"),
    ("\u00C3\u2018", "\u00D1"),
    ("\u00C3\u2019", "\u00D2"),
    ("\u00C3\u201A", "\u00C2"),
    ("\u00C3\u201C", "\u00D3"),
    ("\u00C3\u201D", "\u00D4"),
    ("\u00C3\u201E", "\u00C4"),
    ("\u00C3\u2020", "\u00C6"),
    ("\u00C3\u2021", "\u00C7"),
    ("\u00C3\u2022", "\u00D5"),
    ("\u00C3\u2026", "\u00C5"),
    ("\u00C3\u2030", "\u00C9"),
    ("\u00C3\u2039", "\u00CB"),
    ("\u00C3\u203A", "\u00DB"),
    ("\u00C3\u20AC", "\u00C0"),
    ("\u00C3\u2122", "\u00D9"),
    ("\u00C5\u00A0", "\u0160"),
    ("\u00C5\u00A1", "\u0161"),
    ("\u00C5\u00B8", "\u0178"),
    ("\u00C5\u00BD", "\u017D"),
    ("\u00C5\u00BE", "\u017E"),
    ("\u00C5\u2019", "\u0152"),
    ("\u00C5\u201C", "\u0153"),
    ("\u00C6\u2019", "\u0192"),
    ("\u00CB\u0153", "\u02DC"),
    ("\u00CB\u2020", "\u02C6"))

  /** Encoding repair (mojibake fix) — the ftfy-style pass every real
    * WET/crawl ingest runs BEFORE NFC normalization and hashing: text
    * that went through a UTF-8 -> CP1252 mis-decode somewhere upstream
    * ("cafÃ©", "donâ€™t", "â‚¬5") is mapped back to the intended
    * characters by the fixed [[MojibakeRepairs]] chain. Pure Column
    * fold of codegen'd `replace` calls — map-side, zero shuffle,
    * streaming-safe. Sits upstream of [[nfcNormalize]] in the ingest
    * composition: repair first, then canonical composition, then any
    * fingerprint/dedup hashing.
    */
  def fixEncoding(text: Column): Column =
    MojibakeRepairs.foldLeft(text) { case (acc, (moji, fixed)) =>
      replace(acc, lit(moji), lit(fixed))
    }

  /** Two-layer encoding repair: [[fixEncoding]] applied twice, for
    * doubly-mis-decoded text ("cafÃƒÂ©" → "cafÃ©" → "café") — common in
    * old crawls where a CP1252 round trip happened at both the origin
    * and the archiver. Still a FIXED deterministic chain (the oracle
    * replays the 128 replaces twice); on singly-corrupted or clean text
    * the second pass is a no-op, so 2x is safe as the default ingest
    * choice when layer depth is unknown (property-pinned at 50k random
    * strings in MojibakePropertiesSuite).
    *
    * Adjacency caveat (both variants — the price of replace-chain
    * semantics): when CLEAN text already contains a character that is
    * the PREFIX of a repair pattern immediately followed by mojibake,
    * an early repair's output can complete a later pattern within the
    * same pass — e.g. a literal `Ã` directly before corrupted `â€“`
    * becomes `Ã` + repaired `–`, which the `Ã–` row then rewrites to
    * `Ö`. Mixed clean-mojibake ADJACENCY is inherently ambiguous byte
    * evidence (ftfy faces the same call); the chain resolves it
    * deterministically in chain order, and the oracle replays exactly
    * that resolution.
    */
  def fixEncoding2x(text: Column): Column = fixEncoding(fixEncoding(text))

  /** zlib compression ratio `deflate(text).length / text.length` — the
    * classic redundancy signal (boilerplate, templated spam, and
    * keyword-stuffed pages compress far better than prose; Dolma/CCNet
    * ship it as a standard quality feature). Fixed level-6 deflate, so
    * the value is deterministic for a given input across JVMs. Null or
    * empty text yields null. No SQL oracle exists for zlib byte counts,
    * so this signal is SUITE-pinned (ordering + determinism +
    * null/empty contracts), not gate-pinned — the one operator in the
    * text-signal family whose ground truth is the codec itself.
    *
    * Cost: one deflate pass per row (map-side, no shuffle); the UDF is
    * justified — compression is genuinely procedural.
    */
  val compressionRatio: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null || text.isEmpty) null
      else {
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6)
        try {
          d.setInput(bytes)
          d.finish()
          val buf = new Array[Byte](8192)
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          java.lang.Double.valueOf(
            math.rint(n.toDouble / bytes.length * 1e6) / 1e6)
        } finally d.end()
      }
    }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    * standard web-corpus gate), as a struct of per-rule VIOLATION flags —
    * per-rule observability is the point: production corpora track which
    * rule kills what volume per source, not just a survivor count.
    *  - `too_few_words` / `too_many_words`: token count outside
    *    [minWords, maxWords];
    *  - `mean_word_len_oob`: mean token length outside [3, 10] chars;
    *  - `low_alpha_fraction`: < 80% of tokens contain a letter;
    *  - `high_symbol_ratio`: `#`/`…` occurrences > 10% of tokens;
    *  - `few_stopwords`: fewer than 2 distinct core stopwords.
    * Every ratio threshold is evaluated in INTEGER cross-multiplied form
    * (`5 * nAlpha < 4 * n` etc.), so the flags are bit-portable across
    * engines — no float rounding to pin. Pure expressions, zero shuffle.
    */
  def gopherFlags(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val nSym = ((length(text) - length(replace(text, lit("#"), lit("")))) +
      (length(text) - length(replace(text, lit("…"), lit(""))))).cast("long")
    val sw = array(LangStopwords.head._2.map(lit): _*)
    val nStop = size(array_intersect(array_distinct(toks), sw)).cast("long")
    // null text -> null struct (not a half-null flag mix: size(null) is
    // -1 and would silently fire too_few_words); gopherPass maps it to
    // false. The two paths cannot diverge — pass derives from the same
    // struct.
    when(text.isNotNull, struct(
      (n < minWords).as("too_few_words"),
      (n > maxWords).as("too_many_words"),
      (sumLen < n * 3 || sumLen > n * 10).as("mean_word_len_oob"),
      (nAlpha * 5 < n * 4).as("low_alpha_fraction"),
      (nSym * 10 > n).as("high_symbol_ratio"),
      (nStop < 2).as("few_stopwords")))
  }

  /** True iff no [[gopherFlags]] rule fires — the survivor predicate.
    * Null text is not a survivor (`false`), matching the null-struct
    * contract of [[gopherFlags]].
    */
  def gopherPass(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val f = gopherFlags(text, minWords, maxWords)
    coalesce(
      !(f.getField("too_few_words") || f.getField("too_many_words") ||
        f.getField("mean_word_len_oob") || f.getField("low_alpha_fraction") ||
        f.getField("high_symbol_ratio") || f.getField("few_stopwords")),
      lit(false))
  }

  /** HTML-to-text extraction — the WET-generation step between the raw
    * crawl payload and every text operator in this library (quality
    * scoring a page's `<script>` bodies tanks real prose). Passes, in
    * order (order is load-bearing):
    *  1. drop `<script>`/`<style>` ELEMENTS including their contents
    *     (their bodies are code, not text; a tag-only strip would leak
    *     them into the corpus);
    *  2. drop `<!-- comments -->`;
    *  3. replace every remaining tag with a space (block structure is
    *     collapsed — paragraph-level operators should run BEFORE this on
    *     the source markup or re-split on sentence boundaries);
    *  4. decode the six entities that dominate real markup —
    *     `&nbsp; &lt; &gt; &quot; &#39;/&apos; &amp;` — with `&amp;`
    *     LAST, so `&amp;lt;` decodes to the literal text `&lt;` exactly
    *     once (the double-decode hazard every naive extractor hits);
    *  5. collapse whitespace and trim.
    *
    * Pure chained `regexp_replace` — codegen'd, map-side, zero shuffle —
    * and every pattern RE2-compatible (non-greedy + inline `(?is)` flags
    * only; no backrefs, which is why script and style get separate
    * patterns instead of `</\1>`), so extraction is reproducible across
    * engines like [[redactPii]]. The 100 TB cost is a fixed number of
    * regex scans per row.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val e1 = regexp_replace(noTags, "&nbsp;", " ")
    val e2 = regexp_replace(e1, "&lt;", "<")
    val e3 = regexp_replace(e2, "&gt;", ">")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    val e5 = regexp_replace(e4, "&#39;|&apos;", "'")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(org.apache.spark.sql.graft.GraftExpressions.collapseWs(e6))
  }

  /** Block-level tag boundaries for [[blockFeatures]] — the tags that
    * end a text flow (jusText/trafilatura's segmentation grain). Both
    * opening and closing forms split; attributes are consumed.
    */
  val BlockTagPattern: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|" +
      "br|hr|section|article|aside|header|footer|nav|blockquote|pre|form)\\b[^>]*>"

  /** Anchor text (group 1). Tag-free inner text only — a nested-markup
    * anchor (`<a><b>x</b></a>`) contributes 0 link chars; acceptable
    * under-count for a density SIGNAL, and the price of staying
    * RE2-compatible (no lazy cross-tag match needed).
    */
  val AnchorPattern: String = "(?i)<a\\b[^>]*>([^<]*)</a>"

  /** Per-block main-content features — the jusText shape: split raw
    * HTML at block-tag boundaries, and for each non-empty block report
    * `(idx, txt, n_words, n_stop, link_chars, text_chars)` where `idx`
    * is the 0-based RAW split position (stable even as empty blocks
    * drop), `txt` the tag-stripped whitespace-collapsed text, and
    * `link_chars` the anchor-text volume. All counts integer, so every
    * downstream verdict is a cross-multiplied integer rule the oracle
    * re-derives exactly. One pass, zero shuffle; lambdas over the raw
    * split array (materialize the input behind Opaque when consuming
    * several columns from it).
    */
  def blockFeatures(html: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    filter(
      transform(split(html, BlockTagPattern), (b, i) => {
        val linkChars = aggregate(
          regexp_extract_all(b, lit(AnchorPattern), lit(1)),
          lit(0), (acc, a) => acc + length(a))
        val txt = trim(org.apache.spark.sql.graft.GraftExpressions.collapseWs(
          regexp_replace(b, "<[^>]+>", " ")))
        val toks = filter(split(lower(txt), " "), t => length(t) > 0)
        struct(
          i.cast("long").as("idx"),
          txt.as("txt"),
          size(toks).cast("long").as("n_words"),
          size(filter(toks, t => array_contains(sw, t))).cast("long").as("n_stop"),
          linkChars.cast("long").as("link_chars"),
          length(txt).cast("long").as("text_chars"))
      }),
      blk => blk.getField("text_chars") > 0)
  }

  /** The jusText-style block verdict, integer cross-multiplied (the
    * [[gopherFlags]] discipline — no float thresholds an engine could
    * round differently): a block is main content iff it has at least
    * `minWords` words, link density ≤ 1/3 (`3·link_chars ≤
    * text_chars`), and stopword density ≥ stopNum/stopDen (default
    * 3/10, jusText's prose bar; tune per language/corpus — a short
    * function-word list or terse domain prose wants a lower bar) —
    * link-heavy nav, short fragments, and function-word-free chrome
    * (copyright lines, breadcrumbs) all fail.
    */
  def blockIsGood(
      blk: Column,
      minWords: Int,
      stopNum: Int = 3,
      stopDen: Int = 10): Column =
    blk.getField("n_words") >= minWords &&
      blk.getField("link_chars") * 3 <= blk.getField("text_chars") &&
      blk.getField("n_stop") * stopDen >= blk.getField("n_words") * stopNum

  /** Good blocks' text joined by newlines, from a MATERIALIZED
    * [[blockFeatures]] attribute (pass the column, not the expression —
    * the interpreted-HOF discipline). Empty string when nothing
    * qualifies.
    */
  def mainContentFromBlocks(
      blocks: Column,
      minWords: Int = 5,
      stopNum: Int = 3,
      stopDen: Int = 10): Column =
    array_join(
      transform(filter(blocks, blockIsGood(_, minWords, stopNum, stopDen)),
        _.getField("txt")),
      "\n")

  /** Main-content extraction (the trafilatura/jusText stage between
    * [[htmlToText]]'s tag stripping and the corpus-frequency
    * boilerplate pass): block segmentation + per-block link/stopword
    * density rules keep article prose and drop nav chrome ON A SINGLE
    * PAGE — no corpus statistics needed. Composes upstream of
    * `Dedup.removeBoilerplate` (which then kills the CROSS-page
    * repeated lines this per-page stage cannot see).
    */
  def mainContent(
      html: Column,
      stopwords: Seq[String],
      minWords: Int = 5,
      stopNum: Int = 3,
      stopDen: Int = 10): Column =
    mainContentFromBlocks(blockFeatures(html, stopwords), minWords, stopNum, stopDen)

  /** Lowercased host of a URL (`""` when the URL has no
    * `scheme://authority` prefix — both Spark and DuckDB return the
    * empty string for a non-matching `regexp_extract`, so the sentinel
    * is engine-portable). Port, userinfo, path, and query are excluded.
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** URL canonicalization for crawl dedup — the first dedup key of every
    * web corpus (two fetches of the same page almost always differ only
    * in tracking params, fragment, or authority casing). Normalizations,
    * in order:
    *  1. trim; drop the `#fragment`;
    *  2. lowercase the `scheme://authority` prefix (path case is
    *     CONTENT and is preserved);
    *  3. strip a `www.` host prefix and explicit default ports
    *     (`:80` for http, `:443` for https);
    *  4. remove tracking query params (`utm_*`, `fbclid`, `gclid`),
    *     keeping real ones;
    *  5. strip trailing path slashes (also before `?`).
    *
    * Pure chained `regexp_replace`/`regexp_extract` — codegen'd,
    * map-side, zero shuffle — with every pattern RE2-compatible (no
    * lookarounds/backrefs in the PATTERN; replacements use each engine's
    * own group syntax) so the canonical form is reproducible across the
    * engines that touch a corpus, like [[redactPii]]'s patterns.
    */
  /** Paragraph-level language mixture — the signal doc-level [[langId]]
    * structurally cannot see: a document that is 70% English with a
    * German boilerplate footer and a French quote block IDs as "en"
    * whole-doc, yet poisons a monolingual training mix. Splits on `sep`
    * (default blank line), drops paragraphs that are empty after
    * whitespace removal, runs [[langId]] per paragraph, and reports per
    * doc: `n_paras`, `n_langs` (distinct predictions), `major_lang`
    * (most common, ties by language code ascending), and
    * `major_frac_micro` (its share, exact 1e-6 integer). Docs with null
    * text or no non-empty paragraphs keep a `0/0/'und'/0` row.
    *
    * Scale shape: one paragraph explode with a map-side per-paragraph
    * langId (pure Column program), one partial-aggregated (doc, lang)
    * collapse, one doc-level aggregate — the argmax rides a
    * `min(struct(-count, lang))`, never a window. Output is doc-sized.
    */
  def langMixture(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n\n"): org.apache.spark.sql.DataFrame = {
    require(sep.nonEmpty, "sep must be non-empty")
    val paras = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("para"))
      .filter(regexp_replace(col("para"), "\\s+", "") =!= "")
      .select(col("doc_id"), langId(col("para")).as("plang"))
    val counts = paras.groupBy("doc_id", "plang").agg(count(lit(1)).as("c"))
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

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    // authority prefix lowercased, remainder (path?query) untouched
    val prefix = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rebuilt = concat(lower(prefix), noFrag.substr(length(prefix) + 1, lit(1 << 30)))
    val noWww = regexp_replace(rebuilt, "^(https?://)www\\.", "$1")
    val noP80 = regexp_replace(noWww, "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    val noP443 = regexp_replace(noP80, "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    // tracking params: non-first, then first-with-successor, then lone
    val t1 = regexp_replace(noP443, "&(utm_[a-z]+|fbclid|gclid)=[^&]*", "")
    val t2 = regexp_replace(t1, "\\?(utm_[a-z]+|fbclid|gclid)=[^&]*&", "?")
    val t3 = regexp_replace(t2, "\\?(utm_[a-z]+|fbclid|gclid)=[^&]*$", "")
    regexp_replace(regexp_replace(t3, "/+\\?", "?"), "/+$", "")
  }
}
