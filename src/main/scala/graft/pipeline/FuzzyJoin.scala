package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join — the record-linkage/near-match
  * primitive behind title dedup, entity resolution, and OCR-noise
  * clustering in a training-data pipeline: find every pair of rows whose
  * strings are within Levenshtein distance `maxDist`, without an
  * all-pairs comparison.
  *
  * Propose / verify, like every near-dup path in this library:
  *
  *  1. '''Propose (gram path).''' Each string of length >= q emits its
  *     DISTINCT q-grams; an equi-join on the gram proposes candidate id
  *     pairs. Soundness is the q-gram pigeonhole: one edit destroys at
  *     most q q-grams, so two strings with `lev <= maxDist` share at
  *     least `max(len_a, len_b) - (q-1) - maxDist*q` q-gram occurrences —
  *     >= 1 whenever the LONGER string has `len >= q + maxDist*q`. The
  *     shuffle key is the gram (corpus-linear rows, q bytes each), never
  *     a pair of strings.
  *  2. '''Propose (short path).''' Strings shorter than `q + maxDist*q`
  *     carry no shared-gram guarantee between THEMSELVES (mixed
  *     short/long pairs are covered by the gram path via the max()
  *     bound), so short-short candidates come from a length-bucket
  *     equi-join (`lev <= maxDist` forces `|len_a - len_b| <= maxDist`;
  *     each short row explodes its 2*maxDist+1 candidate lengths). At
  *     corpus scale the short pool is the skew risk of this operator —
  *     every (length, length') bucket pair meets in one task — which is
  *     why the threshold shrinks with q: prefer q=2 unless gram
  *     selectivity demands more.
  *  3. '''Verify.''' Candidates (distinct id pairs) pull their strings
  *     back by id join and the exact `levenshtein` (codegen'd,
  *     Wagner-Fischer O(len^2) per CANDIDATE, not per pair) keeps
  *     `dist <= maxDist`. Output `(id_a, id_b, dist)`, `id_a < id_b`.
  *
  * `maxGramFrequency` optionally drops grams appearing in more than that
  * many strings (the hot-gram/stopword guard, same contract as
  * `Dedup.ngramJaccardPairs.maxDocFrequency`): it bounds the worst
  * bucket at the cost of RECALL for pairs whose every shared gram is
  * hot — a documented trade, off by default.
  *
  * Null/absent strings never pair (dropped up front). Case-sensitive:
  * normalize (lower/NFC) upstream if the match should be case-blind.
  */
object FuzzyJoin {

  def editDistancePairs(
      docs: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 2,
      maxGramFrequency: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    maxGramFrequency.foreach(m =>
      require(m >= 1, s"maxGramFrequency must be >= 1, got $m"))
    val base = docs
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
    val minGuaranteed = q + maxDist * q

    // gram path: distinct q-grams of EVERY string with at least one gram
    // (shorts included — the pigeonhole bound is on the LONGER side)
    val grams = base
      .filter(col("len") >= q)
      .select(col("id"),
        explode(array_distinct(transform(
          sequence(lit(1), col("len") - (q - 1)),
          i => col("s").substr(i, lit(q))))).as("gram"))
    val keptGrams = maxGramFrequency match {
      case None => grams
      case Some(m) =>
        val hot = grams.groupBy("gram").agg(count(lit(1)).as("n"))
          .filter(col("n") > m).select("gram")
        grams.join(hot, Seq("gram"), "left_anti")
    }
    val gramCands = keptGrams.as("a")
      .join(keptGrams.as("b"), "gram")
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()

    // short-short path: length-bucket proposal
    val shorts = base.filter(col("len") < minGuaranteed)
    val shortCands = shorts
      .select(col("id").as("id_a"),
        explode(sequence(col("len") - maxDist, col("len") + maxDist)).as("lb"))
      .join(shorts.select(col("id").as("id_b"), col("len").as("lb")), "lb")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    val cands = gramCands.unionByName(shortCands).distinct()
    val strs = base.select(col("id"), col("s"))
    cands
      .join(strs.select(col("id").as("id_a"), col("s").as("sa")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
