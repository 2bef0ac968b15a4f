package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
