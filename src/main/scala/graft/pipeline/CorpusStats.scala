package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * aggregation, the df join, the per-group top-k window) is
    * vocabulary-sized, shuffle-keyed on token or group; nothing is
    * collected, nothing is quadratic. The df join deliberately does NOT
    * assume the vocabulary is broadcast-able — at web scale it isn't.
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
    val w = Window.partitionBy("grp")
      .orderBy(col("tfidf").desc, col("tf").desc, col("token").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("grp"), col("token"), col("tf"), col("df"), col("tfidf"),
        col("rnk").cast("long").as("rnk"))
  }
}
