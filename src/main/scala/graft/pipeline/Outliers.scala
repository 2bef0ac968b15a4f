package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier scoring — median/MAD instead of mean/stddev,
  * so a handful of pathological rows (concatenated pages, binary blobs
  * scored as text) cannot drag the threshold toward themselves; the
  * robust version of the per-source length screening a corpus runs
  * before ingestion.
  *
  * `score = 0.6745 * |x - median| / MAD` (the modified z-score; 0.6745
  * makes it comparable to a normal z-score), `is_outlier = score > k`.
  * Degenerate groups with `MAD = 0` (at least half the values identical)
  * get a NULL score and `is_outlier = false` — the scale is undefined
  * there, and flagging every non-modal value would quarantine whole
  * uniform sources; gate on `mad = 0` upstream if that matters.
  *
  * Scale shape: two exact `percentile` aggregates keyed on the group
  * (medians of values, then of absolute deviations) and two joins of the
  * corpus against the #groups-sized stats table (broadcast). Per-group
  * aggregate state is the group's sorted value buffer — the same bound
  * as [[CorpusStats.sourceQuantiles]]; switch to `approx_percentile`
  * when single groups outgrow executors. Null values pass through
  * unscored (`score` null, not outliers).
  */
object Outliers {

  def madScores(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val v = col(valueCol).cast("double")
    val med = df.filter(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(percentile(v, lit(0.5)).as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol), "left")
    val mad = withMed.filter(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol), "left")
      .withColumn("median", col("__med"))
      .withColumn("mad", col("__mad"))
      .withColumn("score",
        when(v.isNotNull && col("__mad") > 0.0,
          round(lit(0.6745) * abs(v - col("__med")) / col("__mad"), 6)))
      .withColumn("is_outlier", coalesce(col("score") > k, lit(false)))
      .drop("__med", "__mad")
  }
}
