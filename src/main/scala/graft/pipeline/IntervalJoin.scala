package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch interval (range) join: points against `[start, end)` intervals
  * of the same key. Spark plans a raw `t >= start AND t < end` predicate
  * as a per-key cartesian (BroadcastNestedLoop or worse) — the classic
  * scale killer. The standard fix implemented here: quantize time into
  * fixed-width bins, explode each interval to the bins it covers, then
  * an ordinary shuffled EQUI-join on `(key, bin)` plus the exact range
  * filter. Each point lives in exactly one bin and an interval covers a
  * bin at most once, so no pair is duplicated and no dedup pass is
  * needed.
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY §2.5).
  */
object IntervalJoin {

  /** Inner-join points to every same-key interval containing them
    * (`start <= t < end`, half-open). Times must be non-negative longs
    * (epoch micros; `div` truncation == floor only for non-negatives —
    * enforced fail-loud). Point columns pass through; interval columns
    * (minus the key) arrive prefixed. Multi-interval hits produce one
    * row per hit, inner-join semantics.
    *
    * `binWidth` trades fan-out for join selectivity: an interval
    * explodes to `O(length / binWidth)` rows, a bin gathers the points
    * of one width. Pick ~ the median interval length. The pre-flight
    * budget check (one cheap aggregation over the SMALL interval side)
    * throws when an interval would explode past `maxBinsPerInterval`
    * rather than letting a mis-sized bin melt the shuffle.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      timeCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      intervalPrefix: String = "ivl_",
      maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    // pre-flight fan-out budget: one tiny aggregation over the interval
    // side (the small side by assumption)
    val Array(row) = intervals
      .agg(
        max(ceil((col(endCol) - col(startCol)).cast("double") / binWidth)).as("maxBins"),
        min(col(startCol)).as("minStart"))
      .collect()
    if (!row.isNullAt(0)) {
      val maxBins = row.getLong(0) // ceil(double) evaluates to LongType
      require(maxBins <= maxBinsPerInterval,
        s"an interval spans $maxBins bins > maxBinsPerInterval=$maxBinsPerInterval " +
          "— raise binWidth or the budget")
      require(row.getLong(1) >= 0L, "interval starts must be non-negative")
    }

    val iPay = intervals.columns.filterNot(_ == keyCol).toSeq
    val binned = intervals
      .select(col(keyCol) +: iPay.map(c => col(c).as(intervalPrefix + c)): _*)
      .filter(col(intervalPrefix + endCol) > col(intervalPrefix + startCol))
      .withColumn("__bin", explode(sequence(
        expr(s"`$intervalPrefix$startCol` div $binWidth"),
        expr(s"(`$intervalPrefix$endCol` - 1) div $binWidth"))))
    val p = points.withColumn("__bin", expr(s"`$timeCol` div $binWidth"))
    p.join(binned,
        p(keyCol) === binned(keyCol) && p("__bin") === binned("__bin") &&
          col(timeCol) >= col(intervalPrefix + startCol) &&
          col(timeCol) < col(intervalPrefix + endCol))
      .drop(binned(keyCol))
      .drop(p("__bin")).drop(binned("__bin"))
  }
}
