package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: the salting pattern for keys too hot for a
  * hash-partitioned shuffle join.
  *
  * At 100 TB a single hot key (a null-like sentinel, a default user id, a
  * viral document) puts its entire row set into ONE reducer task; AQE's
  * skew-join splitting handles the sort-merge case after the fact, but
  * only per shuffle block and only for joins — a 10x-hotter-than-median
  * key still serializes on one core. Salting splits each hot key into
  * `saltFactor` synthetic sub-keys BEFORE the shuffle: left rows get a
  * uniform salt in [0, saltFactor), the right side's hot rows are
  * replicated once per salt value, and the join runs on (key, salt) — so
  * a key holding 25% of the table spreads over saltFactor reducers at the
  * cost of replicating only the hot slice of the (small) right side.
  *
  * Only the HOT keys pay the replication: cold keys join exactly as
  * before (salt 0 on both sides), so the right-side blowup is
  * |hot rows| x saltFactor, not |right| x saltFactor.
  */
object SkewJoin {

  /** Keys holding more than `thresholdFraction` of `df`'s rows.
    * `sampleFraction < 1` counts a uniform sample instead of the full
    * table — hot keys by definition survive sampling (a key worth salting
    * holds ≥1% of ALL rows; at any realistic sample size its observed
    * share concentrates tightly around its true share), and the detection
    * scan stops being a full-table pass. At 100 TB the sampled path is
    * the only sane default, so `hotKeysSampled` bakes in 1e-3; the exact
    * path (sampleFraction = 1.0) remains for oracle-deterministic tests.
    * One shuffle on `key`, partial-aggregated map-side, either way.
    */
  def hotKeys(
      df: DataFrame,
      key: String,
      thresholdFraction: Double = 0.01,
      maxKeys: Int = 1000,
      sampleFraction: Double = 1.0,
      seed: Long = 7L): Seq[Any] = {
    require(thresholdFraction > 0 && thresholdFraction <= 1,
      s"thresholdFraction must be in (0,1], got $thresholdFraction")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction must be in (0,1], got $sampleFraction")
    val src = if (sampleFraction < 1.0) df.sample(sampleFraction, seed) else df
    val counted = src.groupBy(col(key)).agg(count(lit(1)).as("__n"))
    counted.persist()
    try {
      // total from the per-key counts (already shuffled/combined) — an
      // all-rows window here would funnel every group through one task;
      // coalesce covers the zero-row frame (sum over nothing is null)
      val total = counted.agg(coalesce(sum("__n"), lit(0L))).head().getLong(0)
      if (total == 0L) Seq.empty
      else counted
        .filter(col("__n") > total * thresholdFraction)
        .orderBy(col("__n").desc)
        .limit(maxKeys)
        .select(key).collect().map(_.get(0)).toSeq
    } finally counted.unpersist(blocking = false)
  }

  /** [[hotKeys]] over a 0.1% uniform sample — the 100 TB default: a
    * `thresholdFraction`-hot key appears ~`thresholdFraction` of any
    * large sample too, so detection needs none of the full-table scan.
    */
  def hotKeysSampled(
      df: DataFrame,
      key: String,
      thresholdFraction: Double = 0.01,
      maxKeys: Int = 1000,
      seed: Long = 7L): Seq[Any] =
    hotKeys(df, key, thresholdFraction, maxKeys, sampleFraction = 1e-3, seed = seed)

  /** Inner equi-join of a skewed `left` against a one-row-per-key-ish
    * `right`, salting only the keys in `hot`. Result columns are
    * `left.*` then `right.*` minus `rightKey` (the equi-join makes it
    * redundant and it may collide with `leftKey`).
    *
    * The salt is `rand(seed)`-derived: it only routes rows to reducers,
    * never reaches the output, and is deterministic per partition layout
    * for task retries.
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      hot: Seq[Any],
      saltFactor: Int = 16,
      seed: Long = 42L): DataFrame = {
    require(saltFactor > 1, s"saltFactor must be > 1, got $saltFactor")
    if (hot.isEmpty) {
      val joined = left.join(right, left(leftKey) === right(rightKey))
      return joined.drop(right(rightKey))
    }
    val hotCol: Column => Column = c => c.isin(hot: _*)
    val saltedLeft = left.withColumn(
      "__salt",
      when(hotCol(col(leftKey)), (rand(seed) * saltFactor).cast("int"))
        .otherwise(lit(0)))
    val saltedRight = right.withColumn(
      "__salts",
      when(hotCol(col(rightKey)),
        sequence(lit(0), lit(saltFactor - 1)))
        .otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__salts")
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop(saltedRight(rightKey))
      .drop(saltedLeft("__salt"))
      .drop(saltedRight("__salt"))
  }
}
