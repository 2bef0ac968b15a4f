package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the pre-ingestion contract check
  * a pipeline runs before a new batch enters the corpus (the Deequ /
  * Great-Expectations shape): completeness, ranges, accepted values, key
  * uniqueness, referential integrity, volume.
  *
  * Report: one row per check — `(check, target, metric, threshold,
  * passed)` — so a scheduler gates on `passed` and a dashboard trends
  * `metric` without parsing anything.
  *
  * Scale shape: every ROW-LOCAL check (not-null, range, accepted values,
  * volume) folds into ONE aggregate pass over the table — a single scan
  * with map-side partial aggregation to one row, no matter how many
  * checks. The two check classes that inherently need data movement pay
  * exactly their own cost: [[QualityChecks.Unique]] is one groupBy on
  * the key columns (vocabulary-sized shuffle; NULL key tuples group like
  * any value — identical semantics in Spark and SQL engines), and
  * [[QualityChecks.ForeignKey]] is one left-anti join against the
  * referenced keys (broadcast when the key side is small). Nothing is
  * collected; the report is O(#checks) rows.
  */
object QualityChecks {

  sealed trait Check

  /** Null ratio of `column` must be <= `maxNullRatio` (0.0 = no nulls). */
  final case class NotNull(column: String, maxNullRatio: Double = 0.0)
      extends Check

  /** Non-null values of `column` must lie in `[min, max]`; metric = the
    * violation count, threshold 0.
    */
  final case class InRange(column: String, min: Double, max: Double)
      extends Check

  /** Non-null values of `column` must be one of `allowed`; metric = the
    * violation count, threshold 0.
    */
  final case class AcceptedValues(column: String, allowed: Seq[String])
      extends Check

  /** Table must have at least `minCount` rows; metric = the row count. */
  final case class MinRows(minCount: Long) extends Check

  /** `columns` must be a unique key; metric = number of rows living in a
    * duplicated key group, threshold 0. NULLs group as values (SQL
    * GROUP BY semantics on both engines).
    */
  final case class Unique(columns: Seq[String]) extends Check

  /** Every non-null `column` value must exist in `ref`'s `refColumn`
    * (referential integrity); metric = orphan row count, threshold 0.
    */
  final case class ForeignKey(column: String, ref: DataFrame, refColumn: String)
      extends Check

  private def reportRow(
      check: String, target: String, metric: Column, threshold: Double,
      passed: Column): Column = struct(
    lit(check).as("check"), lit(target).as("target"),
    round(metric.cast("double"), 6).as("metric"),
    lit(threshold).as("threshold"), passed.as("passed"))

  /** Run `checks` against `df`; returns the report described above, one
    * row per check in declaration order (`check`/`target` make the order
    * total for deterministic output).
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val rowLocal = checks.collect {
      case c @ (_: NotNull | _: InRange | _: AcceptedValues | _: MinRows) => c
    }
    val reports = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    if (rowLocal.nonEmpty) {
      val n = count(lit(1))
      val rows = rowLocal.map {
        case NotNull(c, maxRatio) =>
          val ratio = when(n === 0, lit(0.0))
            .otherwise(sum(when(col(c).isNull, 1L).otherwise(0L)) / n.cast("double"))
          reportRow("not_null", c, ratio, maxRatio,
            round(ratio, 6) <= maxRatio)
        case InRange(c, lo, hi) =>
          val v = sum(when(col(c).isNotNull &&
            (col(c).cast("double") < lo || col(c).cast("double") > hi), 1L)
            .otherwise(0L))
          reportRow("in_range", c, coalesce(v, lit(0L)), 0.0,
            coalesce(v, lit(0L)) === 0L)
        case AcceptedValues(c, allowed) =>
          val v = sum(when(col(c).isNotNull &&
            !col(c).cast("string").isin(allowed: _*), 1L).otherwise(0L))
          reportRow("accepted_values", c, coalesce(v, lit(0L)), 0.0,
            coalesce(v, lit(0L)) === 0L)
        case MinRows(min) =>
          reportRow("min_rows", "*", n, min.toDouble, n >= min)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      val aliased = rows.zipWithIndex.map { case (c, i) => c.as(s"r$i") }
      reports += df.agg(aliased.head, aliased.tail: _*)
        .select(explode(array(rows.indices.map(i => col(s"r$i")): _*)).as("r"))
        .select("r.*")
    }

    checks.foreach {
      case Unique(cols) =>
        require(cols.nonEmpty, "Unique needs at least one column")
        val dupRows = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L)).as("m"))
        reports += dupRows.select(
          lit("unique").as("check"), lit(cols.mkString(",")).as("target"),
          round(col("m").cast("double"), 6).as("metric"),
          lit(0.0).as("threshold"), (col("m") === 0L).as("passed"))
      case ForeignKey(c, ref, refCol) =>
        val orphans = df.select(col(c)).filter(col(c).isNotNull)
          .join(ref.select(col(refCol).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("m"))
        reports += orphans.select(
          lit("foreign_key").as("check"), lit(s"$c->$refCol").as("target"),
          round(col("m").cast("double"), 6).as("metric"),
          lit(0.0).as("threshold"), (col("m") === 0L).as("passed"))
      case _ => ()
    }
    reports.reduce(_ unionByName _)
  }
}
