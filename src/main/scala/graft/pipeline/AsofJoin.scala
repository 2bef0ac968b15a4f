package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — "for every left event, the most recent
  * right event for the same key at or before it" — the alignment
  * primitive of feature stores, trade/quote matching, and event
  * attribution. Spark has no native as-of join; the composition here is
  * union + one running-`last` window, which is exactly the sort-merge
  * dataflow a native operator would run.
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY §2.5);
  * the reference library has no joins.
  */
object AsofJoin {

  /** Left rows keep all their columns and gain every non-key right
    * column as `rightPrefix + name` (including the right time), null
    * when the key has no right row at-or-before the left time (or none
    * within `tolerance`). `timeCol` must be NUMERIC in both inputs
    * (epoch micros as long is the intended shape — exact integer
    * arithmetic; convert timestamps with `unix_micros` first), and both
    * inputs must carry `keyCol` and `timeCol` under the same names.
    *
    * Matching is inclusive (`t_right <= t_left`); among right rows tied
    * on `(key, time)` the winner is the max of the packed payload tuple
    * (a deterministic, partitioning-independent rule — document tables
    * should not carry such ties, but the operator must not be
    * order-dependent when they do).
    *
    * Scale shape: ONE shuffle — both sides exchange on the key and sort
    * by `(time, side)` inside the window, the same dataflow as a
    * sort-merge join; the running `last(ignoreNulls)` is O(1) per row,
    * and no range-join candidate explosion ever materializes (a naive
    * `t_r <= t_l` theta-join is quadratic per key). Hot keys skew the
    * sort like any sort-merge join — pre-salt upstream or split hot
    * keys by time range if one key dominates.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      tolerance: Option[Long] = None,
      rightPrefix: String = "right_"): DataFrame = {
    require(left.columns.contains(keyCol) && left.columns.contains(timeCol),
      s"left needs $keyCol and $timeCol")
    require(right.columns.contains(keyCol) && right.columns.contains(timeCol),
      s"right needs $keyCol and $timeCol")
    tolerance.foreach(t => require(t >= 0, s"tolerance=$t must be >= 0"))

    val rPay = right.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    val rv = struct((timeCol +: rPay).map(col): _*)
    val rvType = right.select(rv).schema.head.dataType
    val lv = struct(left.columns.toSeq.map(col): _*)
    val lvType = left.select(lv).schema.head.dataType

    val rSide = right.select(
      col(keyCol).as("__k"),
      col(timeCol).as("__t"),
      rv.as("__rv"),
      lit(null).cast(lvType).as("__lv"),
      lit(0).as("__side"))
    val lSide = left.select(
      col(keyCol).as("__k"),
      col(timeCol).as("__t"),
      lit(null).cast(rvType).as("__rv"),
      lv.as("__lv"),
      lit(1).as("__side"))

    // right rows sort before left rows at equal time (inclusive match);
    // __rv last in the order makes equal-(key, time) right rows resolve
    // to the payload-max deterministically
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rSide.unionByName(lSide)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        matched.withColumn("__m",
          when(col("__t") - col("__m").getField(timeCol) <= tol, col("__m")))
      case None => matched
    }
    bounded.select(
      left.columns.toSeq.map(c => col("__lv").getField(c).as(c)) ++
        (timeCol +: rPay).map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }
}
