package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is the per-operator correctness surface (verified vs DuckDB
  * at sf0.01 by the driver); `oracleSql` holds the matching ANSI SQL where
  * the operator is SQL-expressible (column names aligned on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q2RevenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    "q2_revenue_by_nation" -> (Queries.q2RevenueByNation _),
    "q3_running_qty_window" -> (Queries.q3RunningQty _),
    "q4_discounted_orders_semi" -> (Queries.q4DiscountedOrders _),
    "q5_segment_stats" -> (Queries.q5SegmentStats _),
    "q6_event_windows" -> (Queries.q6EventWindows _),
    "ml_dummy_mean" -> (Queries.dummyMean _),
    "ml_dummy_prior" -> (Queries.dummyPrior _),
    "ml_bagging_regressor" -> (Queries.baggingRegression _),
    "ml_bagging_classifier" -> (Queries.baggingClassification _),
    "ml_stacking_regressor" -> (Queries.stackingRegression _),
    "ml_stacking_classifier" -> (Queries.stackingClassification _),
    "ml_boosting_regressor" -> (Queries.boostingRegression _),
    "ml_boosting_classifier" -> (Queries.boostingClassification _),
    "ml_gbm_regressor" -> (Queries.gbmRegression _),
    "ml_gbm_classifier" -> (Queries.gbmClassification _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT n_name AS nation,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY nation""".stripMargin,
    "q3_running_qty_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | sum(l_quantity) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem
        |WHERE l_suppkey < 10
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q4_discounted_orders_semi" ->
      """SELECT o_orderpriority AS priority, count(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.05)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q5_segment_stats" ->
      """SELECT c_mktsegment AS segment,
        | max(o_totalprice) AS max_price,
        | min(o_totalprice) AS min_price,
        | count(*) AS order_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q6_event_windows" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
        | event_type,
        | count(*) AS event_count,
        | round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "ml_dummy_mean" ->
      "SELECT round(avg(l_extendedprice), 4) AS prediction FROM lineitem",
    "ml_dummy_prior" ->
      """SELECT CAST(CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS BIGINT) AS class_label,
        | round(count(*) * 1.0 / (SELECT count(*) FROM lineitem), 10) AS probability
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1""".stripMargin
  )
}
