package graft

import org.apache.spark.sql.functions._

/** Proves the SCALE.md co-location claim: with both fact tables bucketed
  * on the join key, the join plans with NO shuffle exchange — the knob
  * that removes the dominant shuffle of q2-class queries at 100 TB.
  */
class BucketingSuite extends SparkSpec {

  test("bucketed co-located join plans without a shuffle exchange") {
    val s = spark
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
    val o = Tables.orders(s, "/root/testdata/sf0.001")

    s.sql("DROP TABLE IF EXISTS li_bucketed")
    s.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the sort-merge path so the exchange count is meaningful
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")

      val bucketed = s.table("li_bucketed")
        .join(s.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val plan = bucketed.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles:\n$plan")

      val unbucketed = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val planU = unbucketed.queryExecution.executedPlan.toString
      assert(planU.contains("Exchange"), "control: unbucketed join should shuffle")

      // same answers either way
      val a = bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val b = unbucketed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(a === b)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("q2_join_bucketed bench query joins shuffle-free on both fact sides") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val bucketed = Queries.q2JoinBucketed(s, sfDir)
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(
        !plan.contains("Exchange hashpartitioning(l_orderkey") &&
          !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed bench join still shuffles a fact side:\n$plan")

      val shuffled = Queries.q2JoinShuffled(s, sfDir)
      val planU = shuffled.queryExecution.executedPlan.toString
      assert(planU.contains("Exchange hashpartitioning(l_orderkey"),
        s"control: raw-parquet merge join should shuffle:\n$planU")

      val a = bucketed.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      val b = shuffled.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      assert(a.toSeq === b.toSeq)
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.sql(s"DROP TABLE IF EXISTS graft_li_bucketed_$tag")
      s.sql(s"DROP TABLE IF EXISTS graft_o_bucketed_$tag")
    }
  }

  test("q2_bucketed_write: the written tables join with no fact-side exchange, rows intact") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      // the bench row's own write path, end to end
      val written = Queries.q2BucketedWrite(s, sfDir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(written("lineitem") === Tables.lineitem(s, sfDir).count())
      assert(written("orders") === Tables.orders(s, sfDir).count())
      // and the tables it wrote carry the layout: joining them plans no
      // exchange on either fact side (write -> read machine-checked as
      // one chain, not two separate claims)
      val j = s.table(s"graft_li_bw_$tag")
        .join(s.table(s"graft_o_bw_$tag"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val plan = j.queryExecution.executedPlan.toString
      assert(
        !plan.contains("Exchange hashpartitioning(l_orderkey") &&
          !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"tables written by q2BucketedWrite still shuffle:\n$plan")
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.sql(s"DROP TABLE IF EXISTS graft_li_bw_$tag")
      s.sql(s"DROP TABLE IF EXISTS graft_o_bw_$tag")
    }
  }
}
