package graft

/** Guards the driver contract itself (t1 smoke + catalog consistency). */
class SparkEntrySuite extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query runs and returns rows at sf0.001") {
    // clearCache per query, mirroring Verify: operators that
    // persist-and-return (pLmScore et al.) must not leak cache entries
    // into later suites — a leaked InMemoryRelation rewrites the plan
    // text PlanSuite asserts on
    try SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"query $name returned 0 rows")
      spark.catalog.clearCache()
    } finally spark.catalog.clearCache()
  }
}
