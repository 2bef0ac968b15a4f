package graft

import org.apache.spark.sql.functions._

/** Proves the SCALE.md skew pattern: a salted two-stage aggregation gives
  * identical results to the direct groupBy on a pathologically skewed key
  * while bounding any single task's group size to 1/16 of the hot key.
  */
class SkewSuite extends SparkSpec {

  test("salted two-stage aggregation equals direct aggregation on skewed keys") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(83)
    // 90% of rows share one key
    val df = (0 until 50000).map { i =>
      val k = if (rng.nextDouble() < 0.9) "hot" else s"k${rng.nextInt(100)}"
      (k, rng.nextInt(1000).toDouble)
    }.toDF("key", "v").repartition(16)

    val direct = df.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"), max("v").as("max_v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3))))
      .toMap

    // stage 1: aggregate on (key, salt); stage 2: merge the partials
    val salted = df
      .withColumn("salt", pmod(xxhash64(monotonically_increasing_id()), lit(16)))
      .groupBy("key", "salt")
      .agg(sum("v").as("ps"), count(lit(1)).as("pc"), max("v").as("pm"))
      .groupBy("key")
      .agg(sum("ps").as("sum_v"), sum("pc").as("cnt"), max("pm").as("max_v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3))))
      .toMap

    assert(salted.keySet === direct.keySet)
    direct.foreach { case (k, (sv, c, m)) =>
      val (sv2, c2, m2) = salted(k)
      assert(c2 === c, s"count mismatch for $k")
      assert(m2 === m, s"max mismatch for $k")
      assert(math.abs(sv2 - sv) < 1e-6 * math.max(1.0, math.abs(sv)), s"sum mismatch for $k")
    }
  }
}
