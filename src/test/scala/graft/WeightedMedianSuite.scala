package org.apache.spark.ml.graft

import org.apache.spark.ml.graft.util.GraftUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WeightedMedian

class WeightedMedianSuite extends graft.SparkSpec {

  test("weighted_median aggregate matches the driver-side reference impl") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(47)
    val data = (0 until 5000).map { _ =>
      (rng.nextInt(8).toLong, rng.nextDouble() * 100, rng.nextDouble() + 0.01)
    }
    val df = data.toDF("grp", "v", "w").repartition(7)
    val agg = df.groupBy("grp")
      .agg(WeightedMedian.weighted_median(col("v"), col("w")).as("wm"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val expected = data.groupBy(_._1).map { case (g, rows) =>
      g -> GraftUtils.weightedMedian(
        rows.map(_._2).toArray, rows.map(_._3).toArray)
    }
    expected.foreach { case (g, e) =>
      assert(agg(g) === e, s"group $g")
    }
  }

  test("weighted_median is usable from SQL text") {
    val s = spark
    import s.implicits._
    WeightedMedian.register(s)
    Seq((1.0, 1.0), (2.0, 1.0), (100.0, 0.1)).toDF("v", "w")
      .createOrReplaceTempView("wm_input")
    val out = s.sql("SELECT weighted_median(v, w) FROM wm_input").head().getDouble(0)
    assert(out === 2.0)
  }

  test("weighted_median handles empty and null inputs") {
    val s = spark
    import s.implicits._
    val df = Seq((Option.empty[Double], 1.0)).toDF("v", "w")
    val r = df.agg(WeightedMedian.weighted_median(col("v"), col("w"))).head()
    assert(r.isNullAt(0))
  }
}
