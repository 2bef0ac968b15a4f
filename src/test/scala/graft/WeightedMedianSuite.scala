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

  test("weighted_median buffer stays bounded on a 1e7-row single group") {
    val s = spark
    import s.implicits._
    // one group, 10M rows, weights ~U(0,1): far past the exact capacity,
    // so the centroid compression must engage — memory stays O(capacity)
    // and the answer lands within one centroid's rank resolution of the
    // true weighted median
    val n = 10000000L
    val df = spark.range(n).select(
      lit(0L).as("grp"),
      (col("id") % 1000000).cast("double").as("v"),
      (pmod(col("id") * 2654435761L, lit(1000)).cast("double") / 1000.0 + 0.0005).as("w"))
    val got = df.groupBy("grp")
      .agg(org.apache.spark.sql.graft.WeightedMedian.weighted_median(col("v"), col("w")).as("wm"))
      .collect().head.getDouble(1)
    // v is uniform over [0, 1e6) and w is independent of v's ordering
    // bucket, so the true weighted median is ~500000; the sketch's rank
    // error bound (1/4096 of total weight) translates to ~±250 here —
    // assert with generous slack
    assert(math.abs(got - 500000.0) < 5000.0, s"got $got")

    // the serialized partial-aggregation buffer must be bounded (capacity
    // pairs, not 10M)
    val buf = new org.apache.spark.sql.graft.WeightedQuantileBuffer(1024, 128)
    val rng = new scala.util.Random(3)
    (0 until 100000).foreach(_ => buf.add(rng.nextDouble(), rng.nextDouble()))
    assert(buf.serialize().length < 1024 * 16 + 128 * 16 + 64,
      s"buffer not bounded: ${buf.serialize().length} bytes")
  }

  test("weighted_median compressed buffer tracks the exact answer") {
    val rng = new scala.util.Random(11)
    val pairs = Array.fill(50000)((rng.nextGaussian() * 10, rng.nextDouble() + 0.01))
    val buf = new org.apache.spark.sql.graft.WeightedQuantileBuffer(1024, 512)
    pairs.foreach { case (v, w) => buf.add(v, w) }
    val approx = buf.quantile(0.5).asInstanceOf[Double]
    val exact = org.apache.spark.ml.graft.util.GraftUtils.weightedMedian(
      pairs.map(_._1), pairs.map(_._2))
    // rank error <= 1/512 of total weight; translate via the local density
    // of a N(0,10) at its median (generous 3x slack)
    assert(math.abs(approx - exact) < 0.5, s"approx $approx exact $exact")
  }

  test("compressed and exact modes agree on degenerate zero-weight groups") {
    // the exact path returns the smallest value when total weight is 0;
    // crossing the compression capacity must not flip the answer to null
    val small = new org.apache.spark.sql.graft.WeightedQuantileBuffer(1000000, 16)
    (0 until 100).foreach(i => small.add(100.0 - i, 0.0))
    val compressed = new org.apache.spark.sql.graft.WeightedQuantileBuffer(64, 16)
    (0 until 100).foreach(i => compressed.add(100.0 - i, 0.0))
    assert(small.quantile(0.5) === 1.0)
    assert(compressed.quantile(0.5) === 1.0)
  }

  test("buffer round-trips its own capacity configuration") {
    val buf = new org.apache.spark.sql.graft.WeightedQuantileBuffer(1024, 128)
    (0 until 50).foreach(i => buf.add(i.toDouble, 1.0))
    val back = org.apache.spark.sql.graft.WeightedQuantileBuffer.deserialize(buf.serialize())
    assert(back.capacity === 1024 && back.compressedSize === 128)
    assert(back.quantile(0.5) === buf.quantile(0.5))
  }
}
