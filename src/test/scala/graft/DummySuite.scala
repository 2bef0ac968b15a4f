package graft

import org.apache.spark.ml.graft.{DummyClassifier, DummyRegressor}
import org.apache.spark.ml.linalg.Vectors

class DummySuite extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      (1.0, Vectors.dense(1.0, 2.0)),
      (2.0, Vectors.dense(2.0, 3.0)),
      (3.0, Vectors.dense(3.0, 4.0)),
      (10.0, Vectors.dense(4.0, 5.0))
    ).toDF("label", "features")
  }

  test("DummyRegressor strategies match exact statistics") {
    assert(new DummyRegressor().setStrategy("mean").fit(df).constantValue === 4.0)
    assert(new DummyRegressor().setStrategy("median").setTol(0.0).fit(df).constantValue === 2.0)
    assert(new DummyRegressor().setStrategy("quantile").setQuantile(1.0).setTol(0.0)
      .fit(df).constantValue === 10.0)
    assert(new DummyRegressor().setStrategy("constant").setConstant(7.5)
      .fit(df).constantValue === 7.5)
  }

  test("DummyRegressor transform appends constant prediction") {
    val out = new DummyRegressor().setStrategy("mean").fit(df).transform(df)
    assert(out.select("prediction").collect().map(_.getDouble(0)).toSeq === Seq.fill(4)(4.0))
  }

  test("DummyRegressor weighted mean") {
    val s = spark
    import s.implicits._
    val wdf = Seq(
      (1.0, 3.0, Vectors.dense(0.0)),
      (5.0, 1.0, Vectors.dense(0.0))
    ).toDF("label", "w", "features")
    val m = new DummyRegressor().setStrategy("mean").setWeightCol("w").fit(wdf)
    assert(m.constantValue === 2.0)
  }

  test("DummyRegressor weighted median honors the weight column") {
    val s = spark
    import s.implicits._
    val wdf = Seq(
      (1.0, 1.0, Vectors.dense(0.0)),
      (2.0, 1.0, Vectors.dense(0.0)),
      (10.0, 10.0, Vectors.dense(0.0))
    ).toDF("label", "w", "features")
    val weighted = new DummyRegressor().setStrategy("median").setWeightCol("w").fit(wdf)
    assert(weighted.constantValue === 10.0) // cumulative weight crosses 6 at label 10
    val unweighted = new DummyRegressor().setStrategy("median").setTol(0.0).fit(wdf)
    assert(unweighted.constantValue === 2.0)
    val q = new DummyRegressor().setStrategy("quantile").setQuantile(0.05)
      .setWeightCol("w").fit(wdf)
    assert(q.constantValue === 1.0)
  }

  test("weighted quantile is exact and distributed (no global single-partition sort)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(20000)((rng.nextDouble() * 1000.0, 1.0 + rng.nextInt(9)))
    val lw = rows.toDF("l", "wt").repartition(32)
    // brute-force reference: sort locally, accumulate, first crossing
    val total = rows.map(_._2.toDouble).sum
    def brute(q: Double): Double = {
      var cum = 0.0
      rows.sortBy(_._1).collectFirst {
        case (l, w) if { cum += w; cum >= q * total } => l
      }.get
    }
    for (q <- Seq(0.0, 0.1, 0.5, 0.9, 1.0)) {
      assert(org.apache.spark.ml.graft.DummyRegressor.weightedQuantile(lw, q) === brute(q),
        s"q=$q")
    }
    // scale shape: the range-partitioned intermediate must not funnel all
    // rows through one task the way the old Window.orderBy("l") plan did
    val planned = lw.repartitionByRange(32, org.apache.spark.sql.functions.col("l"))
      .sortWithinPartitions("l")
    assert(planned.rdd.getNumPartitions === 32)
    val plan = planned.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("DummyClassifier prior / uniform / constant") {
    val s = spark
    import s.implicits._
    val cdf = Seq(
      (0.0, Vectors.dense(1.0)), (0.0, Vectors.dense(2.0)),
      (0.0, Vectors.dense(3.0)), (1.0, Vectors.dense(4.0))
    ).toDF("label", "features")

    val prior = new DummyClassifier().setStrategy("prior").fit(cdf)
    assert(prior.classProbabilities.toSeq === Seq(0.75, 0.25))
    assert(prior.transform(cdf).select("prediction").collect().map(_.getDouble(0)).toSeq
      === Seq.fill(4)(0.0))

    val uni = new DummyClassifier().setStrategy("uniform").fit(cdf)
    assert(uni.classProbabilities.toSeq === Seq(0.5, 0.5))

    val const = new DummyClassifier().setStrategy("constant").setConstant(1.0).fit(cdf)
    assert(const.transform(cdf).select("prediction").collect().map(_.getDouble(0)).toSeq
      === Seq.fill(4)(1.0))
    val probs = const.transform(cdf).select("probability").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
    assert(probs.forall(p => p(1) > 0.99))
  }

  test("Dummy persistence round-trips") {
    val tmp = java.nio.file.Files.createTempDirectory("dummy-io").toString
    val m = new DummyRegressor().setStrategy("mean").fit(df)
    m.write.overwrite().save(s"$tmp/reg")
    val loaded = org.apache.spark.ml.graft.DummyRegressionModel.load(s"$tmp/reg")
    assert(loaded.constantValue === m.constantValue)
    assert(
      loaded.transform(df).select("prediction").collect().toSeq ===
        m.transform(df).select("prediction").collect().toSeq)

    val c = new DummyClassifier().setStrategy("prior").fit(
      df.withColumn("label", org.apache.spark.sql.functions.lit(0.0)))
    c.write.overwrite().save(s"$tmp/cls")
    val cl = org.apache.spark.ml.graft.DummyClassificationModel.load(s"$tmp/cls")
    assert(cl.classProbabilities.toSeq === c.classProbabilities.toSeq)
  }
}
