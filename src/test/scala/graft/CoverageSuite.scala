package graft

import org.apache.spark.ml.classification.{DecisionTreeClassifier, LogisticRegression}
import org.apache.spark.ml.graft._
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.DecisionTreeRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Remaining option-path coverage: every (estimator, strategy) pair the
  * other suites don't already pin.
  */
class CoverageSuite extends SparkSpec {

  private lazy val regDf: DataFrame = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(67)
    (0 until 400).map { _ =>
      val x = Array.fill(3)(rng.nextDouble() * 10)
      (x(0) * 2 - x(1) + 0.3 * x(2), Vectors.dense(x))
    }.toDF("label", "features")
  }

  private lazy val clsDf: DataFrame = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(71)
    (0 until 400).map { _ =>
      val x = Array.fill(3)(rng.nextDouble() * 10)
      (((x(0) + x(1)) / 7).toInt.min(2).toDouble, Vectors.dense(x))
    }.toDF("label", "features")
  }

  private def rmse(df: DataFrame): Double =
    df.select(sqrt(avg(pow(col("prediction") - col("label"), 2)))).head().getDouble(0)

  test("GBMRegressor initStrategy=base and zero") {
    for (strat <- Seq("base", "zero")) {
      val m = new GBMRegressor()
        .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(3).setSeed(1))
        .setMaxIter(3)
        .setInitStrategy(strat)
        .setLearningRate(0.5)
        .setSeed(0L)
        .fit(regDf)
      assert(rmse(m.transform(regDf)) < 3.0, s"initStrategy=$strat")
    }
  }

  test("GBMClassifier newton updates with multiclass logloss and uniform init") {
    val m = new GBMClassifier()
      .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(3).setSeed(1))
      .setMaxIter(3)
      .setUpdates("newton")
      .setInitStrategy("uniform")
      .setLearningRate(0.5)
      .setSeed(0L)
      .fit(clsDf)
    val acc = {
      val rows = m.transform(clsDf).select("prediction", "label").collect()
      rows.count(r => r.getDouble(0) == r.getDouble(1)).toDouble / rows.length
    }
    assert(acc > 0.8, s"newton multiclass accuracy $acc")
  }

  test("GBMClassifier validation early stop truncates") {
    val withVal = clsDf.withColumn("isVal", rand(3) > 0.7)
    val m = new GBMClassifier()
      .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(2).setSeed(1))
      .setMaxIter(25)
      .setLoss("logloss")
      .setValidationIndicatorCol("isVal")
      .setNumRounds(2)
      .setValidationTol(0.05) // stop once per-round improvement drops below 5%
      .setSeed(0L)
      .fit(withVal)
    assert(m.models.length < 25)
    assert(m.models.length > 1, s"stopped degenerately at ${m.models.length}")
  }

  test("StackingClassifier stackMethod=raw") {
    val m = new StackingClassifier()
      .setBaseLearners(Array(
        new DecisionTreeClassifier().setMaxDepth(4).setSeed(1),
        new LogisticRegression().setMaxIter(20)))
      .setStacker(new DecisionTreeClassifier().setMaxDepth(3).setSeed(2))
      .setStackMethod("raw")
      .fit(clsDf)
    val acc = {
      val rows = m.transform(clsDf).select("prediction", "label").collect()
      rows.count(r => r.getDouble(0) == r.getDouble(1)).toDouble / rows.length
    }
    assert(acc > 0.8, s"raw stacking accuracy $acc")
  }

  test("BoostingRegressor linear and squared loss types") {
    for (loss <- Seq("linear", "squared")) {
      val m = new BoostingRegressor()
        .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(4).setSeed(1))
        .setNumBaseLearners(4)
        .setLossType(loss)
        .fit(regDf)
      assert(m.models.nonEmpty)
      assert(rmse(m.transform(regDf)) < 3.0, s"lossType=$loss")
    }
  }

  test("DummyClassifier weighted prior") {
    val s = spark
    import s.implicits._
    val wdf = Seq(
      (0.0, 1.0, Vectors.dense(0.0)),
      (0.0, 1.0, Vectors.dense(0.0)),
      (1.0, 6.0, Vectors.dense(0.0))
    ).toDF("label", "w", "features")
    val m = new DummyClassifier().setStrategy("prior").setWeightCol("w").fit(wdf)
    assert(m.classProbabilities.toSeq === Seq(0.25, 0.75))
  }

  test("GBMRegressor quantile loss biases predictions upward at alpha=0.9") {
    val m9 = new GBMRegressor()
      .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(3).setSeed(1))
      .setMaxIter(5)
      .setLoss("quantile").setAlpha(0.9)
      .setLearningRate(0.5)
      .setSeed(0L)
      .fit(regDf)
    val m1 = m9.parent.asInstanceOf[GBMRegressor].copy(
      org.apache.spark.ml.param.ParamMap.empty).setAlpha(0.1).fit(regDf)
    val over9 = m9.transform(regDf)
      .select(avg(when(col("prediction") >= col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    val over1 = m1.transform(regDf)
      .select(avg(when(col("prediction") >= col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(over9 > over1, s"q0.9 over-rate $over9 should exceed q0.1 over-rate $over1")
  }
}
