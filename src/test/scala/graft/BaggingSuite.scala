package graft

import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.graft._
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.regression.DecisionTreeRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BaggingSuite extends SparkSpec {

  /** Deterministic synthetic regression data: y = 2 x0 - x1 + 0.5 x2. */
  private lazy val regDf: DataFrame = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    (0 until 500).map { _ =>
      val x = Array.fill(4)(rng.nextDouble() * 10)
      (2 * x(0) - x(1) + 0.5 * x(2), Vectors.dense(x))
    }.toDF("label", "features")
  }

  private lazy val clsDf: DataFrame = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    (0 until 500).map { _ =>
      val x = Array.fill(4)(rng.nextDouble() * 10)
      val label = if (x(0) + x(1) > 10) 1.0 else 0.0
      (label, Vectors.dense(x))
    }.toDF("label", "features")
  }

  test("BaggingRegressor fits and beats the trivial constant baseline") {
    val bag = new BaggingRegressor()
      .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(5))
      .setNumBaseLearners(5)
      .setSubsampleRatio(0.8)
      .setSeed(0L)
    val model = bag.fit(regDf)
    assert(model.models.length === 5)
    val out = model.transform(regDf)
      .select(sqrt(avg(pow(col("prediction") - col("label"), 2))).as("rmse"))
      .head().getDouble(0)
    val baseline = new DummyRegressor().setStrategy("mean").fit(regDf)
      .transform(regDf)
      .select(sqrt(avg(pow(col("prediction") - col("label"), 2))).as("rmse"))
      .head().getDouble(0)
    assert(out < baseline, s"bagging rmse $out should beat constant $baseline")
  }

  test("bagging native-tree fast path: K distinct trees, quality parity with generic") {
    // sampling RNG differs between the paths (BaggedPoint counts vs
    // DataFrame.sample), so trees are not bit-identical — pin that the
    // fast path produces K genuinely distinct bootstrap trees whose
    // ensemble quality matches the generic loop's
    def rmseOf(m: BaggingRegressionModel): Double = m.transform(regDf)
      .select(sqrt(avg(pow(col("prediction") - col("label"), 2))).as("rmse"))
      .head().getDouble(0)
    def fitWith(fast: Boolean) = new BaggingRegressor()
      .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(4).setSeed(3))
      .setNumBaseLearners(5)
      .setSubsampleRatio(0.8)
      .setNativeTreeFastPath(fast)
      .setSeed(0L)
      .fit(regDf)
    val fast = fitWith(true)
    val slow = fitWith(false)
    assert(fast.models.length === 5)
    val trees = fast.models.map(
      _.asInstanceOf[org.apache.spark.ml.regression.DecisionTreeRegressionModel].toDebugString)
    assert(trees.distinct.length > 1, "bootstrap trees must differ across bags")
    val (rFast, rSlow) = (rmseOf(fast), rmseOf(slow))
    assert(rFast < rSlow * 1.5 + 0.1, s"fast rmse $rFast vs generic $rSlow")
    // determinism: same seed, same ensemble
    val again = fitWith(true)
    assert(rmseOf(again) === rFast)

    val clsFast = new BaggingClassifier()
      .setBaseLearner(new DecisionTreeClassifier().setMaxDepth(4).setSeed(3))
      .setNumBaseLearners(5)
      .setVotingStrategy("soft")
      .setSeed(0L)
      .fit(clsDf)
    val acc = clsFast.transform(clsDf)
      .select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc > 0.9, s"fast-path soft-vote classifier accuracy $acc")
  }

  test("BaggingRegressor subspaceRatio < 1 slices features per learner") {
    val bag = new BaggingRegressor()
      .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(3))
      .setNumBaseLearners(4)
      .setSubspaceRatio(0.5)
      .setSeed(1L)
    val model = bag.fit(regDf)
    assert(model.subspaces.forall(s => s.nonEmpty && s.length <= 4))
    assert(model.subspaces.exists(_.length < 4), "expected at least one proper subspace")
    // predictions still defined on full-width vectors
    val n = model.transform(regDf).select("prediction").na.drop().count()
    assert(n === 500)
  }

  test("BaggingClassifier hard and soft voting produce valid probabilities") {
    for (strategy <- Seq("hard", "soft")) {
      val bag = new BaggingClassifier()
        .setBaseLearner(new DecisionTreeClassifier().setMaxDepth(4))
        .setNumBaseLearners(4)
        .setVotingStrategy(strategy)
        .setSeed(0L)
      val model = bag.fit(clsDf)
      val rows = model.transform(clsDf).select("probability", "prediction", "label").collect()
      val acc = rows.count(r => r.getDouble(1) == r.getDouble(2)).toDouble / rows.length
      assert(acc > 0.8, s"$strategy voting accuracy $acc")
      rows.foreach { r =>
        val p = r.getAs[Vector](0)
        assert(math.abs(p(0) + p(1) - 1.0) < 1e-9)
      }
    }
  }

  test("Bagging persistence round-trips transforms") {
    val tmp = java.nio.file.Files.createTempDirectory("bag-io").toString
    val model = new BaggingRegressor()
      .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(3))
      .setNumBaseLearners(3)
      .setSubspaceRatio(0.7)
      .setSeed(2L)
      .fit(regDf)
    model.write.overwrite().save(s"$tmp/m")
    val loaded = BaggingRegressionModel.load(s"$tmp/m")
    val a = model.transform(regDf).select("prediction").collect().map(_.getDouble(0))
    val b = loaded.transform(regDf).select("prediction").collect().map(_.getDouble(0))
    assert(a.toSeq === b.toSeq)

    val cmodel = new BaggingClassifier()
      .setBaseLearner(new DecisionTreeClassifier().setMaxDepth(3))
      .setNumBaseLearners(3)
      .setSeed(2L)
      .fit(clsDf)
    cmodel.write.overwrite().save(s"$tmp/c")
    val cloaded = BaggingClassificationModel.load(s"$tmp/c")
    val ca = cmodel.transform(clsDf).select("prediction").collect().map(_.getDouble(0))
    val cb = cloaded.transform(clsDf).select("prediction").collect().map(_.getDouble(0))
    assert(ca.toSeq === cb.toSeq)
  }
}
