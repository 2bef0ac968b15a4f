package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.graft._
import org.apache.spark.ml.regression.DecisionTreeRegressor
import org.apache.spark.sql.functions._

/** Source formats + full-pipeline persistence (the reference's only file
  * format is libsvm, SURVEY.md §1.3; Spark's built-in reader covers it).
  */
class SourcesSuite extends SparkSpec {

  test("libsvm source round-trips into the estimator input schema") {
    val tmp = java.nio.file.Files.createTempDirectory("libsvm").toString
    val lines = (1 to 100).map { i =>
      val label = if (i % 2 == 0) 1.0 else 0.0
      s"$label 1:${i % 7} 2:${(i % 5) * 0.5} 3:${i % 3}"
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/data.svm"),
      lines.mkString("\n").getBytes)
    val df = spark.read.format("libsvm").option("numFeatures", "3").load(s"$tmp/data.svm")
    assert(df.count() === 100)
    assert(df.schema.fieldNames.toSet === Set("label", "features"))
    // estimator consumes it directly (metadata carries numFeatures)
    val model = new BaggingClassifier()
      .setBaseLearner(new org.apache.spark.ml.classification.DecisionTreeClassifier().setMaxDepth(3))
      .setNumBaseLearners(2)
      .setSeed(0L)
      .fit(df)
    assert(model.transform(df).select("prediction").count() === 100)
  }

  test("parquet-sourced instances flow through every estimator entry point") {
    val df = Queries.regressionInstances(spark, "/root/testdata/sf0.001").limit(500).cache()
    val m = new DummyRegressor().setStrategy("mean").fit(df)
    assert(m.transform(df).count() === 500)
  }

  test("PipelineModel with a graft stage persists and reloads") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(41)
    val raw = (0 until 300).map { _ =>
      val a = rng.nextDouble(); val b = rng.nextDouble()
      (2 * a + b, a, b)
    }.toDF("label", "f0", "f1")
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("f0", "f1")).setOutputCol("features"),
      new BaggingRegressor()
        .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(3))
        .setNumBaseLearners(2)
        .setSeed(0L)))
    val model = pipeline.fit(raw)
    val tmp = java.nio.file.Files.createTempDirectory("pipe-io").toString
    model.write.overwrite().save(s"$tmp/pm")
    val loaded = org.apache.spark.ml.PipelineModel.load(s"$tmp/pm")
    val a = model.transform(raw).select("prediction").collect().map(_.getDouble(0))
    val b = loaded.transform(raw).select("prediction").collect().map(_.getDouble(0))
    assert(a.toSeq === b.toSeq)
  }

  test("estimator (not just model) persistence round-trips params") {
    val tmp = java.nio.file.Files.createTempDirectory("est-io").toString
    val est = new GBMRegressor()
      .setBaseLearner(new DecisionTreeRegressor().setMaxDepth(4))
      .setMaxIter(7)
      .setLoss("huber")
      .setAlpha(0.8)
      .setLearningRate(0.25)
    est.write.overwrite().save(s"$tmp/e")
    val loaded = GBMRegressor.load(s"$tmp/e")
    assert(loaded.getMaxIter === 7)
    assert(loaded.getLoss === "huber")
    assert(loaded.getAlpha === 0.8)
    assert(loaded.getLearningRate === 0.25)
    assert(loaded.getBaseLearner.isInstanceOf[DecisionTreeRegressor])
    assert(loaded.getBaseLearner.asInstanceOf[DecisionTreeRegressor].getMaxDepth === 4)
  }
}
