package org.apache.spark.ml.graft

import scala.concurrent.{ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.ml.{PredictionModel, Predictor, PredictorParams}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.graft.util.GraftUtils
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.param.shared.{HasParallelism, HasWeightCol}
import org.apache.spark.ml.util._
import org.apache.spark.ml.util.Instrumentation.instrumented
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.util.ThreadUtils
import org.json4s.DefaultFormats
import org.json4s.JsonDSL._

private[graft] trait StackingParams
    extends PredictorParams
    with HasBaseLearners
    with HasStacker
    with HasWeightCol
    with HasParallelism

private[graft] object StackingFit {

  /** Fit the heterogeneous base learners concurrently on the FULL data (no
    * resampling — reference: regression/StackingRegressor.scala:104-175).
    */
  def fitBases(
      instances: DataFrame,
      learners: Array[EnsemblePredictorType],
      ec: ExecutionContext): Array[EnsemblePredictionModelType] = {
    val futures = learners.map { learner =>
      Future(Learners.fit(learner, instances, "label", "features", Some("weight")))(ec)
    }
    futures.map(ThreadUtils.awaitResult(_, Duration.Inf))
  }

  /** Meta-feature table: chain each base model's transform (executor-side
    * UDFs, single pass, no shuffle) then assemble the per-model columns
    * into the stacker's features vector. Spark-first replacement for the
    * reference's RDD map (regression/StackingRegressor.scala:155-165).
    */
  def metaFeatures(
      instances: DataFrame,
      models: Array[EnsemblePredictionModelType],
      featureCol: Int => String,
      transformOne: (EnsemblePredictionModelType, DataFrame, Int) => DataFrame): DataFrame = {
    val withPreds = models.zipWithIndex.foldLeft(instances) { case (df, (m, i)) =>
      transformOne(m, df, i)
    }
    new VectorAssembler()
      .setInputCols(models.indices.map(featureCol).toArray)
      .setOutputCol("__meta_features")
      .transform(withPreds)
      .select(col("label"), col("weight"), col("__meta_features").as("features"))
  }

  /** Fit the meta-learner on a persisted copy of the meta-feature table.
    * Without the persist, every internal pass of the stacker's fit (e.g. a
    * DecisionTree's metadata build, split finding, and TreePoint
    * conversion) re-runs all N base-model transform UDFs over the corpus —
    * profiled at ~5s of the 10s `ml_stacking_classifier_dt` fit at sf0.1.
    * The meta table is only label+weight+K·N doubles per row, so caching
    * it is far cheaper than recomputing the base transforms.
    */
  def fitStacker(
      stacker: EnsemblePredictorType,
      meta: DataFrame): EnsemblePredictionModelType = {
    meta.persist(StorageLevel.MEMORY_AND_DISK)
    try Learners.fit(stacker, meta, "label", "features", Some("weight"))
    finally meta.unpersist()
  }
}

/** Stacking meta-regressor: N heterogeneous base learners fit in parallel
  * on the full data; a meta-learner (`stacker`) is fit on the vector of
  * their in-sample predictions (reference: regression/StackingRegressor.scala).
  */
class StackingRegressor(override val uid: String)
    extends Predictor[Vector, StackingRegressor, StackingRegressionModel]
    with StackingParams
    with MLWritable {

  def this() = this(Identifiable.randomUID("StackingRegressor"))

  def setBaseLearners(value: Array[EnsemblePredictorType]): this.type = set(baseLearners, value)
  def setStacker(value: EnsemblePredictorType): this.type = set(stacker, value)
  def setWeightCol(value: String): this.type = set(weightCol, value)
  def setParallelism(value: Int): this.type = set(parallelism, value)

  override protected def train(dataset: Dataset[_]): StackingRegressionModel = instrumented {
    instr =>
      GraftInstrumentation.logFit(instr, this, dataset)
      trainImpl(dataset, instr)
  }

  private def trainImpl(dataset: Dataset[_], instr: Instrumentation): StackingRegressionModel = {
    val instances = SubBagFit.instances(
      dataset, $(labelCol),
      if (isDefined(weightCol)) Some($(weightCol)) else None, $(featuresCol))
    val handlePersist = dataset.storageLevel == StorageLevel.NONE
    if (handlePersist) instances.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val models = StackingFit.fitBases(instances, $(baseLearners), getExecutionContext)
      val meta = StackingFit.metaFeatures(
        instances, models,
        i => s"__pred_$i",
        (m, df, i) => {
          val mm = m.asInstanceOf[PredictionModel[Vector, _ <: PredictionModel[Vector, _]]]
          mm.transform(df, ParamMap(mm.predictionCol.w(s"__pred_$i")))
        })
      val stack = StackingFit.fitStacker($(stacker), meta)
      new StackingRegressionModel(uid, models, stack).setParent(this)
    } finally if (handlePersist) instances.unpersist()
  }

  override def copy(extra: ParamMap): StackingRegressor = defaultCopy(extra)

  override def write: MLWriter = new StackingRegressor.Writer(this)
}

object StackingRegressor extends MLReadable[StackingRegressor] {

  private[graft] class Writer(instance: StackingRegressor) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftPersistence.saveMetadata(
        instance, path, sparkSession,
        Some("numLearners" -> instance.getBaseLearners.length))
      instance.getBaseLearners.zipWithIndex.foreach { case (l, i) =>
        Learners.save(l, s"$path/learner-$i")
      }
      Learners.save(instance.getStacker, s"$path/stacker")
    }
  }

  private class Reader extends MLReader[StackingRegressor] {
    private val className = classOf[StackingRegressor].getName
    override def load(path: String): StackingRegressor = {
      implicit val fmt: DefaultFormats.type = DefaultFormats
      val metadata = GraftPersistence.loadMetadata(path, sparkSession, className)
      val n = (metadata.metadata \ "numLearners").extract[Int]
      val est = new StackingRegressor(metadata.uid)
      metadata.getAndSetParams(est)
      est.setBaseLearners(
        Array.tabulate(n)(i => Learners.loadLearner(s"$path/learner-$i", sparkSession)))
      est.setStacker(Learners.loadLearner(s"$path/stacker", sparkSession))
    }
  }

  override def read: MLReader[StackingRegressor] = new Reader
  override def load(path: String): StackingRegressor = super.load(path)
}

class StackingRegressionModel(
    override val uid: String,
    val models: Array[EnsemblePredictionModelType],
    val stack: EnsemblePredictionModelType)
    extends PredictionModel[Vector, StackingRegressionModel]
    with StackingParams
    with MLWritable {

  /** stack.predict([m_1(x) … m_N(x)]) (reference:
    * regression/StackingRegressor.scala:224-226).
    */
  override def predict(features: Vector): Double = {
    val meta = new Array[Double](models.length)
    var i = 0
    while (i < models.length) { meta(i) = models(i).predict(features); i += 1 }
    stack.predict(Vectors.dense(meta))
  }

  private[graft] def setLearners(
      ls: Array[EnsemblePredictorType],
      st: EnsemblePredictorType): this.type = {
    set(baseLearners, ls)
    set(stacker, st)
  }

  override def copy(extra: ParamMap): StackingRegressionModel =
    copyValues(new StackingRegressionModel(uid, models, stack), extra).setParent(parent)

  override def write: MLWriter = new StackingRegressionModel.Writer(this)
}

object StackingRegressionModel extends MLReadable[StackingRegressionModel] {

  private[graft] class Writer(instance: StackingRegressionModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftPersistence.saveMetadata(
        instance, path, sparkSession, Some("numModels" -> instance.models.length))
      instance.getBaseLearners.zipWithIndex.foreach { case (l, i) =>
        Learners.save(l, s"$path/learner-$i")
      }
      Learners.save(instance.getStacker, s"$path/stacker")
      instance.models.zipWithIndex.foreach { case (m, i) =>
        Learners.save(m, s"$path/model-$i")
      }
      Learners.save(instance.stack, s"$path/stack")
    }
  }

  private class Reader extends MLReader[StackingRegressionModel] {
    private val className = classOf[StackingRegressionModel].getName
    override def load(path: String): StackingRegressionModel = {
      implicit val fmt: DefaultFormats.type = DefaultFormats
      val metadata = GraftPersistence.loadMetadata(path, sparkSession, className)
      val n = (metadata.metadata \ "numModels").extract[Int]
      val models = Array.tabulate(n)(i => Learners.loadModel(s"$path/model-$i", sparkSession))
      val stack = Learners.loadModel(s"$path/stack", sparkSession)
      val model = new StackingRegressionModel(metadata.uid, models, stack)
      metadata.getAndSetParams(model, skipParams = Some(List("baseLearners", "stacker")))
      model.setLearners(
        Array.tabulate(n)(i => Learners.loadLearner(s"$path/learner-$i", sparkSession)),
        Learners.loadLearner(s"$path/stacker", sparkSession))
    }
  }

  override def read: MLReader[StackingRegressionModel] = new Reader
  override def load(path: String): StackingRegressionModel = super.load(path)
}
