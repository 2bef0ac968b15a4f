package org.apache.spark.ml.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.ml.PredictorParams
import org.apache.spark.ml.graft.util.GraftUtils
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.{Param, ParamMap, ParamValidators}
import org.apache.spark.ml.param.shared.{
  HasAggregationDepth, HasCheckpointInterval, HasWeightCol
}
import org.apache.spark.ml.regression.{RegressionModel, Regressor}
import org.apache.spark.ml.util._
import org.apache.spark.ml.util.Instrumentation.instrumented
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.json4s.DefaultFormats
import org.json4s.JsonDSL._

/** Iteration-state cache manager: persists the per-iteration weighted
  * dataset, eagerly materializes it, drops the previous one, and truncates
  * lineage every `checkpointInterval` iterations via a checkpoint —
  * without it an N-iteration boosting loop carries O(N) plan depth
  * (reference uses PeriodicRDDCheckpointer: regression/BoostingRegressor
  * .scala:202-206).
  *
  * Checkpoint mode follows the session: when
  * `SparkContext.setCheckpointDir` is set, iterations checkpoint RELIABLY
  * to that directory (data survives executor loss — at 1000 executors
  * with dynamic allocation, localCheckpoint's cached-blocks-only contract
  * is a real failure mode), keeping the latest two checkpoints and
  * deleting older files exactly like the reference's
  * PeriodicRDDCheckpointer. Without a checkpoint dir it falls back to
  * localCheckpoint (single-JVM / test mode).
  */
private[graft] class IterLoopCache(checkpointInterval: Int) {
  private var prev: DataFrame = _
  private var iter = 0
  private val checkpointFiles = scala.collection.mutable.Queue.empty[String]

  private def release(df: DataFrame): Unit = {
    // Dataset.unpersist is a no-op on localCheckpoint blocks (they bypass
    // the CacheManager) — free the underlying RDD cache explicitly or each
    // checkpointed iteration's full dataset lingers in executor storage.
    // Safe here: the successor iteration is already materialized, so the
    // freed lineage is never re-entered (reliable checkpoint files are
    // managed separately and outlive the cached blocks).
    df.unpersist()
    org.apache.spark.sql.graft.DatasetUtils.freeCheckpointBlocks(df)
  }

  def next(df: DataFrame): DataFrame = {
    iter += 1
    val out =
      if (checkpointInterval > 0 && iter % checkpointInterval == 0) {
        if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
          val cp = df.checkpoint(eager = true)
          org.apache.spark.sql.graft.DatasetUtils.checkpointFile(cp)
            .foreach(checkpointFiles.enqueue(_))
          // keep the newest checkpoint plus its predecessor (persisted
          // successor blocks may still recompute through it on loss) —
          // the PeriodicRDDCheckpointer retention policy
          while (checkpointFiles.size > 2) {
            org.apache.spark.sql.graft.DatasetUtils
              .deleteCheckpointFile(checkpointFiles.dequeue(), cp)
          }
          cp
        } else df.localCheckpoint(true)
      } else { df.persist(StorageLevel.MEMORY_AND_DISK); df.count(); df }
    if (prev != null) release(prev)
    prev = out
    out
  }

  /** Callers collect every per-iteration result before closing, so both
    * the cached blocks and any remaining reliable checkpoint files are
    * dead weight by now — free them all.
    */
  def close(): Unit = if (prev != null) {
    val last = prev
    release(prev)
    prev = null
    while (checkpointFiles.nonEmpty) {
      org.apache.spark.sql.graft.DatasetUtils
        .deleteCheckpointFile(checkpointFiles.dequeue(), last)
    }
  }
}

private[graft] trait BoostingRegressorParams
    extends PredictorParams
    with HasNumBaseLearners
    with HasBaseLearner
    with HasWeightCol
    with HasNativeTreeFastPath
    with HasCheckpointInterval
    // kept for API parity with the reference's treeReduce/treeAggregate
    // depth; the DataFrame aggregations here partial-aggregate map-side,
    // which supersedes multi-level tree reduction
    with HasAggregationDepth {

  /** AdaBoost.R2 loss on the max-normalized absolute error (reference:
    * regression/BoostingRegressor.scala:97-106).
    */
  final val lossType: Param[String] = new Param[String](
    this, "lossType", "exponential|linear|squared",
    ParamValidators.inArray(Array("exponential", "linear", "squared")))
  def getLossType: String = $(lossType)

  /** median (weighted median, AdaBoost.R2 default) | mean (weighted mean). */
  final val votingStrategy: Param[String] = new Param[String](
    this, "votingStrategy", "median|mean",
    ParamValidators.inArray(Array("median", "mean")))
  def getVotingStrategy: String = $(votingStrategy)

  setDefault(lossType -> "exponential", votingStrategy -> "median", checkpointInterval -> 10)
}

/** AdaBoost.R2 (Drucker 1997) meta-regressor. Spark-first shape: the
  * per-row boost weight lives in a DataFrame column updated by codegen'd
  * expressions; the three per-iteration reductions (sum of weights, max
  * error, weighted loss) are DataFrame aggs with map-side partial
  * aggregation (reference dataflow: regression/BoostingRegressor
  * .scala:173-282, re-derived from the published algorithm).
  */
class BoostingRegressor(override val uid: String)
    extends Regressor[Vector, BoostingRegressor, BoostingRegressionModel]
    with BoostingRegressorParams
    with MLWritable {

  def this() = this(Identifiable.randomUID("BoostingRegressor"))

  def setBaseLearner(value: EnsemblePredictorType): this.type = set(baseLearner, value)
  def setNumBaseLearners(value: Int): this.type = set(numBaseLearners, value)
  def setLossType(value: String): this.type = set(lossType, value)
  def setVotingStrategy(value: String): this.type = set(votingStrategy, value)
  def setWeightCol(value: String): this.type = set(weightCol, value)
  def setCheckpointInterval(value: Int): this.type = set(checkpointInterval, value)
  def setAggregationDepth(value: Int): this.type = set(aggregationDepth, value)

  override protected def train(dataset: Dataset[_]): BoostingRegressionModel = instrumented {
    instr =>
      GraftInstrumentation.logFit(instr, this, dataset)
      trainImpl(dataset, instr)
  }

  private def trainImpl(dataset: Dataset[_], instr: Instrumentation): BoostingRegressionModel = {
    val instances = SubBagFit
      .instances(
        dataset, $(labelCol),
        if (isDefined(weightCol)) Some($(weightCol)) else None, $(featuresCol))
      .withColumn("__bw", col("weight"))
    $(baseLearner) match {
      case dt: org.apache.spark.ml.regression.DecisionTreeRegressor
          if $(nativeTreeFastPath) =>
        return trainNativeDT(instances, dt)
      case _ => ()
    }
    val loop = new IterLoopCache($(checkpointInterval))
    var df = loop.next(instances)

    val models = ArrayBuffer.empty[EnsemblePredictionModelType]
    val modelWeights = ArrayBuffer.empty[Double]
    var i = 0
    var done = false
    while (i < $(numBaseLearners) && !done) {
      val sumW = df.agg(sum("__bw")).head().getDouble(0)
      val weighted = df.withColumn("__bwn", col("__bw") / sumW)
      val model = Learners.fit($(baseLearner), weighted, "label", "features", Some("__bwn"), weightRequired = true)
      val predicted = Learners
        .transform(model, weighted, "__pred")
        .withColumn("__err", abs(col("__pred") - col("label")))
      predicted.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val maxError = predicted.agg(max("__err")).head().getDouble(0)
        if (maxError == 0.0) {
          // perfect fit: keep it with full confidence and stop early
          models += model
          modelWeights += 1.0
          done = true
        } else {
          val lossCol = $(lossType) match {
            case "linear" => col("__err") / maxError
            case "squared" => pow(col("__err") / maxError, 2)
            case "exponential" => lit(1.0) - exp(-col("__err") / maxError)
          }
          val withLoss = predicted.withColumn("__loss", lossCol)
          val estimatorError =
            withLoss.agg(sum(col("__bwn") * col("__loss"))).head().getDouble(0)
          if (estimatorError >= 0.5) {
            // boosting assumption broken: keep the model only if it is the
            // first (so the ensemble is non-empty, voting with full weight
            // like the classifier's degenerate case), then stop
            if (models.isEmpty) {
              models += model
              modelWeights += 1.0
            }
            done = true
          } else {
            val beta = estimatorError / (1.0 - estimatorError)
            models += model
            modelWeights += math.log(1.0 / beta)
            val updated = withLoss
              .withColumn("__bw", col("__bw") * pow(lit(beta), lit(1.0) - col("__loss")))
              .select("label", "weight", "features", "__bw")
            df = loop.next(updated)
          }
        }
      } finally predicted.unpersist()
      i += 1
    }
    loop.close()
    new BoostingRegressionModel(uid, modelWeights.toArray, models.toArray).setParent(this)
  }

  /** Native-tree fast path for AdaBoost.R2: bin features once, reweight
    * the binned points per boosting round. The candidate split GRID is
    * computed once from the feature values (the hist-gradient-boosting
    * convention — LightGBM/XGBoost-hist bin once the same way); each
    * round's tree still fits the EXACT current boost weights, which enter
    * the induction through the TreePoint weights. The generic path
    * recomputes weighted split candidates per round — a per-round
    * threshold-grid refinement the fixed grid approximates, traded for
    * removing numBaseLearners-1 full binning passes. The weight recursion
    * (normalized loss, beta, log(1/beta) model weights, early-stop
    * conditions) is identical to the generic loop line for line.
    */
  private def trainNativeDT(
      instances: DataFrame,
      dt: org.apache.spark.ml.regression.DecisionTreeRegressor): BoostingRegressionModel = {
    import org.apache.spark.ml.regression.DecisionTreeRegressionModel
    import org.apache.spark.rdd.RDD

    val categorical = MetadataUtils.getCategoricalFeatures(instances.schema("features"))
    val boost = new NativeTreeBoost(
      instances, dt.getOldStrategy(categorical), dt.getSeed, $(checkpointInterval))
    try {
      var bw: RDD[Double] = boost.initialWeights()
      val models = ArrayBuffer.empty[EnsemblePredictionModelType]
      val modelWeights = ArrayBuffer.empty[Double]
      var i = 0
      var done = false
      while (i < $(numBaseLearners) && !done) {
        val sw = NativeTreeBoost.orderedSum(bw)
        val model = boost.fitRound(bw, sw, boost.dtSeed + i)
          .asInstanceOf[DecisionTreeRegressionModel]

        // (absolute error via binned prediction, normalized bw, raw bw)
        val bcSplits = boost.bcSplits
        val data = boost.treePoints.zip(bw).map { case (tp, w) =>
          val pred = model.rootNode.predictBinned(tp.binnedFeatures, bcSplits.value).prediction
          (math.abs(pred - tp.label), w / sw, w)
        }
        data.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val maxError = data.map(_._1).max()
          if (maxError == 0.0) {
            models += model
            modelWeights += 1.0
            done = true
          } else {
            val lossFn: Double => Double = $(lossType) match {
              case "linear" => e => e / maxError
              case "squared" => e => (e / maxError) * (e / maxError)
              case "exponential" => e => 1.0 - math.exp(-e / maxError)
            }
            val estimatorError =
              NativeTreeBoost.orderedSum(data.map { case (e, bwn, _) => bwn * lossFn(e) })
            if (estimatorError >= 0.5) {
              if (models.isEmpty) {
                models += model
                modelWeights += 1.0
              }
              done = true
            } else {
              val beta = estimatorError / (1.0 - estimatorError)
              models += model
              modelWeights += math.log(1.0 / beta)
              bw = boost.advance(
                data.map { case (e, _, w) => w * math.pow(beta, 1.0 - lossFn(e)) })
            }
          }
        } finally data.unpersist(blocking = false)
        i += 1
      }
      new BoostingRegressionModel(uid, modelWeights.toArray, models.toArray).setParent(this)
    } finally boost.close()
  }

  override def copy(extra: ParamMap): BoostingRegressor = defaultCopy(extra)

  override def write: MLWriter = new BoostingRegressor.Writer(this)
}

object BoostingRegressor extends MLReadable[BoostingRegressor] {

  private[graft] class Writer(instance: BoostingRegressor) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftPersistence.saveMetadata(instance, path, sparkSession)
      Learners.save(instance.getBaseLearner, s"$path/learner")
    }
  }

  private class Reader extends MLReader[BoostingRegressor] {
    private val className = classOf[BoostingRegressor].getName
    override def load(path: String): BoostingRegressor = {
      val metadata = GraftPersistence.loadMetadata(path, sparkSession, className)
      val est = new BoostingRegressor(metadata.uid)
      metadata.getAndSetParams(est)
      est.setBaseLearner(Learners.loadLearner(s"$path/learner", sparkSession))
    }
  }

  override def read: MLReader[BoostingRegressor] = new Reader
  override def load(path: String): BoostingRegressor = super.load(path)
}

class BoostingRegressionModel(
    override val uid: String,
    val modelWeights: Array[Double],
    val models: Array[EnsemblePredictionModelType])
    extends RegressionModel[Vector, BoostingRegressionModel]
    with BoostingRegressorParams
    with MLWritable {

  /** Weighted median (default) or weighted mean of base predictions
    * (reference: regression/BoostingRegressor.scala:333-347).
    */
  override def predict(features: Vector): Double = {
    val preds = new Array[Double](models.length)
    var i = 0
    while (i < models.length) { preds(i) = models(i).predict(features); i += 1 }
    $(votingStrategy) match {
      case "median" => GraftUtils.weightedMedian(preds, modelWeights)
      case "mean" =>
        var num = 0.0
        var den = 0.0
        i = 0
        while (i < preds.length) { num += modelWeights(i) * preds(i); den += modelWeights(i); i += 1 }
        if (den == 0.0) preds.sum / preds.length else num / den
    }
  }

  private[graft] def setBaseLearner(value: EnsemblePredictorType): this.type =
    set(baseLearner, value)

  override def copy(extra: ParamMap): BoostingRegressionModel =
    copyValues(new BoostingRegressionModel(uid, modelWeights, models), extra).setParent(parent)

  override def write: MLWriter = new BoostingRegressionModel.Writer(this)
}

object BoostingRegressionModel extends MLReadable[BoostingRegressionModel] {

  private[graft] class Writer(instance: BoostingRegressionModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftPersistence.saveMetadata(
        instance, path, sparkSession,
        Some(("numModels" -> instance.models.length) ~
          ("modelWeights" -> instance.modelWeights.toSeq)))
      Learners.save(instance.getBaseLearner, s"$path/learner")
      instance.models.zipWithIndex.foreach { case (m, i) =>
        Learners.save(m, s"$path/model-$i")
      }
    }
  }

  private class Reader extends MLReader[BoostingRegressionModel] {
    private val className = classOf[BoostingRegressionModel].getName
    override def load(path: String): BoostingRegressionModel = {
      implicit val fmt: DefaultFormats.type = DefaultFormats
      val metadata = GraftPersistence.loadMetadata(path, sparkSession, className)
      val n = (metadata.metadata \ "numModels").extract[Int]
      val weights = (metadata.metadata \ "modelWeights").extract[Seq[Double]].toArray
      val models = Array.tabulate(n)(i => Learners.loadModel(s"$path/model-$i", sparkSession))
      val model = new BoostingRegressionModel(metadata.uid, weights, models)
      metadata.getAndSetParams(model, skipParams = Some(List("baseLearner")))
      model.setBaseLearner(Learners.loadLearner(s"$path/learner", sparkSession))
    }
  }

  override def read: MLReader[BoostingRegressionModel] = new Reader
  override def load(path: String): BoostingRegressionModel = super.load(path)
}
