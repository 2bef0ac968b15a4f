package org.apache.spark.ml.graft

import org.apache.spark.ml.classification.{
  ProbabilisticClassificationModel, ProbabilisticClassifier
}
import org.apache.spark.ml.graft.util.GraftUtils
import org.apache.spark.ml.linalg.{DenseVector, Vector, Vectors}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util._
import org.apache.spark.ml.util.Instrumentation.instrumented
import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel
import org.json4s.DefaultFormats
import org.json4s.JsonDSL._

private[graft] trait BaggingClassifierParams
    extends BaggingParams
    with org.apache.spark.ml.classification.ProbabilisticClassifierParams
    with HasVotingStrategy

/** Bagging meta-classifier: SubBag fit + majority vote, `hard` over
  * predicted classes or `soft` over probability vectors (reference:
  * classification/BaggingClassifier.scala).
  */
class BaggingClassifier(override val uid: String)
    extends ProbabilisticClassifier[Vector, BaggingClassifier, BaggingClassificationModel]
    with BaggingClassifierParams
    with MLWritable {

  def this() = this(Identifiable.randomUID("BaggingClassifier"))

  def setBaseLearner(value: EnsemblePredictorType): this.type = set(baseLearner, value)
  def setNumBaseLearners(value: Int): this.type = set(numBaseLearners, value)
  def setReplacement(value: Boolean): this.type = set(replacement, value)
  def setSubsampleRatio(value: Double): this.type = set(subsampleRatio, value)
  def setSubspaceRatio(value: Double): this.type = set(subspaceRatio, value)
  def setSeed(value: Long): this.type = set(seed, value)
  def setWeightCol(value: String): this.type = set(weightCol, value)
  def setParallelism(value: Int): this.type = set(parallelism, value)
  def setVotingStrategy(value: String): this.type = set(votingStrategy, value)

  override protected def train(dataset: Dataset[_]): BaggingClassificationModel = instrumented {
    instr =>
      GraftInstrumentation.logFit(instr, this, dataset)
      trainImpl(dataset, instr)
  }

  private def trainImpl(dataset: Dataset[_], instr: Instrumentation): BaggingClassificationModel = {
    val numClasses = getNumClasses(dataset)
    if ($(votingStrategy) == "soft") {
      require(
        $(baseLearner).isInstanceOf[ProbabilisticClassifier[_, _, _]],
        "soft voting requires a probabilistic base classifier")
    }
    val instances = SubBagFit.instances(
      dataset, $(labelCol),
      if (isDefined(weightCol)) Some($(weightCol)) else None, $(featuresCol))
    val handlePersist = dataset.storageLevel == StorageLevel.NONE
    if (handlePersist) instances.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val bags = {
        val native =
          if ($(nativeTreeFastPath) && $(subspaceRatio) >= 1.0)
            SubBagFit.runNativeTrees(
              instances, $(baseLearner), $(numBaseLearners), $(replacement),
              $(subsampleRatio), $(seed), Some(numClasses))
          else None
        native.getOrElse(SubBagFit.run(
          instances, $(baseLearner), $(numBaseLearners), $(replacement),
          $(subsampleRatio), $(subspaceRatio), $(seed), getExecutionContext))
      }
      new BaggingClassificationModel(uid, numClasses, bags.map(_._1), bags.map(_._2))
        .setParent(this)
    } finally if (handlePersist) instances.unpersist()
  }

  override def copy(extra: ParamMap): BaggingClassifier = defaultCopy(extra)

  override def write: MLWriter = new BaggingClassifier.Writer(this)
}

object BaggingClassifier extends MLReadable[BaggingClassifier] {

  private[graft] class Writer(instance: BaggingClassifier) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftPersistence.saveMetadata(instance, path, sparkSession)
      Learners.save(instance.getBaseLearner, s"$path/learner")
    }
  }

  private class Reader extends MLReader[BaggingClassifier] {
    private val className = classOf[BaggingClassifier].getName
    override def load(path: String): BaggingClassifier = {
      val metadata = GraftPersistence.loadMetadata(path, sparkSession, className)
      val est = new BaggingClassifier(metadata.uid)
      metadata.getAndSetParams(est)
      est.setBaseLearner(Learners.loadLearner(s"$path/learner", sparkSession))
    }
  }

  override def read: MLReader[BaggingClassifier] = new Reader
  override def load(path: String): BaggingClassifier = super.load(path)
}

class BaggingClassificationModel(
    override val uid: String,
    override val numClasses: Int,
    val subspaces: Array[Array[Int]],
    val models: Array[EnsemblePredictionModelType])
    extends ProbabilisticClassificationModel[Vector, BaggingClassificationModel]
    with BaggingClassifierParams
    with MLWritable {

  private val numModels = models.length

  /** Vote accumulation (reference:
    * classification/BaggingClassifier.scala:260-283): hard adds a one-hot of
    * each base `predict`; soft adds each base probability vector; result is
    * divided by the number of models so raw is already a distribution.
    */
  override def predictRaw(features: Vector): Vector = {
    val votes = new Array[Double](numClasses)
    val hard = $(votingStrategy) == "hard" // hoisted out of the per-model loop
    var i = 0
    while (i < numModels) {
      val sub = subspaces(i)
      val f = if (sub.length == features.size) features else GraftUtils.sliceVector(features, sub)
      if (hard) {
        val k = models(i).predict(f).toInt
        votes(k) += 1.0
      } else {
        val p = models(i)
          .asInstanceOf[ProbabilisticClassificationModel[Vector, _]]
          .predictProbability(f)
        var k = 0
        while (k < numClasses) { votes(k) += p(k); k += 1 }
      }
      i += 1
    }
    var k = 0
    while (k < numClasses) { votes(k) /= numModels; k += 1 }
    Vectors.dense(votes)
  }

  override protected def raw2probabilityInPlace(rawPrediction: Vector): Vector =
    rawPrediction match {
      case d: DenseVector =>
        var s = 0.0
        var i = 0
        while (i < d.size) { s += d.values(i); i += 1 }
        if (s != 0.0) { i = 0; while (i < d.size) { d.values(i) /= s; i += 1 } }
        d
      case v => throw new IllegalArgumentException(s"unexpected raw vector $v")
    }

  private[graft] def setBaseLearner(value: EnsemblePredictorType): this.type =
    set(baseLearner, value)

  override def copy(extra: ParamMap): BaggingClassificationModel =
    copyValues(new BaggingClassificationModel(uid, numClasses, subspaces, models), extra)
      .setParent(parent)

  override def write: MLWriter = new BaggingClassificationModel.Writer(this)
}

object BaggingClassificationModel extends MLReadable[BaggingClassificationModel] {

  private[graft] class Writer(instance: BaggingClassificationModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftPersistence.saveMetadata(
        instance, path, sparkSession,
        Some(("numModels" -> instance.models.length) ~
          ("numClasses" -> instance.numClasses) ~
          ("subspaces" -> instance.subspaces.map(_.toSeq).toSeq)))
      Learners.save(instance.getBaseLearner, s"$path/learner")
      instance.models.zipWithIndex.foreach { case (m, i) =>
        Learners.save(m, s"$path/model-$i")
      }
    }
  }

  private class Reader extends MLReader[BaggingClassificationModel] {
    private val className = classOf[BaggingClassificationModel].getName
    override def load(path: String): BaggingClassificationModel = {
      implicit val fmt: DefaultFormats.type = DefaultFormats
      val metadata = GraftPersistence.loadMetadata(path, sparkSession, className)
      val numModels = (metadata.metadata \ "numModels").extract[Int]
      val numClasses = (metadata.metadata \ "numClasses").extract[Int]
      val subspaces = (metadata.metadata \ "subspaces").extract[Seq[Seq[Int]]]
        .map(_.toArray).toArray
      val models = Array.tabulate(numModels)(i =>
        Learners.loadModel(s"$path/model-$i", sparkSession))
      val model = new BaggingClassificationModel(metadata.uid, numClasses, subspaces, models)
      metadata.getAndSetParams(model, skipParams = Some(List("baseLearner")))
      model.setBaseLearner(Learners.loadLearner(s"$path/learner", sparkSession))
    }
  }

  override def read: MLReader[BaggingClassificationModel] = new Reader
  override def load(path: String): BaggingClassificationModel = super.load(path)
}
