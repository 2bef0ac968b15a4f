package org.apache.spark.ml.graft

import org.apache.spark.ml.PredictorParams
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.HasWeightCol
import org.apache.spark.ml.regression.{RegressionModel, Regressor}
import org.apache.spark.ml.util._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.json4s.DefaultFormats
import org.json4s.JsonDSL._

private[graft] trait DummyRegressorParams extends PredictorParams with HasWeightCol {

  /** mean | median | quantile | constant (reference:
    * regression/DummyRegressor.scala:35-86).
    */
  final val strategy: Param[String] = new Param[String](
    this, "strategy", "mean|median|quantile|constant",
    ParamValidators.inArray(Array("mean", "median", "quantile", "constant")))
  def getStrategy: String = $(strategy)

  final val constant: DoubleParam = new DoubleParam(this, "constant", "constant prediction")

  final val quantile: DoubleParam = new DoubleParam(
    this, "quantile", "quantile in [0,1]", ParamValidators.inRange(0, 1))

  final val tol: DoubleParam = new DoubleParam(
    this, "tol", "approxQuantile relative error", ParamValidators.gtEq(0))

  setDefault(strategy -> "mean", constant -> 0.0, quantile -> 0.5, tol -> 1e-2)
}

/** Constant-prediction baseline regressor; also the GBM `constant` init
  * strategy provider (reference: regression/DummyRegressor.scala).
  * Aggregation is a single DataFrame agg / quantile sketch — already the
  * scalable plan (one pass, no shuffle beyond partial aggregation).
  */
class DummyRegressor(override val uid: String)
    extends Regressor[Vector, DummyRegressor, DummyRegressionModel]
    with DummyRegressorParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("DummyRegressor"))

  def setStrategy(value: String): this.type = set(strategy, value)
  def setConstant(value: Double): this.type = set(constant, value)
  def setQuantile(value: Double): this.type = set(quantile, value)
  def setTol(value: Double): this.type = set(tol, value)
  def setWeightCol(value: String): this.type = set(weightCol, value)

  override protected def train(dataset: Dataset[_]): DummyRegressionModel = {
    val labels = dataset.select(col($(labelCol)).cast(DoubleType).as("label"))
    val c = $(strategy) match {
      case "mean" =>
        if (isDefined(weightCol) && $(weightCol).nonEmpty) {
          val r = dataset
            .select(col($(labelCol)).cast(DoubleType).as("l"), col($(weightCol)).cast(DoubleType).as("w"))
            .agg(sum(col("l") * col("w")).as("lw"), sum("w").as("w"))
            .head()
          r.getDouble(0) / r.getDouble(1)
        } else labels.agg(avg("label")).head().getDouble(0)
      case "median" => quantileValue(dataset, 0.5)
      case "quantile" => quantileValue(dataset, $(quantile))
      case "constant" => $(constant)
    }
    new DummyRegressionModel(uid, c).setParent(this)
  }

  /** Unweighted: exact/approx Greenwald-Khanna sketch. Weighted: the exact
    * weighted quantile (smallest label whose cumulative weight reaches
    * q * total) via a global ordered window — one sort, acceptable for a
    * constant fit; swap for a weighted sketch at extreme row counts.
    */
  private def quantileValue(dataset: Dataset[_], q: Double): Double = {
    if (isDefined(weightCol) && $(weightCol).nonEmpty) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("l").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = dataset
        .select(
          col($(labelCol)).cast(DoubleType).as("l"),
          col($(weightCol)).cast(DoubleType).as("wt"))
        .withColumn("cum", sum("wt").over(w))
      val total = cum.agg(sum("wt")).head().getDouble(0)
      cum.filter(col("cum") >= q * total)
        .orderBy("l")
        .select("l")
        .head()
        .getDouble(0)
    } else {
      dataset.select(col($(labelCol)).cast(DoubleType).as("label"))
        .stat.approxQuantile("label", Array(q), $(tol)).head
    }
  }

  override def copy(extra: ParamMap): DummyRegressor = defaultCopy(extra)
}

object DummyRegressor extends DefaultParamsReadable[DummyRegressor]

class DummyRegressionModel(override val uid: String, val constantValue: Double)
    extends RegressionModel[Vector, DummyRegressionModel]
    with DummyRegressorParams
    with MLWritable {

  override def predict(features: Vector): Double = constantValue

  override def numFeatures: Int = -1

  override def copy(extra: ParamMap): DummyRegressionModel =
    copyValues(new DummyRegressionModel(uid, constantValue), extra).setParent(parent)

  override def write: MLWriter = new DummyRegressionModel.Writer(this)
}

object DummyRegressionModel extends MLReadable[DummyRegressionModel] {

  private[graft] class Writer(instance: DummyRegressionModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit =
      DefaultParamsWriter.saveMetadata(
        instance, path, sparkSession, Some("constantValue" -> instance.constantValue))
  }

  private class Reader extends MLReader[DummyRegressionModel] {
    private val className = classOf[DummyRegressionModel].getName
    override def load(path: String): DummyRegressionModel = {
      implicit val fmt: DefaultFormats.type = DefaultFormats
      val metadata = DefaultParamsReader.loadMetadata(path, sparkSession, className)
      val c = (metadata.metadata \ "constantValue").extract[Double]
      val model = new DummyRegressionModel(metadata.uid, c)
      metadata.getAndSetParams(model)
      model
    }
  }

  override def read: MLReader[DummyRegressionModel] = new Reader
  override def load(path: String): DummyRegressionModel = super.load(path)
}
