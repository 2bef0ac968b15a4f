package org.apache.spark.ml.graft.feature

import graft.pipeline.{Dedup, TextFunctions}
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.param.shared.{HasInputCol, HasOutputCol}
import org.apache.spark.ml.util.{
  DefaultParamsReadable, DefaultParamsWritable, Identifiable
}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The corpus operators as spark.ml Transformer stages, so data cleaning
  * composes with the estimators in one `Pipeline` (and persists with it).
  */

private[feature] trait TextInOut extends HasInputCol with HasOutputCol {
  setDefault(inputCol -> "text")

  protected def outputType: DataType

  protected def validate(schema: StructType): StructType = {
    require(
      schema($(inputCol)).dataType == StringType,
      s"${$(inputCol)} must be a string column")
    StructType(schema.fields :+ StructField($(outputCol), outputType))
  }
}

/** Appends the [0,1] quality score (length / diversity / stopword mix). */
class QualityScorer(override val uid: String)
    extends Transformer with TextInOut with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("QualityScorer"))
  setDefault(outputCol -> "quality")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override protected def outputType: DataType = DoubleType

  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.withColumn(
      $(outputCol),
      TextFunctions.qualityScore(col($(inputCol)), TextFunctions.LangStopwords.head._2))

  override def transformSchema(schema: StructType): StructType = validate(schema)
  override def copy(extra: ParamMap): QualityScorer = defaultCopy(extra)
}

object QualityScorer extends DefaultParamsReadable[QualityScorer]

/** Appends the stopword-vote language tag (en/de/fr/es/und). */
class LanguageTagger(override val uid: String)
    extends Transformer with TextInOut with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("LanguageTagger"))
  setDefault(outputCol -> "lang_pred")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override protected def outputType: DataType = StringType

  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.withColumn($(outputCol), TextFunctions.langId(col($(inputCol))))

  override def transformSchema(schema: StructType): StructType = validate(schema)
  override def copy(extra: ParamMap): LanguageTagger = defaultCopy(extra)
}

object LanguageTagger extends DefaultParamsReadable[LanguageTagger]

/** Appends the 64-bit FNV-1a content fingerprint. */
class Fingerprinter(override val uid: String)
    extends Transformer with TextInOut with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("Fingerprinter"))
  setDefault(outputCol -> "fingerprint")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override protected def outputType: DataType = LongType

  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.withColumn($(outputCol), TextFunctions.fingerprint(col($(inputCol))))

  override def transformSchema(schema: StructType): StructType = validate(schema)
  override def copy(extra: ParamMap): Fingerprinter = defaultCopy(extra)
}

object Fingerprinter extends DefaultParamsReadable[Fingerprinter]

/** Filters the dataset to one canonical row per normalized text. */
class ExactDeduplicator(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("ExactDeduplicator"))

  final val idCol: Param[String] = new Param[String](this, "idCol", "unique row id column")
  final val textCol: Param[String] = new Param[String](this, "textCol", "text column")
  setDefault(idCol -> "doc_id", textCol -> "text")

  def setIdCol(value: String): this.type = set(idCol, value)
  def setTextCol(value: String): this.type = set(textCol, value)

  override def transform(dataset: Dataset[_]): DataFrame =
    Dedup.dedupedCorpus(dataset.toDF(), $(idCol), $(textCol))

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): ExactDeduplicator = defaultCopy(extra)
}

object ExactDeduplicator extends DefaultParamsReadable[ExactDeduplicator]
