package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.graft.feature._
import org.apache.spark.sql.functions._

class TextTransformersSuite extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the cat sat on the mat and it is happy that the sun is out today"),
      (2L, "The cat sat on the mat and it is happy that the sun is out today"),
      (3L, "der hund ist nicht mit der katze auf das sofa zu bringen heute"),
      (4L, "x")
    ).toDF("doc_id", "text")
  }

  test("cleaning transformers compose in a Pipeline and persist") {
    val pipeline = new Pipeline().setStages(Array(
      new LanguageTagger(),
      new QualityScorer(),
      new Fingerprinter(),
      new ExactDeduplicator()))
    val model = pipeline.fit(docs)
    val out = model.transform(docs)
    assert(out.columns.toSet.intersect(Set("lang_pred", "quality", "fingerprint")).size === 3)
    // dedup is case-insensitive: docs 1 and 2 collapse to the min id
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 3L, 4L))
    val langs = out.filter(col("doc_id") === 3L).select("lang_pred").head().getString(0)
    assert(langs === "de")

    val tmp = java.nio.file.Files.createTempDirectory("ttx").toString
    model.write.overwrite().save(s"$tmp/pm")
    val loaded = org.apache.spark.ml.PipelineModel.load(s"$tmp/pm")
    assert(
      loaded.transform(docs).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        === ids)
  }

  test("transformers reject non-string input columns") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, 2.0)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      new QualityScorer().transformSchema(bad.schema)
    }
  }
}
