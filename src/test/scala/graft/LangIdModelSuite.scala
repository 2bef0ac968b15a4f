package graft

import graft.pipeline.LangIdModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned language-ID: training accuracy bars on a synthetic
  * multilingual fixture (treeAggregate float sums aren't bit-stable, so
  * training is bar-pinned — the tree-learner discipline), model==table
  * scoring parity, artifact round-trip, and the zero-shuffle serving
  * plan. The scoring ARITHMETIC is gate-pinned (`p_langid_model`).
  */
class LangIdModelSuite extends SparkSpec {

  import LangIdModel.{Model, scoreWithModel, scoreWithTable}

  /** Four synthetic "languages" with disjoint function-word stock —
    * char trigrams separate these trivially, which is the point:
    * training must recover a near-perfect fit on separable data.
    */
  private val vocab: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "that", "with", "have", "this"),
    "de" -> Seq("der", "und", "das", "nicht", "mit", "auf", "eine", "ist"),
    "fr" -> Seq("le", "et", "les", "des", "dans", "que", "pour", "une"),
    "es" -> Seq("el", "que", "los", "una", "por", "con", "para", "las"))

  private def fixture: DataFrame = {
    val rng = new scala.util.Random(7)
    val rows = for {
      (lang, words) <- vocab.toSeq.sortBy(_._1)
      i <- 0 until 60
    } yield {
      val n = 8 + rng.nextInt(12)
      val text = Seq.fill(n)(words(rng.nextInt(words.length))).mkString(" ")
      (lang.hashCode.toLong * 1000 + i, lang, text)
    }
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  private lazy val model: Model =
    LangIdModel.fit(fixture, "text", "lang",
      n = 3, numBuckets = 4096, iters = 40, stepSize = 4.0)

  test("fit recovers the labels on separable synthetic languages") {
    val docs = fixture
    val pred = scoreWithModel(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("lang").as("pred"))
    val acc = docs.join(pred, "doc_id")
      .select(avg(when(col("lang") === col("pred"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.98, s"train accuracy $acc below bar")
    assert(model.langs.toSeq === Seq("de", "en", "es", "fr"),
      "classes must index in lexicographic label order")
  }

  test("model scorer == table scorer, row-identical (winner rows)") {
    val s = spark; import s.implicits._
    val docs = fixture
    val wRows = model.langs.zipWithIndex.flatMap { case (l, k) =>
      model.weights(k).zipWithIndex.map { case (w, b) => (l, k.toLong, b.toLong, w) }
    }.toSeq.toDF("lang", "idx", "bucket", "w")
    val bRows = model.langs.zipWithIndex.map { case (l, k) =>
      (l, k.toLong, model.biases(k))
    }.toSeq.toDF("lang", "idx", "bias")
    val tableWinners = scoreWithTable(
        docs, "doc_id", "text", wRows, bRows, model.n, model.numBuckets)
      .filter(col("is_best"))
      .select("doc_id", "n_grams", "lang", "z_micro")
    val modelWinners = scoreWithModel(docs, "doc_id", "text", model)
      .select("doc_id", "n_grams", "lang", "z_micro")
    assert(tableWinners.exceptAll(modelWinners).isEmpty
      && modelWinners.exceptAll(tableWinners).isEmpty,
      "table and model scorers disagree")
  }

  test("artifact round-trip scores row-identically and fails loud when malformed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_langid_").toString
    LangIdModel.saveModel(model, dir + "/m", spark)
    val loaded = LangIdModel.loadModel(spark, dir + "/m")
    assert(loaded.langs.toSeq === model.langs.toSeq && loaded.n === model.n)
    val a = scoreWithModel(fixture, "doc_id", "text", model)
    val b = scoreWithModel(fixture, "doc_id", "text", loaded)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // malformed: drop the gram-width row
    val s = spark; import s.implicits._
    spark.read.parquet(dir + "/m").filter(col("bucket") =!= -2L)
      .write.mode("overwrite").parquet(dir + "/bad")
    intercept[IllegalArgumentException] {
      LangIdModel.loadModel(spark, dir + "/bad")
    }
  }

  test("serving plan: model path has zero exchanges; table path broadcasts weights") {
    val served = scoreWithModel(fixture, "doc_id", "text", model)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"model scorer must be map-side only:\n$plan")
    val s = spark; import s.implicits._
    val (w, b) = LangIdModel.lcgTables(spark, Seq("en", "de"), 64)
    val tbl = scoreWithTable(fixture, "doc_id", "text", w, b, 3, 64)
    val tplan = tbl.queryExecution.executedPlan.toString
    // weights AND biases must ride broadcast joins (the argmax
    // attach is doc-keyed and corpus-sized — any join kind is fine
    // there, but the model tables must never shuffle the corpus)
    assert(tplan.split("BroadcastHashJoin").length >= 3,
      s"weight/bias tables not both broadcast:\n$tplan")
  }

  test("langMixture via the model: majority rule, micro share, empty-doc contract") {
    val s = spark; import s.implicits._
    val en = Seq.fill(10)("the and of that with").mkString(" ")
    val de = Seq.fill(10)("der und das nicht mit").mkString(" ")
    val docs = Seq(
      (1L, s"$en\n\n$en\n\n$de"),           // 2/3 en
      (2L, s"$de\n\n  \n\n$de"),            // blank para filtered, all de
      (3L, "\n\n \n\n"),                    // no non-blank paras
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = LangIdModel.langMixture(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(out(1L) === ((3L, 2L, "en", 666667L)))
    assert(out(2L) === ((2L, 1L, "de", 1000000L)))
    assert(out(3L) === ((0L, 0L, "und", 0L)))
    assert(out(4L) === ((0L, 0L, "und", 0L)))
  }

  test("short and empty texts take the whole-string gram fallback; nulls emit no row") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "ab"), (2L, ""), (3L, null.asInstanceOf[String]), (4L, "abcd")
    ).toDF("doc_id", "text")
    val out = scoreWithModel(docs, "doc_id", "text", model)
      .select("doc_id", "n_grams").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 4L -> 2L))
  }
}
