package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusStats, Dedup, LanguageModel, Retrieval}

/** Partition-independence pins for the double-scored operators behind the
  * spread gates (r15 ADVICE item): the gate builders repartition the
  * one-row-group fixture scan, which changes partial-aggregation combine
  * order for double-valued scores (BM25/LM/cosine). Correctness there
  * rests on output snapping (round/decimal micro-units); this suite
  * enforces it directly — each operator must produce IDENTICAL rows at 1
  * input partition and at 8 hash-partitioned input partitions, so a
  * future gate edit cannot silently become partition-dependent.
  */
class PartitionIndependenceSuite extends SparkSpec {

  private lazy val docs: DataFrame = {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "la mbda", "mu\tnu", "xi", "omicron")
    val rnd = new scala.util.Random(7)
    (0L until 200L).map { i =>
      val n = 3 + rnd.nextInt(30)
      val text = (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def both(f: DataFrame => DataFrame): (Seq[String], Seq[String]) = {
    val one = f(docs.repartition(1)).collect().map(_.toString).toSeq.sorted
    val eight = f(docs.repartition(8, col("doc_id"))).collect().map(_.toString).toSeq.sorted
    (one, eight)
  }

  test("bm25TopK is partition-independent") {
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        substring(col("text"), 1, 20).as("qtext"))
    val (a, b) = both(d => Retrieval.bm25TopK(d, "doc_id", "text", queries, "query_id", "qtext", 5))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("language-model scoreDocs is partition-independent") {
    val (a, b) = both { d =>
      val uni = LanguageModel.unigramCounts(d, "text")
      val bi = LanguageModel.bigramCounts(d, "text")
      LanguageModel.scoreDocs(d, "doc_id", "text", uni, bi)
    }
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("minhashPairs is partition-independent") {
    val (a, b) = both(d => Dedup.minhashPairs(d, "doc_id", "text", numHashes = 32, bands = 8,
      threshold = 0.2))
    assert(a == b)
  }

  test("corpusReport is partition-independent") {
    val withSrc = docs.withColumn("src", concat(lit("s"), col("doc_id") % 3))
    val one = CorpusStats.corpusReport(withSrc.repartition(1), "text", "src")
      .collect().map(_.toString).toSeq.sorted
    val eight = CorpusStats.corpusReport(withSrc.repartition(8, col("doc_id")), "text", "src")
      .collect().map(_.toString).toSeq.sorted
    assert(one == eight)
    assert(one.nonEmpty)
  }
}
