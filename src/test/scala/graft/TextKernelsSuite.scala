package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExpressions
import org.apache.spark.unsafe.types.UTF8String

/** Equivalence pins for the byte-scan text kernels that replaced the
  * regex forms in the hot text paths (r16 optimization round):
  *
  *   - [[org.apache.spark.sql.graft.WsSplit]]   ≡ split(s, "\\s+")
  *   - [[org.apache.spark.sql.graft.CollapseWs]] ≡ regexp_replace(s, "\\s+", " ")
  *
  * Both are pinned two ways: a JVM-level property sweep against
  * java.util.regex (the engine the built-ins delegate to), and a
  * Spark-level sweep of the full column pipelines over the same corpus —
  * so a future Spark upgrade changing StringSplit/RegExpReplace
  * semantics would also be caught.
  */
class TextKernelsSuite extends SparkSpec {

  // every Java \s char, multibyte UTF-8, empties, boundary runs
  private val edgeCases: Seq[String] = Seq(
    "",
    " ",
    "  ",
    "\t",
    "\n",
    "",
    "\f",
    "\r",
    " \t\n\f\r ",
    "a",
    "a b",
    "a  b",
    " a",
    "a ",
    " a ",
    "\ta\r\nb\f",
    "a b", // NBSP is NOT Java \s — must stay one token
    "a b", // unicode line sep is NOT Java \s
    "héllo wörld",
    "日本\t語 テスト",
    "mixed   and \t real",
    "ends with newline\n",
    "\r\nstarts with crlf",
    "long   run \t\t\t of   separators",
    "emoji 🙂 token\t🙃",
    "ab" // NEL is NOT Java \s
  )

  private def randomStrings(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabet: Array[String] = Array(
      " ", "\t", "\n", "", "\f", "\r", // all six Java \s chars
      "a", "b", "Z", "0", ".", "é", "ß", "日", "🙂", " ", " ")
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  private val corpus = edgeCases ++ randomStrings(2000, seed = 0xC0FFEE)

  test("WsSplit.compute matches Pattern.split(s, -1) on the property corpus") {
    val p = java.util.regex.Pattern.compile("\\s+")
    corpus.foreach { s =>
      val expected = p.split(s, -1).toSeq
      val got = org.apache.spark.sql.graft.WsSplit
        .compute(UTF8String.fromString(s))
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq == expected, s"WsSplit mismatch on ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("CollapseWs.compute matches replaceAll(\"\\\\s+\", \" \") on the property corpus") {
    val p = java.util.regex.Pattern.compile("\\s+")
    corpus.foreach { s =>
      val expected = p.matcher(s).replaceAll(" ")
      val got = org.apache.spark.sql.graft.CollapseWs
        .compute(UTF8String.fromString(s)).toString
      assert(got == expected, s"CollapseWs mismatch on ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("wsSplit column ≡ split(.., \\s+) and tokens() pipeline over the corpus in Spark") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      corpus.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "s", org.apache.spark.sql.types.StringType, nullable = true))))
    val cmp = df.select(
      split(lower(trim(col("s"))), "\\s+").as("ref"),
      GraftExpressions.wsSplit(lower(trim(col("s")))).as("got"))
    assert(cmp.filter(not(col("ref") === col("got"))).count() === 0)
    // null in → null out, matching split()
    val nulls = spark.sql("select cast(null as string) as s")
      .select(GraftExpressions.wsSplit(col("s")).as("got"))
    assert(nulls.head().isNullAt(0))
  }

  test("collapseWs column ≡ regexp_replace(.., \\s+, ' ') and lineNorm pipeline in Spark") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      corpus.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "s", org.apache.spark.sql.types.StringType, nullable = true))))
    val cmp = df.select(
      lower(trim(regexp_replace(col("s"), "\\s+", " "))).as("ref"),
      lower(trim(GraftExpressions.collapseWs(col("s")))).as("got"))
    assert(cmp.filter(not(col("ref") <=> col("got"))).count() === 0)
    val nulls = spark.sql("select cast(null as string) as s")
      .select(GraftExpressions.collapseWs(col("s")).as("got"))
    assert(nulls.head().isNullAt(0))
  }

  test("WsTokenCount ≡ size(split(s, \\s+)), and is lower()-invariant, on the corpus") {
    val p = java.util.regex.Pattern.compile("\\s+")
    // İ and ẞ lowercase to multi-char/different-length sequences; Σ is
    // position-sensitive — none may change the segment count
    val extra = Seq("İstanbul POLİS", "GROẞE STRAẞE", "ΟΔΟΣ ΣΟΦΙΑΣ", "ǅungla Mix")
    (corpus ++ extra).foreach { s =>
      val expected = p.split(s, -1).length
      val got = org.apache.spark.sql.graft.WsTokenCount
        .compute(UTF8String.fromString(s))
      assert(got == expected, s"count mismatch on ${s.map(_.toInt).mkString(",")}")
      val low = org.apache.spark.sql.graft.WsTokenCount
        .compute(UTF8String.fromString(s.toLowerCase))
      assert(low == expected, s"lower-invariance broken on $s")
    }
  }

  test("tokenCount column ≡ size(split(lower(trim(s)), \\s+)) in Spark") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      corpus.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "s", org.apache.spark.sql.types.StringType, nullable = true))))
    val cmp = df.select(
      size(split(lower(trim(col("s"))), "\\s+")).as("ref"),
      graft.pipeline.TextFunctions.tokenCount(col("s")).as("got"))
    assert(cmp.filter(not(col("ref") <=> col("got"))).count() === 0)
    // schema must stay int (size()'s type)
    assert(cmp.schema("got").dataType === org.apache.spark.sql.types.IntegerType)
    val nulls = spark.sql("select cast(null as string) as s")
      .select(graft.pipeline.TextFunctions.tokenCount(col("s")).as("got"))
    assert(nulls.head().isNullAt(0))
  }

  test("wsSplit/collapseWs match the regex forms over the sf0.001 documents fixture") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(s"$dir/documents.parquet").exists()) {
      val docs = Tables.documents(spark, dir)
      val cmp = docs.select(
        split(lower(trim(col("text"))), "\\s+").as("ref_tok"),
        GraftExpressions.wsSplit(lower(trim(col("text")))).as("got_tok"),
        regexp_replace(col("text"), "\\s+", " ").as("ref_norm"),
        GraftExpressions.collapseWs(col("text")).as("got_norm"))
      assert(cmp.filter(
        not(col("ref_tok") === col("got_tok")) ||
          not(col("ref_norm") <=> col("got_norm"))).count() === 0)
    }
  }
}
