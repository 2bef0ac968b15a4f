package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall-clock at
  * SPARK_GRAFT_SF_DIR. Times every correctness-gate query plus the heavy
  * DecisionTree-base ensemble fits (Queries.benchHeavy, `*_dt` — the
  * perf-comparable successors of the round-1 `ml_*` bench rows; see
  * BASELINE.md). A small untimed warmup absorbs JVM/codegen/JIT startup so
  * the first timed query isn't charged ~5s of warmup (the round-1
  * `q8_pivot` artifact).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = (SparkEntry.queries ++ Queries.benchHeavy).toSeq.sortBy(_._1)
    // warmup: scan/agg/join codegen, window, UDF+fit, dedup expressions
    Seq("q1_pricing_summary", "q3_running_qty_window", "ml_dummy_mean", "p_ngram_jaccard")
      .foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, sfDir).count() catch { case _: Throwable => }
        }
      }
    // each query starts from a clean cache: operators persist small result
    // sets (and release their own intermediates), but nothing may leak
    // across timed queries — round-2's leaked shingle/signature caches
    // inflated every late-alphabet query 2-4x with unchanged plans
    spark.catalog.clearCache()
    val results = all.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (name, sec, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
