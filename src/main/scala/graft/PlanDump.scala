package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round tooling: dump `.explain("formatted")` for named
  * queries to files (`plans/rNN/<query>_<tag>.txt`) so plan-shape claims
  * in OPTIMIZATION notes are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...|all>
  * Session confs mirror graft.Bench (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus), and each query's `Queries.benchConfs` overrides
  * are applied around its dump and restored after (r16, ADVICE item) —
  * so the dumped plan is the one the bench times, including the
  * AQE-off gates whose bench plan is not an AdaptiveSparkPlan.
  * Exits nonzero when any requested query is unknown or fails to plan,
  * so scripted dump runs can detect failures.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length != 4) {
      System.err.println(
        "usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...|all>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, tag, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val all = SparkEntry.queries ++ Queries.benchHeavy
    val wanted =
      if (names == "all") all.keys.toSeq.sorted
      else names.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    var failures = 0
    wanted.foreach { name =>
      all.get(name) match {
        case Some(fn) =>
          // mirror Bench.scala:163-165: the plan claim must hold under
          // the same session confs the bench times the query with
          val overrides = Queries.benchConfs.getOrElse(name, Map.empty)
          val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
          overrides.foreach { case (k, v) => spark.conf.set(k, v) }
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
            spark.catalog.clearCache()
            println(s"[plandump] wrote ${name}_$tag.txt")
          } catch {
            case e: Throwable =>
              failures += 1
              System.err.println(s"[plandump] $name failed: $e")
          } finally saved.foreach {
            case (k, Some(v)) => spark.conf.set(k, v)
            case (k, None) => spark.conf.unset(k)
          }
        case None =>
          failures += 1
          System.err.println(s"[plandump] unknown query: $name")
      }
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
