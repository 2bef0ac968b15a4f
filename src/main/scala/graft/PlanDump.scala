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
  * partitions = cpus) so the dumped plan is the one the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
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
    wanted.foreach { name =>
      all.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
            spark.catalog.clearCache()
            println(s"[plandump] wrote ${name}_$tag.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name failed: $e")
          }
        case None => System.err.println(s"[plandump] unknown query: $name")
      }
    }
    spark.stop()
  }
}
