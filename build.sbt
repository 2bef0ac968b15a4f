ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkensemblespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
Test / parallelExecution := false
run / fork := true
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. sbt's default logger wraps forked-run output in "[info] "
// and appends a "[success] Total time: ..." line after it — so the
// literal last line was never JSON (BENCH_r11..r14 all read
// parsed:null). StdoutOutput routes the forked JVM's stdout straight
// through (no log decoration); showSuccess:=false drops the trailing
// [success] line.
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess)
scalacOptions ++= Seq("-language:existentials", "-deprecation")
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] ML fits churn task results fast enough that an 8g heap
  // spends measurable time in GC (bench run-to-run totals spread ~20%);
  // the machine has 128 GiB — give the single-JVM driver+executor room.
  // -Xms pinned to -Xmx: G1's heap grow/shrink cycles re-tune region
  // counts and concurrent-mark cadence mid-run, a measurable source of
  // run-to-run bench variance on identical plans.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+UseG1GC",
  // fault the whole heap in at JVM startup: without this the first
  // allocation-heavy queries pay the page-fault bill inside their timed
  // repeats (measured 4-28s swings on the alphabetically-first bench query)
  "-XX:+AlwaysPreTouch",
)
