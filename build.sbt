ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gomapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked run's stdout through RAW instead of re-logging each
// line with an "[info] " prefix: the round driver keeps the tail of
// stdout and parses the bench/verify contract line from it — a prefixed
// line doesn't parse (BENCH_r07–r10 all carry "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default: Bench executes every query 3× in one JVM (warm-up + two
  // timed laps) — headroom for the accumulated codegen/broadcast state of
  // the 54-query suite.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // ~90 queries × 3 laps of whole-stage-codegen classes overflow the
  // default 240 MB code cache; flushing then evicts HOT methods and the
  // JIT recompiles them in a storm (measured: cumulative JIT time ramping
  // 17 s → 360 s across one Bench-shaped run, later laps 2-4× slower).
  // One JVM, many plans — size the cache for the suite.
  "-XX:ReservedCodeCacheSize=512m",
)
