ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nnanalyticsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkSession (and the InodeView snapshot cache);
// concurrent suites race on cache invalidation → run sequentially
Test / parallelExecution := false
run / fork := true
// The per-round driver ingests the LAST stdout line of
// `sbt "runMain graft.Bench"` as one JSON object. sbt's default
// LoggedOutput prefixes every forked-process line with "[info] " and
// appends its own "[success] Total time ..." line AFTER the bench's
// JSON, so the bench contract line was never machine-parseable
// (BENCH_r01..r18 all carry parsed:null despite rc 0 and the line
// being visibly complete in each tail). Pass the forked JVM's stdout
// through raw and drop the success banner; the bench binary and its
// timing methodology are untouched.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // a 222-query bench generates thousands of codegen classes; the JDK
  // default 240m code cache fills mid-run and C2 stops compiling — late
  // queries then run interpreted (part of the round-8 3-7x in-run
  // median inflation)
  "-XX:ReservedCodeCacheSize=512m",
)
