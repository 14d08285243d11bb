ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducersspark"
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
// The bench/verify harness parses the forked run's stdout as JSON; sbt's
// default LoggedOutput decorates every child line with "[info] ", which
// breaks that parse (BENCH_r05 "parsed": null). StdoutOutput inherits the
// parent's streams verbatim instead.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Pin the initial heap to the max: adaptive heap growth re-sizes the
  // young gen differently run-to-run, and the resulting gc_s swing (r18:
  // 32.5 vs 15.1 s between two same-code med-of-3 runs) is pure bench
  // noise. A fixed-size G1 heap makes collector behavior reproducible.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseG1GC",
  // One JVM runs the 230+-query bench and generates thousands of
  // whole-stage-codegen classes; the JDK default 240m code cache forces
  // sweeping + C2 re-queues late in the run, and a hot generated method
  // stuck behind that queue executes interpreted at 5-10x CPU billed to
  // whichever query is running (see jit_s in BENCH_DETAIL.json).
  "-XX:ReservedCodeCacheSize=512m",
)
