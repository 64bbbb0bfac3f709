ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pypelinespark"
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
// Driver bench contract: the LAST stdout line of `sbt "runMain
// graft.Bench"` must be the bare compact-JSON line — no sbt logger
// decoration. Two pieces:
//  1. StdoutOutput inherits the forked JVM's stdout/stderr directly,
//     so Bench's println lands unprefixed (no `[info] ` wrapper);
//  2. showSuccess := false drops the `[success] Total time: ...`
//     trailer sbt would otherwise print AFTER the JSON line.
// BENCH_r{9,10,11}.json all had parsed:null from exactly these two
// decorations (see VERDICT r11 "What's wrong" #1).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task, so the
// unused-key lint flags it; exclude it to keep stdout free of warnings.
Global / excludeLintKeys += showSuccess
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
  // pin the committed heap: G1 uncommits after full GCs (the bench
  // settles with System.gc() between queries), and re-faulting
  // gigabytes of heap from 32 executor threads serializes in the
  // kernel — measured as minutes-long 99%-sys-time stalls that made
  // random bench passes 8-15x slower; a fixed heap never uncommits
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
