ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkalchemyspark"
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
// The driver parses Bench's single JSON stdout line; sbt's default logger
// prefixes forked output with "[info] ", which breaks that parse. Route the
// forked process's stdout straight through instead.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and sbt's "[success] Total time: ..." line prints AFTER the forked
// main's output, so Bench's JSON was never the last stdout line (r12
// verdict: driver `parsed` null). Suppress it; exit codes carry success.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not another task —
// silence the unused-key lint for it.
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
  // 16g: the 137-query suite runs three timed passes in one JVM; at 8g the
  // late passes were GC-bound (in-suite rows 3-4x their solo cost with no
  // plan difference). 512m code cache: ~137 queries x several generated
  // classes each no longer fit the 240m default once the codegen cache
  // retains them.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:ReservedCodeCacheSize=512m",
)
