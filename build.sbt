ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nypdarrestetlspark"
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
// Pass the forked JVM's stdout through verbatim: the bench/verify drivers
// parse machine-readable JSON lines from stdout, and sbt's default logger
// strategy would prefix every line with "[info] ", breaking json.loads.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The bench driver keeps only the LAST ~2000 chars of stdout and parses a
// JSON line out of it. sbt's "[success] Total time: ..." epilogue would be
// the final line and the long per-query JSON would be head-truncated out of
// that window — suppress the epilogue so Bench's own compact summary line
// (printed last) is the tail.
Global / showSuccess := false
Global / showTiming := false
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // G1 GCLocker starvation mitigation (JDK-8192647): 32 executor threads
  // in JNI critical sections (lz4/zstd shuffle codecs) can starve a
  // tiny allocation into a spurious OOM ("Retried waiting for GCLocker
  // too often allocating 4 words") on constrained heaps — raise the
  // retry budget from its default 2
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=128",
)
