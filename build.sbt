ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "osmpgetlspark"
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
// The round driver parses the bench's final stdout JSON line. sbt's
// default LoggedOutput prefixes every forked-JVM line with "[info] ",
// which made that line unparseable two rounds running (PERF_r20/r21
// "parsed": null — VERDICT r21 item 1). StdoutOutput passes the forked
// process's stdout through verbatim.
run / outputStrategy := Some(StdoutOutput)
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
  // Pin the heap: G1 grow/uncommit cycles on a moving heap showed up
  // as kernel time 3x user time (mmap/fault/zero churn) and bimodal
  // 5x stage-CPU swings on big runs; -Xms = -Xmx stops the churn and
  // madvise'd transparent huge pages cut fault count 512x.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseTransparentHugePages",
  // Whole-stage-codegen emits methods beyond HotSpot's 8000-bytecode
  // JIT ceiling; with the default DontCompileHugeMethods the JVM runs
  // those stages INTERPRETED — measured 6x CPU (1070 -> 6700 s) on the
  // simhash signature map stage, kicking in semi-randomly as C2 warms.
  // Standard Spark-perf setting; spark-submit clusters set it too.
  "-XX:-DontCompileHugeMethods",
  // A 200-query sweep generates thousands of whole-stage-codegen
  // classes; at the default 240 MB reserved code cache the JVM starts
  // silently FLUSHING compiled methods (UseCodeCacheFlushing) and
  // re-runs evicted hot loops interpreted/deoptimized — observed as
  // random 8x blowups of CPU-heavy queries mid-sweep (q_d_embedding_
  // pairs 3.5 -> 27 s in one sweep, 2.6 s standalone, different
  // victims each sweep). 1 GB keeps every compiled stage resident.
  "-XX:ReservedCodeCacheSize=1g",
)
