ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "job_market_researchspark"
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
// extra JVM flags (e.g. a different GC) without editing the build:
// SPARK_GRAFT_JAVA_OPTS="-XX:+UseG1GC" sbt ...
val extraJvmOpts = sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
// Throughput GC by default: a local[N] Spark driver is a pure batch
// workload (no latency SLO), and JDK 17's default G1 spends measurably
// more on concurrent cycles + region bookkeeping than Parallel's
// stop-the-world scavenges here — interleaved A/B benches at sf0.1
// measured 34.3-34.9 s (G1) vs 28.2-32.0 s (Parallel) suite total, with
// per-query task GC time falling up to 10x (dedup_winnowing 4.8 s ->
// 0.3 s cumulative). Skipped when the caller picks a GC explicitly
// (two -XX:+Use*GC flags would refuse to start).
val gcDefault =
  if (extraJvmOpts.exists(o => o.startsWith("-XX:+Use") && o.endsWith("GC")))
    Seq.empty[String]
  else Seq("-XX:+UseParallelGC")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ gcDefault ++ extraJvmOpts
