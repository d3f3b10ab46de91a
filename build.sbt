ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "caliperpocdataetlspark"
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
// Stream the forked JVM's stdout through unprefixed: sbt's default logger
// prepends "[info] " to every line, which breaks machine parsing of the
// Bench JSON metric line (BENCH_r03.json "parsed": null).
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
  // 24g default: the bench persists several shared index frames
  // (shingles, signatures, normed vectors) across 88 queries; at 8g the
  // storage region evicts under concurrent query pressure and recompute
  // cascades — the machine has 128 GiB, so headroom is free locally.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // G1's GCLocker default gives an allocation TWO retries while a JNI
  // critical section (lz4/zstd codecs) holds the locker; under 32
  // concurrent shuffle tasks that surfaces as a spurious
  // "Retried waiting for GCLocker too often" heap OOM on a 5-WORD
  // allocation with tens of GB free (killed e18's sf100 solo run).
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=64",
) ++
  // dev-only GC visibility: SPARK_GRAFT_GC_LOG=/path writes a unified
  // GC log from the forked JVM (perf triage; never set by the driver)
  sys.env.get("SPARK_GRAFT_GC_LOG").map(p => s"-Xlog:gc*:file=$p").toSeq
