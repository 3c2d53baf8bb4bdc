ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatamigratecloudspark"
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
// Heap scales with the task-slot count (SPARK_GRAFT_CPUS): local[N]
// packs N executor task slots into ONE JVM, so a fixed 8g at N=32 is
// 250 MB/slot — far below any production executor sizing and the root
// of the r19 32-core GC storm (131 s of GC on one query; the same
// binary at 8 cores was flat). 1 GiB/slot (min 8 GiB) keeps per-task
// execution memory CONSTANT across the driver's two core counts, so
// the scaling measurement compares parallelism, not memory starvation.
// SPARK_DRIVER_MEM still overrides explicitly.
val graftHeap: String = sys.env.get("SPARK_DRIVER_MEM").getOrElse {
  val slots = sys.env.get("SPARK_GRAFT_CPUS")
    .flatMap(c => scala.util.Try(c.trim.toInt).toOption).getOrElse(8)
  s"${math.max(8, slots)}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
  // A ~100-query sweep compiles thousands of Janino-generated classes;
  // the JDK default ReservedCodeCacheSize (240 MB) fills mid-sweep, at
  // which point HotSpot silently disables JIT compilation and every
  // later generated join/aggregate runs interpreted (observed as a
  // 10-40x slowdown on the tail of the round-6 bench sweep). Size the
  // code cache for the whole sweep and let cold nmethods be flushed.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
