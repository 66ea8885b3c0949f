ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "buildingandoperatingdatapipelinesatscaleusingcicdspark"
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
// Pass the forked JVM's stdout straight through instead of sbt's "[info] "
// log prefix — the driver parses graft.Bench's JSON line from stdout and a
// prefixed line is not valid JSON (BENCH_r01 recorded parsed:null).
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
// Ceiling, not a reservation. The target environment is a 128 GiB
// local[32] JVM; the old 8g default starved the 576-execution bench —
// accumulated session state (codegen classes, broadcasts, listener
// data) squeezed unified memory until the two largest-shuffle queries
// (x187's 20M-row agg, x189's CC) GC-thrashed IN-BENCH only: 8.7-12.3s
// recorded vs 1.6s isolated on a fresh heap, zero steal both ways.
// Default derives from PHYSICAL memory (≈60%, capped at 48g) so a small
// dev machine isn't pushed into swap/OOM by a 48g ceiling it can't back;
// SPARK_DRIVER_MEM overrides for any explicit target.
val defaultDriverMem: String = {
  val physGb: Long =
    try {
      val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
        .find(_.startsWith("MemTotal:")).map(_.replaceAll("[^0-9]", "").toLong)
        .getOrElse(0L)
      kb / 1024 / 1024
    } catch { case _: Throwable => 0L } // no /proc (macOS etc.)
  if (physGb <= 0) "8g" else s"${math.max(2L, math.min(48L, physGb * 3 / 5))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultDriverMem)}",
)
