ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "confluentexamplefirehosespark"
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
// Default heap derives from the machine so `sbt test`/`run` work out of the
// box under container memory limits: the 128 GiB bench box gets the 48g a
// local[32] run with materialized dedup relations wants (a tight heap turns
// storage pressure into eviction + recompute — a 51 s bench outlier), while
// smaller dev machines fall back to 8g. SPARK_DRIVER_MEM overrides either.
val defaultHeapGb: String = {
  def readLong(path: String): Option[Long] =
    try {
      val src = scala.io.Source.fromFile(path)
      try {
        val it = src.getLines()
        (if (it.hasNext) Some(it.next().trim) else None)
          .filter(l => l.nonEmpty && l.forall(_.isDigit)).map(_.toLong)
      } finally src.close()
    } catch { case _: Throwable => None }
  val memTotalGb: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().collectFirst {
        case l if l.startsWith("MemTotal:") =>
          l.split("\\s+")(1).toLong / (1024L * 1024L)
      }.getOrElse(0L)
      finally src.close()
    } catch { case _: Throwable => 0L }
  // inside a cgroup-limited container /proc/meminfo reports HOST memory —
  // the effective bound is the cgroup limit (v2 memory.max, v1
  // memory.limit_in_bytes; absent or "max" means unlimited)
  val cgroupGb: Long = (readLong("/sys/fs/cgroup/memory.max") orElse
    readLong("/sys/fs/cgroup/memory/memory.limit_in_bytes"))
    .map(_ / (1024L * 1024L * 1024L))
    .filter(g => g > 0 && g < 4096) // v1 reports ~unlimited as a huge number
    .getOrElse(Long.MaxValue)
  if (math.min(memTotalGb, cgroupGb) >= 96) "48g" else "8g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeapGb)}",
)
// forked `run` output goes straight to this process's stdout instead of
// through sbt's logger: the bench JSON line must be parseable without an
// "[info] " prefix
outputStrategy := Some(OutputStrategy.StdoutOutput)
