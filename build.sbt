ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "windowsessionusingkafkaflinkdockerspark"
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
// Pass the forked program's stdout/stderr through UNPREFIXED: sbt's default
// LoggedOutput wraps every program line in "[info] ", which turns Bench's
// machine-readable JSON line into "[info] {...}" and defeats any
// line-is-JSON parse of the captured output (BENCH_r12.json: parsed=null).
// StdoutOutput makes the final bench line bare JSON on stdout.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
// Quarter of physical RAM, clamped to [4g, 32g] — see the -Xmx note below.
val defaultHeap: String = {
  val memTotalGb =
    try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.split("\\s+")(1).toLong / (1024 * 1024) }
        .getOrElse(128L)
    } catch { case scala.util.control.NonFatal(_) => 128L }
  // ceil-divide: /proc/meminfo reports slightly under the nominal size
  // (125 "GiB" on the 128 GiB bench box), and the bench-calibrated value
  // is exactly 32g — rounding down would silently shrink the measured
  // configuration
  s"${math.max(4L, math.min(32L, (memTotalGb + 3) / 4))}g"
}
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
  // Local-mode JVM = driver + all 32 executor task slots in one heap.
  // 8g starved it: spark.memory.fraction 0.6 × 8g / 32 concurrent tasks
  // ≈ 150 MB of execution memory per task — the r14 baseline measured
  // entries up to 20× slower in-suite than isolated (text_decontaminate
  // 7.46 s in-suite vs 0.43 s isolated) purely from GC pressure and
  // spill, and a full-suite A/B (dev/bench_history/{r14_before,
  // probe_mem32}.json) read 348.0 s → 307.1 s from the heap bump alone.
  // 32g on this 128 GiB box ≈ 600 MB execution memory per task slot —
  // the local analogue of a sanely sized executor; on a real cluster
  // this knob is spark.executor.memory and the env override below still
  // applies. The default derives from physical RAM (a quarter, clamped
  // to [4g, 32g]) so a smaller dev machine doesn't swap or OOM-kill the
  // suite; the bench box lands on the measured 32g either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
) ++
  // extra forked-JVM flags for dev measurement runs (e.g. GC probes:
  // SPARK_GRAFT_JVM_OPTS="-XX:+AlwaysPreTouch -XX:G1HeapRegionSize=32m")
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
