package graft

import org.apache.spark.sql.SparkSession

/** Shared session + timer for the dev profiling mains (BpeProfile,
  * DevProfileIngest, TimeQ) — ONE copy of the harness session recipe so
  * a conf change (UTC zone, shuffle partitions, …) cannot silently skip
  * a profiler and produce timings that diverge from the Bench/Verify
  * sessions they claim to explain. Not library code.
  */
object Dev {
  def session(): SparkSession = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[t] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
}
