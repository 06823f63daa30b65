package graft

// Scratch scale harness (dev aid): drives the session engine over a
// synthetic 10M-row event stream on local[32] to measure throughput and
// confirm the plan survives a 100×-rows scale-up of the bench table.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Sessions

object DevScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val users = 50000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic synthetic stream: n events, `users` tenants, uniform
    // over 30 days (inter-event gap/user ≈ 13 min at 10M/50k)
    val startMicros = 1704067200000000L // 2024-01-01 UTC
    val spanMicros = 30L * 86400000000L
    val events = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(startMicros) + pmod(xxhash64(col("id")), lit(spanMicros)))
        .as("ts"),
      pmod(xxhash64(col("id") + 7), lit(users)).as("user_id"),
      (pmod(xxhash64(col("id") + 13), lit(20000)) / 100.0).as("value"))
    events.write.mode("overwrite").parquet("/tmp/scale_events")
    val ev = spark.read.parquet("/tmp/scale_events")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-24s ${sec}%8.2f s  rows=$rows  (${n / sec}%,.0f events/s)")
    }
    time("sessions_30min")(Sessions.sessionAgg(ev, lit("30 minutes")).count())
    time("sessions_dynamic")(Sessions.sessionAgg(ev, Sessions.scaledDynamicGap).count())
    time("big_customers")(Sessions.bigCustomers(
      Sessions.sessionAgg(ev, lit("30 minutes")), 400.0).count())
    time("daily_activity")(graft.operators.Relational.dailyActivity(ev).count())
    spark.stop()
  }
}
