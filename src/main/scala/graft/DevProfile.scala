package graft

// Scratch profiling harness (dev aid): times the out-of-order replay
// trio at bench scale and decomposes the fixed streaming-machinery cost
// (query start + per-micro-batch planning/commit) from data-dependent
// work. The 500k-vector LSH plane curve lives in DevScale — one owner
// per fixture.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSessions
import graft.operators.Sessions

object DevProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val ev = Tables.events(spark, dir)
    ev.count() // warmup
    val synth = spark.range(1000).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L).as("ts"),
      pmod(col("id"), lit(20)).as("user_id"),
      lit("view").as("event_type"),
      (col("id") % 100).cast("double").as("value"),
      lit("{}").as("props"))
    StreamingSessions.replayOutOfOrder(synth, lit("30 seconds"))
      .queryExecution.toRdd.count() // streaming warmup (same as Bench)
    // fixed cost: a near-empty replay at 1..4 data slices isolates query
    // start (~1.2 s) and per-micro-batch overhead (~0.6 s)
    for (round <- 1 to 2; s <- Seq(1, 2, 4))
      time(s"tiny s=$s r$round")(
        StreamingSessions.replayOutOfOrder(synth, lit("30 seconds"),
          slices = s).queryExecution.toRdd.count())
    for (round <- 1 to 2) {
      time(s"t1_replay r$round")(
        StreamingSessions.replayOutOfOrder(ev, lit("30 seconds"))
          .queryExecution.toRdd.count())
      time(s"t3_replay r$round")(
        StreamingSessions.replayOutOfOrder(ev, Sessions.referenceDynamicGap)
          .queryExecution.toRdd.count())
      time(s"t2_replay r$round")(
        StreamingSessions.replayOutOfOrder(ev, lit("2 hours"),
          streamTransform = s => s.filter(col("session_sum") >= 300.0)
            .select(col("user_id")).dropDuplicates("user_id"),
          useRocksDb = false)
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
