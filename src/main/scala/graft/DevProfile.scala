package graft

// Scratch profiling harness (dev aid).
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
    // streaming warmup (same as Bench)
    val synth = spark.range(1000).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L).as("ts"),
      pmod(col("id"), lit(20)).as("user_id"),
      lit("view").as("event_type"),
      (col("id") % 100).cast("double").as("value"),
      lit("{}").as("props"))
    StreamingSessions.replayOutOfOrder(synth, lit("30 seconds"))
      .queryExecution.toRdd.count()
    // fixed streaming-machinery cost: replays over 1k rows with varying
    // micro-batch counts and state providers
    for (round <- 1 to 2; s <- Seq(1, 2, 4))
      time(s"tiny s=$s rocks r$round")(
        StreamingSessions.replayOutOfOrder(synth, lit("30 seconds"),
          slices = s).queryExecution.toRdd.count())
    for (round <- 1 to 2)
      time(s"tiny s=2 hdfs r$round")(
        StreamingSessions.replayOutOfOrder(synth, lit("30 seconds"),
          useRocksDb = false).queryExecution.toRdd.count())
    for (round <- 1 to 2) {
      time(s"t1_replay r$round")(
        StreamingSessions.replayOutOfOrder(ev, lit("30 seconds"))
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
