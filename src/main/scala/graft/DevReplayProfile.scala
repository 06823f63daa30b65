package graft

// Dev measurement harness (numbers land in ARCHITECTURE.md): decomposes
// the fixed cost of the out-of-order replay harness at sf0.1 — prep
// (slice write) vs streaming run, and the marginal cost of micro-batches,
// state partitions and the state-store provider — to find which knob the
// 15 replay-harness bench entries actually pay for.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevReplayProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = Tables.events(spark, sfDir).localCheckpoint()
    println(s"events rows = ${events.count()}")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[replayprof] $label%-48s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val gap = lit("30 minutes")
    // warm-up (codegen + state machinery JIT)
    graft.streaming.StreamingSessions.replayOutOfOrder(
      Tables.events(spark, "/root/testdata/sf0.001"), gap).count()
    (1 to 2).foreach { round =>
      time(s"baseline rocks sp=4 slices=2 (r$round)") {
        graft.streaming.StreamingSessions.replayOutOfOrder(events, gap).count()
      }
    }
    time("statePartitions=1") {
      graft.streaming.StreamingSessions.replayOutOfOrder(events, gap,
        statePartitions = 1).count()
    }
    time("statePartitions=8") {
      graft.streaming.StreamingSessions.replayOutOfOrder(events, gap,
        statePartitions = 8).count()
    }
    time("hdfs provider sp=4") {
      graft.streaming.StreamingSessions.replayOutOfOrder(events, gap,
        useRocksDb = false).count()
    }
    time("slices=4 (2 extra batches)") {
      graft.streaming.StreamingSessions.replayOutOfOrder(events, gap,
        slices = 4).count()
    }
    time("slices=8 (6 extra batches)") {
      graft.streaming.StreamingSessions.replayOutOfOrder(events, gap,
        slices = 8).count()
    }
    spark.stop()
  }
}
