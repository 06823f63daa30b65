package graft

// Dev decomposition of the timer-session 10M cost (ARCHITECTURE r9 row:
// 71.1 s vs the builtin MergingSessionsExec twin's 9.3 s — what is the
// ~8x actually buying?). Runs the same 10M bounded-disorder replay
// through a ladder of processors that each strip one layer:
//   builtin      — MergingSessionsExec (the production shape, baseline)
//   timer        — the full TimerSessionProcessor (state + timers + merge)
//   state-only   — ListState fold per batch, no timers, no emission
//   noop         — consume rows, touch nothing (typed shuffle + RocksDB
//                  scaffold + micro-batch scheduling only)
// The gap between adjacent rungs prices that rung's layer. Args: [nEvents]
// (default 10M).
import graft.streaming.{OpenSession, SessEvent, SessionOut}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Consumes rows, touches no state: prices the scaffold. */
class NoopSessProcessor
    extends StatefulProcessor[Long, SessEvent, SessionOut] {
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
  override def handleInputRows(userId: Long, rows: Iterator[SessEvent],
                               timerValues: TimerValues): Iterator[SessionOut] = {
    var n = 0L
    rows.foreach(_ => n += 1)
    Iterator.empty
  }
  override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
    Iterator.empty
}

/** The TimerSessionProcessor's state fold WITHOUT timers/emission:
  * prices ListState read-merge-write on top of the scaffold.
  */
class StateOnlySessProcessor
    extends StatefulProcessor[Long, SessEvent, SessionOut] {
  @transient private var open: org.apache.spark.sql.streaming.ListState[OpenSession] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getListState[OpenSession]("open_sessions",
      Encoders.product[OpenSession], TTLConfig.NONE)
  override def handleInputRows(userId: Long, rows: Iterator[SessEvent],
                               timerValues: TimerValues): Iterator[SessionOut] = {
    val sessions = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    if (open.exists()) sessions ++= open.get()
    for (e <- rows)
      sessions += OpenSession(e.ts_us, e.ts_us + e.gap_us, e.cents, e.vals, 1L)
    val sorted = sessions.sortBy(s => (s.start_us, s.end_us))
    val out = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    for (s <- sorted) {
      if (out.nonEmpty && s.start_us <= out.last.end_us) {
        val c = out.last
        out(out.length - 1) = OpenSession(c.start_us,
          math.max(c.end_us, s.end_us), c.sum_cents + s.sum_cents,
          c.n_vals + s.n_vals, c.n + s.n)
      } else out += s
    }
    open.put(out.toArray)
    Iterator.empty
  }
  override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
    Iterator.empty
}

object DevTimerProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val users = 50000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // DevScale's deterministic 10M generator, materialized once
    val startMicros = 1704067200000000L
    val spanMicros = 30L * 86400000000L
    val path = s"/tmp/timer_prof_events_$n"
    if (!new java.io.File(path + "/_SUCCESS").exists())
      spark.range(n).select(
        col("id").as("event_id"),
        timestamp_micros(lit(startMicros) + pmod(xxhash64(col("id")), lit(spanMicros)))
          .as("ts"),
        pmod(xxhash64(col("id") + 7), lit(users)).as("user_id"),
        lit("view").as("event_type"),
        (pmod(xxhash64(col("id") + 13), lit(20000)) / 100.0).as("value"),
        lit("{}").as("props"))
        .write.mode("overwrite").parquet(path)
    val ev = spark.read.parquet(path)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timerprof] $name%-22s ${sec}%8.2f s  rows=$rows  (${n / sec}%,.0f events/s)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def typedStage(proc: StatefulProcessor[Long, SessEvent, SessionOut])
                  (src: DataFrame): DataFrame =
      src.filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withWatermark("ts", "10 minutes")
        .select(col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          lit(1800L * 1000000L).as("gap_us"),
          coalesce(expr("cast(round(value * 100, 0) as bigint)"), lit(0L)).as("cents"),
          when(col("value").isNotNull, 1L).otherwise(0L).as("vals"))
        .as[SessEvent]
        .groupByKey(_.user_id)
        .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
        .toDF()
    // state partitions: the replay harness defaults to 4 (right for the
    // sf0.1 contract replays, where per-batch volume is small and commit
    // cost per partition×batch dominates) — at 10M events on 32 cores
    // the stateful stage itself is the cost, so the audit runs at 32
    // unless overridden (args: [nEvents] [stateParts])
    val stateParts = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    // "hdfs" runs the BUILTIN rung on the in-memory HDFSBacked state
    // store (the transformWithState rungs require RocksDB) — isolates
    // provider cost from operator cost on hosts with slow local disk
    val hdfsBuiltin = args.contains("hdfs")
    println(s"[timerprof] statePartitions=$stateParts events=$n " +
      s"builtinStore=${if (hdfsBuiltin) "hdfs" else "rocksdb"}")
    // warmups at 100k (streaming engine + codegen init)
    val warm = ev.filter(col("event_id") % 100 === 0)
    graft.streaming.StreamingSessions.replayOutOfOrder(warm, lit("30 minutes")).count()
    graft.streaming.TimerSessions.replayTimerSessions(warm, 1800L).count()
    time("builtin_replay")(graft.streaming.StreamingSessions
      .replayOutOfOrder(ev, lit("30 minutes"),
        useRocksDb = !hdfsBuiltin, statePartitions = stateParts).count())
    time("timer_replay")(graft.streaming.StreamingSessions
      .replayStageOutOfOrder(ev,
        src => graft.streaming.TimerSessions
          .timerSessionStream(src, 1800L, "10 minutes"),
        statePartitions = stateParts).count())
    time("state_only_replay")(graft.streaming.StreamingSessions
      .replayStageOutOfOrder(ev, typedStage(new StateOnlySessProcessor),
        statePartitions = stateParts).count())
    time("noop_replay")(graft.streaming.StreamingSessions
      .replayStageOutOfOrder(ev, typedStage(new NoopSessProcessor),
        statePartitions = stateParts).count())
    spark.stop()
  }
}
