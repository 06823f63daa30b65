package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One event inside the timer-session state machine: microsecond event
  * time, this event's OWN session gap (dynamic-gap support, the
  * reference's W2 — each event proposes the window `[ts, ts+gap)`), plus
  * the per-event integer-cents convention shared with
  * [[graft.operators.Sessions.sessionAgg]] (`vals` = 0 marks a NULL
  * `value`, which must COUNT toward the session but contribute no sum —
  * and an all-null session must surface a null sum, exactly like the
  * batch `sum`).
  */
case class SessEvent(user_id: Long, ts_us: Long, gap_us: Long,
                     cents: Long, vals: Long)

/** An open (not yet watermark-closed) session in keyed state;
  * `end_us = max(ts + gap)` over merged events, the builtin
  * `session_window` merge frontier.
  */
case class OpenSession(start_us: Long, end_us: Long,
                       sum_cents: Long, n_vals: Long, n: Long)

/** A closed session as emitted by the processor (micros; the public
  * wrapper derives timestamps/sum/avg in the engine's shared convention).
  */
case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                      event_count: Long, sum_cents: Long, n_vals: Long)

/** The session window rebuilt from first principles on Spark 4's
  * `transformWithState` EVENT-TIME TIMERS — the state pattern the rest of
  * the streaming ladder doesn't exercise (builtin `session_window` state,
  * `dropDuplicates`, `flatMapGroupsWithState`, and the timer-free
  * `StatefulProcessor` alert all react to INPUT; this operator must also
  * act on the ABSENCE of input, which is precisely what a gap-timeout
  * session is). Mechanics per key:
  *
  *  - `handleInputRows` folds the batch's events into a `ListState` of
  *    open sessions as singleton windows `[ts, ts + gap)`, then merges:
  *    sorted by start, two sessions coalesce when `next.start ≤ cur.end`
  *    (inclusive — an event exactly at the frontier extends the session,
  *    matching both the builtin and the strictly-greater
  *    gap-and-islands oracle rule), in integer micros so no float edge
  *    exists. Out-of-order and session-bridging late events (the case
  *    that makes incremental sessionization hard) fall out of the merge
  *    for free; per-event gaps make the SAME fold the dynamic-gap
  *    operator (W2) — nothing in the state machine is band-specific.
  *  - One timer per key at the EARLIEST open `end`, `ceil_ms(end)`
  *    (ceiling so a fired timer's watermark genuinely covers the
  *    micros-precision expiry; the watermark API is milliseconds).
  *    Re-registered on every input batch — timers, unlike
  *    `GroupStateTimeout`, survive arbitrarily many quiet batches.
  *  - `handleExpiredTimer` closes every session the watermark has passed
  *    (`end ≤ wm`), emits it, keeps the rest, and re-arms the timer for
  *    the new earliest expiry. Sessions the final watermark never passes
  *    stay open and unemitted — append-mode semantics, identical to the
  *    builtin.
  *
  * State per key is O(open sessions), which bounded disorder keeps at
  * O(1) in practice (a session older than the watermark delay can no
  * longer grow and is closed by its timer). `StreamingSpec` pins the
  * replayed result row-for-row against the batch gap-and-islands oracle
  * through the same out-of-order harness the builtin twin runs
  * (`t1_sessions_timer` static, `t3_dynamic_timer` banded gaps).
  */
class TimerSessionProcessor
    extends StatefulProcessor[Long, SessEvent, SessionOut] {
  @transient private var open: ListState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getListState[OpenSession]("open_sessions",
      Encoders.product[OpenSession], TTLConfig.NONE)

  private def expiryMs(s: OpenSession): Long =
    (s.end_us + 999L) / 1000L // ceil: wm(ms) ≥ this ⟹ wm covers micros expiry

  /** Re-register the key's single timer at the earliest open expiry.
    * `skipMs` is the timer that JUST FIRED when called from
    * `handleExpiredTimer`: the framework deletes it itself after the
    * handler returns, so deleting it here double-deletes — a wasted
    * state-store call plus a WARN ("Failed to delete timer … does not
    * exist") PER CLOSED SESSION, 8.7M of each at the 10M replay. Skipping
    * it is safe: every surviving session ends strictly after the
    * watermark, so its ceil-ms expiry is strictly greater than the fired
    * timer's (≤ wm) and the new registration never collides with the
    * framework's pending delete.
    */
  private def rearm(sessions: Seq[OpenSession],
                    skipMs: Long = Long.MinValue): Unit = {
    getHandle.listTimers().foreach(t =>
      if (t != skipMs) getHandle.deleteTimer(t))
    if (sessions.nonEmpty) getHandle.registerTimer(sessions.map(expiryMs).min)
  }

  private def merged(sessions: ArrayBuffer[OpenSession]): ArrayBuffer[OpenSession] = {
    val sorted = sessions.sortBy(s => (s.start_us, s.end_us))
    val out = ArrayBuffer.empty[OpenSession]
    for (s <- sorted) {
      if (out.nonEmpty && s.start_us <= out.last.end_us) {
        val c = out.last
        out(out.length - 1) = OpenSession(c.start_us,
          math.max(c.end_us, s.end_us), c.sum_cents + s.sum_cents,
          c.n_vals + s.n_vals, c.n + s.n)
      } else out += s
    }
    out
  }

  override def handleInputRows(userId: Long, rows: Iterator[SessEvent],
                               timerValues: TimerValues): Iterator[SessionOut] = {
    val sessions = ArrayBuffer.empty[OpenSession]
    if (open.exists()) sessions ++= open.get()
    for (e <- rows)
      sessions += OpenSession(e.ts_us, e.ts_us + e.gap_us, e.cents, e.vals, 1L)
    val next = merged(sessions)
    open.put(next.toArray)
    rearm(next.toSeq)
    Iterator.empty
  }

  override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val sessions = if (open.exists()) open.get().toSeq else Seq.empty
    val (ripe, rest) = sessions.partition(_.end_us <= wmUs)
    if (rest.isEmpty) open.clear() else open.put(rest.toArray)
    rearm(rest, skipMs = expiredTimerInfo.getExpiryTimeInMs())
    ripe.sortBy(_.start_us).iterator.map(s =>
      SessionOut(userId, s.start_us, s.end_us, s.n, s.sum_cents, s.n_vals))
  }
}

/** Public wrapper around [[TimerSessionProcessor]]: watermarked event
  * stream in, closed sessions out, with the engine-wide output contract
  * (micros timestamps, integer-cents sum, half-up cent avg, null sum for
  * all-null-value sessions) — byte-identical schema to
  * [[StreamingSessions.sessionAggStream]], so every session oracle
  * applies unchanged.
  */
object TimerSessions {

  /** The reference's W2 gap bands (`flink_stream_task3.py:54-62`) as a
    * SECONDS column — the numeric twin of
    * [[graft.operators.Sessions.referenceDynamicGap]]'s duration strings,
    * which the timer processor's integer micros need.
    */
  val referenceDynamicGapSec: Column =
    when(col("user_id") === 9999, 300L)
      .when(col("user_id").between(2, 9), 120L)
      .when(col("user_id").between(100, 200), 60L)
      .otherwise(30L)

  /** Timer-built sessions with a per-event gap column (seconds). */
  def timerSessionStream(events: DataFrame, gapSecCol: Column,
                         delay: String = "0 seconds"): DataFrame = {
    import events.sparkSession.implicits._
    val typed = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", delay)
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        (gapSecCol.cast("long") * 1000000L).as("gap_us"),
        coalesce(expr("cast(round(value * 100, 0) as bigint)"), lit(0L)).as("cents"),
        when(col("value").isNotNull, 1L).otherwise(0L).as("vals"))
      .as[SessEvent]
    typed.groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
      .select(col("user_id"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("event_count"),
        // all-null-value session: batch sum() is null, so ours must be
        (when(col("n_vals") > 0, col("sum_cents") / 100.0)).as("session_sum"),
        (when(col("n_vals") > 0,
          floor(col("sum_cents") / col("event_count") + 0.5) / 100.0))
          .as("session_avg"))
  }

  /** Static-gap convenience (W1). */
  def timerSessionStream(events: DataFrame, gapSec: Long,
                         delay: String): DataFrame =
    timerSessionStream(events, lit(gapSec), delay)

  /** [[StreamingSessions.replayOutOfOrder]]'s contract over the
    * timer-built session operator: bounded-disorder replay of the fixture
    * must reproduce the batch gap-and-islands result exactly. RocksDB
    * stays on — `transformWithState` requires it.
    */
  def replayTimerSessions(events: DataFrame, gapSec: Long,
                          delay: String = "10 minutes"): DataFrame =
    StreamingSessions.replayStageOutOfOrder(events,
      src => timerSessionStream(src, gapSec, delay))

  /** The dynamic-gap (W2) replay: reference bands, same contract. */
  def replayTimerSessionsDynamic(events: DataFrame,
                                 delay: String = "10 minutes"): DataFrame =
    StreamingSessions.replayStageOutOfOrder(events,
      src => timerSessionStream(src, referenceDynamicGapSec, delay))
}

/** One buffered funnel-step observation. */
case class StepAt(idx: Int, ts_us: Long)

/** A user's FINAL funnel depth (batch `windowFunnel` semantics). */
case class FunnelFinal(user_id: Long, funnel_step: Long)

/** The ORDERED window funnel as a streaming operator — the strict
  * variant [[FunnelCoverageProcessor]]'s unordered coverage deliberately
  * isn't: each next step must land in `(t_prev, t_prev + W]`, chained
  * greedily from the user's EARLIEST first-step event, exactly
  * [[graft.operators.Relational.windowFunnel]]. Late data makes this
  * genuinely hard: a late earlier first-step event REWRITES the whole
  * chain (t1 drops, every t_i can move), so nothing can be emitted
  * eagerly. The processor buffers the user's funnel-step events in
  * `ListState` and proves finality from the watermark instead:
  *
  *  - every chain time satisfies `t_j < wm` once seen, and a future
  *    event has `ts ≥ wm`, so stage j is settled once
  *    `wm > t_(j−1) + W` (no admissible event can still arrive in its
  *    selection interval);
  *  - `wm > t_reached + W` therefore settles EVERY stage at once (the
  *    deadlines are increasing), and is also exactly the moment the
  *    chain can no longer extend — one event-time timer at
  *    `t_reached + W`, re-armed as the chain advances, yields one final
  *    `(user, depth)` emission per user, provably equal to the batch
  *    result on the sealed stream.
  *
  * State is the user's funnel-step events until finality — bounded by
  * the watermark delay + W horizon in steady state (a user's buffer
  * seals one window after their chain stalls); the spec and the
  * `q_funnel_ordered_stream` oracle pin replay ≡ batch on the fixture.
  */
class TimerFunnelProcessor(nSteps: Int, windowUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, StepAt, FunnelFinal] {
  require(nSteps > 0 && windowUs > 0, "funnel needs steps and a window")
  @transient private var buf: org.apache.spark.sql.streaming.ListState[StepAt] = _
  @transient private var done: org.apache.spark.sql.streaming.ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[StepAt]("funnel_events",
      org.apache.spark.sql.Encoders.product[StepAt], TTLConfig.NONE)
    done = getHandle.getValueState[Boolean]("funnel_done",
      org.apache.spark.sql.Encoders.scalaBoolean, TTLConfig.NONE)
  }

  /** Greedy chain over the buffer: (stages reached, time of last reached
    * stage); (0, _) when no first-step event exists yet.
    */
  private def chain(evts: Seq[StepAt]): (Int, Long) = {
    val byStep = evts.groupBy(_.idx)
    byStep.get(0).map(_.iterator.map(_.ts_us).min) match {
      case None => (0, 0L)
      case Some(t1) =>
        var t = t1; var reached = 1; var stalled = false
        while (!stalled && reached < nSteps) {
          val candidates = byStep.getOrElse(reached, Nil).iterator
            .map(_.ts_us).filter(x => x > t && x <= t + windowUs)
          if (candidates.isEmpty) stalled = true
          else { t = candidates.min; reached += 1 }
        }
        (reached, t)
    }
  }

  /** Single-timer re-arm; `skipMs` = the just-fired timer when called
    * from `handleExpiredTimer` (the framework deletes that one itself —
    * see [[TimerSessionProcessor.rearm]]). A re-arm only happens there
    * when the chain still extends past the watermark, so the new
    * deadline is strictly later than the fired timer.
    */
  private def rearm(deadlineUs: Long, skipMs: Long = Long.MinValue): Unit = {
    getHandle.listTimers().foreach(t =>
      if (t != skipMs) getHandle.deleteTimer(t))
    getHandle.registerTimer((deadlineUs + 999L) / 1000L)
  }

  override def handleInputRows(userId: Long, rows: Iterator[StepAt],
                               timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[FunnelFinal] = {
    if (done.exists()) return Iterator.empty // final answer already out
    rows.foreach(buf.appendValue)
    val (reached, tReached) = chain(buf.get().toSeq)
    if (reached > 0) rearm(tReached + windowUs)
    Iterator.empty
  }

  override def handleExpiredTimer(userId: Long,
                                  timerValues: org.apache.spark.sql.streaming.TimerValues,
                                  expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[FunnelFinal] = {
    if (done.exists()) return Iterator.empty
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val (reached, tReached) = chain(buf.get().toSeq)
    if (reached > 0 && tReached + windowUs <= wmUs) {
      done.update(true); buf.clear()
      Iterator.single(FunnelFinal(userId, reached.toLong))
    } else {
      if (reached > 0) // chain advanced since arming
        rearm(tReached + windowUs,
          skipMs = expiredTimerInfo.getExpiryTimeInMs())
      Iterator.empty
    }
  }
}

/** Companion wrapper for [[TimerFunnelProcessor]]. */
object TimerFunnel {

  /** Per-user final funnel depths over a watermarked event stream. */
  def orderedFunnelStream(events: DataFrame, steps: Seq[String],
                          stepWithinSec: Long, delay: String): DataFrame = {
    import events.sparkSession.implicits._
    val idx = steps.zipWithIndex.toMap
    val stepIdx = idx.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col("event_type") === s, lit(i)).otherwise(acc)
    }
    // NO post-watermark filter on idx: a ts-free predicate is pushed
    // below the EventTimeWatermark node and would drop the replay
    // harness's flush sentinel BEFORE watermark tracking (the stall trap
    // replayStageOutOfOrder documents). Off-funnel rows ride through and
    // are ignored inside the processor instead.
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", delay)
      .withColumn("idx", stepIdx)
      .select(col("user_id").cast("long").as("user_id"),
        col("idx"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Int, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new KeyedFunnelAdapter(steps.size, stepWithinSec * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }

  /** Bounded-disorder replay → the batch funnel HISTOGRAM (the
    * `windowFunnel` output shape, so the existing SQL oracle applies).
    */
  def replayOrderedFunnel(events: DataFrame,
                          steps: Seq[String] = Seq("view", "click", "purchase"),
                          stepWithinSec: Long = 1800,
                          delay: String = "10 minutes"): DataFrame =
    StreamingSessions.replayStageOutOfOrder(events,
      src => orderedFunnelStream(src, steps, stepWithinSec, delay))
      .groupBy(col("funnel_step")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("funnel_step"))
}

/** Tuple-input adapter so the stream stays a plain 3-column projection
  * (no per-row case-class allocation upstream of the state machine).
  */
class KeyedFunnelAdapter(nSteps: Int, windowUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Int, Long), FunnelFinal] {
  private val inner = new TimerFunnelProcessor(nSteps, windowUs)
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    inner.setHandle(getHandle); inner.init(outputMode, timeMode)
  }
  override def handleInputRows(userId: Long, rows: Iterator[(Long, Int, Long)],
                               timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[FunnelFinal] =
    inner.handleInputRows(userId,
      rows.filter(_._2 >= 0).map(r => StepAt(r._2, r._3)), timerValues)
  override def handleExpiredTimer(userId: Long,
                                  timerValues: org.apache.spark.sql.streaming.TimerValues,
                                  expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[FunnelFinal] =
    inner.handleExpiredTimer(userId, timerValues, expiredTimerInfo)
}
