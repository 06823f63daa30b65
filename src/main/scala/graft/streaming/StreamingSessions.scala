package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for the stateful alert operator. */
case class AlertInput(user_id: Long, session_sum: Double)

/** Emitted alert (at most one per user, ever). */
case class Alert(user_id: Long, first_qualifying_sum: Double, n_suppressed: Long)

/** Structured Streaming twins of the batch session operators — the
  * reference's actual deployment shape (Kafka → keyed session windows →
  * continuous sink; `flink_stream_task1.py:44-85`).
  *
  * The SAME aggregation plan as [[graft.operators.Sessions.sessionAgg]]
  * wrapped in a watermarked stream: Spark's `session_window` is
  * streaming-native (state store backed, `MergingSessionsExec`), so batch
  * and streaming results coincide — asserted in `StreamingSpec` by running
  * one frame through a memory-source stream and comparing to batch.
  *
  * Watermark: the reference uses monotonous timestamps = zero allowed
  * lateness (`flink_stream_task1.py:41`, SURVEY.md §1.4); `delay`
  * parameterizes `forBoundedOutOfOrderness` semantics for out-of-order
  * feeds. No Kafka jar ships in this env (SURVEY.md §7.5.6), so sources
  * are file/memory/rate — the operators only require a streaming
  * DataFrame with (ts, user_id, value).
  */
object StreamingSessions {

  /** W1/W2 + A2 + P3 streaming twin. `outputMode` must be Append (emit on
    * window close, the Flink behavior) or Complete downstream.
    */
  def sessionAggStream(events: DataFrame, gap: Column,
                       delay: String = "0 seconds"): DataFrame =
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        // same per-event integer-cents convention as the batch twin
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("sum_cents"),
        count(lit(1)).as("event_count"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("event_count"),
        (col("sum_cents") / 100.0).as("session_sum"),
        (floor(col("sum_cents") / col("event_count") + 0.5) / 100.0).as("session_avg"))

  /** A3 streaming twin (task 2's "alert once per user",
    * `flink_stream_task2.py:72,85-90`): threshold filter then streaming
    * `dropDuplicates` on user_id. State note (SURVEY.md §7.5.7): without a
    * watermark column in the dedup key the keep-first state is unbounded —
    * correct "once ever per user" semantics cost O(distinct users) state,
    * the same trade the reference's global set makes.
    */
  def bigCustomerAlertStream(sessionized: DataFrame, threshold: Double): DataFrame =
    sessionized
      .filter(col("session_sum") >= threshold)
      .dropDuplicates("user_id")

  /** The same "once ever per user" semantics via explicit keyed state
    * (`flatMapGroupsWithState`) — the engine-state form of the reference's
    * global `printed_users` set (`flink_stream_task2.py:72,85-90`), which
    * is only correct at parallelism 1; here the state is partitioned by
    * key, fault-tolerant (state store), and additionally counts suppressed
    * repeat alerts, which plain `dropDuplicates` cannot express.
    *
    * State is one boolean+counter per alerted user — O(distinct alerted
    * users), the same bound the reference's in-memory set has.
    */
  def alertOnceStateful(sessions: Dataset[AlertInput], threshold: Double): Dataset[Alert] = {
    import sessions.sparkSession.implicits._
    def fn(userId: Long, rows: Iterator[AlertInput],
           state: GroupState[(Double, Long)]): Iterator[Alert] = {
      val qualifying = rows.filter(_.session_sum >= threshold).toSeq
      if (qualifying.isEmpty) Iterator.empty
      else if (state.exists) {
        val (first, suppressed) = state.get
        state.update((first, suppressed + qualifying.size))
        Iterator.empty // already alerted — suppress, keep counting
      } else {
        state.update((qualifying.head.session_sum, qualifying.size - 1L))
        Iterator.single(Alert(userId, qualifying.head.session_sum, qualifying.size - 1L))
      }
    }
    sessions.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
