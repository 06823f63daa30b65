package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-window operators — the core capability of the reference
  * (`flink_stream_task1.py:48-85`, `flink_stream_task2.py:52-110`,
  * `flink_stream_task3.py:51-117`), re-expressed on Spark's builtin
  * `session_window` (analysis rule `SessionWindowing`; physical
  * `MergingSessionsExec`), which supports both static gaps (W1) and
  * per-row dynamic gap expressions (W2) in batch AND Structured Streaming.
  *
  * Semantics (pinned by `SessionsSpec`): an event whose timestamp is exactly
  * `previous_ts + gap` MERGES into the session — Spark's session window
  * treats the gap as a closed interval, the same `gap <= g` merge rule as
  * Flink's session windows. A new session starts only when the inter-event
  * diff is strictly greater than the gap; the emitted `session_end` is
  * `last_event_ts + gap`. The DuckDB oracle uses the same convention
  * (`date_diff(us) > gap` ⇒ new session) — see SURVEY.md §7.5.1.
  *
  * Scale: `groupBy(user_id, session_window(ts, gap))` compiles to a single
  * hash shuffle on `user_id` followed by in-partition sort+merge of session
  * state — the same shape Flink's keyed session windows have, but columnar
  * and whole-stage-codegen'd. No driver-side state; skew on a hot user is
  * the only risk at 100 TB (mitigate upstream with AQE skew handling — the
  * aggregation itself does partial aggregation per partition).
  *
  * Determinism: all `value` arithmetic is carried in integer "cents" —
  * each event's value is rounded to a long of cents BEFORE aggregation
  * (`sum(cast(round(value*100) as bigint))`), so the session sum is pure
  * integer math and summation order (Spark partial/final vs DuckDB
  * sequential) cannot matter (SURVEY.md §7.5.2 rounding parity).
  */
object Sessions {

  /** Reference dynamic-gap policy, verbatim bands from
    * `flink_stream_task3.py:54-62`: user 9999 → 5 min, users 2..9 → 2 min,
    * users 100..200 → 60 s, everyone else → 30 s.
    */
  val referenceDynamicGap: Column =
    when(col("user_id") === 9999, "5 minutes")
      .when(col("user_id").between(2, 9), "2 minutes")
      .when(col("user_id").between(100, 200), "60 seconds")
      .otherwise("30 seconds")

  /** Same band structure rescaled to hours so the driver's events table
    * (median per-user gap ≈ 7.4 h — FIXTURES.md §2) actually exercises
    * window merging, per SURVEY.md §7.5.5.
    */
  val scaledDynamicGap: Column =
    when(col("user_id") === 9999, "12 hours")
      .when(col("user_id").between(2, 9), "8 hours")
      .when(col("user_id").between(100, 200), "4 hours")
      .otherwise("2 hours")

  /** W1/W2 + A1 + A2 + P3 in one relational pipeline: keyed session windows
    * with `sum(value)` / `count(*)` and the derived half-up average
    * (`flink_stream_task1.py:53-75`). `gap` may be a literal duration
    * (`lit("30 seconds")`) or a per-row expression (dynamic gaps).
    */
  def sessionAgg(events: DataFrame, gap: Column): DataFrame =
    sessionAggBy(events, gap, col("ts"))

  /** [[sessionAgg]] over an arbitrary time column. The reference *declares*
    * event-time but *actually* sessionizes over Kafka ingest time (no
    * timestamp assigner — SURVEY.md §1.4); passing a derived ingest-time
    * column here models that variant deterministically.
    */
  def sessionAggBy(events: DataFrame, gap: Column, tsCol: Column): DataFrame =
    events
      .withColumn("ts", tsCol)
      .filter(col("user_id").isNotNull && col("ts").isNotNull) // P2 null filter
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        // per-EVENT integer cents, summed as longs: order-independent
        // integer math, so Spark's partial/final aggregation order and the
        // oracle's sequential sum cannot diverge even at boundary ULPs
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("sum_cents"),
        count(lit(1)).as("event_count"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("event_count"),
        (col("sum_cents") / 100.0).as("session_sum"),
        // avg = round-half-up(sum/count) at cent precision; floor(x+0.5) on
        // identical doubles is engine-independent (SURVEY.md §7.5.2)
        (floor(col("sum_cents") / col("event_count") + 0.5) / 100.0).as("session_avg"))

  /** Task 2 ("big customers", `flink_stream_task2.py:81-90`): sessions whose
    * sum crosses `threshold`, deduplicated to the FIRST qualifying session
    * per user. The reference's keep-first dedup is a mutable global set
    * (correct only at parallelism 1); the deterministic batch form is
    * `row_number()` over (user, session_start) — SURVEY.md §2.3 A3.
    *
    * Scale: the row_number window partitions by `user_id`, reusing the same
    * hash partitioning as the session aggregation — with AQE this is one
    * shuffle, and per-user qualifying-session counts are tiny, so no skew.
    */
  def bigCustomers(sessions: DataFrame, threshold: Double): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("session_start"), col("session_end"))
    sessions
      .filter(col("session_sum") >= threshold) // P4 post-agg predicate
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1) // A3 keep-first dedup, deterministic order
      .drop("rn")
  }
}
