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
  * the only risk at 100 TB, and it is REAL — AQE cannot split a
  * session-window aggregate (the within-key merge is order-dependent), so
  * a 90%-hot key funnels through one reducer. Measured at 10M events /
  * 90% on one user (`DevSkewSessions`, r13): plain fold 28.2 s vs
  * [[saltedSessionAgg]]'s two-phase slice fold 4.9 s (5.8×, bit-identical
  * output; the timer machine, also one task per key, 43.6 s). Route hot
  * corpora — [[graft.operators.Sketches.skewProfile]]'s `needs_salting`
  * trigger — through [[saltedSessionAgg]].
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

  /** Skew-defended session aggregation — the session-window member of the
    * salting playbook ([[Relational.saltedUserTotals]] /
    * [[Relational.saltedEnrichJoin]]), result-identical to
    * [[sessionAgg]] with a STATIC `gapSeconds` gap. Plain
    * `groupBy(user_id, session_window)` funnels a hot key's entire event
    * stream through one reducer (`generator1.py:51`'s phase-4 shape: 90%+
    * of events on one user), and AQE cannot split a session-window
    * aggregate — the merge is order-dependent within the key.
    *
    * Two-phase fold:
    *  1. PRE-FOLD — sessionize within `(user_id, time-slice)` groups,
    *     where the slice is `floor(event epoch / sliceSeconds)`. The
    *     shuffle key gains the slice, so a hot user's events spread over
    *     `span / sliceSeconds` reducers; within a slice the builtin
    *     `session_window` semantics apply unchanged. Emits PARTIAL
    *     sessions (start, end = last_ts + gap, sum_cents, n).
    *  2. MERGE — gap-and-islands over partial sessions per user: a new
    *     island starts where `session_start > max(prior session_end)`
    *     (running max, so a session bridging several empty slices still
    *     chains), exactly the closed-interval `diff ≤ gap` rule — a
    *     partial ending at `t1 + gap` absorbs a neighbor starting at
    *     `t2 ⟺ t2 ≤ t1 + gap`. Island aggregation re-adds the integer
    *     cents, so the result is bit-identical to the one-shot fold.
    *
    * Scale: the merge's per-user window ranges over PARTIAL SESSIONS, not
    * events — at most `span/sliceSeconds + true sessions` rows per user —
    * so the hot key's straggler shrinks by the events-per-slice factor
    * (measured at 10M/90%-hot: see ARCHITECTURE r13). `sliceSeconds`
    * trades pre-fold spread against merge-frame length; anything ≫ gap
    * and ≪ hot-key span works, default 1 h against the 30 s reference gap.
    *
    * Per-USER gaps are supported through [[saltedDynamicSessionAgg]]; a
    * gap that varied WITHIN a user would make a partial session's end
    * depend on its last event's gap — still well-defined, but no longer
    * equal to the one-shot fold, so that shape routes through
    * [[sessionAgg]].
    */
  def saltedSessionAgg(events: DataFrame, gapSeconds: Long,
                       sliceSeconds: Long = 3600L): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    saltedDynamicSessionAgg(events, lit(s"$gapSeconds seconds"), sliceSeconds)
  }

  /** [[saltedSessionAgg]] for PER-USER dynamic gaps — the W2 (dynamic
    * band) path with the same hot-key defense as the static fold. The
    * reference's bands (`flink_stream_task3.py:54-62`) are per-user
    * CONSTANTS, which is exactly what makes the two-phase fold exact
    * here: the pre-fold sessionizes within `(user, slice)` under the
    * user's own gap, and the island merge needs no gap expression at
    * all — every partial's END is `last_ts + gap_user`, so the
    * closed-interval rule "neighbor starting at `t2` merges ⟺
    * `t2 ≤ prior end`" carries the user's band implicitly, and a
    * running `max(end)` chains islands across any number of empty
    * slices. `gap` must therefore be constant per user (the
    * precondition the reference's band policy satisfies by
    * construction); `sliceSeconds` affects only the plan, never the
    * result — pick it ≫ the largest band and ≪ the hot key's span
    * (default 1 day against the scaled hour-band policy).
    */
  def saltedDynamicSessionAgg(events: DataFrame, gap: Column,
                              sliceSeconds: Long = 86400L): DataFrame =
    finalizePartials(mergeIslands(slicePartials(events, gap, sliceSeconds)))

  /** Phase 1 of the two-phase fold: sessionize within `(user, slice)`
    * groups, emitting PARTIAL sessions `(user_id, s, e, sum_cents, n)`
    * with `e = last_ts + gap`. Exposed (package-private) so the
    * streaming twin ([[graft.streaming.SaltedSessionStream]]) folds each
    * micro-batch with the IDENTICAL expressions.
    */
  private[graft] def slicePartials(events: DataFrame, gap: Column,
                                   sliceSeconds: Long): DataFrame =
    slicePartialsWithMax(events, gap, sliceSeconds).drop("mx_us")

  /** [[slicePartials]] carrying each partial's `max(unix_micros(ts))` as
    * `mx_us` — the streaming twin derives its per-batch stats (row count,
    * watermark candidate) from the PARTIALS instead of a second full scan
    * of the batch (guide §1.2: one pass where one pass suffices; the
    * partials are O(users × slices) rows, the batch is the corpus slice).
    */
  private[graft] def slicePartialsWithMax(events: DataFrame, gap: Column,
                                          sliceSeconds: Long): DataFrame = {
    require(sliceSeconds > 0, s"sliceSeconds must be positive, got $sliceSeconds")
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull) // P2 null filter
      .withColumn("slice",
        floor(unix_micros(col("ts")) / (sliceSeconds * 1000000L)))
      .groupBy(col("user_id"), col("slice"),
        session_window(col("ts"), gap))
      .agg(sum(expr("cast(round(value * 100, 0) as bigint)")).as("sum_cents"),
        count(lit(1)).as("n"),
        max(unix_micros(col("ts"))).as("mx_us"))
      .select(col("user_id"),
        col("session_window.start").as("s"),
        col("session_window.end").as("e"),
        col("sum_cents"), col("n"), col("mx_us"))
  }

  /** Phase 2: gap-and-islands merge of partial sessions per user — a new
    * island starts where `s > max(prior e)` (running max, so islands
    * chain across empty slices). IDEMPOTENT over its own output
    * (`mergeIslands(mergeIslands(x) ∪ y) == mergeIslands(x ∪ y)` when no
    * row of `y` can chain into a closed island of `x`) — the property
    * the streaming twin's open-partials state relies on.
    */
  private[graft] def mergeIslands(partials: DataFrame): DataFrame = {
    val byStart = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
    val prevMaxEnd = max(col("e"))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    partials
      .withColumn("new_island",
        when(prevMaxEnd.isNull || col("s") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island"))
        .over(byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"),
        sum(col("sum_cents")).as("sum_cents"), sum(col("n")).as("n"))
      .select(col("user_id"), col("s"), col("e"), col("sum_cents"), col("n"))
  }

  /** Phase 3: partial-session rows → the [[sessionAgg]] output schema
    * (cents finalized to sum/avg with the engine-wide half-up rule). */
  private[graft] def finalizePartials(partials: DataFrame): DataFrame =
    partials.select(
      col("user_id"), col("s").as("session_start"), col("e").as("session_end"),
      col("n").as("event_count"),
      (col("sum_cents") / 100.0).as("session_sum"),
      (floor(col("sum_cents") / col("n") + 0.5) / 100.0)
        .as("session_avg"))

  /** Measure-then-choose session aggregation — the session-window member
    * of the adaptive skew playbook ([[Relational.adaptiveUserTotals]]'s
    * decision step applied to the fold that actually needs it): run
    * [[graft.operators.Sketches.skewProfile]] (two partial-aggregated
    * passes, a one-row scalar back to the driver) and route to
    * [[saltedSessionAgg]] only when its `needs_salting` trigger fires;
    * uniform keys take the plain single-shuffle [[sessionAgg]], because
    * the slice pre-fold spends an extra shuffle + merge pass that buys
    * nothing without a straggler. Both branches are bit-identical
    * relations, so routing cannot change results — only the plan.
    *
    * The profiling pass is EAGER: `skewProfile` executes two aggregation
    * jobs over `events` at CALL time (not at the returned frame's action
    * time), so calling this inside a lazy pipeline triggers work early.
    */
  def adaptiveSessionAgg(events: DataFrame, gapSeconds: Long,
                         sliceSeconds: Long = 3600L,
                         saltAbove: Double = 4.0): DataFrame = {
    val trigger = graft.operators.Sketches.skewProfile(events, saltAbove)
      .select(col("needs_salting")).head()
    val salted = !trigger.isNullAt(0) && trigger.getBoolean(0)
    if (salted) saltedSessionAgg(events, gapSeconds, sliceSeconds)
    else sessionAgg(events, lit(s"$gapSeconds seconds"))
  }

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
