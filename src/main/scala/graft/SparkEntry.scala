package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{CsvIngest, Curation, Dedup, JsonIngest, Multimodal, NearDup, Relational, Sessions, Similarity}
import graft.streaming.StreamingSessions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the LLM-pipeline extensions) has an
  * entry in [[queries]]; SQL-expressible ones also have a DuckDB oracle in
  * [[oracleSql]]. Column names and arithmetic are kept bit-identical between
  * the Spark query and the oracle (integer-cents convention, explicit
  * `floor(x+0.5)` rounding — SURVEY.md §7.5.2).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("t1_sessions_2h")(spark, "/root/testdata/sf0.001")

  /** Run a persisted-artifact replay in a fresh temp root and CLEAN IT UP:
    * the gate result is bounded (tens of rows), so it is materialized
    * eagerly (`localCheckpoint`) before the parquet artifact chain under
    * the root is deleted — otherwise every oracle compare and bench
    * repetition leaks a full v0..vN + checkpoint + input split into /tmp.
    */
  private def withTempReplayRoot(prefix: String)
                                (f: java.nio.file.Path => DataFrame): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(prefix)
    try f(root).localCheckpoint()
    finally StreamingSessions.deleteRecursively(root)
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1+A1+A2+P3: static-gap session aggregation (flink_stream_task1.py).
    // 30 s = literal reference parity (mostly singleton sessions on this
    // data); 2 h variant actually exercises window merging (FIXTURES.md §2).
    "t1_sessions_30s" -> ((s, dir) =>
      Sessions.sessionAgg(Tables.events(s, dir), lit("30 seconds"))
        .orderBy(col("user_id"), col("session_start"))),
    "t1_sessions_2h" -> ((s, dir) =>
      Sessions.sessionAgg(Tables.events(s, dir), lit("2 hours"))
        .orderBy(col("user_id"), col("session_start"))),
    // skew-defended two-phase fold (pre-fold per (user, 1h slice) → island
    // merge over partial sessions) — result-identical to t1_sessions_30s,
    // so it shares the same gap-and-islands oracle
    "t1_sessions_skewed" -> ((s, dir) =>
      Sessions.saltedSessionAgg(Tables.events(s, dir), 30L, 3600L)
        .orderBy(col("user_id"), col("session_start"))),
    // measure-then-choose routing (skewProfile trigger) — both branches
    // are the same relation, so it shares the oracle regardless of which
    // plan the fixture's key distribution selects
    "t1_sessions_adaptive" -> ((s, dir) =>
      Sessions.adaptiveSessionAgg(Tables.events(s, dir), 30L)
        .orderBy(col("user_id"), col("session_start"))),
    // P4+A3: big-customer alert with deterministic keep-first dedup
    // (flink_stream_task2.py:81-90); threshold rescaled from 1e6 to 300 for
    // value∈[0,200] sessions (SURVEY.md §7.3 M2).
    "t2_big_customers" -> ((s, dir) =>
      Sessions.bigCustomers(
        Sessions.sessionAgg(Tables.events(s, dir), lit("2 hours")), 300.0)
        .orderBy(col("user_id"))),
    // W2: dynamic per-row gap, verbatim reference bands
    // (flink_stream_task3.py:54-62) + a scaled variant that merges.
    "t3_dynamic_gap_ref" -> ((s, dir) =>
      Sessions.sessionAgg(Tables.events(s, dir), Sessions.referenceDynamicGap)
        .orderBy(col("user_id"), col("session_start"))),
    "t3_dynamic_gap_scaled" -> ((s, dir) =>
      Sessions.sessionAgg(Tables.events(s, dir), Sessions.scaledDynamicGap)
        .orderBy(col("user_id"), col("session_start"))),
    // W2 + skew defense: the two-phase slice fold under PER-USER dynamic
    // gaps (bands are per-user constants, so the island merge is exact) —
    // result-identical to t3_dynamic_gap_scaled, same oracle
    "t3_dynamic_skewed" -> ((s, dir) =>
      Sessions.saltedDynamicSessionAgg(Tables.events(s, dir),
        Sessions.scaledDynamicGap)
        .orderBy(col("user_id"), col("session_start"))),
    // §1.4 ingest-time variant: the reference actually sessionizes over
    // Kafka ingest time; model it with a deterministic synthetic ingest
    // clock (100 events/s in arrival = event_id order, the reference
    // generator's sustained rate).
    "t1_sessions_ingest" -> ((s, dir) =>
      Sessions.sessionAggBy(Tables.events(s, dir), lit("30 seconds"),
        timestamp_micros(col("event_id") * 10000L))
        .orderBy(col("user_id"), col("session_start"))),
    // W3/W4 oracle-checked: bounded-out-of-order streaming replay with a
    // 10-minute watermark must reproduce batch sessionization exactly
    // (the gap-and-islands oracle is order-insensitive)
    "t1_sessions_outoforder" -> ((s, dir) =>
      StreamingSessions.replayOutOfOrder(Tables.events(s, dir), lit("30 seconds"))),
    // A1 skew defense in STREAMING form: the foreachBatch salted fold
    // (per-(user, slice) pre-fold inside each micro-batch + island merge
    // against the open-partials state table) under the same
    // bounded-disorder replay contract — result ≡ batch sessionization,
    // same gap-and-islands oracle
    "t1_sessions_skewed_stream" -> ((s, dir) =>
      graft.streaming.SaltedSessionStream.replaySaltedSessions(
        Tables.events(s, dir), lit("30 seconds"))),
    // the same replay contract over the from-scratch timer-built session
    // operator (transformWithState event-time timers; W1 re-derived
    // without session_window) — same oracle as the builtin twin
    "t1_sessions_timer" -> ((s, dir) =>
      graft.streaming.TimerSessions.replayTimerSessions(Tables.events(s, dir), 30L)),
    // W2 (dynamic per-user gap bands) through the same timer state machine
    "t3_dynamic_timer" -> ((s, dir) =>
      graft.streaming.TimerSessions.replayTimerSessionsDynamic(Tables.events(s, dir))),
    // W2 through the same replay harness: dynamic per-row gaps must also
    // survive bounded disorder (streaming ≡ batch, oracle-checked)
    "t3_dynamic_outoforder" -> ((s, dir) =>
      StreamingSessions.replayOutOfOrder(Tables.events(s, dir),
        Sessions.referenceDynamicGap)),
    // A3 through the replay harness: session agg → threshold → keyed
    // "alert once" dedup, chained stateful operators under a watermark;
    // contract = alert-set equality with the batch rule
    "t2_alert_outoforder" -> ((s, dir) =>
      StreamingSessions.replayAlertOutOfOrder(Tables.events(s, dir),
        lit("2 hours"), 300.0)),
    // P1/P2: CSV wire-format roundtrip — render events in the reference's
    // CSV format, inject malformed fixtures, parse permissively; survivors
    // must equal the original events exactly.
    "csv_roundtrip_events" -> ((s, dir) => {
      import s.implicits._
      // repartition before the parse: line parsing is embarrassingly
      // parallel and must not inherit the upstream file layout (the
      // fixture is ONE small parquet file → one scan partition; real
      // wire ingest arrives from many Kafka partitions/files)
      val lines = CsvIngest.renderCsv(Tables.events(s, dir))
        .union(CsvIngest.malformedFixtures.toDF("value"))
        .repartition(s.sparkContext.defaultParallelism)
      CsvIngest.parsePermissive(lines).orderBy(col("transaction_id"))
    }),
    // Relational coverage (extensions; SURVEY.md §2.5)
    "q1_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(Tables.lineitem(s, dir))),
    "q3_top_revenue" -> ((s, dir) =>
      Relational.topRevenue(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir))),
    "q_top3_parts_per_brand" -> ((s, dir) =>
      Relational.top3PartsPerBrand(Tables.part(s, dir))),
    "q_parts_page2" -> ((s, dir) =>
      Relational.partsPage(Tables.part(s, dir), pageSize = 10, pageIdx = 1)),
    "q_rollup_acctbal" -> ((s, dir) =>
      Relational.acctbalRollup(Tables.customer(s, dir), Tables.nation(s, dir),
        Tables.region(s, dir))),
    "q_anti_customers_no_orders" -> ((s, dir) =>
      Relational.customersWithoutOrders(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_semi_urgent_customers" -> ((s, dir) =>
      Relational.urgentCustomers(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_events_json_enrich" -> ((s, dir) =>
      Relational.eventsJsonEnrich(Tables.events(s, dir))),
    "q_asof_latest_order" -> ((s, dir) =>
      Relational.asofLatestOrder(Tables.events(s, dir), Tables.orders(s, dir))),
    "q_daily_activity" -> ((s, dir) =>
      Relational.dailyActivity(Tables.events(s, dir))),
    "q_sliding_activity" -> ((s, dir) =>
      Relational.slidingActivity(Tables.events(s, dir))),
    // W3/W4 for the tumbling/sliding family: the same bounded-disorder
    // replay contract the session queries carry — watermarked streaming
    // sliding windows over jittered arrival must reproduce the batch
    // rollup exactly (same oracle as q_sliding_activity)
    "q_sliding_outoforder" -> ((s, dir) =>
      StreamingSessions.replaySlidingOutOfOrder(Tables.events(s, dir))),
    // keyed tumbling windows through the same replay contract: daily
    // per-event-type rollups (the most common production window shape)
    "q_tumbling_by_type_outoforder" -> ((s, dir) =>
      StreamingSessions.replayTumblingByTypeOutOfOrder(Tables.events(s, dir))),
    "q_range_join_errors" -> ((s, dir) =>
      Relational.purchaseErrorPairs(Tables.events(s, dir))),
    // the same interval join as a watermarked STREAM-STREAM join through
    // the bounded-disorder replay (W3/W4 for the join family) — state is
    // bounded by delay + the ±2 h interval, pairs emit eagerly
    "q_range_join_stream" -> ((s, dir) =>
      StreamingSessions.replayIntervalJoinOutOfOrder(Tables.events(s, dir))),
    // stream-STATIC broadcast enrichment + watermarked daily rollup
    // through the same replay contract (the third join mode)
    "q_enrich_segment_stream" -> ((s, dir) =>
      StreamingSessions.replayEnrichedSegmentsOutOfOrder(
        Tables.events(s, dir), Tables.customer(s, dir))),
    "q_window_funnel" -> ((s, dir) =>
      Relational.windowFunnel(Tables.events(s, dir))),
    // SQL-text twin: the same dialect-portable SQL the oracle runs
    "q_window_funnel_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(windowFunnelSql)
    }),
    // cohort retention triangle: first-activity-day cohorts × day offsets
    "q_retention_cohorts" -> ((s, dir) =>
      Relational.retentionCohorts(Tables.events(s, dir))),
    // arbitrary grouping sets (status totals + priority totals + grand
    // total in one Expand pass), grouping() bits disambiguating nulls
    "q_grouping_sets_orders" -> ((s, dir) =>
      Relational.orderGroupingSets(Tables.orders(s, dir))),
    // time-RANGE window frame: trailing-1h per-user count/sum at every
    // event — the physical-time sliding horizon ROWS frames can't express
    "q_trailing_hour" -> ((s, dir) =>
      Relational.trailingHourStats(Tables.events(s, dir))),
    // distribution ranks: ntile/percent_rank/cume_dist per event type
    "q_value_distribution" -> ((s, dir) =>
      Relational.valueDistribution(Tables.events(s, dir))),
    // unpivot (wide -> long), the inverse of q_pivot_status_priority
    "q_unpivot_priority" -> ((s, dir) =>
      Relational.unpivotPriorityMatrix(Tables.orders(s, dir))),
    // full outer join: user activity vs customer dim, both unmatched
    // sides preserved
    "q_full_outer_coverage" -> ((s, dir) =>
      Relational.userCustomerCoverage(
        Tables.events(s, dir), Tables.customer(s, dir))),
    "q_cube_orders" -> ((s, dir) =>
      Relational.ordersCube(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_pivot_status_priority" -> ((s, dir) =>
      Relational.pivotPriorityMatrix(Tables.orders(s, dir))),
    "q_set_ops_segments" -> ((s, dir) =>
      Relational.userSegments(Tables.events(s, dir))),
    "q_value_percentiles" -> ((s, dir) =>
      Relational.valuePercentiles(Tables.events(s, dir))),
    "q_user_running_total" -> ((s, dir) =>
      Relational.userRunningTotals(Tables.events(s, dir))),
    "q_salted_user_totals" -> ((s, dir) =>
      Relational.saltedUserTotals(Tables.events(s, dir))),
    // explicit salted shuffle join (replicated dim), == the plain join
    "q_salted_enrich_join" -> ((s, dir) =>
      Relational.saltedEnrichJoin(Tables.events(s, dir), Tables.customer(s, dir))),
    // measured chooser: skewProfile's needs_salting routes plain vs salted;
    // both branches are result-identical, so one plain oracle covers both
    "q_adaptive_user_totals" -> ((s, dir) =>
      Relational.adaptiveUserTotals(Tables.events(s, dir))),
    // weekday × hour load heatmap (ISO day numbering, engine-portable)
    "q_weekday_hour_profile" -> ((s, dir) =>
      Relational.weekdayHourProfile(Tables.events(s, dir))),
    // month-over-month totals with floor-bp growth (negative-safe)
    "q_monthly_growth" -> ((s, dir) =>
      Relational.monthlyOrderGrowth(Tables.orders(s, dir))),
    // time-series densification: zero rows for day × type holes
    "q_timeseries_gapfill" -> ((s, dir) =>
      Relational.gapFillDaily(Tables.events(s, dir))),
    // first-order Markov transition matrix over user event sequences
    "q_markov_transitions" -> ((s, dir) =>
      Relational.eventTransitions(Tables.events(s, dir))),
    // per-user inter-event cadence (min/max/mean/exact-median gap)
    "q_inter_event_gaps" -> ((s, dir) =>
      Relational.interEventGaps(Tables.events(s, dir))),
    // SQL-text twin of the Markov matrix (API parity for the wave-3
    // analytics; same integer-bp arithmetic in Spark SQL dialect)
    "q_markov_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |             AND event_id IS NOT NULL AND event_type IS NOT NULL),
        |p AS (SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS prev_type,
        |        event_type AS next_type FROM e),
        |c AS (SELECT prev_type, next_type, count(1) AS n
        |      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  (n * 20000 + sum(n) OVER (PARTITION BY prev_type))
        |    div (2 * sum(n) OVER (PARTITION BY prev_type)) AS prob_bp
        |FROM c ORDER BY 1, 2""".stripMargin)
    }),
    // SQL-text twin of the day × type gap fill (sequence() grid in SQL)
    "q_gapfill_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |WITH b AS (SELECT event_type, date_trunc('day', ts) AS day, value
        |           FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |d AS (SELECT event_type, day, count(1) AS n_events,
        |        sum(cast(round(value * 100, 0) AS bigint)) AS cents
        |      FROM b GROUP BY 1, 2),
        |days AS (SELECT explode(sequence(lo, hi, interval 1 day)) AS day
        |         FROM (SELECT min(day) AS lo, max(day) AS hi FROM b)),
        |types AS (SELECT DISTINCT event_type FROM b)
        |SELECT t.event_type, dy.day,
        |  coalesce(d.n_events, 0L) AS n_events,
        |  coalesce(d.cents, 0L) / 100e0 AS sum_value
        |FROM types t CROSS JOIN days dy
        |LEFT JOIN d ON d.event_type = t.event_type AND d.day = dy.day
        |ORDER BY 1, 2""".stripMargin)
    }),
    // SQL-text twin of the weekday × hour load heatmap
    "q_weekday_hour_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |SELECT CAST(weekday(ts) + 1 AS BIGINT) AS iso_dow,
        |  CAST(hour(ts) AS BIGINT) AS hour,
        |  count(1) AS n_events,
        |  sum(cast(round(value * 100, 0) as bigint)) / 100e0 AS sum_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    }),
    // SQL-text twin of the month-over-month growth rollup (same div
    // truncation semantics, same null-on-first-month contract)
    "q_monthly_growth_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
        |    count(1) AS n_orders,
        |    sum(cast(round(o_totalprice * 100, 0) as bigint)) AS cents
        |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)
        |SELECT month, n_orders, cents / 100e0 AS total_price,
        |  CASE WHEN lag(cents) OVER (ORDER BY month) > 0
        |    THEN ((cents - lag(cents) OVER (ORDER BY month)) * 10000)
        |         div lag(cents) OVER (ORDER BY month)
        |  END AS growth_bp
        |FROM m ORDER BY month""".stripMargin)
    }),
    // SQL-text twin of the robust MAD outlier rule (broadcast hints keep
    // the two dimension-sized median tables off the shuffle path)
    "q_mad_outliers_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |WITH b AS (SELECT event_id, user_id, event_type,
        |             cast(round(value * 100, 0) as bigint) AS cents
        |           FROM events
        |           WHERE event_id IS NOT NULL AND event_type IS NOT NULL
        |             AND value IS NOT NULL),
        |med AS (SELECT event_type,
        |          cast(percentile(cents, 0.5d) * 2 as bigint) AS med_x2
        |        FROM b GROUP BY 1),
        |dev AS (SELECT /*+ BROADCAST(med) */ b.*, med.med_x2,
        |          abs(b.cents * 2 - med.med_x2) AS dev_x2
        |        FROM b JOIN med USING (event_type)),
        |mad AS (SELECT event_type,
        |          cast(percentile(dev_x2, 0.5d) * 2 as bigint) AS mad_x4
        |        FROM dev GROUP BY 1)
        |SELECT /*+ BROADCAST(mad) */ dev.event_id, dev.user_id,
        |  dev.event_type, dev.cents / 100e0 AS value,
        |  dev.med_x2, dev.dev_x2, mad.mad_x4
        |FROM dev JOIN mad USING (event_type)
        |WHERE dev.dev_x2 * 2 > mad.mad_x4 * 3
        |ORDER BY event_id""".stripMargin)
    }),
    // SQL-text twin of the per-user cadence profile (×2-carried median)
    "q_inter_gaps_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |WITH e AS (SELECT user_id, ts, event_id FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |             AND event_id IS NOT NULL),
        |g AS (SELECT user_id,
        |        unix_micros(ts) - unix_micros(lag(ts) OVER (
        |          PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |      FROM e)
        |SELECT user_id, count(1) AS n_gaps,
        |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
        |  (sum(gap_us) * 2 + count(1)) div (2 * count(1)) AS mean_gap_us,
        |  cast(percentile(gap_us, 0.5d) * 2 as bigint) AS p50_gap_us_x2
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
    }),
    // funnel latency: first view -> first subsequent purchase, per user
    "q_funnel_time" -> ((s, dir) =>
      Relational.funnelConversionTime(Tables.events(s, dir))),
    // median/MAD robust outliers, integer-exact decision rule
    "q_mad_outliers" -> ((s, dir) =>
      Relational.madOutliers(Tables.events(s, dir))),
    "sketch_accuracy" -> ((s, dir) =>
      graft.operators.Sketches.sketchAccuracy(Tables.events(s, dir))),
    // shuffle-key skew diagnostic: the measurement that decides whether
    // q_salted_user_totals' salting is warranted on a given key
    "skew_profile" -> ((s, dir) =>
      graft.operators.Sketches.skewProfile(Tables.events(s, dir))),
    // Count-Min point-frequency gate: exact top-20 tokens + sketch
    // estimates + the never-underestimates theorem boolean
    "vocab_cmsketch" -> ((s, dir) =>
      graft.operators.Sketches.cmsketchGate(Tables.documents(s, dir))),
    // SQL-text twin: the whole CM pipeline — portable md5 cell hashes,
    // sketch build, top-k probe, never-under theorem — in one statement
    "vocab_cmsketch_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |WITH tok AS (SELECT explode(split(text, ' ')) AS tok
        |             FROM documents WHERE text IS NOT NULL),
        |ex AS (SELECT tok, count(1) AS n_true FROM tok GROUP BY tok),
        |top AS (SELECT tok, n_true FROM ex ORDER BY n_true DESC, tok LIMIT 20),
        |cells AS (SELECT CAST(rw AS BIGINT) AS rw,
        |            pmod(CAST(conv(substring(md5(
        |              concat('r', CAST(rw AS STRING), ' ', tok)), 1, 15),
        |              16, 10) AS BIGINT), CAST(1024 AS BIGINT)) AS col_id,
        |            n_true AS c
        |          FROM ex LATERAL VIEW explode(sequence(0, 3)) r AS rw),
        |st AS (SELECT rw, col_id, sum(c) AS cnt
        |       FROM cells GROUP BY rw, col_id),
        |keys AS (SELECT t.tok, CAST(rw AS BIGINT) AS rw,
        |           pmod(CAST(conv(substring(md5(
        |             concat('r', CAST(rw AS STRING), ' ', t.tok)), 1, 15),
        |             16, 10) AS BIGINT), CAST(1024 AS BIGINT)) AS col_id
        |         FROM top t LATERAL VIEW explode(sequence(0, 3)) r AS rw),
        |es AS (SELECT k.tok, min(coalesce(st.cnt, CAST(0 AS BIGINT))) AS est
        |       FROM keys k LEFT JOIN st ON k.rw = st.rw
        |                               AND k.col_id = st.col_id
        |       GROUP BY k.tok)
        |SELECT t.tok, t.n_true, e.est,
        |  e.est >= t.n_true AS never_under,
        |  e.est - t.n_true AS overcount
        |FROM top t JOIN es e ON t.tok = e.tok ORDER BY tok""".stripMargin)
    }),
    // the same gate over a foreachBatch-maintained artifact (3-batch
    // replay): vector-add maintenance is bit-identical to one-shot
    "vocab_cmsketch_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Sketches.cmsketchGateFrom(
        graft.streaming.StreamingSketches.replayCmSketch(docs), docs)
    }),
    // the gate over a PERSISTED-artifact maintainer (parquet table per
    // batch, crash-recoverable — StreamingSpec kills and restarts it);
    // exact vector-add maintenance keeps it on the one-shot oracle
    "vocab_cmsketch_persist" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      withTempReplayRoot("graft_cmp_") { root =>
        graft.operators.Sketches.cmsketchGateFrom(
          graft.streaming.StreamingSketches.replayCmSketchPersisted(docs, root),
          docs)
      }
    }),
    // the MG theorem gate over the persisted-artifact maintainer — the
    // crash-recoverable versioned-parquet fold ported to the second
    // value-mergeable sketch; gated bounds are batching-independent, so it
    // shares the one-shot MG oracle
    "vocab_hh_persist" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      withTempReplayRoot("graft_hhp_") { root =>
        graft.operators.Sketches.heavyHitterGateFrom(
          graft.streaming.StreamingSketches.replayHeavyHittersPersisted(docs, root),
          docs)
      }
    }),
    // q-digest rank-theorem gate: deterministic 128-ary dyadic sketch
    // over the unbounded cents universe, exact ranks + bound booleans
    "quantile_qdigest" -> ((s, dir) =>
      graft.operators.Sketches.qdigestGate(Tables.events(s, dir))),
    // SQL-text twin: the full 8-round build unrolled as CTEs (windows
    // over parent groups, scalar-subquery threshold) + the readout and
    // rank gate — the whole sketch as one Spark SQL statement
    "quantile_qdigest_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(qdigestSparkSql)
    }),
    // same gate over an 80/20 incrementally-merged artifact (doubled
    // per-node slack — the merge invariant)
    "quantile_qdigest_update" -> ((s, dir) =>
      graft.operators.Sketches.qdigestGateIncremental(Tables.events(s, dir))),
    // the gate over a foreachBatch-maintained artifact (2-batch replay,
    // event_id % 2 split) — build-then-merge, replayed two-phase
    "quantile_qdigest_stream" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Sketches.qdigestGateStreamed(
        graft.streaming.StreamingSketches.replayQDigest(ev), ev)
    }),
    // the same gate over the PERSISTED (versioned-parquet, crash-
    // recoverable) maintainer — identical split and fold, so the stored
    // artifact and readout match the in-memory streamed twin exactly
    "quantile_qdigest_persist" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft_qd_persist_")
      graft.operators.Sketches.qdigestGateStreamed(
        graft.streaming.StreamingSketches.replayQDigestPersisted(ev, root), ev)
    }),
    // single-pass Deequ-style constraint suite over the corpus
    "corpus_constraints" -> ((s, dir) =>
      Curation.validateConstraints(Tables.documents(s, dir))),
    // train/test split whose train side quarantines near-dups of ANY
    // test doc — the leak exact-match decontamination can't see
    "split_leakage_guard" -> ((s, dir) =>
      Curation.splitWithLeakageGuard(Tables.documents(s, dir))),
    // mergeable per-source HLL vocabulary sketches, gated against exact
    // distinct counts (incl. the artifact-merge TOTAL path)
    "vocab_cardinality_sketch" -> ((s, dir) =>
      graft.operators.Sketches.vocabCardinalitySketch(Tables.documents(s, dir))),
    // pairwise cross-source vocabulary overlap from the per-source HLL
    // artifacts (inclusion–exclusion on a sources² grid — no corpus
    // join), gated against exact intersection within 5% of each union
    "vocab_overlap_sketch" -> ((s, dir) =>
      graft.operators.Sketches.crossSourceOverlapGate(Tables.documents(s, dir))),
    // the same readout over an artifact table built in two maintenance
    // folds — overlap answered from persisted state, corpus never reread
    "vocab_overlap_incremental" -> ((s, dir) =>
      graft.operators.Sketches.crossSourceOverlapIncremental(Tables.documents(s, dir))),
    // HDR-histogram quantile artifacts: deterministic log-spaced bins,
    // exact-replayed readout + in-bin containment of the true quantile
    "value_quantile_hist" -> ((s, dir) =>
      graft.operators.Sketches.valueHistGate(Tables.events(s, dir))),
    // day-over-day total-variation drift on the histogram bins
    // (integer cross-multiplied — the input-shift alarm between
    // corpus snapshots)
    "value_drift_daily" -> ((s, dir) =>
      graft.operators.Sketches.valueDriftDaily(Tables.events(s, dir))),
    // streaming drift monitor: the same alarm with the artifact table
    // maintained incrementally by foreachBatch over a 4-batch replay
    "value_drift_stream" -> ((s, dir) =>
      graft.streaming.StreamingSketches.replayDriftMonitor(Tables.events(s, dir))),
    // per-source token-distribution drift between the same two corpus
    // versions corpus_diff ledgers — content shift vs row churn
    "corpus_token_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Sketches.tokenDrift(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))))
    }),
    // Misra–Gries frequent-items artifacts, gated on the MG theorems
    // (counter values legitimately vary with partitioning; the checked
    // lower-bound / error-bound / coverage booleans cannot)
    "vocab_heavy_hitters" -> ((s, dir) =>
      graft.operators.Sketches.heavyHitterGate(Tables.documents(s, dir))),
    // SQL-text twin: the MG UDAF as a first-class SQL citizen; the output
    // columns (exact aggregates + theorem booleans) are all
    // batching-independent, so the twin is cell-identical to the
    // Column-API gate even though internal counters may differ
    "vocab_heavy_hitters_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.udf.register("graft_mg8", udaf(
        new graft.functions.MisraGries(8),
        org.apache.spark.sql.Encoders.STRING))
      s.sql("""
        |WITH toks AS (SELECT source, explode(split(text, ' ')) AS tok
        |              FROM documents
        |              WHERE source IS NOT NULL AND text IS NOT NULL),
        |st AS (SELECT source, graft_mg8(tok).m AS summary
        |       FROM toks GROUP BY source),
        |ex AS (SELECT source, tok, count(1) AS n
        |       FROM toks GROUP BY source, tok),
        |summ AS (SELECT source, tok, est FROM st
        |         LATERAL VIEW explode(summary) t AS tok, est),
        |j AS (SELECT e.source, e.n, s.est
        |      FROM ex e LEFT JOIN summ s
        |        ON e.source = s.source AND e.tok = s.tok),
        |w AS (SELECT source, n, est,
        |        sum(n) OVER (PARTITION BY source) AS nr FROM j)
        |SELECT source, max(nr) AS n_tokens, count(1) AS n_distinct,
        |  (count(est) <= 8) AS size_ok,
        |  bool_and(est IS NULL OR est <= n) AS underestimates_only,
        |  bool_and((n - coalesce(est, CAST(0 AS BIGINT))) * 9 <= nr)
        |    AS err_within_bound,
        |  bool_and(NOT (n * 9 > nr) OR est IS NOT NULL) AS heavy_covered
        |FROM w GROUP BY source ORDER BY source""".stripMargin)
    }),
    // the same theorem gate over a foreachBatch-maintained MG artifact —
    // counter values differ per batching, the gated bounds cannot
    "vocab_hh_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Sketches.heavyHitterGateFrom(
        graft.streaming.StreamingSketches.replayHeavyHitters(docs), docs)
    }),
    // cardinality gate over a foreachBatch-maintained HLL artifact —
    // register-wise-max union makes it bit-identical to one-shot
    "vocab_sketch_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Sketches.vocabCardinalityFrom(
        graft.streaming.StreamingSketches.replayVocabSketch(docs), docs)
    }),
    // A3 on Spark 4's transformWithState API (RocksDB-backed named state):
    // same alert-set contract as t2_alert_outoforder
    "t2_alert_tws" -> ((s, dir) =>
      StreamingSessions.replayAlertTws(Tables.events(s, dir),
        lit("2 hours"), 300.0)),
    // streaming funnel coverage on MapState (set contract: users whose
    // observed step set first covers view->click->purchase)
    "q_funnel_coverage_stream" -> ((s, dir) =>
      graft.streaming.FunnelCoverage.replayCoverage(Tables.events(s, dir),
        Seq("view", "click", "purchase"))),
    // the ORDERED funnel as a stream: watermark-proved finality over
    // buffered per-user chains (event-time timers) — same histogram
    // oracle as the batch q_window_funnel
    "q_funnel_ordered_stream" -> ((s, dir) =>
      graft.streaming.TimerFunnel.replayOrderedFunnel(Tables.events(s, dir),
        stepWithinSec = 172800)),
    // the same session pipeline through the pure SQL-text surface
    // (registered temp views + SQL session_window) — API parity is
    // oracle-gated, not just claimed
    "t1_sessions_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |SELECT user_id,
        |  session_window.start AS session_start,
        |  session_window.end AS session_end,
        |  count(1) AS event_count,
        |  -- 100e0, not 100.0: SQL-text numeric literals parse as DECIMAL
        |  -- (unlike Scala doubles in the DataFrame API), and decimal
        |  -- division would emit decimal128 columns where the batch twin
        |  -- emits double — equal values, different schema/hash. Pinned by
        |  -- SqlParitySpec (SQL-text schema == DataFrame twin schema).
        |  sum(cast(round(value * 100, 0) as bigint)) / 100e0 AS session_sum,
        |  floor(sum(cast(round(value * 100, 0) as bigint)) / count(1) + 0.5) / 100e0 AS session_avg
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |GROUP BY user_id, session_window(ts, '30 seconds')
        |ORDER BY user_id, session_start""".stripMargin)
    }),
    // the big-customer alert through the SQL-text surface (P4 + A3 as
    // SQL citizens): sessionize, threshold, keep-first via row_number —
    // with t1/t3 twins this makes every reference task SQL-runnable
    "t2_big_customers_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |WITH sess AS (
        |  SELECT user_id,
        |    session_window.start AS session_start,
        |    session_window.end AS session_end,
        |    count(1) AS event_count,
        |    sum(cast(round(value * 100, 0) as bigint)) / 100e0 AS session_sum,
        |    floor(sum(cast(round(value * 100, 0) as bigint)) / count(1) + 0.5) / 100e0 AS session_avg
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY user_id, session_window(ts, '2 hours')
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |             ORDER BY session_start, session_end) AS rn
        |  FROM sess WHERE session_sum >= 300.0
        |)
        |SELECT user_id, session_start, session_end, event_count,
        |       session_sum, session_avg
        |FROM ranked WHERE rn = 1
        |ORDER BY user_id""".stripMargin)
    }),
    // dynamic-gap session windows through the SQL-text surface (W2 as a
    // SQL citizen): CASE-expression gap inside session_window
    "t3_dynamic_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |SELECT user_id,
        |  session_window.start AS session_start,
        |  session_window.end AS session_end,
        |  count(1) AS event_count,
        |  sum(cast(round(value * 100, 0) as bigint)) / 100e0 AS session_sum,
        |  floor(sum(cast(round(value * 100, 0) as bigint)) / count(1) + 0.5) / 100e0 AS session_avg
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |GROUP BY user_id, session_window(ts,
        |  CASE WHEN user_id = 9999 THEN '5 minutes'
        |       WHEN user_id BETWEEN 2 AND 9 THEN '2 minutes'
        |       WHEN user_id BETWEEN 100 AND 200 THEN '60 seconds'
        |       ELSE '30 seconds' END)
        |ORDER BY user_id, session_start""".stripMargin)
    }),
    // JSONL wire-format roundtrip (LLM-corpus line format): render ->
    // inject malformed lines -> permissive parse; survivors must equal
    // the original events exactly (field-level nulls preserved)
    "jsonl_roundtrip_events" -> ((s, dir) => {
      import s.implicits._
      // repartition before the parse — same rationale as the CSV twin:
      // Jackson parse is the expensive stage and must spread across
      // cores, not run on the fixture's single scan partition
      val lines = JsonIngest.renderJsonl(Tables.events(s, dir))
        .union(JsonIngest.malformedFixtures.toDF("value"))
        .repartition(s.sparkContext.defaultParallelism)
      JsonIngest.parseJsonl(lines, graft.sources.EventSource.schema)
        .orderBy(col("event_id"))
    }),
    // ORC interchange roundtrip: write the normalized events as ORC,
    // read them back through the canonical schema — the second builtin
    // columnar format, microsecond-exact (identity vs the events oracle).
    // Same per-run temp-dir + localCheckpoint + delete discipline as
    // corpus_manifest: the returned frame is self-contained.
    "orc_roundtrip_events" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft_orc_rt_")
      try {
        val out = root.resolve("events").toString
        graft.sources.EventSource.writeOrc(Tables.events(s, dir), out)
        graft.sources.EventSource.readOrc(s, out)
          .orderBy(col("event_id")).localCheckpoint()
      } finally graft.streaming.StreamingSessions.deleteRecursively(root)
    }),
    // Text-analysis extensions over documents
    "text_langid" -> ((s, dir) => TextAnalysis.langId(Tables.documents(s, dir))),
    "text_quality" -> ((s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir))),
    "text_tokens" -> ((s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir))),
    // word-entropy quality signal (repetition/gibberish detector)
    "text_entropy" -> ((s, dir) => TextAnalysis.wordEntropy(Tables.documents(s, dir))),
    // Heaps'-law vocabulary growth curve (per 100-doc bucket)
    "vocab_growth" -> ((s, dir) => TextAnalysis.vocabGrowth(Tables.documents(s, dir))),
    "text_fingerprints" -> ((s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir))),
    "text_langid_ngram" -> ((s, dir) => TextAnalysis.langIdNgram(Tables.documents(s, dir))),
    "text_token_docfreq" -> ((s, dir) => TextAnalysis.tokenDocFrequency(Tables.documents(s, dir))),
    "text_typicality" -> ((s, dir) => TextAnalysis.typicality(Tables.documents(s, dir))),
    "text_top_ngrams" -> ((s, dir) => TextAnalysis.topNgrams(Tables.documents(s, dir))),
    "text_distinctive" -> ((s, dir) => TextAnalysis.distinctiveTokens(Tables.documents(s, dir))),
    // BM25-shaped keyword search: top-20 docs for a fixed 3-term query,
    // exact-integer scoring (rational idf surrogate; k1=1.2, b=0.75)
    "search_bm25" -> ((s, dir) => TextAnalysis.searchBm25(Tables.documents(s, dir))),
    // bigram-LM fluency score: per-occurrence P(w2|w1) in integer ppm —
    // the conditional-probability filter unigram typicality can't see
    "text_bigram_lm" -> ((s, dir) => TextAnalysis.bigramLmScore(Tables.documents(s, dir))),
    // the END-TO-END training-data pipeline, one oracle-exact query:
    // domain-reputation gate -> corpus-relative quality quantile gate
    // (threshold computed on the gated subset) -> exact dedup (keep min
    // id) -> near-dup canonicalization against FULL-corpus clusters ->
    // token-budget shard packing of the survivors
    // eval-safe packing: leakage-guarded split -> pack ONLY the train
    // side — the composition that makes the guard consequential (the
    // packed artifact provably contains no near-dup of a held-out doc)
    "pipeline_eval_safe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.join(
        Curation.splitWithLeakageGuard(docs)
          .filter(col("split") === "train").select(col("doc_id")), "doc_id")
      Curation.packShards(train, 2048L)
    }),
    "pipeline_training_data" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val g1 = docs.join(
        Curation.gateBySource(docs).select(col("doc_id")), "doc_id")
      val g2 = docs.join(
        Curation.qualityQuantileGate(g1).select(col("doc_id")), "doc_id")
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val ex = g2.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val nonCanonical = NearDup.nearDupClusters(docs)
        .filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
      Curation.packShards(ex.join(nonCanonical, Seq("doc_id"), "left_anti"),
        2048L)
    }),
    // corpus-version diff: deterministic synthetic "yesterday vs today"
    // split of the fixture (old = id%10!=0; new = id%7!=0 with text
    // edited when id%5==0) -> added/removed/changed/unchanged per id
    "corpus_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Curation.corpusDiff(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))))
    }),
    // corpus-frequency vocabulary: top-1000 tokens densely numbered by
    // (count desc, token) — the id table token-id encoding joins against
    "vocab_topk" -> ((s, dir) => TextAnalysis.buildVocab(Tables.documents(s, dir))),
    // token-id encoding: each doc as its space-joined vocab-id sequence
    // (OOV → 0) + coverage counts — the corpus → packable-token-ids step
    "tokenize_ids" -> ((s, dir) => TextAnalysis.encodeTokenIds(Tables.documents(s, dir))),
    // subword (BPE) merge-rule training: 10 rounds of pair-count + argmax
    // over the word-type table; the whole loop replays as unrolled CTEs
    "vocab_bpe" -> ((s, dir) => TextAnalysis.trainBpeMerges(Tables.documents(s, dir))),
    // subword (BPE) encoding: apply the trained merges to every word and
    // emit dense token-id sequences — the encoding an LLM pipeline ships
    "tokenize_bpe" -> ((s, dir) => TextAnalysis.encodeBpe(Tables.documents(s, dir))),
    // BYTE-level BPE (the production GPT-2-style domain: initial
    // inventory 256, no OOV): train+encode over a planted-non-ASCII
    // corpus (a→ä, o→ø makes every doc multi-byte UTF-8) — symbols are
    // lowercase-hex UTF-8 bytes, merges and ids follow the same argmax /
    // dense-id contracts as the char-level path
    "tokenize_bpe_bytes" -> ((s, dir) => TextAnalysis.encodeBpeBytes(
      Tables.documents(s, dir).withColumn("text",
        replace(replace(col("text"), lit("a"), lit("ä")),
          lit("o"), lit("ø"))), 10)),
    // byte-level incremental BPE: freeze hex-domain merge+vocab artifacts
    // on the 4/5 prefix of the planted-non-ASCII corpus, encode the 1/5
    // tail O(batch) with OOV->0 — the byte tokenizer's ship shape
    "tokenize_bpe_bytes_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).withColumn("text",
        replace(replace(col("text"), lit("a"), lit("ä")),
          lit("o"), lit("ø")))
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val (m, v) = TextAnalysis.bpeBytesArtifacts(
        docs.filter(col("doc_id") < cut))
      TextAnalysis.encodeBpeBytesWith(m, v, docs.filter(col("doc_id") >= cut))
    }),
    // incremental BPE: freeze merge+vocab artifacts on the 4/5 prefix,
    // encode the 1/5 tail O(batch) with OOV->0 — the tokenizer-ship shape
    "tokenize_bpe_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val (m, v) = TextAnalysis.bpeArtifacts(docs.filter(col("doc_id") < cut))
      TextAnalysis.encodeBpeWith(m, v, docs.filter(col("doc_id") >= cut))
    }),
    // quality-weighted sampling: keep probability = ttr_bp/10000 via the
    // content-free md5 bucket — soft quality gate, no cliff effects
    "sample_weighted" -> ((s, dir) => Curation.weightedSample(Tables.documents(s, dir))),
    // domain-level reputation: per-source doc count, duplicate rate, mean
    // length and mean TTR quality (integer bp, round-half-up)
    "source_reputation" -> ((s, dir) => Curation.sourceReputation(Tables.documents(s, dir))),
    // domain-level gate: drop whole sources whose mean TTR < 4800 bp or
    // exact-dup rate > 2000 bp — the before-any-per-doc-gate web screen
    "gate_by_source" -> ((s, dir) => Curation.gateBySource(Tables.documents(s, dir))),
    "sample_stratified" -> ((s, dir) => Curation.stratifiedSample(Tables.documents(s, dir), 40)),
    // data-mixing: per-language keep rates (bps), incl. a dropped (fr=0)
    // and a fully-kept (de=10000) stratum
    "sample_mixture" -> ((s, dir) => Curation.mixtureSample(Tables.documents(s, dir),
      Map("en" -> 2500, "es" -> 7500, "de" -> 10000, "zh" -> 5000))),
    // data-mixing in the unit training runs budget: TOKENS per language
    // (en/es/zh cut mid-language, de fully kept, fr absent -> dropped)
    "sample_mixture_tokens" -> ((s, dir) => Curation.mixtureSampleTokens(
      Tables.documents(s, dir),
      Map("en" -> 2500L, "es" -> 1200L, "de" -> 100000L, "zh" -> 800L))),
    // benchmark decontamination: training docs sharing any word-8-gram
    // with the held-out split (md5-bucket 10% of the corpus)
    "text_decontaminate" -> ((s, dir) => Curation.decontaminate(Tables.documents(s, dir))),
    // the decontamination screen through the SQL-text surface — pins the
    // two-arg graft_shingles(text, n) extension function as a SQL citizen
    "text_decontaminate_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.TextHashOps.register(s)
      s.sql("""
        |WITH p AS (
        |  SELECT doc_id, xxhash64(ng) AS ngh,
        |    CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)
        |      AS BIGINT) % 10000 < 1000 AS is_eval
        |  FROM documents
        |  LATERAL VIEW explode(graft_shingles(text, 8)) t AS ng)
        |SELECT tr.doc_id,
        |  count(DISTINCT ev.doc_id) AS n_eval_docs,
        |  count(DISTINCT tr.ngh) AS n_shared_ngrams
        |FROM p tr JOIN p ev ON tr.ngh = ev.ngh
        |WHERE NOT tr.is_eval AND ev.is_eval
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin)
    }),
    // relative quality gate: keep the top 75% of the corpus by type-token
    // ratio, threshold from a bounded score histogram (ties inclusive)
    "quality_gate" -> ((s, dir) =>
      Curation.qualityQuantileGate(Tables.documents(s, dir))),
    // context-window chunking: fixed 200-char windows at stride 150 (50
    // chars of overlap), the corpus → training-sequences step; map-only
    "chunk_docs" -> ((s, dir) => Curation.chunkDocs(Tables.documents(s, dir))),
    // the same screen with a broadcast-Bloom prune of the training-side
    // postings before the shuffle (the 100 TB shape); the exact join after
    // the prune removes Bloom false positives, so the output — and the
    // oracle — are identical to text_decontaminate
    "text_decontaminate_bloom" -> ((s, dir) =>
      Curation.decontaminateBloom(Tables.documents(s, dir))),
    // fuzzy decontamination: training docs whose 3-shingle Jaccard vs any
    // eval doc is >= 1/2 — MinHash band candidates keyed against the
    // benchmark-sized eval band table only, exact integer verify
    "text_decontaminate_fuzzy" -> ((s, dir) =>
      Curation.decontaminateFuzzy(Tables.documents(s, dir))),
    // the fuzzy screen's frozen-artifact form: eval band table + eval
    // shingle sets persisted once, the last-20% (non-eval) slice
    // screened as an arriving batch
    "text_decontaminate_fuzzy_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val (bands, shingles) = Curation.evalFuzzyArtifacts(docs)
      Curation.decontaminateFuzzyWith(bands, shingles,
        docs.filter(col("doc_id") >= cut &&
          Curation.sampleBucket(col("doc_id")) >= 1000))
    }),
    // the CONTINUOUS fuzzy screen over the same persisted artifacts —
    // stateless, so it shares the incremental oracle
    "text_decontaminate_fuzzy_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      withTempReplayRoot("graft_fuzzy_stream_") { root =>
        val (bands, shingles) = Curation.evalFuzzyArtifacts(docs)
        bands.write.parquet(s"$root/art/bands")
        shingles.write.parquet(s"$root/art/shingles")
        val in = root.resolve("in")
        java.nio.file.Files.createDirectories(in)
        val batch = docs.filter(col("doc_id") >= cut &&
            Curation.sampleBucket(col("doc_id")) >= 1000)
          .select(col("doc_id"), col("text"))
        (0 until 3).foreach { i =>
          StreamingSessions.appendReplayFile(
            batch.filter(pmod(col("doc_id"), lit(3)) === i), in, i)
        }
        graft.streaming.StreamingPack.fuzzyScreenStream(s,
          in.toString, s"$root/art", root.resolve("out").toString,
          root.resolve("ckpt").toString)
        graft.streaming.StreamingPack
          .readOutput(s, root.resolve("out").toString)
          .orderBy(col("doc_id"))
      }
    }),
    // frozen-artifact screen: the eval split's postings persisted once,
    // the last-20% (non-eval) slice screened as an arriving batch —
    // O(batch), eval side never re-shingled
    "text_decontaminate_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Curation.decontaminateWith(
        Curation.evalNgramArtifact(docs),
        docs.filter(col("doc_id") >= cut &&
          Curation.sampleBucket(col("doc_id")) >= 1000))
    }),
    // the CONTINUOUS screen: the same persisted eval postings, the batch
    // slice replayed as 3 micro-batches through the stateless loop —
    // must equal the incremental screen (same oracle)
    "text_decontaminate_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      withTempReplayRoot("graft_decon_stream_") { root =>
        Curation.evalNgramArtifact(docs)
          .write.parquet(s"$root/art/eval_ngrams")
        val in = root.resolve("in")
        java.nio.file.Files.createDirectories(in)
        val batch = docs.filter(col("doc_id") >= cut &&
            Curation.sampleBucket(col("doc_id")) >= 1000)
          .select(col("doc_id"), col("text"))
        (0 until 3).foreach { i =>
          StreamingSessions.appendReplayFile(
            batch.filter(pmod(col("doc_id"), lit(3)) === i), in, i)
        }
        graft.streaming.StreamingPack.decontaminationScreenStream(s,
          in.toString, s"$root/art", root.resolve("out").toString,
          root.resolve("ckpt").toString)
        graft.streaming.StreamingPack
          .readOutput(s, root.resolve("out").toString)
          .orderBy(col("doc_id"))
      }
    }),
    // DSIR-style importance resampling (Xie et al. 2023): hashed
    // unigram/bigram milli-integer probability-ratio weights vs the
    // lang=en target, keep the top quartile by mean weight (tie class in)
    "sample_importance" -> ((s, dir) =>
      Curation.importanceSample(Tables.documents(s, dir))),
    // the deployment shape: weights + threshold frozen on the first-80%
    // pool, the last-20% batch admitted per-doc against the artifacts
    "sample_importance_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Curation.importanceSampleIncremental(
        docs.filter(col("doc_id") < cut), docs.filter(col("doc_id") >= cut))
    }),
    // the CONTINUOUS form: the same frozen artifacts persisted to parquet,
    // the batch slice replayed as 3 micro-batches through the stateless
    // admission loop — must equal the incremental operator (same oracle)
    "sample_importance_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      withTempReplayRoot("graft_imp_stream_") { root =>
        val (wt, thr) = Curation.importanceArtifacts(
          docs.filter(col("doc_id") < cut))
        wt.write.parquet(s"$root/art/weights")
        thr.write.parquet(s"$root/art/thr")
        val in = root.resolve("in")
        java.nio.file.Files.createDirectories(in)
        val batch = docs.filter(col("doc_id") >= cut)
          .select(col("doc_id"), col("text"))
        (0 until 3).foreach { i =>
          StreamingSessions.appendReplayFile(
            batch.filter(pmod(col("doc_id"), lit(3)) === i), in, i)
        }
        graft.streaming.StreamingPack.importanceAdmissionStream(s,
          in.toString, s"$root/art", root.resolve("out").toString,
          root.resolve("ckpt").toString)
        graft.streaming.StreamingPack
          .readOutput(s, root.resolve("out").toString)
          .orderBy(col("doc_id"))
      }
    }),
    // Gopher-style repetition quality signals (top-2-gram share,
    // duplicate-3-gram share, exact integer basis points)
    "text_repetition" -> ((s, dir) => TextAnalysis.repetitionMetrics(Tables.documents(s, dir))),
    // PII detection + redaction over deterministically planted positives
    // (the corpus itself is PII-free word salad)
    "text_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(TextAnalysis.withSyntheticPii(Tables.documents(s, dir)))),
    // Dedup extensions
    "dedup_exact" -> ((s, dir) => Dedup.exactDedup(Tables.documents(s, dir))),
    "dedup_fingerprint" -> ((s, dir) => Dedup.fingerprintDedup(Tables.documents(s, dir))),
    "dedup_spans" -> ((s, dir) => Dedup.spanDedup(Tables.documents(s, dir))),
    "dedup_simhash_md5" -> ((s, dir) => NearDup.simhashNearDupsPortable(Tables.documents(s, dir))),
    // daily-run span dedup: batch = top 20% of ids against the 80% index;
    // the split scalar is a bounded collect, replicated in the oracle
    "dedup_spans_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val split = docs.agg(expr("(max(doc_id) * 4) div 5")).head().getLong(0)
      Dedup.spanDedupIncremental(
        docs.filter(col("doc_id") < split),
        docs.filter(col("doc_id") >= split))
    }),
    // Near-dup extensions: MinHash+LSH and the exact inverted-index
    // Jaccard both reproduce the brute-force oracle at Jaccard ≥ 0.5;
    // SimHash is Spark-hash-specific (no SQL oracle; ScalaTest-covered).
    "dedup_minhash_lsh" -> ((s, dir) => NearDup.minhashNearDups(Tables.documents(s, dir))),
    // SQL-text twins of the dedup family: registered views + the
    // graft_* extension functions as first-class SQL citizens, checked
    // against the SAME oracles as the Column-API pipelines
    "dedup_exact_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |SELECT md5(text) AS text_key, min(doc_id) AS canonical_id,
        |       count(1) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin)
    }),
    "dedup_minhash_lsh_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.TextHashOps.register(s)
      s.sql(s"""
        |WITH sh AS (
        |  SELECT doc_id, graft_shingles(text) AS shingles FROM documents
        |),
        |sh1 AS (SELECT * FROM sh WHERE size(shingles) >= 1),
        |b AS (
        |  SELECT doc_id, pos AS band_idx, col AS band_key
        |  FROM (SELECT doc_id, graft_minhash(shingles) AS sig FROM sh1)
        |  LATERAL VIEW posexplode(graft_bandkeys(sig)) t AS pos, col
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_i, y.doc_id AS doc_j
        |  FROM b x JOIN b y
        |    ON x.band_idx = y.band_idx AND x.band_key = y.band_key
        |   AND x.doc_id < y.doc_id
        |),
        |v AS (
        |  SELECT doc_i, doc_j,
        |    cast(size(array_intersect(si.shingles, sj.shingles)) AS bigint) AS inter,
        |    cast(size(si.shingles) AS bigint)
        |      + cast(size(sj.shingles) AS bigint) AS sz
        |  FROM cand
        |  JOIN sh1 si ON cand.doc_i = si.doc_id
        |  JOIN sh1 sj ON cand.doc_j = sj.doc_id
        |)
        |SELECT doc_i, doc_j,
        |  (inter * 20000 + (sz - inter)) div (2 * (sz - inter)) AS jac_bp
        |FROM v WHERE inter * 2 >= sz - inter
        |ORDER BY doc_i, doc_j""".stripMargin)
    }),
    "dedup_ngram_jaccard" -> ((s, dir) => NearDup.jaccardNearDupsExact(Tables.documents(s, dir))),
    // doc-in-doc: asymmetric containment over the same posting lists
    "dedup_containment" -> ((s, dir) => NearDup.containmentNearDups(Tables.documents(s, dir))),
    // character-level verifier: head/tail-anchored candidates + exact
    // relative Levenshtein (the OCR/boilerplate-variant detector)
    "dedup_edit_distance" -> ((s, dir) => NearDup.editDistanceNearDups(Tables.documents(s, dir))),
    // default SimHash query runs the engine-portable md5 kernel at a
    // TIGHTER radius (hamming <= 2, still pigeonhole-exact with 4 chunks)
    // so it is fully DuckDB-oracled; the xxhash64 kernel stays the
    // spec-pinned perf twin (NearDupSpec pins its bit-level parity)
    "dedup_simhash" -> ((s, dir) =>
      NearDup.simhashNearDupsPortable(Tables.documents(s, dir), maxHamming = 2)),
    "dedup_clusters" -> ((s, dir) => NearDup.nearDupClusters(Tables.documents(s, dir))),
    // quality-aware canonicalization: per near-dup cluster keep the member
    // with the most tokens (ties → lowest id), not the arbitrary min id
    "dedup_keep_best" -> ((s, dir) => NearDup.keepBestNearDups(Tables.documents(s, dir))),
    // incremental (daily-run) dedup: the first 80% of ids play the
    // persisted canonical index, the rest arrive as the new batch;
    // admission must equal whole-corpus clustering restricted to the batch
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      NearDup.incrementalNearDups(
        docs.filter(col("doc_id") < cut), docs.filter(col("doc_id") >= cut))
    }),
    // same split through the ARTIFACT-TABLE path: the index side is the
    // three tables a previous run persists (shingles, signatures, labels),
    // never re-read text — must land on the identical whole-corpus answer
    "dedup_incremental_indexed" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val index = docs.filter(col("doc_id") < cut)
      val idxSh = NearDup.shingled(index).persist()
      try NearDup.incrementalNearDupsIndexed(
        idxSh, NearDup.minhashSignatures(idxSh),
        NearDup.nearDupClusters(index),
        docs.filter(col("doc_id") >= cut))._1
      finally idxSh.unpersist()
    }),
    // incremental exact admission: same 80/20 split, key-table join shape
    "dedup_incremental_exact" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Dedup.incrementalExact(
        docs.filter(col("doc_id") < cut), docs.filter(col("doc_id") >= cut))
    }),
    // Curation extensions: deterministic sampling, corpus rollup, and the
    // quality -> exact-dedup -> near-dup-canonicalization funnel
    "sample_docs" -> ((s, dir) => Curation.deterministicSample(Tables.documents(s, dir), 2000)),
    // partitioned corpus writer: lang-partitioned parquet + read-back
    // manifest — the write path is part of what the oracle pins
    "corpus_manifest" -> ((s, dir) => {
      // per-run temp dir (process-isolated, not a world-shared fixed
      // path), deleted after the manifest is materialized — the
      // localCheckpoint makes the returned frame self-contained
      val root = java.nio.file.Files.createTempDirectory("graft_corpus_")
      try graft.sinks.CorpusSink.writePartitioned(Tables.documents(s, dir),
        root.resolve("docs").toString).localCheckpoint()
      finally graft.streaming.StreamingSessions.deleteRecursively(root)
    }),
    "corpus_stats" -> ((s, dir) => Curation.corpusStats(Tables.documents(s, dir))),
    // token-budget shard packing (distributed prefix sum; 2048-token shards)
    "pack_shards" -> ((s, dir) => Curation.packShards(Tables.documents(s, dir), 2048L)),
    // sequence packing: 128-token training sequences, docs split across
    // boundaries; one (seq, doc) span row per overlap
    "pack_sequences" -> ((s, dir) => Curation.packSequences(Tables.documents(s, dir), 128L)),
    // incremental twin: state over the first 4/5 of ids, batch = the rest;
    // must land spans exactly where the whole-corpus pack would
    "pack_sequences_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Curation.packSequencesWith(
        Curation.packState(docs.filter(col("doc_id") < cut)),
        docs.filter(col("doc_id") >= cut), 128L)
    }),
    // epoch shuffle: 2 epochs of the 128-token sequences into 8 shards
    "shuffle_epochs" -> ((s, dir) =>
      Curation.shuffleEpochs(Tables.documents(s, dir), 128L, 2, 8)),
    "pipeline_clean_corpus" -> ((s, dir) => Curation.cleanCorpus(Tables.documents(s, dir), 30L)),
    // the release-gate composition: non-eval docs clearing BOTH surface
    // leak screens (exact 8-gram + fuzzy 3-shingle Jaccard)
    "pipeline_decontaminated" -> ((s, dir) =>
      Curation.decontaminatedCorpus(Tables.documents(s, dir))),
    // Embedding similarity: exact near-dup pairs + exact top-k (oracle),
    // LSH-bucketed approximate top-k (scale path; no oracle).
    "dedup_embedding" -> ((s, dir) => Similarity.cosineNearDupPairs(Tables.embeddings(s, dir), 0.4)),
    // SQL-text twin of the exact cosine pair join: graft_dot as a
    // first-class SQL citizen, same block-grid distribution (the grid is
    // built by explode(sequence), not a cross join), same oracle
    "dedup_embedding_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.ArrayOps.register(s)
      s.sql("""
        |WITH p AS (
        |  SELECT vec_id, ve, sqrt(graft_dot(ve, ve)) AS nrm,
        |         pmod(vec_id, 8) AS blk
        |  FROM (SELECT vec_id, cast(embedding AS array<double>) AS ve
        |        FROM embeddings)
        |),
        |g AS (
        |  SELECT bi, explode(sequence(bi, 7)) AS bj
        |  FROM (SELECT explode(sequence(0, 7)) AS bi)
        |)
        |SELECT least(a.vec_id, b.vec_id) AS vec_i,
        |       greatest(a.vec_id, b.vec_id) AS vec_j
        |FROM p a JOIN g ON a.blk = g.bi
        |JOIN p b ON b.blk = g.bj
        |        AND (a.blk <> b.blk OR a.vec_id < b.vec_id)
        |WHERE graft_dot(a.ve, b.ve) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY vec_i, vec_j""".stripMargin)
    }),
    "dedup_embedding_lsh" -> ((s, dir) => Similarity.cosineNearDupPairsLsh(Tables.embeddings(s, dir), 0.4)),
    // embedding-space decontamination: training vectors with cosine >= 0.4
    // against any eval vector (md5-bucket 10% split), exact cross-set
    // block-grid screen — the leak class no n-gram screen can see
    "decontaminate_semantic" -> ((s, dir) =>
      Similarity.decontaminateSemantic(Tables.embeddings(s, dir))),
    // the 100 TB shape: train-side bucket/hamming-1 probes equi-joined
    // against the eval bucket table, exact cosine verify — candidates
    // bounded by eval collisions, never corpus x eval dot products
    "decontaminate_semantic_lsh" -> ((s, dir) =>
      Similarity.decontaminateSemanticLsh(Tables.embeddings(s, dir))),
    // the frozen-artifact form: the eval split's bucket table + vectors
    // persisted once, the last-20% (non-eval) slice probed as a batch
    "decontaminate_semantic_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cut = emb.agg(expr("(max(vec_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val evalSide = emb.filter(
        graft.operators.Curation.sampleBucket(col("vec_id")) < 1000)
      Similarity.decontaminateSemanticWith(
        evalSide, Similarity.bucketTable(evalSide),
        emb.filter(col("vec_id") >= cut &&
          graft.operators.Curation.sampleBucket(col("vec_id")) >= 1000))
    }),
    // the CONTINUOUS semantic screen over the same persisted artifacts —
    // stateless, so it shares the incremental oracle
    "decontaminate_semantic_stream" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cut = emb.agg(expr("(max(vec_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      withTempReplayRoot("graft_sem_stream_") { root =>
        val evalSide = emb.filter(
          graft.operators.Curation.sampleBucket(col("vec_id")) < 1000)
        evalSide.write.parquet(s"$root/art/eval_emb")
        Similarity.bucketTable(evalSide).write.parquet(s"$root/art/buckets")
        val in = root.resolve("in")
        java.nio.file.Files.createDirectories(in)
        val batch = emb.filter(col("vec_id") >= cut &&
          graft.operators.Curation.sampleBucket(col("vec_id")) >= 1000)
        (0 until 3).foreach { i =>
          StreamingSessions.appendReplayFile(
            batch.filter(pmod(col("vec_id"), lit(3)) === i), in, i)
        }
        graft.streaming.StreamingPack.semanticScreenStream(s,
          in.toString, s"$root/art", root.resolve("out").toString,
          root.resolve("ckpt").toString)
        graft.streaming.StreamingPack
          .readOutput(s, root.resolve("out").toString)
          .orderBy(col("vec_id"))
      }
    }),
    // SemDeDup-style admission: components over the LSH-verified pair
    // graph, keep the minimum vec_id per component
    "dedup_semantic" -> ((s, dir) => Similarity.semanticDedup(Tables.embeddings(s, dir), 0.4)),
    // incremental semantic admission: first 80% of vec_ids play the
    // persisted index (bucket table + sparse labels from previous runs),
    // the rest arrive as the new batch; must equal whole-corpus semantic
    // dedup restricted to the batch (incl. bridge merges)
    "dedup_semantic_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cut = emb.agg(expr("(max(vec_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val index = emb.filter(col("vec_id") < cut)
      // the index-side artifacts (bucket table + one-shot label store)
      // are the operator's FROZEN inputs — in production they are parquet
      // reads, so materialize them once (localCheckpoint) before the
      // operator under test consumes them. Left lazy, the whole one-shot
      // semanticDedup re-ran inside every downstream consumption and the
      // bench entry measured fixture construction, not the incremental
      // path (r13 prescription #4).
      Similarity.semanticDedupIncremental(
        index, Similarity.bucketTable(index).localCheckpoint(),
        Similarity.semanticDedup(index, 0.4)
          .filter(!col("kept")).select(col("vec_id"), col("cluster_id"))
          .localCheckpoint(),
        emb.filter(col("vec_id") >= cut), 0.4)._1
    }),
    // spherical k-means clustering; the oracle re-runs the ENTIRE Lloyd
    // loop (md5 seed + 3 fixed-point iterations) as unrolled DuckDB CTEs
    "cluster_embeddings" -> ((s, dir) => Similarity.clusterEmbeddings(Tables.embeddings(s, dir))),
    // cluster-balanced diversity sampling: up to 8 vectors per k-means
    // cell in content-free (md5-bucket, vec_id) order — training,
    // assignment, and the pick all replayed in the oracle
    "sample_cluster_balanced" -> ((s, dir) =>
      Similarity.clusterBalancedSample(Tables.embeddings(s, dir))),
    // incremental cluster-balanced admission: centroids + per-cell quota
    // keys frozen from the 4/5 prefix, the 1/5 batch admitted through the
    // merged top-perCell pick — exactly the whole-corpus pick restricted
    // to the batch, at O(batch) cost
    "sample_cluster_balanced_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cut = emb.agg(expr("(max(vec_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Similarity.clusterBalancedSampleIncremental(
        emb.filter(col("vec_id") < cut), emb.filter(col("vec_id") >= cut))
    }),
    // the CONTINUOUS form over persisted centroid + quota artifacts: the
    // tail arrives as three id-ordered micro-batches, state = the evolving
    // ≤cells×perCell quota table; each batch's admissions equal the
    // whole-so-far pick restricted to that batch
    "sample_cluster_balanced_stream" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val mx = emb.agg(max(col("vec_id"))).head().getLong(0)
      val cut = mx * 4 / 5
      val e1 = cut + (mx - cut) / 3
      val e2 = cut + 2 * (mx - cut) / 3
      withTempReplayRoot("graft_cbal_stream_") { root =>
        val idx = emb.filter(col("vec_id") < cut)
        // train once: the quota seed derives from the SAME artifact
        // centroids (admit-everything pick), not a second k-means run
        val cents = Similarity.clusterArtifacts(idx)
        cents.write.parquet(s"$root/art/centroids")
        Similarity.clusterQuotaAfter(cents, Similarity.emptyQuota(emb), idx)
          .withColumn("max_vec_id", lit(cut - 1))
          .write.parquet(s"$root/art/quota")
        val in = root.resolve("in")
        java.nio.file.Files.createDirectories(in)
        Seq((cut, e1), (e1, e2), (e2, mx + 1)).zipWithIndex.foreach {
          case ((lo, hi), i) =>
            StreamingSessions.appendReplayFile(
              emb.filter(col("vec_id") >= lo && col("vec_id") < hi), in, i)
        }
        graft.streaming.StreamingPack.clusterAdmissionStream(s, in.toString,
          s"$root/art", s"$root/state", root.resolve("out").toString,
          root.resolve("ckpt").toString)
        graft.streaming.StreamingPack
          .readOutput(s, root.resolve("out").toString)
          .orderBy(col("vec_id"))
      }
    }),
    // incremental assignment: freeze centroid artifacts on the 4/5
    // vec_id prefix, assign the 1/5 tail O(batch) — keeps semantic
    // shards stable as the corpus grows
    "cluster_assign_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cut = emb.agg(expr("(max(vec_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val cents = Similarity.clusterArtifacts(emb.filter(col("vec_id") < cut))
      Similarity.assignWith(cents, emb.filter(col("vec_id") >= cut))
    }),
    // artifact-refresh drift gate: occupancy TV + coarse-fit drop of a
    // batch under the FROZEN centroid artifact, with a planted-drift
    // scenario (every component +0.25) that must flip retrain_needed and
    // an unshifted control that must not
    "ann_artifact_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cut = emb.agg(expr("(max(vec_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val idx = emb.filter(col("vec_id") < cut)
      val tail = emb.filter(col("vec_id") >= cut)
      val drifted = tail.withColumn("embedding",
        transform(col("embedding").cast("array<double>"), x => x + lit(0.25)))
      val cents = Similarity.clusterArtifacts(idx).localCheckpoint()
      Similarity.annArtifactDrift(cents, idx, tail)
        .select(lit("none").as("scenario"), col("*"))
        .unionAll(Similarity.annArtifactDrift(cents, idx, drifted)
          .select(lit("planted").as("scenario"), col("*")))
        .orderBy(col("scenario"))
    }),
    "ann_topk_brute" -> ((s, dir) => Similarity.bruteForceTopK(Tables.embeddings(s, dir), 20, 10)),
    "ann_topk_lsh" -> ((s, dir) => Similarity.lshTopK(Tables.embeddings(s, dir), 20, 10)),
    "ann_topk_ivf" -> ((s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir), 20, 10)),
    // product quantization: brute force over 128x-compressed codes — the
    // memory-bounded ANN path; training/encode/ADC all oracle-replayed
    "ann_topk_pq" -> ((s, dir) => Similarity.pqTopK(Tables.embeddings(s, dir), 20, 10)),
    // frozen-codebook encode of the arriving 1/5 batch: map-only, no
    // training rescan — the artifact-incremental daily-run path for PQ
    "ann_pq_encode_inc" -> ((s, dir) =>
      Similarity.pqEncodeIncremental(Tables.embeddings(s, dir))),
    // the production composition: IVF cell pruning + PQ code scoring —
    // a cell equi-join, no raw vectors in the search path
    "ann_topk_ivfpq" -> ((s, dir) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, dir), 20, 10)),
    // residual encoding: PQ codes describe x̂ − ĉ_cell, scores add the
    // coarse term back — better codebook utilization at the same 2 bytes
    "ann_topk_ivfpq_res" -> ((s, dir) =>
      Similarity.ivfPqResTopK(Tables.embeddings(s, dir), 20, 10)),
    // the production composition's daily-run path: frozen quantizer +
    // frozen offsets + frozen residual codebooks, batch encoded map-only
    "ann_ivfpq_encode_inc" -> ((s, dir) =>
      Similarity.ivfPqResEncodeIncremental(Tables.embeddings(s, dir))),
    // two-stage retrieval: residual IVF-PQ top-m candidates re-ranked by
    // EXACT cosine on the raw vectors (the FAISS refine stage) —
    // candidate-bounded exact reads via a broadcast equi-join
    "ann_topk_ivfpq_refine" -> ((s, dir) =>
      Similarity.ivfPqResRefineTopK(Tables.embeddings(s, dir), 20, 10)),
    // the refine stage sized by the autoM policy (candidate fraction held
    // constant as the corpus grows); at every fixture SF the auto answer
    // IS the pinned 4k floor, so it shares the refine oracle verbatim
    "ann_topk_refine_auto" -> ((s, dir) =>
      Similarity.ivfPqResRefineAutoTopK(Tables.embeddings(s, dir), 20, 10)),
    // scalar quantization: 8 bits per DIMENSION (64 B/vec, 8× cut) — the
    // high-recall compression point between brute (512 B, exact) and PQ
    // (2 B, coarse); the r12 10M audit showed PQ's fixed code error
    // overwhelming tight top-rank margins — SQ8 is the deployment answer
    "ann_topk_sq8" -> ((s, dir) =>
      Similarity.sqTopK(Tables.embeddings(s, dir), 20, 10)),
    // the regime decision artifact: autoCells sizing + mean-fit readout
    // (integer bp) + the clustered/uniform verdict — the r13 audit rule
    // as a one-row relation, training replayed by the oracle
    "ann_regime_probe" -> ((s, dir) =>
      Similarity.annRegimeProbe(Tables.embeddings(s, dir))),
    // the router itself: probe then run the regime's winning method.
    // The fixture corpus measures uniform (fit_bp ~3.3k at sf0.01, well
    // under the 7000 line), so the routed result IS the SQ8 full scan
    // and shares its oracle — the probe query above pins the route
    "ann_topk_adaptive" -> ((s, dir) =>
      Similarity.adaptiveAnnTopK(Tables.embeddings(s, dir), 20, 10)),
    // IVF cell pruning + SQ8 code scoring (the FAISS "IVF…,SQ8" shape):
    // codes-only search path on the probed cells' members
    // per-cell SQ8 bounds: the quantization step sized to each cell's
    // LOCAL range — the r13 clustered-audit answer (global bounds lose
    // within-cluster margins; cell bounds shrink the step by the
    // cluster-radius factor and degenerate to global on uniform data)
    "ann_topk_ivfsq_cell" -> ((s, dir) =>
      Similarity.ivfSqCellTopK(Tables.embeddings(s, dir), 20, 10)),
    "ann_topk_ivfsq" -> ((s, dir) =>
      Similarity.ivfSqTopK(Tables.embeddings(s, dir), 20, 10)),
    // the persisted per-cell training artifact itself (cell, dim, mn, mx)
    // — clusterArtifacts' companion table; both engines derive the exact
    // doubles (min/max are order-free)
    "ann_sqcell_artifacts" -> ((s, dir) =>
      Similarity.sqCellArtifacts(Tables.embeddings(s, dir))
        .orderBy(col("cell"), col("pos"))),
    // frozen-artifact incremental encode for the per-cell quantizer:
    // frozen coarse centroids + frozen per-(cell,dim) bounds over the
    // stored 4/5, the arriving 1/5 cell-assigned and quantized map-only
    "ann_ivfsq_cell_encode_inc" -> ((s, dir) =>
      Similarity.ivfSqCellEncodeIncremental(Tables.embeddings(s, dir))),
    // bounds-staleness gate for the per-cell artifact: same planted
    // dimension-collapse scenario as ann_sq_bounds_drift, readout under
    // the frozen centroids + cell bounds (unassignable-cell rows count
    // fully saturated); alarm replayed in integer math by the oracle
    "ann_sqcell_bounds_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cut = emb.agg(expr("(max(vec_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val idx = emb.filter(col("vec_id") < cut)
      val tail = emb.filter(col("vec_id") >= cut)
      val drifted = tail.withColumn("embedding",
        concat(slice(col("embedding").cast("array<double>"), 1, 24),
          typedlit(Seq.fill(40)(0.0))))
      Similarity.sqCellBoundsDrift(idx, tail)
        .select(lit("none").as("scenario"), col("*"))
        .unionAll(Similarity.sqCellBoundsDrift(idx, drifted)
          .select(lit("planted").as("scenario"), col("*")))
        .orderBy(col("scenario"))
    }),
    // frozen-bounds incremental SQ8 encode of the arriving 1/5 batch:
    // one map-only pass, out-of-range values clamp by construction
    "ann_sq_encode_inc" -> ((s, dir) =>
      Similarity.sqEncodeIncremental(Tables.embeddings(s, dir))),
    // bounds-staleness gate for the frozen SQ8 artifact: clamp-saturation
    // per-mille of the batch vs the index baseline. The planted range
    // drift is DIMENSION COLLAPSE (keep the first 24 components, zero
    // the rest — an upstream embedding-model change): the surviving
    // dims' normalized values concentrate far past the trained bounds
    // and must flip retrain_needed; the unshifted control must not.
    // Note a global shift/scale would NOT trip this gate — it vanishes
    // under normalization, which is exactly why the gate watches
    // saturation, not means. The alarm itself is replayed by the oracle
    // (integer counts, integer division).
    "ann_sq_bounds_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cut = emb.agg(expr("(max(vec_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val idx = emb.filter(col("vec_id") < cut)
      val tail = emb.filter(col("vec_id") >= cut)
      val drifted = tail.withColumn("embedding",
        concat(slice(col("embedding").cast("array<double>"), 1, 24),
          typedlit(Seq.fill(40)(0.0))))
      Similarity.sqBoundsDrift(idx, tail)
        .select(lit("none").as("scenario"), col("*"))
        .unionAll(Similarity.sqBoundsDrift(idx, drifted)
          .select(lit("planted").as("scenario"), col("*")))
        .orderBy(col("scenario"))
    }),
    // the STREAMED index maintainer: the code table is the persisted
    // versioned artifact, each micro-batch appends its frozen-bounds
    // encodes (crash-recoverable like the CM/MG/q-digest folds); the
    // final table must equal the one-shot incremental encode
    "ann_sq_encode_stream" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft_sq_persist_")
      graft.streaming.StreamingSketches.replaySqEncodePersisted(
        Tables.embeddings(s, dir), root)
    }),
    "ann_recall_floor" -> ((s, dir) =>
      Similarity.annRecallReport(Tables.embeddings(s, dir), 20, 10,
        ivfFloor = 140L, lshFloor = 25L)),
    // Multimodal extensions: binary media column + typed metadata; decode
    // is a deterministic stub (no codecs in env), plumbing is real.
    "multimodal_meta" -> ((s, dir) => Multimodal.mediaMeta(Tables.documents(s, dir))),
    "multimodal_frames" -> ((s, dir) => Multimodal.sampleFrames(Tables.documents(s, dir))),
    "multimodal_features" -> ((s, dir) => Multimodal.extractFeatures(Tables.documents(s, dir))),
    "multimodal_resize" -> ((s, dir) => Multimodal.resize(Tables.documents(s, dir))),
    // perceptual hash over real decoded pixels; banded Hamming near-dup
    "multimodal_phash" -> ((s, dir) => Multimodal.imageHashes(Tables.documents(s, dir))),
    "multimodal_image_dups" -> ((s, dir) => Multimodal.imageNearDups(Tables.documents(s, dir))),
    // real RIFF/WAVE PCM decode + integer signal statistics / frame energy
    "multimodal_audio" -> ((s, dir) => Multimodal.audioFeatures(Tables.documents(s, dir))),
    "multimodal_audio_frames" -> ((s, dir) => Multimodal.audioFrames(Tables.documents(s, dir))),
    // energy-contour acoustic fingerprint; banded Hamming near-dup
    "multimodal_audio_fp" -> ((s, dir) => Multimodal.audioFingerprints(Tables.documents(s, dir))),
    "multimodal_audio_dups" -> ((s, dir) => Multimodal.audioNearDups(Tables.documents(s, dir))),
    // the 64-bit contour scale path: 16-bit bands (65 536 buckets), the
    // image search's constants — production audio dedup's shape
    "multimodal_audio_fp64" -> ((s, dir) => Multimodal.audioFingerprints64(Tables.documents(s, dir))),
    "multimodal_audio_dups64" -> ((s, dir) => Multimodal.audioNearDups64(Tables.documents(s, dir))),
    // real YUV4MPEG2 decode + pixel-domain scene-cut detection
    "multimodal_video_frames" -> ((s, dir) => Multimodal.videoFrameStats(Tables.documents(s, dir))),
    "multimodal_video_scenes" -> ((s, dir) => Multimodal.videoScenes(Tables.documents(s, dir))),
    // temporal luma-contour video fingerprint; banded Hamming near-dup
    "multimodal_video_fp" -> ((s, dir) => Multimodal.videoFingerprints(Tables.documents(s, dir))),
    "multimodal_video_dups" -> ((s, dir) => Multimodal.videoNearDups(Tables.documents(s, dir))),
    // incremental perceptual admission: batch fingerprints vs the
    // persisted fingerprint artifact (80/20 split), media never re-read
    "multimodal_image_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Multimodal.fingerprintAdmission(
        Multimodal.imageHashes(docs.filter(col("doc_id") < cut)),
        Multimodal.imageHashes(docs.filter(col("doc_id") >= cut)),
        "phash", 16)
    }),
    "multimodal_audio_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Multimodal.fingerprintAdmission(
        Multimodal.audioFingerprints(docs.filter(col("doc_id") < cut)),
        Multimodal.audioFingerprints(docs.filter(col("doc_id") >= cut)),
        "afp", 8)
    }),
    "multimodal_video_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Multimodal.fingerprintAdmission(
        Multimodal.videoFingerprints(docs.filter(col("doc_id") < cut)),
        Multimodal.videoFingerprints(docs.filter(col("doc_id") >= cut)),
        "vfp", 8)
    }),
    // cross-modal curation gate: per-doc duplicate flags across text /
    // image / audio / video and the conjunction a packer would consume
    "pipeline_multimodal" -> ((s, dir) =>
      Multimodal.cleanMultimodalCorpus(Tables.documents(s, dir))),
  )

  // ------------------------------------------------------------ oracle SQL

  /** Gap-and-islands sessionization oracle (SURVEY.md §5.2): new session
    * when the microsecond diff to the previous event is STRICTLY greater
    * than the gap. Pinned by SessionsSpec: Spark's `session_window` merges
    * events exactly `gap` apart (closed interval, same as Flink's
    * `gap <= g` merge rule). `gsecSql` is a SQL expression (over
    * `user_id`) yielding the gap in whole seconds.
    */
  /** The shared gap-and-islands aggregation CTE chain (→ `agg`). */
  private def sessionAggCte(gsecSql: String, tsSql: String = "ts"): String = s"""
      |WITH e AS (
      |  SELECT user_id, ($tsSql) AS ts, value, CAST(($gsecSql) AS BIGINT) AS gsec
      |  FROM events WHERE user_id IS NOT NULL AND ($tsSql) IS NOT NULL
      |), flagged AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |       OR date_diff('microsecond', lag(ts) OVER w, ts) > gsec * 1000000
      |     THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged
      |), agg AS (
      |  SELECT user_id,
      |     min(ts) AS session_start,
      |     max(ts) + to_microseconds(CAST(max(gsec) * 1000000 AS BIGINT)) AS session_end,
      |     count(*) AS event_count,
      |     -- per-event integer cents summed as BIGINT: order-independent,
      |     -- mirrors Spark's sum(cast(round(value*100) as bigint))
      |     CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS session_sum,
      |     floor(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / count(*) + 0.5) / 100.0 AS session_avg
      |  FROM sess GROUP BY user_id, sid
      |)""".stripMargin

  private def sessionOracle(gsecSql: String, having: String = "",
                            keepFirst: Boolean = false,
                            tsSql: String = "ts"): String = {
    val agg = sessionAggCte(gsecSql, tsSql)
    if (!keepFirst)
      s"""$agg
         |SELECT user_id, session_start, session_end, event_count,
         |       session_sum, session_avg
         |FROM agg $having
         |ORDER BY user_id, session_start""".stripMargin
    else
      s"""$agg, ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |              ORDER BY session_start, session_end) AS rn
         |  FROM agg $having
         |)
         |SELECT user_id, session_start, session_end, event_count,
         |       session_sum, session_avg
         |FROM ranked WHERE rn = 1
         |ORDER BY user_id""".stripMargin
  }

  /** Alert-SET oracle: the distinct users with any session ≥ threshold —
    * the order-insensitive contract of the streaming alert replay.
    */
  private def alertSetOracle(gsecSql: String, threshold: String): String =
    s"""${sessionAggCte(gsecSql)}
       |SELECT DISTINCT user_id FROM agg WHERE session_sum >= $threshold
       |ORDER BY user_id""".stripMargin

  private val refGapSql =
    """CASE WHEN user_id = 9999 THEN 300
      |     WHEN user_id BETWEEN 2 AND 9 THEN 120
      |     WHEN user_id BETWEEN 100 AND 200 THEN 60
      |     ELSE 30 END""".stripMargin

  private val scaledGapSql =
    """CASE WHEN user_id = 9999 THEN 43200
      |     WHEN user_id BETWEEN 2 AND 9 THEN 28800
      |     WHEN user_id BETWEEN 100 AND 200 THEN 14400
      |     ELSE 7200 END""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "t1_sessions_30s" -> sessionOracle("30"),
    "t1_sessions_2h" -> sessionOracle("7200"),
    "t1_sessions_skewed" -> sessionOracle("30"),
    "t1_sessions_adaptive" -> sessionOracle("30"),
    "t2_big_customers" -> sessionOracle("7200",
      having = "WHERE session_sum >= 300.0", keepFirst = true),
    "t3_dynamic_gap_ref" -> sessionOracle(refGapSql),
    "t3_dynamic_gap_scaled" -> sessionOracle(scaledGapSql),
    // salted dynamic == plain dynamic: the oracle IS the dynamic
    // gap-and-islands aggregation
    "t3_dynamic_skewed" -> sessionOracle(scaledGapSql),
    "t1_sessions_ingest" -> sessionOracle("30",
      tsSql = "make_timestamp(event_id * 10000)"),
    "t1_sessions_outoforder" -> sessionOracle("30"),
    "t1_sessions_skewed_stream" -> sessionOracle("30"),
    "t1_sessions_timer" -> sessionOracle("30"),
    "t3_dynamic_timer" -> sessionOracle(refGapSql),
    "t3_dynamic_outoforder" -> sessionOracle(refGapSql),
    "t2_alert_outoforder" -> alertSetOracle("7200", "300.0"),
    "t1_sessions_sql" -> sessionOracle("30"),
    "t3_dynamic_sql" -> sessionOracle(refGapSql),
    "t2_big_customers_sql" -> sessionOracle("7200",
      having = "WHERE session_sum >= 300.0", keepFirst = true),
    // salted == plain: the oracle IS the unsalted aggregation
    "q_salted_user_totals" -> userTotalsOracle,
    // adaptive == plain on BOTH branches (salted is plain-identical and
    // the plain branch is literally the plain plan)
    "q_adaptive_user_totals" -> userTotalsOracle,
    // Roundtrip parity: parse(render(events)) == events (malformed dropped)
    "csv_roundtrip_events" ->
      """SELECT ts, user_id, event_id AS transaction_id, value AS payload_value
        |FROM events
        |WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  AND event_id IS NOT NULL AND value IS NOT NULL
        |ORDER BY transaction_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(l_quantity), 0) AS BIGINT) AS sum_qty,
        |  round(sum(l_extendedprice) * 100, 0) / 100.0 AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)) * 100, 0) / 100.0 AS sum_disc_price,
        |  floor(round(sum(l_extendedprice) * 100, 0) / count(*) + 0.5) / 100.0 AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_top_revenue" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)) * 100, 0) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_top3_parts_per_brand" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice, rnk FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |                       ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |  FROM part) t
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q_parts_page2" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey
        |LIMIT 10 OFFSET 10""".stripMargin,
    "q_rollup_acctbal" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name,
        |  count(*) AS n_customers,
        |  round(sum(c_acctbal) * 100, 0) / 100.0 AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "q_anti_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_urgent_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_asof_latest_order" ->
      """WITH o1 AS (
        |  SELECT o_custkey AS k, o_orderdate AS t,
        |    max(o_orderkey) AS asof_orderkey,
        |    max_by(o_totalprice, o_orderkey) AS asof_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT event_id, user_id, ts, asof_orderkey, asof_totalprice
        |FROM events ASOF LEFT JOIN o1
        |  ON events.user_id = o1.k AND events.ts >= o1.t
        |ORDER BY event_id""".stripMargin,
    "q_daily_activity" ->
      """SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
        |  round(sum(value) * 100, 0) / 100.0 AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sliding_activity" ->
      """-- every event belongs to the 4 epoch-aligned 6h-slide windows
        |-- whose 1-day span covers it: starts (floor(epoch/6h) - i) * 6h
        |WITH x AS (
        |  SELECT value,
        |    make_timestamp(((epoch_us(ts) // 21600000000) - i) * 21600000000) AS w_start
        |  FROM events, unnest(range(0, 4)) AS t(i))
        |SELECT w_start, count(*) AS n_events,
        |  round(sum(value) * 100, 0) / 100.0 AS sum_value
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    // streaming replay must land on the batch answer: same oracle
    "q_sliding_outoforder" ->
      """WITH x AS (
        |  SELECT value,
        |    make_timestamp(((epoch_us(ts) // 21600000000) - i) * 21600000000) AS w_start
        |  FROM events, unnest(range(0, 4)) AS t(i))
        |SELECT w_start, count(*) AS n_events,
        |  round(sum(value) * 100, 0) / 100.0 AS sum_value
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tumbling_by_type_outoforder" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
        |  count(*) AS n_events,
        |  round(sum(value) * 100, 0) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_range_join_errors" -> rangeJoinOracle,
    // the streaming replay must land on the identical pair set
    "q_range_join_stream" -> rangeJoinOracle,
    // batch twin of the stream-static enrichment rollup (inner join
    // drops dimension-less users; epoch-aligned 1-day windows ≡
    // date_trunc under UTC)
    "q_enrich_segment_stream" ->
      """SELECT date_trunc('day', e.ts) AS day, c.c_mktsegment AS segment,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
        |    / 100.0 AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // greedy chained funnel: each stage anchors on the earliest qualifying
    // event, so the whole funnel is a join chain (no sequence scan)
    "q_window_funnel" -> windowFunnelSql,
    "q_window_funnel_sql" -> windowFunnelSql,
    // 48 h step window so the fixture actually exercises depths 2 and 3
    // (median per-user gap ~7.4 h; the 30 min default leaves depth 1 only)
    "q_funnel_ordered_stream" -> windowFunnelSqlAt(172800),
    "q_cube_orders" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
        |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice) * 100, 0) / 100.0 AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderpriority)
        |ORDER BY mktsegment, orderpriority""".stripMargin,
    // wide-format pivot: declared-domain count matrix, FILTER replica
    "q_pivot_status_priority" ->
      """SELECT o_orderstatus AS orderstatus,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p1_urgent,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p2_high,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3_medium,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4_not_specified,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p5_low
        |FROM orders GROUP BY o_orderstatus ORDER BY orderstatus""".stripMargin,
    "q_value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5) * 100, 0) / 100.0 AS p50,
        |  round(quantile_cont(value, 0.9) * 100, 0) / 100.0 AS p90,
        |  round(quantile_cont(value, 0.99) * 100, 0) / 100.0 AS p99,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_user_running_total" ->
      """SELECT event_id, user_id, ts,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0 AS running_value,
        |  date_diff('microsecond',
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q_weekday_hour_profile" -> weekdayHourOracle,
    "q_weekday_hour_sql" -> weekdayHourOracle,
    // DuckDB // truncates toward zero on integers, same as Spark div
    "q_monthly_growth" -> monthlyGrowthOracle,
    "q_monthly_growth_sql" -> monthlyGrowthOracle,
    // the PLAIN join formulation — salting must not change results
    "q_salted_enrich_join" ->
      """SELECT c.c_mktsegment AS segment,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
        |    / 100.0 AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.user_id IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // complete day × type grid via generate_series, zero-filled holes
    "q_timeseries_gapfill" -> gapfillOracle,
    // the SQL-text twin lands on the identical grid
    "q_gapfill_sql" -> gapfillOracle,
    "q_markov_transitions" -> markovOracle,
    "q_markov_sql" -> markovOracle,
    "q_inter_event_gaps" -> interEventGapsOracle,
    "q_inter_gaps_sql" -> interEventGapsOracle,
    "q_funnel_time" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |f AS (SELECT user_id, ts, event_type,
        |        min(CASE WHEN event_type = 'view' THEN ts END)
        |          OVER (PARTITION BY user_id) AS first_touch
        |      FROM e)
        |SELECT user_id, first_touch, min(ts) AS converted_at,
        |  CAST(date_diff('microsecond', first_touch, min(ts)) // 1000000 AS BIGINT)
        |    AS secs_to_convert
        |FROM f WHERE event_type = 'purchase' AND first_touch IS NOT NULL AND ts >= first_touch
        |GROUP BY user_id, first_touch ORDER BY user_id""".stripMargin,
    // the ×2/×4 carries keep interpolated medians integer-exact, so the
    // flagged row set is deterministic across engines (see Relational)
    "q_mad_outliers" -> madOutliersOracle,
    "q_mad_outliers_sql" -> madOutliersOracle,
    // sketch gate: exact values + deterministic bound checks (HLL ≤3%,
    // approx-median ≤1.0 — wide margin over measured ≤0.67% / ≤0.25)
    "sketch_accuracy" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
        |  true AS hll_within_3pct, true AS p50_within_1
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-key count distribution reduced to partitioning decisions;
    // quantile parity as in q_value_percentiles, ratio rounded to 4 dp
    "skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events
        |           WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(max(n) AS BIGINT) AS max_key_rows,
        |  coalesce(round(quantile_cont(n, 0.5) * 100, 0) / 100.0, 0.0) AS p50_key_rows,
        |  coalesce(round(quantile_cont(n, 0.99) * 100, 0) / 100.0, 0.0) AS p99_key_rows,
        |  round(CAST(max(n) AS DOUBLE) * count(*) / sum(n) * 10000, 0)
        |    / 10000.0 AS skew_ratio,
        |  CAST(max(n) AS DOUBLE) * count(*) > sum(n) * 4.0 AS needs_salting
        |FROM c""".stripMargin,
    // exact violation counts per declared constraint; null semantics are
    // explicit per check (see Curation.validateConstraints)
    "corpus_constraints" ->
      """WITH m AS (SELECT
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_key_null,
        |  CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT) AS v_key_dup,
        |  CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_text_empty,
        |  CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN ('en','es','zh','de','fr') THEN 1 ELSE 0 END) AS BIGINT) AS v_lang_domain,
        |  CAST(sum(CASE WHEN source IS NULL OR NOT regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS v_source_format,
        |  CAST(sum(CASE WHEN text IS NOT NULL AND n_chars IS NOT NULL AND n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_len_consistent,
        |  CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_len_nonneg
        |FROM documents)
        |SELECT check_name, violations, n_rows, violations = 0 AS passed
        |FROM (
        |  SELECT 'doc_id_complete' AS check_name, v_key_null AS violations, n_rows FROM m
        |  UNION ALL SELECT 'doc_id_unique', v_key_dup, n_rows FROM m
        |  UNION ALL SELECT 'text_nonempty', v_text_empty, n_rows FROM m
        |  UNION ALL SELECT 'lang_in_domain', v_lang_domain, n_rows FROM m
        |  UNION ALL SELECT 'source_format', v_source_format, n_rows FROM m
        |  UNION ALL SELECT 'n_chars_consistent', v_len_consistent, n_rows FROM m
        |  UNION ALL SELECT 'n_chars_nonnegative', v_len_nonneg, n_rows FROM m)
        |ORDER BY check_name""".stripMargin,
    "t2_alert_tws" -> alertSetOracle("7200", "300.0"),
    // unordered coverage rule — the batch twin of the MapState stream
    // (the ORDERED variant is q_window_funnel)
    "q_funnel_coverage_stream" ->
      """SELECT user_id FROM events
        |WHERE user_id IS NOT NULL
        |  AND event_type IN ('view', 'click', 'purchase')
        |GROUP BY 1 HAVING count(DISTINCT event_type) = 3
        |ORDER BY user_id""".stripMargin,
    // sketch-vs-exact vocabulary cardinality: exact values + bound
    // booleans, sketchAccuracy-style; ROLLUP's null group = grand total
    // ('TOTAL' < 'srcN' in binary collation on both engines, so the
    // global row sorts first deterministically)
    "vocab_cardinality_sketch" -> vocabCardinalityOracle,
    // streamed HLL artifact ≡ one-shot (register-wise max) → same oracle
    "vocab_sketch_stream" -> vocabCardinalityOracle,
    "vocab_overlap_sketch" -> vocabOverlapOracle,
    // batched-artifact estimates ≡ one-shot (register-wise max) → the
    // incremental spelling passes the identical gate
    "vocab_overlap_incremental" -> vocabOverlapOracle,
    // md5-bucket split + brute-jaccard leakage edges (same shingle CTE as
    // bruteJaccardOracle; only the train side of a cross-split edge is
    // quarantined). The Spark side defaults to banded-MinHash edges; its
    // pair-set equality with exact jac >= 1/2 is oracle-gated separately
    // (dedup_minhash_lsh), so the exact-pair SQL remains this query's oracle
    "split_leakage_guard" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                        for i in range(1, len(w) - 1)]) AS s
        |       FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
        |        len(list_intersect(a.s, b.s)) AS inter,
        |        len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pairs AS (SELECT doc_i, doc_j FROM p WHERE inter * 2 >= u),
        |ids AS (SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < 1000 AS is_test
        |  FROM documents),
        |edges AS (SELECT doc_i AS a, doc_j AS b FROM pairs
        |          UNION ALL SELECT doc_j, doc_i FROM pairs),
        |leaky AS (SELECT DISTINCT e.a AS doc_id
        |          FROM edges e JOIN ids i ON e.b = i.doc_id AND i.is_test)
        |SELECT i.doc_id,
        |  CASE WHEN i.is_test THEN 'test'
        |       WHEN l.doc_id IS NOT NULL THEN 'quarantine'
        |       ELSE 'train' END AS split
        |FROM ids i LEFT JOIN leaky l USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // the FULL histogram walk replayed in SQL: same bin function
    // (length(bin())-1 integer log2), same rank, same lower-bound values
    "value_quantile_hist" ->
      """WITH b AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
        |           FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |bb AS (SELECT event_type, cents,
        |    CASE WHEN cents <= 0 THEN 0
        |      ELSE (length(bin(cents)) - 1) * 128
        |         + ((cents - (CAST(1 AS BIGINT) << (length(bin(cents)) - 1)))
        |            >> greatest(length(bin(cents)) - 1 - 7, 0)) + 1 END AS bin_id
        |  FROM b),
        |h AS (SELECT event_type, bin_id, CAST(count(*) AS BIGINT) AS cnt
        |      FROM bb GROUP BY 1, 2),
        |c AS (SELECT event_type, bin_id,
        |        CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |        CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |      FROM h),
        |qq AS (SELECT unnest([CAST(50 AS BIGINT), 90, 99]) AS q),
        |sel AS (SELECT c.event_type, qq.q, max(c.n) AS n, min(c.bin_id) AS bin_id
        |        FROM c CROSS JOIN qq
        |        WHERE c.cum >= (qq.q * c.n + 99) // 100
        |        GROUP BY 1, 2),
        |v AS (SELECT event_type, q, n, bin_id,
        |    CAST((bin_id - 1) // 128 AS BIGINT) AS be
        |  FROM sel),
        |est AS (SELECT event_type, q, n, bin_id,
        |    CASE WHEN bin_id = 0 THEN 0
        |      ELSE (CAST(1 AS BIGINT) << CAST(be AS INT))
        |         + ((bin_id - 1) % 128)
        |           * (CAST(1 AS BIGINT) << CAST(greatest(be - 7, 0) AS INT)) END AS est_cents,
        |    CASE WHEN bin_id = 0 THEN 1
        |      ELSE CAST(1 AS BIGINT) << CAST(greatest(be - 7, 0) AS INT) END AS width_cents
        |  FROM v),
        |sorted AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn
        |  FROM b),
        |ex AS (SELECT e.event_type, e.q, s.cents AS exact_cents
        |       FROM est e JOIN sorted s ON s.event_type = e.event_type
        |        AND s.rn = (e.q * e.n + 99) // 100)
        |SELECT est.event_type, est.q, est.n, est.est_cents, est.width_cents,
        |  ex.exact_cents >= est.est_cents
        |    AND ex.exact_cents < est.est_cents + est.width_cents AS in_bin
        |FROM est JOIN ex ON est.event_type = ex.event_type AND est.q = ex.q
        |ORDER BY est.event_type, est.q""".stripMargin,
    // Count-Min: md5 row hashes replayed cell-for-cell; never_under is
    // the CM theorem, the overcount is reported exactly (not gated —
    // the classic eps*N bound is probabilistic over hash draws). The
    // streamed variant shares the oracle: vector-add maintenance makes
    // its artifact bit-identical to the one-shot build
    "vocab_cmsketch" -> cmsketchOracle,
    "vocab_cmsketch_sql" -> cmsketchOracle,
    "vocab_cmsketch_stream" -> cmsketchOracle,
    "vocab_cmsketch_persist" -> cmsketchOracle,
    // q-digest: full 8-level deterministic compression replayed in SQL,
    // readout + rank-theorem booleans matched exactly
    "quantile_qdigest" -> qdigestOracle,
    "quantile_qdigest_sql" -> qdigestOracle,
    "quantile_qdigest_update" -> qdigestUpdateOracle,
    "quantile_qdigest_stream" -> qdigestStreamOracle,
    "quantile_qdigest_persist" -> qdigestStreamOracle,
    // consecutive-day TV distance over the same hdr bins, integer
    // cross-multiplied (drift_bp = Σ|c1·n2 − c2·n1|·10⁴ ÷ 2n1n2)
    "value_drift_daily" -> valueDriftOracle,
    // streaming twin: foreachBatch-maintained day-keyed artifacts, drift
    // read from artifacts only — merge associativity makes it identical
    // to the one-shot build, so the SAME oracle applies
    "value_drift_stream" -> valueDriftOracle,
    // the corpus_diff v1/v2 recipe -> per-source TV over token unigrams
    "corpus_token_drift" ->
      """WITH o AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents
        |           WHERE doc_id % 10 != 0 AND source IS NOT NULL AND text IS NOT NULL),
        |v2 AS (SELECT source, unnest(string_split(
        |           CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END, ' ')) AS tok
        |       FROM documents
        |       WHERE doc_id % 7 != 0 AND source IS NOT NULL AND text IS NOT NULL),
        |a AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c1 FROM o GROUP BY 1, 2),
        |b AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c2 FROM v2 GROUP BY 1, 2),
        |p AS (SELECT coalesce(a.source, b.source) AS source,
        |        coalesce(a.tok, b.tok) AS tok,
        |        coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
        |      FROM a FULL OUTER JOIN b ON a.source = b.source AND a.tok = b.tok),
        |n AS (SELECT source, CAST(sum(c1) AS BIGINT) AS n_old,
        |        CAST(sum(c2) AS BIGINT) AS n_new FROM p GROUP BY 1)
        |SELECT p.source, max(n.n_old) AS n_old, max(n.n_new) AS n_new,
        |  CAST((sum(abs(c1 * n.n_new - c2 * n.n_old)) * 10000)
        |    // (2 * max(n.n_old) * max(n.n_new)) AS BIGINT) AS drift_bp
        |FROM p JOIN n ON n.source = p.source
        |WHERE n.n_old > 0 AND n.n_new > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact totals + literal-true MG theorems (size / lower-bound /
    // N/(k+1) error / heavy-coverage are guarantees, not measurements)
    "vocab_heavy_hitters" -> heavyHitterOracle,
    "vocab_heavy_hitters_sql" -> heavyHitterOracle,
    // streamed MG: counters vary per batching, the gated theorems do not
    "vocab_hh_stream" -> heavyHitterOracle,
    // persisted MG: same gate over the crash-recoverable versioned-parquet
    // maintainer — batching-independent bounds keep it on the same oracle
    "vocab_hh_persist" -> heavyHitterOracle,
    // JSONL roundtrip parity: parse(render(events)) == events (malformed
    // lines dropped, field-level nulls preserved)
    "jsonl_roundtrip_events" ->
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin,
    // ORC roundtrip parity: read(write(events)) == events exactly
    "orc_roundtrip_events" ->
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin,
    "q_set_ops_segments" ->
      """WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'
        |           GROUP BY 1 HAVING count(*) > 15),
        |e AS (SELECT user_id FROM events WHERE event_type = 'error'
        |      GROUP BY 1 HAVING count(*) > 15)
        |SELECT user_id, 'both' AS segment FROM (FROM p INTERSECT FROM e)
        |UNION ALL
        |SELECT user_id, 'purchase_only' FROM (FROM p EXCEPT FROM e)
        |UNION ALL
        |SELECT user_id, 'error_only' FROM (FROM e EXCEPT FROM p)
        |ORDER BY segment, user_id""".stripMargin,
    "q_events_json_enrich" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(sum(value) * 100, 0) / 100.0 AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_langid" ->
      s"""WITH $langCtes
         |SELECT doc_id, pred_lang, c_en, c_es, c_de, c_fr, c_zh
         |FROM lang ORDER BY doc_id""".stripMargin,
    // TF-IDF-shaped distinctive tokens: integer (tf*1e6) div df ranking
    "text_distinctive" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |r AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
        |        CAST(row_number() OVER (PARTITION BY doc_id
        |          ORDER BY (tf.tf * 1000000) // dfq.df DESC, tf.tok) AS BIGINT) AS rnk
        |      FROM tf JOIN dfq ON tf.tok = dfq.tok)
        |SELECT doc_id, tok, tf, df, rnk FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    // stratified deterministic sample: 40 docs per predicted language by
    // md5-bucket order (same langid CTEs as text_langid)
    "sample_stratified" ->
      s"""WITH $langCtes,
         |b AS (SELECT doc_id,
         |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |        % 10000 AS bkt
         |      FROM documents),
         |r AS (SELECT l.doc_id, pred_lang,
         |        CAST(row_number() OVER (PARTITION BY pred_lang
         |          ORDER BY bkt, l.doc_id) AS BIGINT) AS stratum_rank
         |      FROM lang l JOIN b ON l.doc_id = b.doc_id)
         |SELECT doc_id, pred_lang, stratum_rank FROM r
         |WHERE stratum_rank <= 40
         |ORDER BY pred_lang, stratum_rank""".stripMargin,
    // mixture sampling: same langid CTEs + md5-bucket thinning per
    // language at the query's rates ('fr' absent -> dropped)
    "sample_mixture" ->
      s"""WITH $langCtes
         |SELECT l.doc_id, pred_lang FROM lang l
         |WHERE CAST(('0x' || substring(md5(CAST(l.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 10000 <
         |      CASE pred_lang WHEN 'en' THEN 2500 WHEN 'es' THEN 7500
         |                     WHEN 'de' THEN 10000 WHEN 'zh' THEN 5000
         |                     ELSE 0 END
         |ORDER BY l.doc_id""".stripMargin,
    // token-budget mixture: same langid CTEs; the oracle's single flat
    // per-language window equals the operator's two-level prefix sum
    // because both run over the identical (bkt, doc_id) order
    "sample_mixture_tokens" ->
      s"""WITH $langCtes,
         |tk AS (SELECT l.doc_id, pred_lang,
         |        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |        CAST(('0x' || substring(md5(CAST(l.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |        % 10000 AS bkt
         |      FROM lang l JOIN documents d ON l.doc_id = d.doc_id),
         |pf AS (SELECT doc_id, pred_lang, n_tokens,
         |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY pred_lang
         |          ORDER BY bkt, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |          0) AS BIGINT) AS prefix_tokens
         |      FROM tk)
         |SELECT doc_id, pred_lang, n_tokens, prefix_tokens FROM pf
         |WHERE prefix_tokens < CASE pred_lang
         |  WHEN 'en' THEN 2500 WHEN 'es' THEN 1200
         |  WHEN 'de' THEN 100000 WHEN 'zh' THEN 800 ELSE -1 END
         |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, length(text) AS n_chars,
        |    string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, n_chars, len(w) AS n_tokens,
        |  len(list_distinct(w)) AS n_distinct,
        |  len(list_filter(w, x -> x IN ('the', 'a', 'of'))) AS stop_cnt
        |FROM t)
        |SELECT doc_id, n_chars, n_tokens, n_distinct,
        |  (n_distinct * 20000 + n_tokens) // (2 * n_tokens) AS ttr_bp,
        |  stop_cnt,
        |  ((n_chars - n_tokens + 1) * 200 + n_tokens) // (2 * n_tokens) AS avg_tok_len_cp
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+')) AS alpha_runs,
        |  (length(text) + 3) // 4 AS bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprints" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // cumulative types = count of tokens whose first occurrence lands at
    // or before the bucket — the same two-aggregate formulation as Spark
    "vocab_growth" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |pb AS (SELECT doc_id // 100 AS bucket, CAST(count(*) AS BIGINT) AS n_tokens
        |       FROM w GROUP BY 1),
        |nt AS (SELECT doc_id // 100 AS bucket,
        |         CAST(count(*) AS BIGINT) AS n_new_types
        |       FROM (SELECT tok, min(doc_id) AS doc_id FROM w GROUP BY 1)
        |       GROUP BY 1)
        |SELECT pb.bucket, pb.n_tokens,
        |  coalesce(nt.n_new_types, 0) AS n_new_types,
        |  CAST(sum(pb.n_tokens) OVER (ORDER BY pb.bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(nt.n_new_types, 0)) OVER (ORDER BY pb.bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
        |FROM pb LEFT JOIN nt USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "text_entropy" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round((log2(sum(c)) - sum(c * log2(c)) / sum(c)) * 10000, 0) / 10000.0
        |    AS entropy_bits
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_langid_ngram" ->
      """WITH s AS (SELECT doc_id,
        |  (length(text) - length(replace(text, 'th', ''))) / 2
        |    + (length(text) - length(replace(text, 'he', ''))) / 2 AS b_en,
        |  (length(text) - length(replace(text, 'qu', ''))) / 2
        |    + (length(text) - length(replace(text, 'ue', ''))) / 2 AS b_es,
        |  (length(text) - length(replace(text, 'sc', ''))) / 2
        |    + (length(text) - length(replace(text, 'ch', ''))) / 2 AS b_de,
        |  (length(text) - length(replace(text, 'me', ''))) / 2
        |    + (length(text) - length(replace(text, 'rg', ''))) / 2 AS b_fr,
        |  (length(text) - length(replace(text, 'ha', ''))) / 2
        |    + (length(text) - length(replace(text, 'an', ''))) / 2 AS b_zh
        |FROM documents)
        |SELECT doc_id,
        |  CASE WHEN b_en >= b_es AND b_en >= b_de AND b_en >= b_fr AND b_en >= b_zh THEN 'en'
        |       WHEN b_es >= b_de AND b_es >= b_fr AND b_es >= b_zh THEN 'es'
        |       WHEN b_de >= b_fr AND b_de >= b_zh THEN 'de'
        |       WHEN b_fr >= b_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  CAST(b_en AS BIGINT) AS b_en, CAST(b_es AS BIGINT) AS b_es,
        |  CAST(b_de AS BIGINT) AS b_de, CAST(b_fr AS BIGINT) AS b_fr,
        |  CAST(b_zh AS BIGINT) AS b_zh
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_token_docfreq" ->
      """SELECT tok, count(DISTINCT doc_id) AS doc_freq
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY tok ORDER BY tok""".stripMargin,
    // unigram typicality: integer ppm arithmetic (sum() CAST back from
    // DuckDB's HUGEINT promotion so the hash compare sees BIGINT)
    "text_typicality" ->
      """WITH occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY tok),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM tf),
        |ppm AS (SELECT tok, (tf * 1000000) // n_total AS tf_ppm FROM tf, tot)
        |SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  (CAST(sum(tf_ppm) AS BIGINT) * 2 + count(*)) // (2 * count(*))
        |    AS mean_tf_ppm,
        |  min(tf_ppm) AS min_tf_ppm,
        |  CAST(sum(CASE WHEN tf_ppm < 100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rare_cnt
        |FROM occ JOIN ppm ON occ.tok = ppm.tok
        |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin,
    // boilerplate mining: corpus top-20 3-grams, ties broken by gram text
    "text_top_ngrams" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, array_to_string(w[(i+1):(i+3)], ' ') AS gram
        |      FROM w CROSS JOIN unnest(range(len(w) - 2)) AS t(i)
        |      WHERE len(w) >= 3),
        |occ AS (SELECT gram, count(*) AS n_occurrences FROM g GROUP BY gram),
        |dfq AS (SELECT gram, count(*) AS n_docs
        |        FROM (SELECT DISTINCT doc_id, gram FROM g) GROUP BY gram),
        |r AS (SELECT occ.gram, n_occurrences, n_docs,
        |        CAST(row_number() OVER (ORDER BY n_occurrences DESC, occ.gram)
        |             AS BIGINT) AS rnk
        |      FROM occ JOIN dfq ON occ.gram = dfq.gram)
        |SELECT gram, n_occurrences, n_docs, rnk FROM r WHERE rnk <= 20
        |ORDER BY rnk""".stripMargin,
    // BM25 keyword search: the same integer-scaled scoring expressions,
    // term for term; DuckDB's 1-row cross join against (n, avgdl) plays
    // the Spark side's bounded scalar collect
    "search_bm25" ->
      """WITH dl AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    (CAST(sum(dl) AS BIGINT) * 200 + count(*)) // (2 * count(*))
        |      AS avgdl_x100 FROM dl),
        |occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM occ
        |       WHERE tok IN ('customer', 'join', 'dup') GROUP BY doc_id, tok),
        |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |s AS (SELECT tf.doc_id,
        |    ((n - df + 1) * 1000) // (df + 1) AS idf_milli,
        |    (tf * 220 * 1000) // (tf * 100 +
        |      (120 * (25 + (75 * ((dl.dl * 10000) // avgdl_x100)) // 100)) // 100)
        |      AS tf_part_milli
        |  FROM tf JOIN dfq USING (tok) JOIN dl ON tf.doc_id = dl.doc_id, tot),
        |sc AS (SELECT doc_id,
        |    CAST(sum((idf_milli * tf_part_milli) // 1000) AS BIGINT)
        |      AS score_milli,
        |    CAST(count(*) AS BIGINT) AS n_terms_hit
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, score_milli, n_terms_hit, rank FROM
        |  (SELECT *, CAST(row_number() OVER (ORDER BY score_milli DESC, doc_id)
        |     AS BIGINT) AS rank FROM sc)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // grouping sets with grouping() bits (gid 1 = status rows, 2 =
    // priority rows, 3 = grand total — same bit order as Spark)
    "q_grouping_sets_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice) * 100, 0) / 100.0 AS total_price,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
        |    AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, orderstatus, orderpriority""".stripMargin,
    // distribution ranks: the (value, event_id) order leaves no ties
    "q_value_distribution" ->
      """SELECT event_id, event_type, value,
        |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM events
        |WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  AND event_id IS NOT NULL
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,
    // time-RANGE trailing window (RANGE over epoch micros; ties share a
    // frame, so no tie-break column is needed or allowed)
    "q_trailing_hour" ->
      """SELECT event_id, user_id, ts,
        |  count(*) OVER w AS n_trailing_1h,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
        |    / 100.0 AS sum_trailing_1h
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // unpivot: the long form of the pivot matrix, via a 5-row melt spec
    "q_unpivot_priority" ->
      """SELECT o_orderstatus AS orderstatus, priority_col,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = pr) AS BIGINT)
        |    AS n_orders
        |FROM orders
        |CROSS JOIN (VALUES ('p1_urgent', '1-URGENT'), ('p2_high', '2-HIGH'),
        |    ('p3_medium', '3-MEDIUM'), ('p4_not_specified', '4-NOT SPECIFIED'),
        |    ('p5_low', '5-LOW')) AS m(priority_col, pr)
        |GROUP BY orderstatus, priority_col
        |ORDER BY orderstatus, priority_col""".stripMargin,
    // full outer coverage join
    "q_full_outer_coverage" ->
      """WITH a AS (SELECT user_id, count(*) AS n_events FROM events
        |           WHERE user_id IS NOT NULL GROUP BY user_id),
        |c AS (SELECT c_custkey,
        |        round(c_acctbal * 100, 0) / 100.0 AS acctbal FROM customer)
        |SELECT coalesce(user_id, c_custkey) AS key_id,
        |  coalesce(n_events, 0) AS n_events,
        |  user_id IS NOT NULL AS has_events,
        |  c_custkey IS NOT NULL AS is_customer,
        |  acctbal
        |FROM a FULL OUTER JOIN c ON a.user_id = c.c_custkey
        |ORDER BY key_id""".stripMargin,
    // retention triangle: exact epoch-us day offsets over date_trunc
    "q_retention_cohorts" ->
      """WITH a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |           FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
        |SELECT cohort_day,
        |  (epoch_us(a.day) - epoch_us(cohort_day)) // 86400000000
        |    AS offset_days,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // bigram LM: P(w2|w1) ppm per occurrence, doc mean/min
    "text_bigram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, w[i+1] AS w1, w[i+1] || ' ' || w[i+2] AS gram
        |      FROM w CROSS JOIN unnest(range(len(w) - 1)) AS t(i)
        |      WHERE len(w) >= 2),
        |uni AS (SELECT unnest(string_split(text, ' ')) AS w1 FROM documents),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY w1),
        |c2 AS (SELECT gram, CAST(count(*) AS BIGINT) AS c2 FROM g GROUP BY gram),
        |s AS (SELECT doc_id, (c2 * 1000000) // c1 AS cond_ppm
        |      FROM g JOIN c2 USING (gram) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  (CAST(sum(cond_ppm) AS BIGINT) * 2 + count(*)) // (2 * count(*))
        |    AS mean_cond_ppm,
        |  min(cond_ppm) AS min_cond_ppm
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // corpus diff over the same deterministic synthetic split
    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_key FROM documents
        |           WHERE doc_id % 10 != 0),
        |n AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
        |          AS new_key
        |      FROM documents WHERE doc_id % 7 != 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN old_key IS NULL THEN 'added'
        |       WHEN new_key IS NULL THEN 'removed'
        |       WHEN old_key = new_key THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    // corpus vocabulary: dense ids by (tf desc, token) — a total order, so
    // "rank then limit" ≡ Spark's "limit then rank"
    "vocab_topk" ->
      """WITH occ AS (SELECT unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY tok)
        |SELECT token_id, tok, tf FROM
        |  (SELECT tok, tf, CAST(row_number() OVER (ORDER BY tf DESC, tok)
        |     AS BIGINT) AS token_id FROM tf)
        |WHERE token_id <= 1000 ORDER BY token_id""".stripMargin,
    // token-id encoding: positional unnest, vocab left join (OOV → id 0),
    // order restored by string_agg(... ORDER BY pos)
    "tokenize_ids" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |t AS (SELECT doc_id, w[i+1] AS tok, CAST(i AS BIGINT) AS pos
        |      FROM w CROSS JOIN unnest(range(len(w))) AS u(i)),
        |tf AS (SELECT tok, count(*) AS tf FROM t GROUP BY tok),
        |vocab AS (SELECT tok, token_id FROM
        |    (SELECT tok, CAST(row_number() OVER (ORDER BY tf DESC, tok)
        |       AS BIGINT) AS token_id FROM tf)
        |  WHERE token_id <= 1000),
        |enc AS (SELECT doc_id, pos, coalesce(token_id, 0) AS id,
        |          token_id IS NULL AS oov
        |        FROM t LEFT JOIN vocab USING (tok))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos) AS ids_str
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // BPE training replayed as unrolled CTEs (one pair-count + argmax +
    // replace round per merge rank — the cluster_embeddings pattern)
    "vocab_bpe" -> bpeVocabOracle(10),
    "tokenize_bpe" -> bpeTokenizeOracle(10),
    "tokenize_bpe_bytes" -> bpeBytesTokenizeOracle(10),
    "tokenize_bpe_bytes_incremental" -> bpeBytesIncrementalOracle(10),
    "tokenize_bpe_incremental" -> bpeIncrementalOracle(10),
    // per-source reputation: integer round-half-up bp math throughout
    "source_reputation" ->
      """WITH t AS (SELECT source, md5(text) AS text_key,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |       * 20000 + len(string_split(text, ' ')))
        |      // (2 * len(string_split(text, ' '))) AS ttr_bp
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT text_key) AS BIGINT) AS n_unique_texts,
        |  ((count(*) - count(DISTINCT text_key)) * 20000 + count(*))
        |    // (2 * count(*)) AS dup_bp,
        |  (CAST(sum(n_tokens) AS BIGINT) * 2 + count(*))
        |    // (2 * count(*)) AS avg_tokens,
        |  (CAST(sum(ttr_bp) AS BIGINT) * 2 + count(*))
        |    // (2 * count(*)) AS avg_ttr_bp
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // domain gate: survivors of the reputation floor, whole-source drops
    "gate_by_source" ->
      """WITH t AS (SELECT source, md5(text) AS text_key,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |       * 20000 + len(string_split(text, ' ')))
        |      // (2 * len(string_split(text, ' '))) AS ttr_bp
        |  FROM documents),
        |rep AS (SELECT source,
        |    ((count(*) - count(DISTINCT text_key)) * 20000 + count(*))
        |      // (2 * count(*)) AS dup_bp,
        |    (CAST(sum(ttr_bp) AS BIGINT) * 2 + count(*))
        |      // (2 * count(*)) AS avg_ttr_bp
        |  FROM t GROUP BY source),
        |bad AS (SELECT source FROM rep
        |        WHERE avg_ttr_bp < 4800 OR dup_bp > 2000)
        |SELECT doc_id, source, CAST(len(text) AS BIGINT) AS n_chars
        |FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.source = d.source)
        |ORDER BY doc_id""".stripMargin,
    // eval-overlap contamination: 8-gram join on shingle TEXT (the Spark
    // side joins on xxhash64 of the same strings — identical result barring
    // a 64-bit collision, the dedup_ngram_jaccard precedent)
    "text_decontaminate_sql" -> decontaminateOracle,
    "text_decontaminate_bloom" -> decontaminateOracle,
    // the frozen-artifact screen is the whole-corpus screen restricted
    // to the batch slice (per-doc purity) — same CTE chain, cut filter
    "text_decontaminate_incremental" -> decontaminateIncOracle,
    // the streamed screen is stateless over the same frozen artifact,
    // so batching cannot change a report — shared incremental oracle
    "text_decontaminate_stream" -> decontaminateIncOracle,
    // the composed release gate: both screens' flag sets replayed, then
    // survivors = non-eval docs outside the union
    "pipeline_decontaminated" ->
      """WITH b AS (SELECT doc_id, text,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < 1000 AS is_eval
        |  FROM documents),
        |t AS (SELECT doc_id, is_eval, string_split(text, ' ') AS w FROM b),
        |g8 AS MATERIALIZED (SELECT doc_id, is_eval,
        |  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
        |    || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' '
        |    || w[i+7] for i in range(1, len(w) - 6)])) AS ng
        |  FROM t WHERE len(w) >= 8),
        |exact_flag AS (SELECT DISTINCT tr.doc_id
        |  FROM g8 tr JOIN g8 ev ON tr.ng = ev.ng
        |  WHERE NOT tr.is_eval AND ev.is_eval),
        |s3 AS MATERIALIZED (SELECT doc_id, is_eval,
        |   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                  for i in range(1, len(w) - 1)]) AS s
        | FROM t WHERE len(w) >= 3),
        |fuzzy_flag AS (SELECT DISTINCT tr.doc_id
        |  FROM s3 tr JOIN s3 ev ON (NOT tr.is_eval) AND ev.is_eval
        |  WHERE len(list_intersect(tr.s, ev.s)) * 2 >=
        |        len(tr.s) + len(ev.s) - len(list_intersect(tr.s, ev.s))),
        |flagged AS (SELECT doc_id FROM exact_flag
        |            UNION SELECT doc_id FROM fuzzy_flag)
        |SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM b WHERE NOT is_eval
        |  AND doc_id NOT IN (SELECT doc_id FROM flagged)
        |ORDER BY doc_id""".stripMargin,
    // fuzzy decontamination: brute cross-set 3-shingle Jaccard (the
    // bruteJaccardOracle shape restricted to train x eval, grouped per
    // training doc) — the LSH path's 32-band x 4-row capture at the >= 1/2
    // verify threshold is the dedup_minhash_lsh precedent
    "text_decontaminate_fuzzy" -> decontaminateFuzzyOracle(),
    // the frozen-artifact fuzzy screen is the whole-corpus screen
    // restricted to the batch slice (per-doc purity given the artifacts)
    "text_decontaminate_fuzzy_incremental" -> decontaminateFuzzyOracle(
      "AND tr.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)"),
    "text_decontaminate_fuzzy_stream" -> decontaminateFuzzyOracle(
      "AND tr.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)"),
    // DSIR importance resampling: the full weight/score/threshold chain
    // replayed — md5-prefix feature buckets, milli-integer smoothed
    // ratio weights, per-doc mean, histogram quantile gate (ties in)
    "sample_importance" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, lang, unnest(w) AS feat FROM t
        |  UNION ALL
        |  SELECT doc_id, lang,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS feat
        |  FROM t WHERE len(w) >= 2),
        |bo AS (SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(feat), 1, 15)) AS BIGINT) % 4096 AS b
        |  FROM occ),
        |cnt AS (SELECT b,
        |    CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS cnt_t,
        |    CAST(count(*) AS BIGINT) AS cnt_r
        |  FROM bo GROUP BY b),
        |wt AS (SELECT b,
        |    (1000 * (cnt_t + 1) * ((SELECT sum(cnt_r) FROM cnt) + 4096))
        |      // ((cnt_r + 1) * ((SELECT sum(cnt_t) FROM cnt) + 4096))
        |      AS w_milli
        |  FROM cnt),
        |ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |    CAST(sum(w_milli) // count(*) AS BIGINT) AS w_avg_milli
        |  FROM bo JOIN wt USING (b) GROUP BY doc_id),
        |hist AS (SELECT w_avg_milli AS s, count(*) AS cnt FROM ds GROUP BY 1),
        |thr AS (SELECT max(s) AS thr FROM (
        |  SELECT s, sum(cnt) OVER (ORDER BY s DESC) AS cum,
        |         sum(cnt) OVER () AS total FROM hist)
        |  WHERE cum * 10000 >= total * 2500)
        |SELECT doc_id, n_feats, w_avg_milli FROM ds
        |WHERE w_avg_milli >= (SELECT thr FROM thr)
        |ORDER BY doc_id""".stripMargin,
    // frozen-artifact admission: weights + threshold from the pool slice
    // only, batch scored against them — the whole chain replayed
    "sample_importance_incremental" -> importanceIncrementalOracle,
    // the streamed admission is stateless over the same frozen artifacts,
    // so batching cannot change a verdict — shared incremental oracle
    "sample_importance_stream" -> importanceIncrementalOracle,
    "quality_gate" ->
      """WITH t AS (SELECT doc_id,
        |    (len(list_distinct(string_split(text, ' '))) * 20000
        |       + len(string_split(text, ' ')))
        |      // (2 * len(string_split(text, ' '))) AS ttr_bp
        |  FROM documents),
        |h AS (SELECT ttr_bp, count(*) AS cnt FROM t GROUP BY ttr_bp),
        |c AS (SELECT ttr_bp,
        |        sum(cnt) OVER (ORDER BY ttr_bp DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(cnt) OVER () AS total
        |      FROM h),
        |thr AS (SELECT max(ttr_bp) AS thr FROM c
        |        WHERE cum * 10000 >= total * 7500)
        |SELECT doc_id, CAST(ttr_bp AS BIGINT) AS ttr_bp
        |FROM t, thr WHERE ttr_bp >= thr ORDER BY doc_id""".stripMargin,
    "chunk_docs" ->
      """SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
        |  substring(text, CAST(u.i * 150 + 1 AS INT), 200) AS chunk_text,
        |  CAST(len(substring(text, CAST(u.i * 150 + 1 AS INT), 200)) AS BIGINT)
        |    AS n_chars
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, (len(text) - 1) // 150)) AS i
        |      FROM documents
        |      WHERE text IS NOT NULL AND len(text) > 0) u(doc_id, text, i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_decontaminate" -> decontaminateOracle,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |        [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS g2,
        |        CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |          for i in range(1, len(w) - 1)])) AS BIGINT) AS d3
        |      FROM t WHERE len(w) >= 3),
        |c AS (SELECT doc_id, n_tokens, d3, count(*) AS cnt
        |      FROM (SELECT doc_id, n_tokens, d3, unnest(g2) AS g FROM s)
        |      GROUP BY doc_id, n_tokens, d3, g),
        |m AS (SELECT doc_id, n_tokens, d3, max(cnt) AS top2
        |      FROM c GROUP BY 1, 2, 3)
        |SELECT doc_id, n_tokens,
        |  (top2 * 20000 + (n_tokens - 1)) // (2 * (n_tokens - 1)) AS top_2gram_bp,
        |  ((n_tokens - 2 - d3) * 20000 + (n_tokens - 2)) // (2 * (n_tokens - 2)) AS dup_3gram_bp
        |FROM m ORDER BY doc_id""".stripMargin,
    // same planted-PII construction, then RE2/Java-portable regex classes;
    // redaction order email -> phone -> ip on both sides
    "text_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@mail.example'
        |      || CASE WHEN doc_id % 3 = 0
        |              THEN ' alt doc' || CAST(doc_id AS VARCHAR) || '@alt.example'
        |              ELSE '' END
        |      || ' phone 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+[a-z]')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t, '10\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-z0-9.]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g'),
        |    '10\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g')) AS redacted_key
        |FROM p ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_key, min(doc_id) AS canonical_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    "dedup_fingerprint" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    // portable SimHash: 60-bit md5-derived signatures (bit b majority of
    // token-hash bits), 4x15-bit pigeonhole candidates; the default query
    // verifies at hamming<=2, the _md5 twin at the classic <=3 radius
    "dedup_simhash" -> simhashOracle(2),
    "dedup_simhash_md5" -> simhashOracle(3),
    // sub-document span dedup: first (doc_id, pos) occurrence of each
    // 10-token chunk survives; docs rebuilt from surviving chunks
    "dedup_spans" -> spanDedupOracle(""),
    // incremental contract: whole-corpus span dedup restricted to the
    // batch ids — exactly what the monotone-ids invariant guarantees
    "dedup_spans_incremental" -> spanDedupOracle(
      "WHERE t.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)"),
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  64 + n_chars % 576 AS width,
        |  48 + n_chars % 432 AS height,
        |  n_chars // 100 + 1 AS n_frames,
        |  octet_length(encode(text)) AS media_bytes,
        |  md5(text) AS content_key
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text AS b,
        |    unnest(range(0, n_chars // 100 + 1)) AS frame_idx
        |  FROM documents)
        |-- text is pure ASCII, so string slicing == the byte slicing Spark
        |-- performs on the binary media column
        |SELECT doc_id, frame_idx,
        |  octet_length(encode(substring(b, CAST(frame_idx * 16 + 1 AS INT), 16))) AS frame_bytes,
        |  md5(substring(b, CAST(frame_idx * 16 + 1 AS INT), 16)) AS frame_key
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // the oracle recomputes the pixel statistics from the CLOSED-FORM
    // fixture recipe (Multimodal.makePpm), independently of the binary
    // path — Spark must reproduce them through a real P6 header parse +
    // byte decode, so any decode defect breaks the hash
    "multimodal_features" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |           FROM documents),
        |px AS (SELECT doc_id, w, h,
        |    (doc_id * 7 + i * 13) % 256 AS r,
        |    (doc_id * 11 + i * 17) % 256 AS g,
        |    (doc_id * 3 + i * 29) % 256 AS b
        |  FROM d CROSS JOIN unnest(range(w * h)) AS t(i)),
        |lx AS (SELECT *, (299 * r + 587 * g + 114 * b) // 1000 AS luma
        |       FROM px)
        |SELECT doc_id,
        |  CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
        |  CAST((sum(r) * 1000) // count(*) AS BIGINT) AS mean_r_milli,
        |  CAST((sum(g) * 1000) // count(*) AS BIGINT) AS mean_g_milli,
        |  CAST((sum(b) * 1000) // count(*) AS BIGINT) AS mean_b_milli,
        |  CAST((sum(luma) * 1000) // count(*) AS BIGINT) AS mean_luma_milli,
        |  CAST(max(luma) AS BIGINT) AS max_luma,
        |  CAST(min(luma) AS BIGINT) AS min_luma
        |FROM lx GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // 2x box-downsample recomputed from the same recipe: output pixel
    // (x, y) averages the 2x2 source block; P6 byte counts are
    // 9 + digits(w) + digits(h) + 3wh (header "P6\n<w> <h>\n255\n")
    "multimodal_resize" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |           FROM documents),
        |rp AS (SELECT doc_id, w, h, w // 2 AS nw, h // 2 AS nh,
        |    j % (w // 2) AS x, j // (w // 2) AS y
        |  FROM d CROSS JOIN unnest(range((w // 2) * (h // 2))) AS t(j)),
        |rv AS (SELECT doc_id, w, h, nw, nh,
        |    (((doc_id*7 + ((2*y)*w + 2*x)*13) % 256)
        |     + ((doc_id*7 + ((2*y)*w + 2*x + 1)*13) % 256)
        |     + ((doc_id*7 + ((2*y+1)*w + 2*x)*13) % 256)
        |     + ((doc_id*7 + ((2*y+1)*w + 2*x + 1)*13) % 256)) // 4
        |    + (((doc_id*11 + ((2*y)*w + 2*x)*17) % 256)
        |     + ((doc_id*11 + ((2*y)*w + 2*x + 1)*17) % 256)
        |     + ((doc_id*11 + ((2*y+1)*w + 2*x)*17) % 256)
        |     + ((doc_id*11 + ((2*y+1)*w + 2*x + 1)*17) % 256)) // 4
        |    + (((doc_id*3 + ((2*y)*w + 2*x)*29) % 256)
        |     + ((doc_id*3 + ((2*y)*w + 2*x + 1)*29) % 256)
        |     + ((doc_id*3 + ((2*y+1)*w + 2*x)*29) % 256)
        |     + ((doc_id*3 + ((2*y+1)*w + 2*x + 1)*29) % 256)) // 4 AS pxsum
        |  FROM rp)
        |SELECT doc_id,
        |  CAST(max(nw) AS BIGINT) AS new_width,
        |  CAST(max(nh) AS BIGINT) AS new_height,
        |  CAST(9 + length(CAST(max(w) AS VARCHAR))
        |    + length(CAST(max(h) AS VARCHAR))
        |    + max(w) * max(h) * 3 AS BIGINT) AS orig_bytes,
        |  CAST(9 + length(CAST(max(nw) AS VARCHAR))
        |    + length(CAST(max(nh) AS VARCHAR))
        |    + max(nw) * max(nh) * 3 AS BIGINT) AS thumb_bytes,
        |  CAST(sum(pxsum) AS BIGINT) AS thumb_sum
        |FROM rv GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // perceptual hash recomputed from the hash-fixture recipe — Spark
    // must reproduce it through real decode + grid sampling + threshold
    "multimodal_phash" ->
      s"""WITH $phashCtes
         |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  phash
         |FROM ph ORDER BY doc_id""".stripMargin,
    // banded Hamming search replicated in SQL: same 4×16-bit bands, same
    // radius — the oracle's candidate set IS the operator's candidate
    // set, so a banding defect (not just a hash defect) breaks the match
    "multimodal_image_dups" ->
      s"""WITH $phashCtes,
         |bands AS (SELECT doc_id, phash, bi,
         |            substring(phash, CAST(bi * 4 + 1 AS INT), 4) AS bv
         |          FROM ph CROSS JOIN unnest(range(4)) AS t(bi)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.phash AS ha, y.phash AS hb
         |         FROM bands x JOIN bands y
         |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |hm AS (SELECT doc_a, doc_b,
         |         CAST(sum(bit_count(xor(
         |           strpos('0123456789abcdef', substring(ha, CAST(i + 1 AS INT), 1)) - 1,
         |           strpos('0123456789abcdef', substring(hb, CAST(i + 1 AS INT), 1)) - 1)))
         |           AS BIGINT) AS hamming
         |       FROM cand CROSS JOIN unnest(range(16)) AS t(i)
         |       GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, hamming FROM hm
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // audio statistics recomputed from the closed-form sample recipe
    // (Multimodal.wavSamples) — Spark must reproduce them through a real
    // RIFF chunk walk + little-endian PCM decode, so any header-parse,
    // byte-order, or chunk-skip defect breaks the hash
    "multimodal_audio" ->
      """WITH an AS (SELECT doc_id, 64 + doc_id % 193 AS n FROM documents),
        |sm AS (SELECT doc_id, n, i,
        |         ((doc_id * 31 + i * 57) % 4001) - 2000 AS s
        |       FROM an CROSS JOIN unnest(range(256)) AS t(i) WHERE i < n),
        |zc AS (SELECT doc_id, n, i, s,
        |         lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS ps
        |       FROM sm)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(max(n) AS BIGINT) AS n_samples,
        |  CAST(max(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(max(abs(s)) AS BIGINT) AS peak,
        |  CAST(sum(s * s) // max(n) AS BIGINT) AS mean_square,
        |  CAST(sum(CASE WHEN ps IS NOT NULL AND (ps >= 0) <> (s >= 0)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM zc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // per-frame energy over the same recipe: fixed 64-sample analysis
    // frames, ragged tail, integer division
    "multimodal_audio_frames" ->
      """WITH an AS (SELECT doc_id, 64 + doc_id % 193 AS n FROM documents),
        |sm AS (SELECT doc_id, i, i // 64 AS frame_idx,
        |         ((doc_id * 31 + i * 57) % 4001) - 2000 AS s
        |       FROM an CROSS JOIN unnest(range(256)) AS t(i) WHERE i < n)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(count(*) AS BIGINT) AS frame_samples,
        |  CAST(sum(s * s) // count(*) AS BIGINT) AS energy
        |FROM sm GROUP BY doc_id, frame_idx
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // acoustic fingerprint recomputed from the fixture recipe — Spark
    // must reproduce it through real WAV decode + framing + contour bits
    "multimodal_audio_fp" ->
      s"""WITH $audioFpCtes
         |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, afp
         |FROM afp ORDER BY doc_id""".stripMargin,
    // banded Hamming search replicated in SQL: same 4×8-bit bands, same
    // radius — the oracle's candidate set IS the operator's candidate set
    "multimodal_audio_dups" ->
      s"""WITH $audioFpCtes,
         |abands AS (SELECT doc_id, afp, bi,
         |            substring(afp, CAST(bi * 2 + 1 AS INT), 2) AS bv
         |          FROM afp CROSS JOIN unnest(range(4)) AS t(bi)),
         |acand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.afp AS fa, y.afp AS fb
         |         FROM abands x JOIN abands y
         |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |ahm AS (SELECT doc_a, doc_b,
         |         CAST(sum(bit_count(xor(
         |           strpos('0123456789abcdef', substring(fa, CAST(i + 1 AS INT), 1)) - 1,
         |           strpos('0123456789abcdef', substring(fb, CAST(i + 1 AS INT), 1)) - 1)))
         |           AS BIGINT) AS hamming
         |       FROM acand CROSS JOIN unnest(range(8)) AS t(i)
         |       GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, hamming FROM ahm
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // the 64-bit contour recomputed from its longer-clip recipe; Spark
    // reproduces it through real WAV decode + framing + 64 contour bits
    "multimodal_audio_fp64" ->
      s"""WITH $audioFp64Ctes
         |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, afp
         |FROM afp64 ORDER BY doc_id""".stripMargin,
    // banded Hamming search over the 64-bit contour: 4×16-bit bands
    // (4 hex chars each), same radius — the production constants
    "multimodal_audio_dups64" ->
      s"""WITH $audioFp64Ctes,
         |abands64 AS (SELECT doc_id, afp, bi,
         |            substring(afp, CAST(bi * 4 + 1 AS INT), 4) AS bv
         |          FROM afp64 CROSS JOIN unnest(range(4)) AS t(bi)),
         |acand64 AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.afp AS fa, y.afp AS fb
         |         FROM abands64 x JOIN abands64 y
         |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |ahm64 AS (SELECT doc_a, doc_b,
         |         CAST(sum(bit_count(xor(
         |           strpos('0123456789abcdef', substring(fa, CAST(i + 1 AS INT), 1)) - 1,
         |           strpos('0123456789abcdef', substring(fb, CAST(i + 1 AS INT), 1)) - 1)))
         |           AS BIGINT) AS hamming
         |       FROM acand64 CROSS JOIN unnest(range(16)) AS t(i)
         |       GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, hamming FROM ahm64
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // incremental perceptual admission ≡ the whole-corpus smaller-id-
    // neighbor rule restricted to the batch (monotone ids make the index
    // exactly the smaller-id side) — recomputed from the fixture recipes
    "multimodal_image_admission" ->
      s"""WITH $phashCtes,
         |$imageNeighborCtes
         |SELECT d.doc_id, coalesce(im.canon, d.doc_id) AS canonical_id,
         |  im.canon IS NULL AS kept
         |FROM documents d LEFT JOIN im ON d.doc_id = im.doc_id
         |WHERE d.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
         |ORDER BY d.doc_id""".stripMargin,
    "multimodal_audio_admission" ->
      s"""WITH $audioFpCtes,
         |$audioNeighborCtes
         |SELECT d.doc_id, coalesce(am.canon, d.doc_id) AS canonical_id,
         |  am.canon IS NULL AS kept
         |FROM documents d LEFT JOIN am ON d.doc_id = am.doc_id
         |WHERE d.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
         |ORDER BY d.doc_id""".stripMargin,
    "multimodal_video_admission" ->
      s"""WITH $videoFpCtes,
         |$videoNeighborCtes
         |SELECT d.doc_id, coalesce(vm.canon, d.doc_id) AS canonical_id,
         |  vm.canon IS NULL AS kept
         |FROM documents d LEFT JOIN vm ON d.doc_id = vm.doc_id
         |WHERE d.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
         |ORDER BY d.doc_id""".stripMargin,
    // temporal luma-contour fingerprint recomputed from the fixture
    // recipe — Spark must reproduce it through real Y4M decode + per-
    // frame luma sums + contour bits
    "multimodal_video_fp" ->
      s"""WITH $videoFpCtes
         |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, vfp
         |FROM vfp ORDER BY doc_id""".stripMargin,
    // banded Hamming search replicated in SQL: same 4×8-bit bands, same
    // radius — the oracle's candidate set IS the operator's candidate set
    "multimodal_video_dups" ->
      s"""WITH $videoFpCtes,
         |$videoNeighborCtes
         |SELECT doc_a, doc_b, hamming FROM vhm
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // cross-modal curation gate: one row per doc with per-modality
    // duplicate flags (exact text md5 keep-first; image / audio / video
    // smaller-id fingerprint neighbor at radius 3) and the conjunction
    "pipeline_multimodal" ->
      s"""WITH $phashCtes,
         |$audioFpCtes,
         |$videoFpCtes,
         |$imageNeighborCtes,
         |$audioNeighborCtes,
         |$videoNeighborCtes,
         |tx AS (SELECT doc_id,
         |        row_number() OVER (PARTITION BY md5(text)
         |                           ORDER BY doc_id) > 1 AS text_dup
         |      FROM documents)
         |SELECT t.doc_id, t.text_dup,
         |  im.canon IS NOT NULL AS image_dup,
         |  am.canon IS NOT NULL AS audio_dup,
         |  vm.canon IS NOT NULL AS video_dup,
         |  NOT (t.text_dup OR im.canon IS NOT NULL
         |       OR am.canon IS NOT NULL OR vm.canon IS NOT NULL) AS kept
         |FROM tx t LEFT JOIN im ON t.doc_id = im.doc_id
         |          LEFT JOIN am ON t.doc_id = am.doc_id
         |          LEFT JOIN vm ON t.doc_id = vm.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    // per-frame video statistics recomputed from the fixture recipe —
    // Spark must reproduce them through a real Y4M parse + frame decode,
    // so a header-tag, FRAME-marker, or plane-indexing defect breaks the
    // hash; is_cut re-runs the detection inequality in SQL
    "multimodal_video_frames" ->
      s"""WITH $videoCtes
         |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, mean_luma_milli,
         |  sad AS sum_abs_diff,
         |  (npy > 0 AND sad > 10 * n) AS is_cut
         |FROM vs ORDER BY doc_id, frame_idx""".stripMargin,
    // scene decomposition: cut count + keyframe list (frame 0 plus every
    // detected cut), joined to the recipe dimensions
    "multimodal_video_scenes" ->
      s"""WITH $videoCtes
         |SELECT v.doc_id, CAST(max(d.w) AS BIGINT) AS width,
         |  CAST(max(d.h) AS BIGINT) AS height,
         |  CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum(CASE WHEN npy > 0 AND sad > 10 * n THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_cuts,
         |  string_agg(CASE WHEN f = 0 OR (npy > 0 AND sad > 10 * n)
         |               THEN CAST(f AS VARCHAR) END, ',' ORDER BY f)
         |    AS keyframes
         |FROM vs v JOIN vd d ON v.doc_id = d.doc_id
         |GROUP BY v.doc_id ORDER BY v.doc_id""".stripMargin,
    "dedup_minhash_lsh" -> bruteJaccardOracle,
    "dedup_minhash_lsh_sql" -> bruteJaccardOracle,
    "dedup_ngram_jaccard" -> bruteJaccardOracle,
    // head/tail-anchored candidates + exact relative Levenshtein
    "dedup_edit_distance" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
        |           WHERE text IS NOT NULL),
        |keys AS (
        |  SELECT doc_id, 'h' || substr(text, 1, 24) AS k FROM d
        |  UNION ALL
        |  SELECT doc_id, 't' || substr(text, greatest(1, n - 23), 24) AS k FROM d),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
        |         FROM keys a JOIN keys b ON a.k = b.k AND a.doc_id < b.doc_id)
        |SELECT c.doc_i, c.doc_j,
        |  CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist,
        |  CAST(greatest(length(x.text), length(y.text)) AS BIGINT) AS max_len
        |FROM cand c JOIN d x ON x.doc_id = c.doc_i JOIN d y ON y.doc_id = c.doc_j
        |WHERE levenshtein(x.text, y.text) * 100
        |      <= greatest(length(x.text), length(y.text)) * 10
        |ORDER BY doc_i, doc_j""".stripMargin,
    // asymmetric containment twin of bruteJaccardOracle (doc-in-doc)
    "dedup_containment" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                        for i in range(1, len(w) - 1)]) AS s
        |       FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
        |        len(list_intersect(a.s, b.s)) AS inter,
        |        len(a.s) AS n_i, len(b.s) AS n_j
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |q AS (SELECT CASE WHEN n_j < n_i THEN doc_j ELSE doc_i END AS doc_inner,
        |        CASE WHEN n_j < n_i THEN doc_i ELSE doc_j END AS doc_outer,
        |        inter, least(n_i, n_j) AS n_inner
        |      FROM p)
        |SELECT doc_inner, doc_outer, CAST(inter AS BIGINT) AS inter,
        |  CAST(n_inner AS BIGINT) AS n_inner,
        |  (inter * 20000 + n_inner) // (2 * n_inner) AS cont_bp
        |FROM q WHERE inter * 10000 >= n_inner * 8000
        |ORDER BY doc_inner, doc_outer""".stripMargin,
    "dedup_exact_sql" ->
      """SELECT md5(text) AS text_key, min(doc_id) AS canonical_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    // connected components of the near-dup graph: transitive closure via
    // recursive CTE, canonical label = min reachable doc id (incl. self)
    "dedup_clusters" ->
      s"""WITH RECURSIVE
         |$clusterCtes
         |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,
    // keep-best canonicalization: same cluster closure, then a per-cluster
    // first_value window ordered by (n_tokens DESC, doc_id)
    "dedup_keep_best" ->
      s"""WITH RECURSIVE
         |$clusterCtes,
         |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |        FROM reach GROUP BY a),
         |m AS (SELECT lab.doc_id, lab.cluster_id,
         |        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
         |      FROM lab JOIN documents d ON lab.doc_id = d.doc_id)
         |SELECT doc_id, cluster_id, n_tokens,
         |  first_value(doc_id) OVER (PARTITION BY cluster_id
         |    ORDER BY n_tokens DESC, doc_id) AS keep_id,
         |  first_value(doc_id) OVER (PARTITION BY cluster_id
         |    ORDER BY n_tokens DESC, doc_id) = doc_id AS kept
         |FROM m ORDER BY doc_id""".stripMargin,
    // union-vs-incremental equivalence: whole-corpus transitive closure,
    // restricted to the batch ids (the operator must reproduce it while
    // only propagating labels over the batch-side subgraph)
    "dedup_incremental" -> incrementalNearDupOracle,
    // the artifact-table path must land on the SAME whole-corpus answer
    "dedup_incremental_indexed" -> incrementalNearDupOracle,
    // whole-corpus exact dedup restricted to the batch ids — the same
    // union-vs-incremental equivalence contract as dedup_incremental
    "dedup_incremental_exact" ->
      """WITH k AS (SELECT doc_id, md5(text) AS key FROM documents),
        |canon AS (SELECT key, min(doc_id) AS canonical_id FROM k GROUP BY key)
        |SELECT k.doc_id, canon.canonical_id,
        |       (canon.canonical_id = k.doc_id) AS admitted
        |FROM k JOIN canon ON k.key = canon.key
        |WHERE k.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
        |ORDER BY k.doc_id""".stripMargin,
    "sample_docs" ->
      """SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < 2000
        |ORDER BY doc_id""".stripMargin,
    // weighted sample: keep iff bucket < quality score (ttr bp)
    "sample_weighted" ->
      """WITH t AS (SELECT doc_id,
        |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |       * 20000 + len(string_split(text, ' ')))
        |      // (2 * len(string_split(text, ' '))) AS ttr_bp
        |  FROM documents)
        |SELECT doc_id, ttr_bp FROM t
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < ttr_bp
        |ORDER BY doc_id""".stripMargin,
    "pack_shards" ->
      """SELECT doc_id, n_tokens,
        |  CAST(prefix // 2048 AS BIGINT) AS shard_id FROM (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // same exclusive-prefix CTE as pack_shards; the (seq, doc) overlap
    // rows are pure arithmetic on the offset, unnested per sequence
    "pack_sequences" ->
      """WITH pf AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents)),
        |x AS (SELECT doc_id, n_tokens, prefix,
        |        prefix // 128 AS s0,
        |        (prefix + n_tokens - 1) // 128 AS s1
        |      FROM pf)
        |SELECT CAST(s0 + t.i AS BIGINT) AS seq_id, doc_id,
        |  CAST(greatest(prefix, (s0 + t.i) * 128) - prefix AS BIGINT)
        |    AS doc_offset,
        |  CAST(greatest(prefix, (s0 + t.i) * 128) - (s0 + t.i) * 128 AS BIGINT)
        |    AS seq_offset,
        |  CAST(least(prefix + n_tokens, (s0 + t.i + 1) * 128)
        |       - greatest(prefix, (s0 + t.i) * 128) AS BIGINT) AS len
        |FROM x CROSS JOIN unnest(range(s1 - s0 + 1)) AS t(i)
        |ORDER BY seq_id, doc_id""".stripMargin,
    // whole-corpus pack restricted to the batch's OUTPUT rows — the
    // continuation contract: incremental placement ≡ union placement
    "pack_sequences_incremental" ->
      """WITH pf AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents)),
        |x AS (SELECT doc_id, n_tokens, prefix,
        |        prefix // 128 AS s0,
        |        (prefix + n_tokens - 1) // 128 AS s1
        |      FROM pf)
        |SELECT CAST(s0 + t.i AS BIGINT) AS seq_id, doc_id,
        |  CAST(greatest(prefix, (s0 + t.i) * 128) - prefix AS BIGINT)
        |    AS doc_offset,
        |  CAST(greatest(prefix, (s0 + t.i) * 128) - (s0 + t.i) * 128 AS BIGINT)
        |    AS seq_offset,
        |  CAST(least(prefix + n_tokens, (s0 + t.i + 1) * 128)
        |       - greatest(prefix, (s0 + t.i) * 128) AS BIGINT) AS len
        |FROM x CROSS JOIN unnest(range(s1 - s0 + 1)) AS t(i)
        |WHERE doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
        |ORDER BY seq_id, doc_id""".stripMargin,
    // same md5(epoch:seq_id) permutation key; sequence count from the
    // corpus token total, never from a data scan
    "shuffle_epochs" ->
      """WITH tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
        |            FROM documents),
        |sq AS (SELECT unnest(range((t + 127) // 128)) AS seq_id FROM tot),
        |ep AS (SELECT seq_id, e AS epoch
        |       FROM sq CROSS JOIN unnest(range(2)) AS x(e)),
        |k AS (SELECT epoch, seq_id,
        |        md5(CAST(epoch AS VARCHAR) || ':' || CAST(seq_id AS VARCHAR))
        |          AS skey
        |      FROM ep),
        |s AS (SELECT epoch, seq_id, skey,
        |        CAST(('0x' || substring(skey, 1, 8)) AS BIGINT) % 8 AS shard
        |      FROM k)
        |SELECT CAST(epoch AS BIGINT) AS epoch, seq_id, shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, shard
        |    ORDER BY skey, seq_id) AS BIGINT) AS pos
        |FROM s ORDER BY epoch, shard, pos""".stripMargin,
    "corpus_manifest" ->
      s"""WITH $langCtes
         |SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(d.text)) AS BIGINT) AS total_chars
         |FROM lang JOIN documents d ON lang.doc_id = d.doc_id
         |GROUP BY pred_lang ORDER BY pred_lang""".stripMargin,
    "corpus_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
        |  CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents""".stripMargin,
    // curation funnel: quality gate >= 30 tokens, keep-lowest exact dedup,
    // then drop non-canonical members of the (full-corpus) near-dup
    // clusters — same cluster CTEs as dedup_clusters
    // the full pipeline: every stage is an already-oracle-checked
    // fragment; this entry re-verifies their COMPOSITION (threshold
    // computed on the domain-gated subset, clusters on the full corpus)
    // split CTEs (as split_leakage_guard) -> train-only prefix shards
    "pipeline_eval_safe" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                        for i in range(1, len(w) - 1)]) AS s
        |       FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
        |        len(list_intersect(a.s, b.s)) AS inter,
        |        len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pairs AS (SELECT doc_i, doc_j FROM p WHERE inter * 2 >= u),
        |ids AS (SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < 1000 AS is_test
        |  FROM documents),
        |edges AS (SELECT doc_i AS a, doc_j AS b FROM pairs
        |          UNION ALL SELECT doc_j, doc_i FROM pairs),
        |leaky AS (SELECT DISTINCT e.a AS doc_id
        |          FROM edges e JOIN ids i ON e.b = i.doc_id AND i.is_test),
        |train AS (SELECT i.doc_id,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        |  FROM ids i JOIN documents d USING (doc_id)
        |  WHERE NOT i.is_test AND i.doc_id NOT IN (SELECT doc_id FROM leaky))
        |SELECT doc_id, n_tokens,
        |  CAST(prefix // 2048 AS BIGINT) AS shard_id FROM (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |  FROM train)
        |ORDER BY doc_id""".stripMargin,
    "pipeline_training_data" ->
      s"""WITH RECURSIVE
         |$clusterCtes,
         |nc AS (SELECT a AS doc_id FROM reach GROUP BY a
         |       HAVING least(a, min(b)) <> a),
         |dt AS (SELECT doc_id, source, md5(text) AS text_key,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |       * 20000 + len(string_split(text, ' ')))
         |      // (2 * len(string_split(text, ' '))) AS ttr_bp
         |  FROM documents),
         |rep AS (SELECT source,
         |    ((count(*) - count(DISTINCT text_key)) * 20000 + count(*))
         |      // (2 * count(*)) AS dup_bp,
         |    (CAST(sum(ttr_bp) AS BIGINT) * 2 + count(*))
         |      // (2 * count(*)) AS avg_ttr_bp
         |  FROM dt GROUP BY source),
         |bad AS (SELECT source FROM rep
         |        WHERE avg_ttr_bp < 4800 OR dup_bp > 2000),
         |g1 AS (SELECT dt.* FROM dt
         |       WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.source = dt.source)),
         |h AS (SELECT ttr_bp, count(*) AS cnt FROM g1 GROUP BY ttr_bp),
         |c AS (SELECT ttr_bp,
         |        sum(cnt) OVER (ORDER BY ttr_bp DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |        sum(cnt) OVER () AS total
         |      FROM h),
         |thr AS (SELECT max(ttr_bp) AS thr FROM c
         |        WHERE cum * 10000 >= total * 7500),
         |g2 AS (SELECT g1.* FROM g1, thr WHERE g1.ttr_bp >= thr),
         |ex AS (SELECT doc_id, n_tokens FROM (
         |        SELECT doc_id, n_tokens,
         |          row_number() OVER (PARTITION BY text_key ORDER BY doc_id) AS rn
         |        FROM g2) WHERE rn = 1),
         |surv AS (SELECT doc_id, n_tokens FROM ex
         |         WHERE doc_id NOT IN (SELECT doc_id FROM nc))
         |SELECT doc_id, n_tokens,
         |  CAST(prefix // 2048 AS BIGINT) AS shard_id FROM (
         |  SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
         |  FROM surv)
         |ORDER BY doc_id""".stripMargin,
    "pipeline_clean_corpus" ->
      s"""WITH RECURSIVE
         |$clusterCtes,
         |nc AS (SELECT a AS doc_id FROM reach GROUP BY a
         |       HAVING least(a, min(b)) <> a),
         |tk AS (SELECT doc_id, text,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents),
         |q AS (SELECT * FROM tk WHERE n_tokens >= 30),
         |ex AS (SELECT doc_id, n_tokens FROM (
         |        SELECT doc_id, n_tokens,
         |          row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |        FROM q) WHERE rn = 1)
         |SELECT doc_id, n_tokens FROM ex
         |WHERE doc_id NOT IN (SELECT doc_id FROM nc)
         |ORDER BY doc_id""".stripMargin,
    "dedup_embedding" ->
      """SELECT a.vec_id AS vec_i, b.vec_id AS vec_j
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY vec_i, vec_j""".stripMargin,
    "dedup_embedding_sql" ->
      """SELECT a.vec_id AS vec_i, b.vec_id AS vec_j
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY vec_i, vec_j""".stripMargin,
    "dedup_embedding_lsh" -> lshPairOracle,
    // embedding-space decontamination: brute cross-set cosine screen
    // (pair membership has >= 1e-4 margin on this data; cosines are not
    // emitted — the dedup_embedding contract)
    "decontaminate_semantic" ->
      """WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
        |    CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 10000 < 1000 AS is_eval
        |  FROM embeddings)
        |SELECT t.vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits
        |FROM b t JOIN b e ON (NOT t.is_eval) AND e.is_eval
        |WHERE list_cosine_similarity(t.ve, e.ve) >= 0.4
        |GROUP BY t.vec_id ORDER BY t.vec_id""".stripMargin,
    // LSH-prefiltered screen: the hyperplane buckets replayed in SQL
    // (lshBucketCtes), candidates = cross-set hamming <= 1, exact verify
    "decontaminate_semantic_lsh" -> decontaminateSemLshOracle(),
    // the frozen-artifact probe is the LSH screen restricted to the
    // batch slice (per-doc purity given the persisted buckets)
    "decontaminate_semantic_incremental" -> decontaminateSemLshOracle(
      "AND t.vec_id >= (SELECT (max(vec_id) * 4) // 5 FROM embeddings)"),
    "decontaminate_semantic_stream" -> decontaminateSemLshOracle(
      "AND t.vec_id >= (SELECT (max(vec_id) * 4) // 5 FROM embeddings)"),
    "dedup_semantic" -> semanticDedupOracle(),
    "dedup_semantic_incremental" -> semanticDedupOracle(
      "WHERE emb.vec_id >= (SELECT (max(vec_id) * 4) // 5 FROM embeddings)"),
    "cluster_embeddings" -> kmeansClusterOracle,
    "cluster_assign_incremental" -> kmeansIncrementalOracle,
    // cluster-balanced sampling: the same trained quantizer + assignment,
    // then the per-cell (md5-bucket, vec_id) pick replayed as one window
    "sample_cluster_balanced" ->
      ("WITH " + kmTrainCtes("") + ",\n" + kmAsg("af", KmIters) + "\n" +
        """SELECT vec_id, CAST(cell AS BIGINT) AS cell, rk FROM (
          |  SELECT vec_id, cell, CAST(row_number() OVER (PARTITION BY cell
          |    ORDER BY CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
          |      AS BIGINT) % 10000, vec_id) AS BIGINT) AS rk
          |  FROM af)
          |WHERE rk <= 8 ORDER BY vec_id""".stripMargin),
    // incremental cluster-balanced admission: train on the 4/5 prefix,
    // assign EVERYTHING against those frozen centroids, rank per cell in
    // the content-free order, restrict the pick to the batch — the
    // whole-corpus pick restricted to the arriving slice
    "sample_cluster_balanced_incremental" -> clusterBalancedIncOracle,
    // the streamed form: same frozen-centroid assignment, per-batch rank
    // among everything-so-far (ids below that batch's end), restricted to
    // the batch's id range — the evolving-quota admission replayed as
    // three window passes
    "sample_cluster_balanced_stream" -> clusterBalancedStreamOracle,
    "ann_artifact_drift" -> annArtifactDriftOracle,
    "ann_topk_lsh" -> lshTopKOracle,
    "ann_topk_ivf" -> ivfTopKOracle,
    "ann_topk_pq" -> pqTopKOracle,
    "ann_pq_encode_inc" -> pqEncodeIncOracle,
    "ann_topk_ivfpq" -> ivfPqTopKOracle,
    "ann_topk_ivfpq_res" -> ivfPqResTopKOracle,
    "ann_topk_ivfpq_refine" -> ivfPqResRefineOracle,
    // autoM(n≤1M, k=10) = the pinned 40 floor, so the auto-sized refine
    // is the same chain at every driver SF
    "ann_topk_refine_auto" -> ivfPqResRefineOracle,
    "ann_ivfpq_encode_inc" -> ivfPqResEncodeIncOracle,
    "ann_topk_sq8" -> sqTopKOracle,
    "ann_regime_probe" -> annRegimeProbeOracle,
    // the fixture routes uniform (ann_regime_probe pins it), so the
    // routed result is the SQ8 full scan verbatim
    "ann_topk_adaptive" -> sqTopKOracle,
    "ann_topk_ivfsq" -> ivfSqTopKOracle,
    "ann_topk_ivfsq_cell" -> ivfSqCellTopKOracle,
    "ann_sq_encode_inc" -> sqEncodeIncOracle,
    "ann_sqcell_artifacts" -> sqCellArtifactsOracle,
    "ann_ivfsq_cell_encode_inc" -> ivfSqCellEncodeIncOracle,
    "ann_sqcell_bounds_drift" -> sqCellBoundsDriftOracle,
    // streamed fold ≡ one-shot incremental encode row-for-row
    "ann_sq_encode_stream" -> sqEncodeIncOracle,
    "ann_sq_bounds_drift" -> sqBoundsDriftOracle,
    // the report's VALUES are fully determined (deterministic ANN paths +
    // exact baseline), so the oracle is the expected fixed table; a recall
    // regression or a query that stops producing rows flips a cell
    "ann_recall_floor" ->
      """SELECT 'ivf' AS method, CAST(20 AS BIGINT) AS n_queries, true AS floor_met
        |UNION ALL
        |SELECT 'lsh', CAST(20 AS BIGINT), true
        |UNION ALL
        |SELECT 'sq8', CAST(20 AS BIGINT), true
        |UNION ALL
        |SELECT 'ivfsq', CAST(20 AS BIGINT), true
        |ORDER BY method""".stripMargin,
    "ann_topk_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT query_id, vec_id AS neighbor_id,
        |        round(list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])), 6) AS cos_r
        |      FROM q, embeddings WHERE vec_id <> query_id),
        |r AS (SELECT query_id, neighbor_id,
        |        CAST(row_number() OVER (PARTITION BY query_id
        |                                ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
        |      FROM c)
        |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
        |ORDER BY query_id, "rank"""".stripMargin,
  )

  /** Independent SQL replica of [[Similarity.cosineNearDupPairsLsh]]'s
    * approximation contract: the hyperplanes are deterministic constants
    * (splitmix64-derived thousandths — `k/1000.0` reproduces the exact
    * doubles), the bucket is the sign-bit sum, candidates are pairs within
    * hamming 1, verify is the cosine threshold. Both engines loop the dot
    * product in index order over identical doubles, so even sign decisions
    * at 1e-18 agree bit-for-bit. This pins the LSH pipeline — bucketing,
    * probing, verify — not just its output rows.
    */
  /** Shared CTE chain replicating the deterministic hyperplane bucketing
    * (`emb` → `b(vec_id, ve, bucket)`).
    */
  /** Unrolled-CTE replica of the BPE training loop
    * ([[graft.functions.TextAnalysis.bpeMerges]]): `w0` is the lowercased
    * `[a-z]+` word-type table with corpus counts; each round r is three
    * CTEs — `p_r` counts adjacent symbol pairs (1-based list subscripts
    * over the `..`-delimited symseq; `s` = ['', sym1..symN, ''], so lhs
    * indices run 2..len-2), `m_r` is the (count DESC, lhs, rhs) argmax,
    * `e_r` applies the merge with the same one-outer-dot `replace`
    * contract as the Spark side. `replace` is leftmost non-overlapping in
    * both engines, so greedy application order is pinned bit-for-bit.
    */
  /** Every chained CTE is `AS MATERIALIZED`: each `e_r` is referenced
    * twice (by `p_{r+1}` and `e_{r+1}`), so DuckDB's default inlining
    * re-derives the whole prefix per reference — measured 119 s / 329 s
    * for the two tokenize oracles at sf0.01 (exponential in k);
    * materialized, 0.5 s / 0.2 s with identical results.
    */
  /** Per-round (pair-count, argmax, apply) CTE template — shared by the
    * char-level and byte-level trainers (the round logic never looks
    * inside a symbol, exactly like the Spark-side merge loop).
    */
  private def bpeRoundCtes(k: Int): String =
    (1 to k).map { r =>
      s"""p$r AS MATERIALIZED (SELECT s[i] AS lhs, s[i + 1] AS rhs,
         |    CAST(sum(c) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(symseq, '..') AS s, c FROM e${r - 1})
         |  CROSS JOIN unnest(range(2, len(s) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$r
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |e$r AS MATERIALIZED (SELECT word, c,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM e${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")

  private def bpeTrainCtes(k: Int, corpus: String = "documents"): String = {
    val base =
      s"""w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
        |        FROM $corpus)
        |  WHERE regexp_full_match(word, '[a-z]+') GROUP BY word),
        |e0 AS MATERIALIZED (SELECT word, c,
        |    regexp_replace(word, '(.)', '..\\1', 'g') || '..' AS symseq
        |  FROM w0)""".stripMargin
    base + ",\n" + bpeRoundCtes(k)
  }

  private def bpeVocabOracle(k: Int): String = {
    val rows = (1 to k).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_rank, lhs, rhs,
         |  lhs || rhs AS merged, cnt AS pair_count FROM m$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH ${bpeTrainCtes(k)}\nSELECT * FROM (\n$rows\n) ORDER BY merge_rank"
  }

  /** BPE encoding oracle: re-trains via [[bpeTrainCtes]], then applies the
    * k merges in rank order to every doc's positional word stream and
    * encodes the final symbols with dense (count DESC, sym) ids — the
    * exact [[graft.functions.TextAnalysis.encodeBpe]] contract, including
    * docs with zero alphabetic words dropping out on both sides.
    */
  private def bpeTokenizeOracle(k: Int): String = {
    val enc = (1 to k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT doc_id, pos,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM x${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeTrainCtes(k)},
       |d0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS word
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
       |        FROM documents)
       |  CROSS JOIN unnest(range(len(w))) AS u(i)),
       |x0 AS MATERIALIZED (SELECT doc_id, pos,
       |    regexp_replace(word, '(.)', '..\\1', 'g') || '..' AS symseq
       |  FROM d0 WHERE regexp_full_match(word, '[a-z]+')),
       |$enc,
       |sy AS MATERIALIZED (SELECT doc_id, pos, CAST(i AS BIGINT) AS spos, s[i] AS sym
       |  FROM (SELECT doc_id, pos, string_split(symseq, '..') AS s FROM x$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i)),
       |vc AS (SELECT sym, CAST(count(*) AS BIGINT) AS n FROM sy GROUP BY sym),
       |vi AS (SELECT sym, CAST(row_number() OVER (ORDER BY n DESC, sym)
       |    AS BIGINT) AS id FROM vc),
       |en AS (SELECT doc_id, pos, spos, id FROM sy JOIN vi USING (sym))
       |SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos, spos) AS ids_str
       |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** BYTE-level BPE oracle: same shape as [[bpeTokenizeOracle]] with the
    * symbol domain switched to lowercase-hex UTF-8 bytes (`hex()` encodes
    * a string's UTF-8 bytes identically in DuckDB and Spark) and the
    * pre-tokenizer widened to every non-empty whitespace token. The
    * corpus is the planted-non-ASCII transform (a→ä, o→ø) of `documents`,
    * so every word exercises multi-byte sequences.
    */
  private def bpeBytesTokenizeOracle(k: Int): String = {
    val enc = (1 to k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT doc_id, pos,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM x${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH dx AS MATERIALIZED (SELECT doc_id,
       |    replace(replace(text, 'a', 'ä'), 'o', 'ø') AS text
       |  FROM documents),
       |w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM dx)
       |  WHERE word <> '' GROUP BY word),
       |e0 AS MATERIALIZED (SELECT word, c,
       |    regexp_replace(lower(hex(word)), '(..)', '..\\1', 'g') || '..' AS symseq
       |  FROM w0),
       |${bpeRoundCtes(k)},
       |d0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM dx)
       |  CROSS JOIN unnest(range(len(w))) AS u(i)),
       |x0 AS MATERIALIZED (SELECT doc_id, pos,
       |    regexp_replace(lower(hex(word)), '(..)', '..\\1', 'g') || '..' AS symseq
       |  FROM d0 WHERE word <> ''),
       |$enc,
       |sy AS MATERIALIZED (SELECT doc_id, pos, CAST(i AS BIGINT) AS spos, s[i] AS sym
       |  FROM (SELECT doc_id, pos, string_split(symseq, '..') AS s FROM x$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i)),
       |vc AS (SELECT sym, CAST(count(*) AS BIGINT) AS n FROM sy GROUP BY sym),
       |vi AS (SELECT sym, CAST(row_number() OVER (ORDER BY n DESC, sym)
       |    AS BIGINT) AS id FROM vc),
       |en AS (SELECT doc_id, pos, spos, id FROM sy JOIN vi USING (sym))
       |SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos, spos) AS ids_str
       |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Byte-level incremental oracle: [[bpeBytesTokenizeOracle]]'s hex
    * domain with [[bpeIncrementalOracle]]'s split — train merges and the
    * token-weighted frozen vocabulary over the 4/5 doc_id prefix of the
    * planted corpus, encode the 1/5 tail with OOV → 0.
    */
  private def bpeBytesIncrementalOracle(k: Int): String = {
    val cut = "(SELECT (max(doc_id) * 4) // 5 FROM documents)"
    val enc = (1 to k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT doc_id, pos,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM x${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH dx AS MATERIALIZED (SELECT doc_id,
       |    replace(replace(text, 'a', 'ä'), 'o', 'ø') AS text
       |  FROM documents),
       |w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM dx WHERE doc_id < $cut)
       |  WHERE word <> '' GROUP BY word),
       |e0 AS MATERIALIZED (SELECT word, c,
       |    regexp_replace(lower(hex(word)), '(..)', '..\\1', 'g') || '..' AS symseq
       |  FROM w0),
       |${bpeRoundCtes(k)},
       |sv AS MATERIALIZED (SELECT s[i] AS sym, CAST(sum(c) AS BIGINT) AS n
       |  FROM (SELECT string_split(symseq, '..') AS s, c FROM e$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i) GROUP BY 1),
       |vi AS MATERIALIZED (SELECT sym, CAST(row_number() OVER (ORDER BY n DESC, sym)
       |    AS BIGINT) AS id FROM sv),
       |d0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM dx WHERE doc_id >= $cut)
       |  CROSS JOIN unnest(range(len(w))) AS u(i)),
       |x0 AS MATERIALIZED (SELECT doc_id, pos,
       |    regexp_replace(lower(hex(word)), '(..)', '..\\1', 'g') || '..' AS symseq
       |  FROM d0 WHERE word <> ''),
       |$enc,
       |sy AS MATERIALIZED (SELECT doc_id, pos, CAST(i AS BIGINT) AS spos, s[i] AS sym
       |  FROM (SELECT doc_id, pos, string_split(symseq, '..') AS s FROM x$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i)),
       |en AS (SELECT doc_id, pos, spos,
       |    coalesce(vi.id, CAST(0 AS BIGINT)) AS id
       |  FROM sy LEFT JOIN vi USING (sym))
       |SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos, spos) AS ids_str
       |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Incremental-BPE oracle: trains merges AND the frozen vocabulary over
    * the first 4/5 of doc ids (the artifact corpus — `sv` is the
    * token-weighted post-merge symbol count, `sum(c)` over the type
    * table), then encodes the remaining 1/5 with those frozen tables.
    * Batch symbols absent from the training vocabulary LEFT-JOIN to NULL
    * and coalesce to id 0 — the
    * [[graft.functions.TextAnalysis.encodeBpeWith]] OOV contract.
    */
  private def bpeIncrementalOracle(k: Int): String = {
    val cut = "(SELECT (max(doc_id) * 4) // 5 FROM documents)"
    val enc = (1 to k).map { r =>
      s"""x$r AS MATERIALIZED (SELECT doc_id, pos,
         |    replace(symseq, '.' || m.lhs || '..' || m.rhs || '.',
         |            '.' || m.lhs || m.rhs || '.') AS symseq
         |  FROM x${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    val train =
      bpeTrainCtes(k, s"(SELECT * FROM documents WHERE doc_id < $cut) tr")
    s"""WITH $train,
       |sv AS MATERIALIZED (SELECT s[i] AS sym, CAST(sum(c) AS BIGINT) AS n
       |  FROM (SELECT string_split(symseq, '..') AS s, c FROM e$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i) GROUP BY 1),
       |vi AS MATERIALIZED (SELECT sym, CAST(row_number() OVER (ORDER BY n DESC, sym)
       |    AS BIGINT) AS id FROM sv),
       |d0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS word
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
       |        FROM documents WHERE doc_id >= $cut)
       |  CROSS JOIN unnest(range(len(w))) AS u(i)),
       |x0 AS MATERIALIZED (SELECT doc_id, pos,
       |    regexp_replace(word, '(.)', '..\\1', 'g') || '..' AS symseq
       |  FROM d0 WHERE regexp_full_match(word, '[a-z]+')),
       |$enc,
       |sy AS MATERIALIZED (SELECT doc_id, pos, CAST(i AS BIGINT) AS spos, s[i] AS sym
       |  FROM (SELECT doc_id, pos, string_split(symseq, '..') AS s FROM x$k)
       |  CROSS JOIN unnest(range(2, len(s))) AS t(i)),
       |en AS (SELECT doc_id, pos, spos,
       |    coalesce(vi.id, CAST(0 AS BIGINT)) AS id
       |  FROM sy LEFT JOIN vi USING (sym))
       |SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos, spos) AS ids_str
       |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Whole-corpus span-dedup oracle; `restrict` filters the OUTPUT rows
    * (winner selection always sees the full corpus) — which is precisely
    * the incremental operator's contract.
    */
  /** Exact-values-plus-theorem-boolean oracles shared by the one-shot and
    * streamed sketch gates: HLL artifacts are bit-identical under any
    * batching (register max), MG counter values vary but the gated
    * theorem booleans hold for any merge tree.
    */
  /** Cross-source overlap oracle: exact pairwise intersection of the
    * per-source distinct-token vocabularies over the all-pairs grid
    * (`src_a < src_b`), with `within_bound` pinned TRUE — the Spark
    * side's sketch estimate must land inside its stated union-relative
    * bound on every pair.
    */
  private val vocabOverlapOracle: String =
    """WITH toks AS (SELECT DISTINCT * FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents WHERE source IS NOT NULL AND text IS NOT NULL)),
      |srcs AS (SELECT DISTINCT source FROM toks),
      |pairs AS (SELECT a.source AS src_a, b.source AS src_b
      |          FROM srcs a CROSS JOIN srcs b WHERE a.source < b.source),
      |ov AS (SELECT x.source AS src_a, y.source AS src_b,
      |         count(*) AS n_overlap_exact
      |       FROM toks x JOIN toks y
      |         ON x.tok = y.tok AND x.source < y.source
      |       GROUP BY 1, 2)
      |SELECT p.src_a, p.src_b,
      |  COALESCE(ov.n_overlap_exact, 0) AS n_overlap_exact,
      |  TRUE AS within_bound
      |FROM pairs p LEFT JOIN ov
      |  ON ov.src_a = p.src_a AND ov.src_b = p.src_b
      |ORDER BY p.src_a, p.src_b""".stripMargin

  private val vocabCardinalityOracle: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL)
      |SELECT coalesce(source, 'TOTAL') AS source,
      |  CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens_exact,
      |  true AS within_bound
      |FROM toks GROUP BY ROLLUP(source)
      |ORDER BY source""".stripMargin

  private val heavyHitterOracle: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
      |  true AS size_ok,
      |  true AS underestimates_only,
      |  true AS err_within_bound,
      |  true AS heavy_covered
      |FROM toks GROUP BY source
      |ORDER BY source""".stripMargin

  /** Count-Min cells replayed cell-for-cell — shared by the one-shot and
    * the stream-maintained gate (exact vector-add merge ⇒ identical
    * artifacts ⇒ identical readouts).
    */
  private val cmsketchOracle: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
      |             FROM documents WHERE text IS NOT NULL),
      |ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_true FROM tok GROUP BY 1),
      |top AS (SELECT tok, n_true FROM (
      |          SELECT tok, n_true,
      |            row_number() OVER (ORDER BY n_true DESC, tok) AS rk FROM ex)
      |        WHERE rk <= 20),
      |cells AS (SELECT r.i AS rw,
      |            CAST(('0x' || substring(md5('r' || r.i || ' ' || tok), 1, 15))
      |              AS BIGINT) % 1024 AS col_id
      |          FROM tok CROSS JOIN (SELECT unnest(range(4)) AS i) r),
      |st AS (SELECT rw, col_id, CAST(count(*) AS BIGINT) AS cnt
      |       FROM cells GROUP BY 1, 2),
      |keys AS (SELECT t.tok, r.i AS rw,
      |           CAST(('0x' || substring(md5('r' || r.i || ' ' || t.tok), 1, 15))
      |             AS BIGINT) % 1024 AS col_id
      |         FROM top t CROSS JOIN (SELECT unnest(range(4)) AS i) r),
      |es AS (SELECT k.tok, CAST(min(coalesce(st.cnt, 0)) AS BIGINT) AS est
      |       FROM keys k LEFT JOIN st USING (rw, col_id) GROUP BY 1)
      |SELECT t.tok, t.n_true, e.est, e.est >= t.n_true AS never_under,
      |  e.est - t.n_true AS overcount
      |FROM top t JOIN es e USING (tok) ORDER BY tok""".stripMargin

  /** One q-digest compression round chain in DuckDB SQL (the bit-exact
    * replica of `Sketches.qdCompress`): `g{l}` windows pending nodes over
    * their parent, `k{l}` freezes groups reaching `t`, `p{l+1}` collects
    * pushed mass plus — when merging a stored artifact `mat` — the stored
    * nodes at that level. Suffix distinguishes the build-A / build-B /
    * merge chains inside one statement.
    */
  private def qdChainSql(sfx: String, tt: String,
                         mat: Option[String]): String = {
    val rounds = (0 until 8).map { l =>
      val matUnion = mat.map(m =>
        s"\n        UNION ALL SELECT prefix, cnt FROM $m WHERE level = ${l + 1}")
        .getOrElse("")
      s"""g$l$sfx AS MATERIALIZED (SELECT prefix, cnt, prefix >> 7 AS parent,
         |         sum(cnt) OVER (PARTITION BY prefix >> 7) AS s FROM p$l$sfx),
         |k$l$sfx AS MATERIALIZED (SELECT CAST($l AS BIGINT) AS level, prefix, cnt
         |        FROM g$l$sfx, $tt WHERE s >= t),
         |p${l + 1}$sfx AS MATERIALIZED (SELECT prefix, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
         |        SELECT parent AS prefix, cnt FROM g$l$sfx, $tt WHERE s < t$matUnion
         |     ) GROUP BY 1),""".stripMargin
    }.mkString("\n")
    rounds + s"""
      |k8$sfx AS MATERIALIZED (SELECT CAST(8 AS BIGINT) AS level, prefix, cnt FROM p8$sfx),
      |nodes$sfx AS MATERIALIZED (${(0 to 8).map(l => s"SELECT * FROM k$l$sfx")
        .mkString(" UNION ALL ")})""".stripMargin
  }

  /** The q-digest readout + rank-theorem gate in DuckDB SQL (the bit-exact
    * replica of `Sketches.qdGateFrom`). */
  private def qdGateSql(nodes: String, raw: String, tt: String,
                        slack: Int): String =
    s"""ups AS (SELECT (prefix << (7 * level)) - 4611686018427387904
       |              + ((CAST(1 AS BIGINT) << (7 * level)) - 1) AS upper_c, cnt
       |        FROM $nodes),
       |bu AS (SELECT upper_c, CAST(sum(cnt) AS BIGINT) AS cnt FROM ups GROUP BY 1),
       |cw AS MATERIALIZED (SELECT upper_c, sum(cnt) OVER (ORDER BY upper_c) AS cum FROM bu),
       |qq AS (SELECT unnest([50, 90, 99]) AS q),
       |es AS (SELECT q, min(upper_c) AS est_cents
       |       FROM cw, qq, $tt WHERE cum >= (q * n + 99) // 100 GROUP BY q),
       |rk AS (SELECT q, est_cents,
       |         (SELECT CAST(count(*) AS BIGINT) FROM $raw WHERE c <= est_cents) AS rank_le,
       |         (SELECT CAST(count(*) AS BIGINT) FROM $raw WHERE c < est_cents) AS rank_lt
       |       FROM es)
       |SELECT CAST(q AS BIGINT) AS q, n, t, est_cents, rank_le, rank_lt,
       |  rank_le >= (q * n + 99) // 100 AS lo_ok,
       |  rank_lt < (q * n + 99) // 100 + $slack * t AS hi_ok
       |FROM rk, $tt ORDER BY q""".stripMargin

  /** The Spark-SQL-text spelling of `quantile_qdigest` — the same 8
    * window-over-parent freeze/push rounds as the Column API (which
    * `localCheckpoint`s per round; here they unroll as CTEs in one
    * statement), the same readout and the same rank gate. Thresholds
    * arrive as uncorrelated scalar subqueries (no one-row join → no
    * nested-loop plan); the percentile fan-outs are LATERAL VIEW
    * generators or a broadcast equi-join on a constant key. Checked
    * against [[qdigestOracle]] — the identical DuckDB replay — and
    * against the Column twin cell-for-cell in `SqlParitySpec`.
    */
  private def qdigestSparkSql: String = {
    val rounds = (0 until 8).map { l =>
      s"""g$l AS (SELECT prefix, cnt, shiftrightunsigned(prefix, 7) AS parent,
         |        sum(cnt) OVER (PARTITION BY shiftrightunsigned(prefix, 7)) AS s
         |        FROM p$l),
         |k$l AS (SELECT CAST($l AS BIGINT) AS level, prefix, cnt FROM g$l
         |        WHERE s >= (SELECT t FROM tt)),
         |p${l + 1} AS (SELECT parent AS prefix, sum(cnt) AS cnt FROM g$l
         |        WHERE s < (SELECT t FROM tt) GROUP BY parent)""".stripMargin
    }.mkString(",\n")
    val nodes = (0 to 8).map(l => s"SELECT * FROM k$l").mkString(" UNION ALL ")
    s"""WITH raw AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c
       |            FROM events WHERE value IS NOT NULL),
       |tt AS (SELECT CAST(count(1) AS BIGINT) AS n,
       |        greatest(CAST((count(1) + 255) div 256 AS BIGINT),
       |                 CAST(1 AS BIGINT)) AS t
       |       FROM raw),
       |p0 AS (SELECT c + 4611686018427387904 AS prefix, count(1) AS cnt
       |       FROM raw GROUP BY 1),
       |$rounds,
       |k8 AS (SELECT CAST(8 AS BIGINT) AS level, prefix, cnt FROM p8),
       |nodes AS ($nodes),
       |ups AS (SELECT shiftleft(prefix, CAST(7 * level AS INT))
       |             - 4611686018427387904
       |             + (shiftleft(CAST(1 AS BIGINT), CAST(7 * level AS INT))
       |                - 1) AS upper_c, cnt
       |        FROM nodes),
       |bu AS (SELECT upper_c, sum(cnt) AS cnt FROM ups GROUP BY upper_c),
       |cw AS (SELECT upper_c, sum(cnt) OVER (ORDER BY upper_c) AS cum FROM bu),
       |es AS (SELECT q, min(upper_c) AS est_cents
       |       FROM (SELECT upper_c, cum, q FROM cw
       |             LATERAL VIEW explode(array(50L, 90L, 99L)) x AS q)
       |       WHERE cum >= (q * (SELECT n FROM tt) + 99) div 100
       |       GROUP BY q),
       |ra AS (SELECT
       |         count(CASE WHEN c <= (SELECT est_cents FROM es WHERE q = 50)
       |               THEN 1 END) AS le50,
       |         count(CASE WHEN c <  (SELECT est_cents FROM es WHERE q = 50)
       |               THEN 1 END) AS lt50,
       |         count(CASE WHEN c <= (SELECT est_cents FROM es WHERE q = 90)
       |               THEN 1 END) AS le90,
       |         count(CASE WHEN c <  (SELECT est_cents FROM es WHERE q = 90)
       |               THEN 1 END) AS lt90,
       |         count(CASE WHEN c <= (SELECT est_cents FROM es WHERE q = 99)
       |               THEN 1 END) AS le99,
       |         count(CASE WHEN c <  (SELECT est_cents FROM es WHERE q = 99)
       |               THEN 1 END) AS lt99
       |       FROM raw),
       |rk AS (SELECT q,
       |         CASE q WHEN 50 THEN (SELECT est_cents FROM es WHERE q = 50)
       |                WHEN 90 THEN (SELECT est_cents FROM es WHERE q = 90)
       |                ELSE (SELECT est_cents FROM es WHERE q = 99)
       |         END AS est_cents,
       |         CASE q WHEN 50 THEN le50 WHEN 90 THEN le90 ELSE le99
       |         END AS rank_le,
       |         CASE q WHEN 50 THEN lt50 WHEN 90 THEN lt90 ELSE lt99
       |         END AS rank_lt
       |       FROM ra LATERAL VIEW explode(array(50L, 90L, 99L)) x AS q)
       |SELECT q, (SELECT n FROM tt) AS n, (SELECT t FROM tt) AS t,
       |  est_cents, rank_le, rank_lt,
       |  rank_le >= (q * (SELECT n FROM tt) + 99) div 100 AS lo_ok,
       |  rank_lt < (q * (SELECT n FROM tt) + 99) div 100
       |    + 16 * (SELECT t FROM tt) AS hi_ok
       |FROM rk ORDER BY q""".stripMargin
  }

  private val qdigestOracle: String =
    s"""WITH raw AS MATERIALIZED (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c
       |             FROM events WHERE value IS NOT NULL),
       |lv AS MATERIALIZED (SELECT c + 4611686018427387904 AS u FROM raw),
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |         greatest(CAST((count(*) + 255) // 256 AS BIGINT), 1) AS t FROM lv),
       |p0 AS (SELECT u AS prefix, CAST(count(*) AS BIGINT) AS cnt FROM lv GROUP BY 1),
       |${qdChainSql("", "tt", None)},
       |${qdGateSql("nodes", "raw", "tt", 16)}""".stripMargin

  private val qdigestUpdateOracle: String =
    qdigestTwoPhaseOracle("event_id < cutv", "event_id >= cutv")

  /** The streamed maintainer replays as the SAME two-phase build-then-
    * merge, with the engine-portable `event_id % 2` batch split.
    */
  private val qdigestStreamOracle: String =
    qdigestTwoPhaseOracle("event_id % 2 = 0", "event_id % 2 = 1")

  /** Two-phase q-digest oracle: build the first batch's artifact with its
    * own `t`, compress the second batch likewise, merge under the
    * combined `t` — the exact shape of `qdigestUpdate(build(A), B)` and
    * of the 2-batch foreachBatch replay; gate slack 32 (the merged
    * internal-node bound).
    */
  private def qdigestTwoPhaseOracle(aPred: String, bPred: String): String =
    s"""WITH rawe AS MATERIALIZED (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c, event_id
       |              FROM events WHERE value IS NOT NULL),
       |raw AS MATERIALIZED (SELECT c FROM rawe),
       |cutc AS (SELECT (max(event_id) * 4) // 5 AS cutv FROM events),
       |la AS MATERIALIZED (SELECT c + 4611686018427387904 AS u FROM rawe, cutc WHERE $aPred),
       |lb AS MATERIALIZED (SELECT c + 4611686018427387904 AS u FROM rawe, cutc WHERE $bPred),
       |tta AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |          greatest(CAST((count(*) + 255) // 256 AS BIGINT), 1) AS t FROM la),
       |p0a AS (SELECT u AS prefix, CAST(count(*) AS BIGINT) AS cnt FROM la GROUP BY 1),
       |${qdChainSql("a", "tta", None)},
       |ttb AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |          greatest(CAST((count(*) + 255) // 256 AS BIGINT), 1) AS t FROM lb),
       |p0b AS (SELECT u AS prefix, CAST(count(*) AS BIGINT) AS cnt FROM lb GROUP BY 1),
       |${qdChainSql("b", "ttb", None)},
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |         greatest(CAST((count(*) + 255) // 256 AS BIGINT), 1) AS t FROM raw),
       |sm AS MATERIALIZED (SELECT * FROM nodesa UNION ALL SELECT * FROM nodesb),
       |p0m AS (SELECT prefix, CAST(sum(cnt) AS BIGINT) AS cnt FROM sm
       |        WHERE level = 0 GROUP BY 1),
       |${qdChainSql("m", "tt", Some("sm"))},
       |${qdGateSql("nodesm", "raw", "tt", 32)}""".stripMargin

  /** Consecutive-day TV drift over the hdr histogram bins — shared oracle
    * for the one-shot build (`value_drift_daily`) and the foreachBatch
    * streaming maintainer (`value_drift_stream`); merge associativity
    * makes the two result-identical by construction.
    */
  private val valueDriftOracle: String =
    """WITH b AS (SELECT event_type, date_trunc('day', ts) AS day,
      |             CAST(round(value * 100, 0) AS BIGINT) AS cents
      |           FROM events
      |           WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL),
      |bb AS (SELECT event_type, day,
      |    CASE WHEN cents <= 0 THEN 0
      |      ELSE (length(bin(cents)) - 1) * 128
      |         + ((cents - (CAST(1 AS BIGINT) << (length(bin(cents)) - 1)))
      |            >> greatest(length(bin(cents)) - 1 - 7, 0)) + 1 END AS bin_id
      |  FROM b),
      |h AS (SELECT event_type, day, bin_id, CAST(count(*) AS BIGINT) AS cnt
      |      FROM bb GROUP BY 1, 2, 3),
      |n AS (SELECT event_type, day, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1, 2),
      |p AS (SELECT coalesce(a.event_type, c.event_type) AS event_type,
      |        coalesce(a.day, c.day - INTERVAL 1 DAY) AS day,
      |        coalesce(a.cnt, 0) AS c1, coalesce(c.cnt, 0) AS c2
      |      FROM h a FULL OUTER JOIN h c
      |        ON a.event_type = c.event_type AND a.day = c.day - INTERVAL 1 DAY
      |       AND a.bin_id = c.bin_id),
      |w AS (SELECT p.event_type, p.day, p.c1, p.c2, n1.n AS n_from, n2.n AS n_to
      |      FROM p JOIN n n1 ON n1.event_type = p.event_type AND n1.day = p.day
      |             JOIN n n2 ON n2.event_type = p.event_type
      |                      AND n2.day = p.day + INTERVAL 1 DAY)
      |SELECT event_type, day AS day_from, day + INTERVAL 1 DAY AS day_to,
      |  CAST(max(n_from) AS BIGINT) AS n_from, CAST(max(n_to) AS BIGINT) AS n_to,
      |  CAST((sum(abs(c1 * n_to - c2 * n_from)) * 10000)
      |    // (2 * max(n_from) * max(n_to)) AS BIGINT) AS drift_bp
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Shared oracles for the wave-3 analytics that exist on both the
  // DataFrame and SQL-text surfaces (same dual-surface contract as
  // q_markov / q_gapfill): one oracle per algorithm, two declared queries.
  private val weekdayHourOracle: String =
    """SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow,
      |  CAST(hour(ts) AS BIGINT) AS hour,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |    / 100.0 AS sum_value
      |FROM events WHERE ts IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val monthlyGrowthOracle: String =
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)
      |SELECT month, n_orders, cents / 100.0 AS total_price,
      |  CASE WHEN lag(cents) OVER (ORDER BY month) > 0
      |    THEN CAST(((cents - lag(cents) OVER (ORDER BY month)) * 10000)
      |         // lag(cents) OVER (ORDER BY month) AS BIGINT)
      |  END AS growth_bp
      |FROM m ORDER BY month""".stripMargin

  private val interEventGapsOracle: String =
    """WITH e AS (SELECT user_id, ts, event_id FROM events
      |           WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL),
      |g AS (SELECT user_id,
      |        date_diff('microsecond',
      |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
      |      FROM e)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
      |  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
      |  CAST((sum(gap_us) * 2 + count(*)) // (2 * count(*)) AS BIGINT) AS mean_gap_us,
      |  CAST(quantile_cont(gap_us, 0.5) * 2 AS BIGINT) AS p50_gap_us_x2
      |FROM g WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin

  private val madOutliersOracle: String =
    """WITH b AS (SELECT event_id, user_id, event_type,
      |             CAST(round(value * 100, 0) AS BIGINT) AS cents
      |           FROM events
      |           WHERE event_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL),
      |med AS (SELECT event_type, CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med_x2
      |        FROM b GROUP BY 1),
      |dev AS (SELECT b.*, med.med_x2, abs(b.cents * 2 - med.med_x2) AS dev_x2
      |        FROM b JOIN med USING (event_type)),
      |mad AS (SELECT event_type, CAST(quantile_cont(dev_x2, 0.5) * 2 AS BIGINT) AS mad_x4
      |        FROM dev GROUP BY 1)
      |SELECT dev.event_id, dev.user_id, dev.event_type, dev.cents / 100.0 AS value,
      |  dev.med_x2, dev.dev_x2, mad.mad_x4
      |FROM dev JOIN mad USING (event_type)
      |WHERE dev.dev_x2 * 2 > mad.mad_x4 * 3
      |ORDER BY event_id""".stripMargin

  /** The plain per-user totals SQL — shared oracle for the plain, salted,
    * and adaptive variants (all three are result-identical by contract).
    */
  private val userTotalsOracle: String =
    """SELECT user_id,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
      |  count(*) AS n_events
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Engine-portable SimHash oracle (60-bit md5 signatures, 4x15-bit
    * pigeonhole candidates) parameterized by the verify radius — the
    * pigeonhole guarantee holds for any maxHamming <= 3 with 4 chunks.
    */
  private def simhashOracle(maxHamming: Int): String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |             FROM documents),
       |h AS (SELECT doc_id,
       |        CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
       |      FROM tok),
       |bits AS (SELECT doc_id, b.b,
       |           sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |         FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) b
       |         GROUP BY doc_id, b.b),
       |sig AS (SELECT doc_id,
       |          CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END)
       |               AS BIGINT) AS sig
       |        FROM bits GROUP BY doc_id),
       |ch AS (SELECT doc_id, sig, c.c AS chunk_idx,
       |         (sig >> (15 * c.c)) & 32767 AS chunk_key
       |       FROM sig CROSS JOIN (SELECT unnest(range(4)) AS c) c),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_i, y.doc_id AS doc_j,
       |           x.sig AS si, y.sig AS sj
       |         FROM ch x JOIN ch y ON x.chunk_idx = y.chunk_idx
       |           AND x.chunk_key = y.chunk_key AND x.doc_id < y.doc_id)
       |SELECT doc_i, doc_j, CAST(bit_count(xor(si, sj)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(si, sj)) <= $maxHamming
       |ORDER BY doc_i, doc_j""".stripMargin

  private def spanDedupOracle(restrict: String): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
       |              FROM documents),
       |chunks AS (SELECT doc_id, i AS pos,
       |    array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
       |  FROM toks CROSS JOIN unnest(range((len(w) + 9) // 10)) AS t(i)),
       |winners AS (SELECT doc_id, pos, chunk FROM (
       |    SELECT doc_id, pos, chunk,
       |      row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
       |    FROM chunks) WHERE rn = 1),
       |reb AS (SELECT doc_id, count(*) AS spans_kept,
       |    string_agg(chunk, ' ' ORDER BY pos) AS clean_text
       |  FROM winners GROUP BY doc_id)
       |SELECT t.doc_id,
       |  coalesce(reb.clean_text, '') AS clean_text,
       |  coalesce(reb.spans_kept, 0) AS spans_kept,
       |  ((len(w) + 9) // 10) - coalesce(reb.spans_kept, 0) AS spans_dropped
       |FROM toks t LEFT JOIN reb ON t.doc_id = reb.doc_id
       |$restrict
       |ORDER BY t.doc_id""".stripMargin

  /** Dialect-portable funnel SQL: runs verbatim under BOTH Spark SQL (the
    * `q_window_funnel_sql` SQL-text twin) and DuckDB (the oracle for both
    * funnel queries) — one string, three roles, so the twin can't drift.
    */
  private[graft] def windowFunnelSqlAt(windowSec: Long): String =
    s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2
      |       FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |         AND e.ts <= s1.t1 + INTERVAL $windowSec SECOND
      |       GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3
      |       FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |         AND e.ts <= s2.t2 + INTERVAL $windowSec SECOND
      |       GROUP BY e.user_id)
      |SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
      |                 WHEN t2 IS NOT NULL THEN 2
      |                 ELSE 1 END AS BIGINT) AS funnel_step,
      |  count(*) AS n_users
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private[graft] val windowFunnelSql: String = windowFunnelSqlAt(1800)

  private val lshBucketCtes: String = {
    val bucketExpr = graft.operators.Similarity.planes.zipWithIndex.map {
      case (pl, i) =>
        val arr = pl.map(w => s"${Math.round(w * 1000)}/1000.0")
          .mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(ve, $arr) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n     + ")
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       |b AS (SELECT vec_id, ve,
       |  CAST($bucketExpr AS BIGINT) AS bucket FROM emb)""".stripMargin
  }

  /** Unrolled-CTE DuckDB replica of [[graft.operators.Similarity
    * .clusterEmbeddings]]'s full training loop: md5-ordered seed pick,
    * then per Lloyd iteration (i) centroids re-listed from components +
    * norms, (ii) assignment by rounded cosine (ties → higher cell, exactly
    * [[graft.functions.NearestCells]]'s selection), (iii) fixed-point mean
    * update `sum(round(x·2^20))::BIGINT / (n·2^20)` with empty cells
    * keeping their centroid. Fixed-point sums are order-independent, so
    * both engines agree bit-for-bit; the only double ops are the dot
    * products, identical sequential loops in both.
    */
  private val KmCells = graft.operators.Similarity.IvfCells
  private val KmIters = graft.operators.Similarity.IvfKmeansIters
  private val KmScale = 1L << 20

  private def kmCents(k: Int) =
    s"""c$k AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM cp$k GROUP BY cell),
       |n$k AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM c$k)""".stripMargin

  /** Nearest-cell assignment of `src` rows against iteration-`k` centroids
    * — the `src` table is aliased to `p`, so the projection works for the
    * training corpus and any batch table with the same shape.
    */
  private def kmAsg(name: String, k: Int, src: String = "p") =
    s"""$name AS (SELECT vec_id, cell FROM (
       |  SELECT p.vec_id, n.cell,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      (CASE WHEN isfinite(list_dot_product(p.v, n.cv) / (p.nrm * n.cn))
       |            THEN round(list_dot_product(p.v, n.cv) / (p.nrm * n.cn), 6)
       |            ELSE -1e308 END) DESC, n.cell DESC) AS rn
       |  FROM $src p CROSS JOIN n$k n) WHERE rn = 1)""".stripMargin

  private def kmUpd(k: Int) =
    s"""cp${k + 1} AS (
       |  SELECT prev.cell, prev.pos,
       |    CASE WHEN s.n IS NULL THEN prev.cx
       |         ELSE CAST(s.sx AS DOUBLE) / (CAST(s.n AS DOUBLE) * $KmScale.0) END AS cx
       |  FROM cp$k prev LEFT JOIN (
       |    SELECT a.cell, t.i + 1 AS pos,
       |      sum(CAST(round(pp.v[t.i + 1] * $KmScale.0, 0) AS BIGINT)) AS sx,
       |      count(*) AS n
       |    FROM a${k + 1} a JOIN p pp USING (vec_id)
       |    CROSS JOIN unnest(range(len(pp.v))) AS t(i)
       |    GROUP BY a.cell, t.i + 1) s
       |  ON prev.cell = s.cell AND prev.pos = s.pos)""".stripMargin

  /** `(vec_id, v, nrm)` projection of `embeddings` under `where`. */
  private def kmProj(name: String, where: String) =
    s"""$name AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                        CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings$where)""".stripMargin

  /** The full Lloyd training chain over `p` = embeddings filtered by
    * `pWhere`: seed pick + `KmIters` iterations, ending at the trained
    * centroid table `n$KmIters`.
    */
  private def kmTrainCtes(pWhere: String): String = {
    val head =
      s"""${kmProj("p", pWhere)},
         |cp0 AS (
         |  SELECT CAST(s.rn - 1 AS INTEGER) AS cell, t.i + 1 AS pos,
         |         s.v[t.i + 1] AS cx
         |  FROM (SELECT vec_id, v, row_number() OVER
         |          (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |        FROM p) s CROSS JOIN unnest(range(len(s.v))) AS t(i)
         |  WHERE s.rn <= $KmCells)""".stripMargin
    val body = (0 until KmIters)
      .flatMap(k => Seq(kmCents(k), kmAsg(s"a${k + 1}", k), kmUpd(k)))
    (Seq(head) ++ body ++ Seq(kmCents(KmIters))).mkString(",\n")
  }

  private val kmeansClusterOracle: String =
    "WITH " + kmTrainCtes("") + ",\n" + kmAsg("af", KmIters) + "\n" +
      """SELECT CAST(cell AS BIGINT) AS cell, count(*) AS n_vectors,
        |  min(vec_id) AS min_vec_id
        |FROM af GROUP BY 1 ORDER BY 1""".stripMargin

  /** Incremental-assignment oracle: trains the quantizer over the first
    * 4/5 of vec_ids ([[kmTrainCtes]] on the prefix — the frozen
    * [[graft.operators.Similarity.clusterArtifacts]] corpus), then
    * assigns the remaining 1/5 batch against those frozen centroids with
    * the identical tie contract ([[kmAsg]] over `pb`).
    */
  private val kmeansIncrementalOracle: String = {
    val cut = "(SELECT (max(vec_id) * 4) // 5 FROM embeddings)"
    "WITH " + kmTrainCtes(s" WHERE vec_id < $cut") + ",\n" +
      kmProj("pb", s" WHERE vec_id >= $cut") + ",\n" +
      kmAsg("afb", KmIters, "pb") + "\n" +
      "SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM afb ORDER BY vec_id"
  }

  /** Drift-gate oracle: replays the frozen-centroid training over the
    * 4/5 prefix ([[kmTrainCtes]]), then for each side (index, raw tail,
    * planted-drift tail = every component +0.25) the assignment WITH the
    * winning raw cosine, reduced to occupancy TV distance and truncated
    * mean-fit basis points — the exact
    * [[graft.operators.Similarity.annArtifactDrift]] integer contract,
    * thresholds included.
    */
  private val annArtifactDriftOracle: String = {
    val cut = "(SELECT (max(vec_id) * 4) // 5 FROM embeddings)"
    // assignment + fit of a projected side against the trained centroids:
    // winner by (rounded cosine DESC, cell DESC) — kmAsg's contract —
    // carrying the winner's RAW cosine into a round(·10⁶) long
    def asgFit(name: String, src: String) =
      s"""$name AS (SELECT vec_id, cell,
         |    CAST(round(rawcos * 1000000.0, 0) AS BIGINT) AS fit6 FROM (
         |  SELECT p.vec_id, n.cell,
         |    list_dot_product(p.v, n.cv) / (p.nrm * n.cn) AS rawcos,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |      (CASE WHEN isfinite(list_dot_product(p.v, n.cv) / (p.nrm * n.cn))
         |            THEN round(list_dot_product(p.v, n.cv) / (p.nrm * n.cn), 6)
         |            ELSE -1e308 END) DESC, n.cell DESC) AS rn
         |  FROM $src p CROSS JOIN n$KmIters n) WHERE rn = 1)""".stripMargin
    // per-side readout: occupancy by cell + (n, Σfit6)
    def sideAgg(tag: String, asg: String) =
      s"""occ_$tag AS (SELECT cell, CAST(count(*) AS BIGINT) AS c
         |  FROM $asg GROUP BY cell),
         |tot_$tag AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(fit6) AS BIGINT) AS f FROM $asg)""".stripMargin
    // one scenario row: TV(occ_i, occ_x) in bp + truncated mean fits
    def scenario(label: String, tag: String) =
      s"""SELECT '$label' AS scenario, ti.n AS n_index, tx.n AS n_batch,
         |  CAST(num.v * 10000 // (2 * ti.n * tx.n) AS BIGINT)
         |    AS occupancy_drift_bp,
         |  CAST(ti.f // (ti.n * 100) AS BIGINT) AS fit_index_bp,
         |  CAST(tx.f // (tx.n * 100) AS BIGINT) AS fit_batch_bp,
         |  (num.v * 10000 // (2 * ti.n * tx.n) > 4000
         |   OR ti.f // (ti.n * 100) - tx.f // (tx.n * 100) > 2000)
         |    AS retrain_needed
         |FROM tot_i ti, tot_$tag tx,
         |  (SELECT CAST(sum(abs(coalesce(a.c, 0) * tx.n
         |                       - coalesce(b.c, 0) * ti.n)) AS BIGINT) AS v
         |   FROM occ_i a FULL OUTER JOIN occ_$tag b USING (cell),
         |        tot_i ti, tot_$tag tx) num""".stripMargin
    "WITH " + kmTrainCtes(s" WHERE vec_id < $cut") + ",\n" +
      s"""pi AS (SELECT * FROM p WHERE nrm > 0),
         |${kmProj("pbr", s" WHERE vec_id >= $cut")},
         |pb AS (SELECT * FROM pbr WHERE nrm > 0),
         |pdr AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.25) AS v
         |  FROM embeddings WHERE vec_id >= $cut),
         |pdn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
         |  FROM pdr),
         |pd AS (SELECT * FROM pdn WHERE nrm > 0),
         |${asgFit("ai", "pi")},
         |${asgFit("ab", "pb")},
         |${asgFit("ad", "pd")},
         |${sideAgg("i", "ai")},
         |${sideAgg("b", "ab")},
         |${sideAgg("d", "ad")}
         |${scenario("none", "b")}
         |UNION ALL
         |${scenario("planted", "d")}
         |ORDER BY scenario""".stripMargin
  }

  /** Regime-probe oracle: the whole-corpus Lloyd chain + the
    * winning-cosine fit pass (the [[annArtifactDriftOracle]] `asgFit`
    * spelling), truncated to basis points, plus the routing verdict.
    * `cells_auto` is the literal [[KmCells]] — [[graft.operators
    * .Similarity.autoCells]]'s answer at every driver SF (≤ 2k vectors);
    * a larger fixture would hash-mismatch loudly, the [[autoM]]-oracle
    * convention.
    */
  private val annRegimeProbeOracle: String =
    "WITH " + kmTrainCtes("") + ",\n" +
      s"""pi AS (SELECT * FROM p WHERE nrm > 0),
         |af AS (SELECT vec_id, cell,
         |    CAST(round(rawcos * 1000000.0, 0) AS BIGINT) AS fit6 FROM (
         |  SELECT p.vec_id, n.cell,
         |    list_dot_product(p.v, n.cv) / (p.nrm * n.cn) AS rawcos,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |      (CASE WHEN isfinite(list_dot_product(p.v, n.cv) / (p.nrm * n.cn))
         |            THEN round(list_dot_product(p.v, n.cv) / (p.nrm * n.cn), 6)
         |            ELSE -1e308 END) DESC, n.cell DESC) AS rn
         |  FROM pi p CROSS JOIN n$KmIters n) WHERE rn = 1)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST($KmCells AS BIGINT) AS cells_auto,
         |  CAST(sum(fit6) // (count(*) * 100) AS BIGINT) AS fit_bp,
         |  CASE WHEN sum(fit6) // (count(*) * 100) >= 7000
         |       THEN 'clustered' ELSE 'uniform' END AS regime
         |FROM af""".stripMargin

  /** The content-free md5 sample bucket, DuckDB spelling — the rank key
    * of every cluster-balanced pick.
    */
  private val bktSql =
    "CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) " +
      "AS BIGINT) % 10000"

  /** Incremental cluster-balanced-admission oracle: Lloyd training on the
    * 4/5 prefix ([[kmTrainCtes]]), frozen-centroid assignment of the WHOLE
    * corpus ([[kmAsg]] over `pall`), one per-cell rank in `(bkt, vec_id)`
    * order, pick restricted to the batch ids — the
    * [[graft.operators.Similarity.clusterBalancedSampleIncremental]]
    * contract (whole-corpus pick restricted to the batch).
    */
  private val clusterBalancedIncOracle: String = {
    val cut = "(SELECT (max(vec_id) * 4) // 5 FROM embeddings)"
    "WITH " + kmTrainCtes(s" WHERE vec_id < $cut") + ",\n" +
      kmProj("pall", "") + ",\n" +
      kmAsg("afall", KmIters, "pall") + "\n" +
      s"""SELECT vec_id, CAST(cell AS BIGINT) AS cell, rk FROM (
         |  SELECT vec_id, cell, CAST(row_number() OVER (PARTITION BY cell
         |    ORDER BY $bktSql, vec_id) AS BIGINT) AS rk
         |  FROM afall)
         |WHERE rk <= 8 AND vec_id >= $cut ORDER BY vec_id""".stripMargin
  }

  /** Streamed cluster-balanced-admission oracle: the same frozen-centroid
    * assignment, then one rank pass PER MICRO-BATCH over everything so
    * far (ids below that batch's end), restricted to the batch's id
    * range — the evolving-quota admission loop's per-arrival semantics
    * ([[graft.streaming.StreamingPack.clusterAdmissionStream]], three
    * id-ordered slices of the 1/5 tail).
    */
  private val clusterBalancedStreamOracle: String = {
    val cut = "(SELECT (max(vec_id) * 4) // 5 FROM embeddings)"
    def adm(k: Int) =
      s"""adm$k AS (
         |  SELECT vec_id, CAST(cell AS BIGINT) AS cell, rk FROM (
         |    SELECT a.vec_id, a.cell, CAST(row_number() OVER (
         |      PARTITION BY a.cell ORDER BY $bktSql, a.vec_id) AS BIGINT)
         |      AS rk
         |    FROM afall a, wb WHERE a.vec_id < wb.e${k + 1})
         |  , wb WHERE rk <= 8 AND vec_id >= wb.e$k)""".stripMargin
    "WITH " + kmTrainCtes(s" WHERE vec_id < $cut") + ",\n" +
      kmProj("pall", "") + ",\n" +
      kmAsg("afall", KmIters, "pall") + ",\n" +
      """wb AS (SELECT (max(vec_id) * 4) // 5 AS e0,
        |  (max(vec_id) * 4) // 5 + (max(vec_id) - (max(vec_id) * 4) // 5) // 3 AS e1,
        |  (max(vec_id) * 4) // 5 + 2 * (max(vec_id) - (max(vec_id) * 4) // 5) // 3 AS e2,
        |  max(vec_id) + 1 AS e3 FROM embeddings),
        |""".stripMargin +
      Seq(0, 1, 2).map(adm).mkString(",\n") + "\n" +
      """SELECT vec_id, cell, rk FROM adm0
        |UNION ALL SELECT vec_id, cell, rk FROM adm1
        |UNION ALL SELECT vec_id, cell, rk FROM adm2
        |ORDER BY vec_id""".stripMargin
  }

  /** Full SQL replay of [[graft.operators.Similarity.pqTopK]] — per
    * subspace: md5-seeded init, `PqIters` L2 Lloyd iterations with
    * fixed-point mean updates, assignment by `round(⟨sv,c⟩ − |c|²/2, 6)`
    * with ties → higher cell (the Spark side's `array_max` over
    * (score, idx) structs), then ADC scoring of every (query, code row)
    * pair against the trained centroid tables and the shared rounded-
    * cosine ranking contract.
    */
  private val pqTopKOracle: String = {
    import graft.operators.Similarity.{PqSubspaces, PqSubDim}
    val sub = pqSubChainSql("pp") _
    val encJoins = (1 until PqSubspaces)
      .map(s => s"JOIN s${s}e ea$s USING (vec_id)").mkString("\n        ")
    val encCols = (0 until PqSubspaces).map(s => s"ea$s.cell AS c$s")
      .mkString(", ")
    val centJoins = (0 until PqSubspaces)
      .map(s => s"JOIN s${s}h${graft.operators.Similarity.PqIters} f$s ON f$s.cell = e.c$s")
      .mkString("\n         ")
    val score = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"list_dot_product(q.vn[$lo:$hi], f$s.cv)"
    }.mkString("\n         + ")
    s"""WITH $pqPpSql,
       |${(0 until PqSubspaces).map(sub).mkString(",\n")},
       |enc AS (SELECT ea0.vec_id, $encCols
       |        FROM s0e ea0
       |        $encJoins),
       |qs AS (SELECT vec_id AS query_id, vn FROM pp WHERE vec_id < 20),
       |sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |         round($score, 6) AS cos_r
       |       FROM enc e CROSS JOIN qs q
       |         $centJoins
       |       WHERE e.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM sc)
       |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** IVF-PQ oracle: the km-training prefix (trained coarse centroids +
    * per-vector cell ranking, verbatim from [[ivfTopKOracle]]'s chain)
    * composed with the PQ chains — candidates come from the probed
    * cells' members, scores from the trained codebooks via the encoded
    * code table. Both component replays unchanged.
    */
  private val ivfPqTopKOracle: String = {
    import graft.operators.Similarity.{PqSubspaces, PqSubDim, PqIters, IvfProbes}
    val ctePrefix = kmeansClusterOracle.substring(0,
      kmeansClusterOracle.indexOf(",\naf AS"))
    val sub = pqSubChainSql("pp") _
    val encJoins = (1 until PqSubspaces)
      .map(s => s"JOIN s${s}e ea$s USING (vec_id)").mkString("\n        ")
    val encCols = (0 until PqSubspaces).map(s => s"ea$s.cell AS pc$s")
      .mkString(", ")
    val centJoins = (0 until PqSubspaces)
      .map(s => s"JOIN s${s}h$PqIters f$s ON f$s.cell = e.pc$s")
      .mkString("\n         ")
    val score = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"list_dot_product(qq.vn[$lo:$hi], f$s.cv)"
    }.mkString("\n         + ")
    s"""$ctePrefix,
       |av AS (SELECT vec_id, cell, rn FROM (
       |  SELECT p.vec_id, n.cell,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      (CASE WHEN isfinite(list_dot_product(p.v, n.cv) / (p.nrm * n.cn))
       |            THEN round(list_dot_product(p.v, n.cv) / (p.nrm * n.cn), 6)
       |            ELSE -1e308 END) DESC, n.cell DESC) AS rn
       |  FROM p CROSS JOIN n${graft.operators.Similarity.IvfKmeansIters} n)),
       |corp AS (SELECT vec_id, cell FROM av WHERE rn = 1),
       |qpr AS (SELECT vec_id AS query_id, cell AS q_cell FROM av
       |        WHERE rn <= $IvfProbes AND vec_id < 20),
       |pp AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
       |       FROM p WHERE nrm > 0),
       |${(0 until PqSubspaces).map(sub).mkString(",\n")},
       |enc AS (SELECT ea0.vec_id, $encCols
       |        FROM s0e ea0
       |        $encJoins),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         round($score, 6) AS cos_r
       |       FROM qpr q JOIN corp c ON c.cell = q.q_cell
       |                             AND c.vec_id <> q.query_id
       |         JOIN enc e ON e.vec_id = c.vec_id
       |         $centJoins
       |         JOIN pp qq ON qq.vec_id = q.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM sc)
       |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** Residual IVF-PQ oracle: the [[ivfPqTopKOracle]] chain with the PQ
    * stages retargeted at residuals — `cmn`/`chn` compute each cell's
    * fixed-point mean of its normalized members (the variance-minimizing
    * offset), `ppr` subtracts the assigned cell's mean from each
    * normalized vector, [[pqSubChainSql]] trains/encodes over `ppr`
    * unchanged, and the score adds the `⟨q̂, m_cell⟩` term back.
    */
  private val ivfPqResTopKOracle: String = ivfPqResOracle(refineM = None)

  /** Two-stage refine oracle: the residual chain keeps the top-m ADC
    * candidates per query, then re-scores exactly those rows with the
    * TRUE cosine (`list_dot_product` of the normalized vectors — the
    * identical spelling Spark's kernel folds) and re-ranks to top-k —
    * the [[graft.operators.Similarity.ivfPqResRefineTopK]] contract.
    */
  private val ivfPqResRefineOracle: String =
    ivfPqResOracle(refineM = Some(graft.operators.Similarity.RefineCandidates))

  private def ivfPqResOracle(refineM: Option[Int]): String = {
    import graft.operators.Similarity.{PqSubspaces, PqSubDim, PqIters, IvfProbes}
    val ctePrefix = kmeansClusterOracle.substring(0,
      kmeansClusterOracle.indexOf(",\naf AS"))
    val sub = pqSubChainSql("ppr") _
    val encJoins = (1 until PqSubspaces)
      .map(s => s"JOIN s${s}e ea$s USING (vec_id)").mkString("\n        ")
    val encCols = (0 until PqSubspaces).map(s => s"ea$s.cell AS pc$s")
      .mkString(", ")
    val centJoins = (0 until PqSubspaces)
      .map(s => s"JOIN s${s}h$PqIters f$s ON f$s.cell = e.pc$s")
      .mkString("\n         ")
    val score = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"list_dot_product(qq.vn[$lo:$hi], f$s.cv)"
    }.mkString("\n         + ")
    s"""$ctePrefix,
       |av AS MATERIALIZED (SELECT vec_id, cell, rn FROM (
       |  SELECT p.vec_id, n.cell,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      (CASE WHEN isfinite(list_dot_product(p.v, n.cv) / (p.nrm * n.cn))
       |            THEN round(list_dot_product(p.v, n.cv) / (p.nrm * n.cn), 6)
       |            ELSE -1e308 END) DESC, n.cell DESC) AS rn
       |  FROM p CROSS JOIN n${graft.operators.Similarity.IvfKmeansIters} n)),
       |corp AS MATERIALIZED (SELECT vec_id, cell FROM av WHERE rn = 1),
       |qpr AS (SELECT vec_id AS query_id, cell AS q_cell FROM av
       |        WHERE rn <= $IvfProbes AND vec_id < 20),
       |pp AS MATERIALIZED (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
       |       FROM p WHERE nrm > 0),
       |cmn AS MATERIALIZED (SELECT c.cell, t.i + 1 AS pos,
       |        CAST(sum(CAST(round(pp.vn[t.i + 1] * 1048576.0, 0) AS BIGINT))
       |             AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1048576.0) AS mx
       |      FROM pp JOIN corp c ON c.vec_id = pp.vec_id
       |      CROSS JOIN unnest(range(len(pp.vn))) AS t(i)
       |      GROUP BY 1, 2),
       |chn AS MATERIALIZED (SELECT cell, list(mx ORDER BY pos) AS chv
       |      FROM cmn GROUP BY cell),
       |ppr AS MATERIALIZED (SELECT pp.vec_id,
       |        list_transform(range(1, len(pp.vn) + 1),
       |                       i -> pp.vn[i] - ch.chv[i]) AS vn
       |      FROM pp JOIN corp ON corp.vec_id = pp.vec_id
       |              JOIN chn ch ON ch.cell = corp.cell),
       |${(0 until PqSubspaces).map(sub).mkString(",\n")},
       |enc AS (SELECT ea0.vec_id, $encCols
       |        FROM s0e ea0
       |        $encJoins),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         round(list_dot_product(qq.vn, cc.chv)
       |         + $score, 6) AS cos_r
       |       FROM qpr q JOIN corp c ON c.cell = q.q_cell
       |                             AND c.vec_id <> q.query_id
       |         JOIN chn cc ON cc.cell = c.cell
       |         JOIN enc e ON e.vec_id = c.vec_id
       |         $centJoins
       |         JOIN pp qq ON qq.vec_id = q.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM sc)${refineM.fold("")(m => s""",
       |cand AS (SELECT query_id, neighbor_id FROM r WHERE "rank" <= $m),
       |rf AS (SELECT c.query_id, c.neighbor_id,
       |         round(list_dot_product(qn.vn, nn.vn), 6) AS cos_r
       |       FROM cand c JOIN pp qn ON qn.vec_id = c.query_id
       |                   JOIN pp nn ON nn.vec_id = c.neighbor_id),
       |rr AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM rf)""")}
       |SELECT query_id, neighbor_id, "rank"
       |FROM ${refineM.fold("r")(_ => "rr")} WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** Residual-IVF-PQ incremental-encode oracle: the coarse quantizer
    * trains on the 4/5 prefix ([[kmTrainCtes]]), every vector is assigned
    * a cell against those frozen centroids, offsets are the prefix
    * members' fixed-point means, residual codebooks train on the prefix
    * residuals ([[pqSubChainSql]] on `ppra`), and the 1/5 batch encodes
    * against the final centroid tables with the shared tie contract.
    */
  private val ivfPqResEncodeIncOracle: String = {
    import graft.operators.Similarity.{PqSubspaces, PqSubDim, PqIters}
    val cut = "(SELECT (max(vec_id) * 4) // 5 FROM embeddings)"
    val sub = pqSubChainSql("ppra") _
    val batchChains = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"""bb$s AS (SELECT vec_id, vn[$lo:$hi] AS sv FROM pprb),
         |s${s}be AS (SELECT vec_id, cell FROM (
         |    SELECT p.vec_id, n.cell, row_number() OVER (PARTITION BY p.vec_id
         |      ORDER BY round(list_dot_product(p.sv, n.cv) - n.ch, 6) DESC,
         |               n.cell DESC) AS rn
         |    FROM bb$s p CROSS JOIN s${s}h$PqIters n) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val joins = (1 until PqSubspaces)
      .map(s => s"JOIN s${s}be b$s USING (vec_id)").mkString("\n  ")
    val cols = (0 until PqSubspaces).map(s => s"b$s.cell AS code$s")
      .mkString(", ")
    s"""WITH ${kmTrainCtes(s" WHERE vec_id < $cut")},
       |${kmProj("pall", "")},
       |${kmAsg("aall", KmIters, "pall")},
       |pp AS MATERIALIZED (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
       |     FROM pall WHERE nrm > 0),
       |pc AS MATERIALIZED (SELECT pp.vec_id, pp.vn, a.cell
       |     FROM pp JOIN aall a ON a.vec_id = pp.vec_id),
       |cutc AS (SELECT (max(vec_id) * 4) // 5 AS cutv FROM embeddings),
       |cmn AS MATERIALIZED (SELECT cell, t.i + 1 AS pos,
       |        CAST(sum(CAST(round(pc.vn[t.i + 1] * 1048576.0, 0) AS BIGINT))
       |             AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1048576.0) AS mx
       |      FROM pc
       |      CROSS JOIN unnest(range(len(pc.vn))) AS t(i)
       |      WHERE pc.vec_id < (SELECT cutv FROM cutc)
       |      GROUP BY 1, 2),
       |chn AS MATERIALIZED (SELECT cell, list(mx ORDER BY pos) AS chv
       |      FROM cmn GROUP BY cell),
       |ppra AS MATERIALIZED (SELECT pc.vec_id,
       |        list_transform(range(1, len(pc.vn) + 1),
       |                       i -> pc.vn[i] - ch.chv[i]) AS vn
       |      FROM pc JOIN chn ch ON ch.cell = pc.cell
       |      WHERE pc.vec_id < (SELECT cutv FROM cutc)),
       |pprb AS MATERIALIZED (SELECT pc.vec_id,
       |        list_transform(range(1, len(pc.vn) + 1),
       |                       i -> pc.vn[i] - coalesce(ch.chv[i], 0.0)) AS vn
       |      FROM pc LEFT JOIN chn ch ON ch.cell = pc.cell
       |      WHERE pc.vec_id >= (SELECT cutv FROM cutc)),
       |${(0 until PqSubspaces).map(sub).mkString(",\n")},
       |$batchChains
       |SELECT b0.vec_id, CAST(pc.cell AS BIGINT) AS cell, $cols
       |FROM s0be b0
       |  $joins
       |  JOIN pc ON pc.vec_id = b0.vec_id
       |ORDER BY vec_id""".stripMargin
  }

  /** Incremental-encode oracle: train the codebooks over the first 4/5 of
    * vec_ids ([[pqSubChainSql]] on `ppa` — the frozen artifact corpus),
    * then assign each batch subvector against the FINAL centroids with
    * the identical rounded-score / higher-cell tie contract.
    */
  private val pqEncodeIncOracle: String = {
    import graft.operators.Similarity.{PqSubspaces, PqSubDim, PqIters}
    val sub = pqSubChainSql("ppa") _
    val batchChains = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"""bb$s AS (SELECT vec_id, vn[$lo:$hi] AS sv FROM ppb),
         |s${s}be AS (SELECT vec_id, cell FROM (
         |    SELECT p.vec_id, n.cell, row_number() OVER (PARTITION BY p.vec_id
         |      ORDER BY round(list_dot_product(p.sv, n.cv) - n.ch, 6) DESC,
         |               n.cell DESC) AS rn
         |    FROM bb$s p CROSS JOIN s${s}h$PqIters n) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val joins = (1 until PqSubspaces)
      .map(s => s"JOIN s${s}be b$s USING (vec_id)").mkString("\n  ")
    val cols = (0 until PqSubspaces).map(s => s"b$s.cell AS code$s")
      .mkString(", ")
    s"""WITH $pqPpSql,
       |cutc AS (SELECT (max(vec_id) * 4) // 5 AS cutv FROM embeddings),
       |ppa AS (SELECT pp.vec_id, pp.vn FROM pp, cutc WHERE vec_id < cutv),
       |ppb AS (SELECT pp.vec_id, pp.vn FROM pp, cutc WHERE vec_id >= cutv),
       |${(0 until PqSubspaces).map(sub).mkString(",\n")},
       |$batchChains
       |SELECT b0.vec_id, $cols
       |FROM s0be b0
       |  $joins
       |ORDER BY vec_id""".stripMargin
  }

  /** The SQ8 chain over a normalized-vector CTE: per-dim bounds from
    * `trSrc` (`mm`), derived step/inverse-step (`st`), and the wide
    * quantized-code table over `pSrc` (`enc`, columns `c00..c63`) —
    * shared by all three SQ oracles. Every FP op mirrors
    * [[graft.operators.Similarity.sqTopK]]'s kernels in the identical
    * order: `(x − mn)·iv + 0.5 → floor → clamp`, `st = (mx − mn)/255`,
    * `iv = 255/(mx − mn)`.
    */
  private def sqBoundsSql(trSrc: String): String = {
    import graft.operators.Similarity.SqDim
    val mm = (0 until SqDim).map(d =>
      s"min(vn[${d + 1}]) AS mn$d, max(vn[${d + 1}]) AS mx$d")
      .mkString(",\n    ")
    val st = (0 until SqDim).map(d =>
      s"CASE WHEN mx$d > mn$d THEN (mx$d - mn$d)/255.0 ELSE 0.0 END AS st$d, " +
        s"CASE WHEN mx$d > mn$d THEN 255.0/(mx$d - mn$d) ELSE 0.0 END AS iv$d")
      .mkString(",\n    ")
    s"""mm AS MATERIALIZED (SELECT $mm FROM $trSrc),
       |st AS MATERIALIZED (SELECT *,
       |    $st FROM mm)""".stripMargin
  }

  private def sqEncSql(pSrc: String, encName: String): String = {
    import graft.operators.Similarity.SqDim
    val enc = (0 until SqDim).map(d =>
      s"CAST(least(255.0, greatest(0.0, floor((p.vn[${d + 1}] - s.mn$d)*s.iv$d + 0.5))) AS BIGINT) AS c${"%02d".format(d)}")
      .mkString(",\n    ")
    s"""$encName AS MATERIALIZED (SELECT p.vec_id,
       |    $enc
       |  FROM $pSrc p CROSS JOIN st s)""".stripMargin
  }

  private def sqChainSql(pSrc: String, trSrc: String): String =
    s"${sqBoundsSql(trSrc)},\n${sqEncSql(pSrc, "enc")}"

  /** The fused SQ8 ADC terms, as SQL fragments: per-query constant
    * `⟨q̂, mn⟩`, per-query weight list `q̂ ⊙ st`, and the code list cast
    * to double — [[graft.operators.Similarity.sqTopK]]'s decomposition
    * `⟨q̂, deq(c)⟩ = cq + ⟨wq, c⟩` verbatim.
    */
  private def sqScoreParts: (String, String, String) = {
    import graft.operators.Similarity.SqDim
    ((0 until SqDim).map(d => s"s.mn$d").mkString(", "),
      (0 until SqDim).map(d => s"p.vn[${d + 1}]*s.st$d").mkString(", "),
      (0 until SqDim).map(d => s"CAST(e.c${"%02d".format(d)} AS DOUBLE)").mkString(", "))
  }

  /** SQ8 full-scan top-k oracle: bounds → codes → fused ADC → rank. */
  private val sqTopKOracle: String = {
    val (mnList, wqList, cList) = sqScoreParts
    s"""WITH $pqPpSql,
       |${sqChainSql("pp", "pp")},
       |qs AS (SELECT p.vec_id AS query_id,
       |         list_dot_product(p.vn, [$mnList]) AS cq,
       |         [$wqList] AS wq
       |       FROM pp p CROSS JOIN st s WHERE p.vec_id < 20),
       |sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |         round(q.cq + list_dot_product(q.wq, [$cList]), 6) AS cos_r
       |       FROM enc e CROSS JOIN qs q WHERE e.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM sc)
       |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** IVF-SQ8 oracle: the km-training prefix + per-vector cell ranking
    * (verbatim from [[ivfPqTopKOracle]]'s chain) composed with the SQ8
    * chain — candidates from the probed cells, scores from the fused
    * SQ8 ADC over the code table.
    */
  private val ivfSqTopKOracle: String = {
    import graft.operators.Similarity.IvfProbes
    val ctePrefix = kmeansClusterOracle.substring(0,
      kmeansClusterOracle.indexOf(",\naf AS"))
    val (mnList, wqList, cList) = sqScoreParts
    s"""$ctePrefix,
       |av AS (SELECT vec_id, cell, rn FROM (
       |  SELECT p.vec_id, n.cell,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      (CASE WHEN isfinite(list_dot_product(p.v, n.cv) / (p.nrm * n.cn))
       |            THEN round(list_dot_product(p.v, n.cv) / (p.nrm * n.cn), 6)
       |            ELSE -1e308 END) DESC, n.cell DESC) AS rn
       |  FROM p CROSS JOIN n${graft.operators.Similarity.IvfKmeansIters} n)),
       |corp AS (SELECT vec_id, cell FROM av WHERE rn = 1),
       |qpr AS (SELECT vec_id AS query_id, cell AS q_cell FROM av
       |        WHERE rn <= $IvfProbes AND vec_id < 20),
       |pp AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
       |       FROM p WHERE nrm > 0),
       |${sqChainSql("pp", "pp")},
       |qs AS (SELECT p.vec_id AS query_id,
       |         list_dot_product(p.vn, [$mnList]) AS cq,
       |         [$wqList] AS wq
       |       FROM pp p CROSS JOIN st s WHERE p.vec_id < 20),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         round(qq.cq + list_dot_product(qq.wq, [$cList]), 6) AS cos_r
       |       FROM qpr q JOIN corp c ON c.cell = q.q_cell
       |                             AND c.vec_id <> q.query_id
       |         JOIN enc e ON e.vec_id = c.vec_id
       |         JOIN qs qq ON qq.query_id = q.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM sc)
       |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** Per-cell-bounds IVF-SQ8 oracle: the IVF chain verbatim, bounds
    * trained per `(cell, dim)` (`GROUP BY cell` over the assigned
    * normalized corpus — min/max are order-free, so they match Spark's
    * partial-aggregated groupBy exactly), codes and the fused ADC terms
    * selected by each row's / probe's cell.
    */
  private val ivfSqCellTopKOracle: String = {
    import graft.operators.Similarity.{IvfProbes, SqDim}
    val ctePrefix = kmeansClusterOracle.substring(0,
      kmeansClusterOracle.indexOf(",\naf AS"))
    val mm = (0 until SqDim).map(d =>
      s"min(vn[${d + 1}]) AS mn$d, max(vn[${d + 1}]) AS mx$d")
      .mkString(",\n    ")
    val st = (0 until SqDim).map(d =>
      s"CASE WHEN mx$d > mn$d THEN (mx$d - mn$d)/255.0 ELSE 0.0 END AS st$d, " +
        s"CASE WHEN mx$d > mn$d THEN 255.0/(mx$d - mn$d) ELSE 0.0 END AS iv$d")
      .mkString(",\n    ")
    val enc = (0 until SqDim).map(d =>
      s"CAST(least(255.0, greatest(0.0, floor((p.vn[${d + 1}] - s.mn$d)*s.iv$d + 0.5))) AS BIGINT) AS c${"%02d".format(d)}")
      .mkString(",\n    ")
    val mnList = (0 until SqDim).map(d => s"s.mn$d").mkString(", ")
    val wqList = (0 until SqDim).map(d => s"p.vn[${d + 1}]*s.st$d").mkString(", ")
    val cList = (0 until SqDim).map(d =>
      s"CAST(e.c${"%02d".format(d)} AS DOUBLE)").mkString(", ")
    s"""$ctePrefix,
       |av AS (SELECT vec_id, cell, rn FROM (
       |  SELECT p.vec_id, n.cell,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      (CASE WHEN isfinite(list_dot_product(p.v, n.cv) / (p.nrm * n.cn))
       |            THEN round(list_dot_product(p.v, n.cv) / (p.nrm * n.cn), 6)
       |            ELSE -1e308 END) DESC, n.cell DESC) AS rn
       |  FROM p CROSS JOIN n${graft.operators.Similarity.IvfKmeansIters} n)),
       |corp AS (SELECT vec_id, cell FROM av WHERE rn = 1),
       |qpr AS (SELECT vec_id AS query_id, cell AS q_cell FROM av
       |        WHERE rn <= $IvfProbes AND vec_id < 20),
       |pp AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
       |       FROM p WHERE nrm > 0),
       |ppc AS (SELECT pp.vec_id, pp.vn, corp.cell
       |        FROM pp JOIN corp USING (vec_id)),
       |cb AS MATERIALIZED (SELECT cell,
       |    $mm
       |  FROM ppc GROUP BY cell),
       |stc AS MATERIALIZED (SELECT *,
       |    $st FROM cb),
       |encc AS MATERIALIZED (SELECT p.vec_id, p.cell,
       |    $enc
       |  FROM ppc p JOIN stc s ON p.cell = s.cell),
       |qs AS (SELECT q.query_id, q.q_cell,
       |         list_dot_product(p.vn, [$mnList]) AS cq,
       |         [$wqList] AS wq
       |       FROM qpr q JOIN pp p ON p.vec_id = q.query_id
       |         JOIN stc s ON s.cell = q.q_cell),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         round(q.cq + list_dot_product(q.wq, [$cList]), 6) AS cos_r
       |       FROM qs q JOIN corp c ON c.cell = q.q_cell
       |                            AND c.vec_id <> q.query_id
       |         JOIN encc e ON e.vec_id = c.vec_id),
       |r AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM sc)
       |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** Per-cell SQ8 artifact oracle: the Lloyd chain + final assignment,
    * then per-(cell, dim) min/max over the normalized assigned corpus —
    * exact doubles, both engines agree bit-for-bit.
    */
  private val sqCellArtifactsOracle: String =
    "WITH " + kmTrainCtes("") + ",\n" + kmAsg("af", KmIters) + ",\n" +
      s"""pp AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
         |       FROM p WHERE nrm > 0),
         |ppc AS (SELECT pp.vec_id, pp.vn, af.cell FROM pp JOIN af USING (vec_id))
         |SELECT CAST(cell AS BIGINT) AS cell, CAST(t.i + 1 AS BIGINT) AS pos,
         |  min(vn[t.i + 1]) AS mn, max(vn[t.i + 1]) AS mx
         |FROM ppc CROSS JOIN unnest(range(${graft.operators.Similarity.SqDim})) AS t(i)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-cell incremental-encode oracle: Lloyd training AND per-cell
    * bounds over the 4/5 prefix (the frozen artifacts), the 1/5 batch
    * assigned against the frozen centroids ([[kmAsg]] over `pb`) and
    * quantized against its cell's bounds.
    */
  private val ivfSqCellEncodeIncOracle: String = {
    import graft.operators.Similarity.SqDim
    val cut = "(SELECT (max(vec_id) * 4) // 5 FROM embeddings)"
    val mm = (0 until SqDim).map(d =>
      s"min(vn[${d + 1}]) AS mn$d, max(vn[${d + 1}]) AS mx$d")
      .mkString(",\n    ")
    val st = (0 until SqDim).map(d =>
      s"CASE WHEN mx$d > mn$d THEN 255.0/(mx$d - mn$d) ELSE 0.0 END AS iv$d")
      .mkString(",\n    ")
    val enc = (0 until SqDim).map(d =>
      s"CAST(least(255.0, greatest(0.0, floor((p.vn[${d + 1}] - s.mn$d)*s.iv$d + 0.5))) AS BIGINT) AS c${"%02d".format(d)}")
      .mkString(",\n    ")
    val cols = (0 until SqDim).map(d => s"c${"%02d".format(d)}").mkString(", ")
    "WITH " + kmTrainCtes(s" WHERE vec_id < $cut") + ",\n" +
      kmAsg("afa", KmIters) + ",\n" +
      kmProj("pb", s" WHERE vec_id >= $cut") + ",\n" +
      kmAsg("afb", KmIters, "pb") + ",\n" +
      s"""ppa AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
         |        FROM p WHERE nrm > 0),
         |ppb AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
         |        FROM pb WHERE nrm > 0),
         |ppca AS (SELECT ppa.vec_id, ppa.vn, afa.cell
         |         FROM ppa JOIN afa USING (vec_id)),
         |cb AS MATERIALIZED (SELECT cell,
         |    $mm
         |  FROM ppca GROUP BY cell),
         |stc AS MATERIALIZED (SELECT *,
         |    $st FROM cb),
         |ppcb AS (SELECT ppb.vec_id, ppb.vn, afb.cell
         |         FROM ppb JOIN afb USING (vec_id)),
         |encc AS (SELECT p.vec_id, CAST(p.cell AS BIGINT) AS cell,
         |    $enc
         |  FROM ppcb p JOIN stc s ON p.cell = s.cell)
         |SELECT vec_id, cell, $cols FROM encc ORDER BY vec_id""".stripMargin
  }

  /** Per-cell bounds-drift oracle: frozen centroids + cell bounds over
    * the 4/5 prefix, three assigned-and-quantized sides (index / raw
    * tail / dimension-collapsed tail), saturation counted per row with
    * unassignable-cell rows (LEFT-join miss) fully saturated — the
    * whole [[graft.operators.Similarity.sqCellBoundsDrift]] integer
    * contract, thresholds included.
    */
  private val sqCellBoundsDriftOracle: String = {
    import graft.operators.Similarity.SqDim
    val cut = "(SELECT (max(vec_id) * 4) // 5 FROM embeddings)"
    val mm = (0 until SqDim).map(d =>
      s"min(vn[${d + 1}]) AS mn$d, max(vn[${d + 1}]) AS mx$d")
      .mkString(",\n    ")
    val st = (0 until SqDim).map(d =>
      s"CASE WHEN mx$d > mn$d THEN 255.0/(mx$d - mn$d) ELSE 0.0 END AS iv$d")
      .mkString(",\n    ")
    val satSum = (0 until SqDim).map(d =>
      s"CASE WHEN floor((p.vn[${d + 1}] - s.mn$d)*s.iv$d + 0.5) <= 0 " +
        s"OR floor((p.vn[${d + 1}] - s.mn$d)*s.iv$d + 0.5) >= 255 THEN 1 ELSE 0 END")
      .mkString("\n      + ")
    def satCte(name: String, src: String) =
      s"""$name AS (SELECT CAST(count(*) * $SqDim AS BIGINT) AS n_codes,
         |  CAST(sum(CASE WHEN s.cell IS NULL THEN $SqDim ELSE $satSum END) AS BIGINT) AS n_sat
         |  FROM $src p LEFT JOIN stc s ON p.cell = s.cell)""".stripMargin
    def row(scenario: String, b: String) =
      s"""SELECT '$scenario' AS scenario, si.n_codes AS n_codes_index,
         |  $b.n_codes AS n_codes_batch,
         |  si.n_sat * 1000 // si.n_codes AS sat_pm_index,
         |  $b.n_sat * 1000 // $b.n_codes AS sat_pm_batch,
         |  ($b.n_sat * 1000 // $b.n_codes)
         |    - (si.n_sat * 1000 // si.n_codes) > 10 AS retrain_needed
         |FROM si, $b""".stripMargin
    "WITH " + kmTrainCtes(s" WHERE vec_id < $cut") + ",\n" +
      kmAsg("afa", KmIters) + ",\n" +
      kmProj("pb", s" WHERE vec_id >= $cut") + ",\n" +
      kmAsg("afb", KmIters, "pb") + ",\n" +
      s"""dr0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[])[1:24]
         |          || [${Seq.fill(40)("0.0").mkString(", ")}] AS v
         |        FROM embeddings WHERE vec_id >= $cut),
         |drc AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM dr0),
         |""".stripMargin +
      kmAsg("afd", KmIters, "drc") + ",\n" +
      s"""ppa AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
         |        FROM p WHERE nrm > 0),
         |ppb AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
         |        FROM pb WHERE nrm > 0),
         |ppd AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
         |        FROM drc WHERE nrm > 0),
         |ppca AS (SELECT ppa.vec_id, ppa.vn, afa.cell
         |         FROM ppa JOIN afa USING (vec_id)),
         |cb AS MATERIALIZED (SELECT cell,
         |    $mm
         |  FROM ppca GROUP BY cell),
         |stc AS MATERIALIZED (SELECT *,
         |    $st FROM cb),
         |ppcb AS (SELECT ppb.vec_id, ppb.vn, afb.cell
         |         FROM ppb JOIN afb USING (vec_id)),
         |ppcd AS (SELECT ppd.vec_id, ppd.vn, afd.cell
         |         FROM ppd JOIN afd USING (vec_id)),
         |${satCte("si", "ppca")},
         |${satCte("sb", "ppcb")},
         |${satCte("sd", "ppcd")}
         |${row("none", "sb")}
         |UNION ALL
         |${row("planted", "sd")}
         |ORDER BY scenario""".stripMargin
  }

  /** Frozen-bounds incremental SQ8 encode oracle: bounds over the
    * stored 4/5, wide code table over the arriving 1/5 — the
    * [[pqEncodeIncOracle]] cut spelling.
    */
  private val sqEncodeIncOracle: String = {
    import graft.operators.Similarity.SqDim
    val cols = (0 until SqDim).map(d => s"c${"%02d".format(d)}").mkString(", ")
    s"""WITH $pqPpSql,
       |cutc AS (SELECT (max(vec_id) * 4) // 5 AS cutv FROM embeddings),
       |ppa AS (SELECT pp.vec_id, pp.vn FROM pp, cutc WHERE vec_id < cutv),
       |ppb AS (SELECT pp.vec_id, pp.vn FROM pp, cutc WHERE vec_id >= cutv),
       |${sqChainSql("ppb", "ppa")}
       |SELECT vec_id, $cols
       |FROM enc
       |ORDER BY vec_id""".stripMargin
  }

  /** SQ8 bounds-drift oracle: the WHOLE alarm replayed — bounds from the
    * stored 4/5, three encodes (index / unshifted batch / +0.25-shifted
    * batch), integer saturation counts, integer per-mille, and the
    * threshold booleans themselves (everything is exact integer math, so
    * nothing needs pinning).
    */
  private val sqBoundsDriftOracle: String = {
    import graft.operators.Similarity.SqDim
    def satSum(e: String) = (0 until SqDim).map(d =>
      s"CASE WHEN $e.c${"%02d".format(d)} IN (0, 255) THEN 1 ELSE 0 END")
      .mkString("\n      + ")
    def satCte(name: String, enc: String) =
      s"""$name AS (SELECT CAST(count(*) * $SqDim AS BIGINT) AS n_codes,
         |  CAST(sum(${satSum(enc)}) AS BIGINT) AS n_sat FROM $enc $enc)""".stripMargin
    def row(scenario: String, b: String) =
      s"""SELECT '$scenario' AS scenario, sa.n_codes AS n_codes_index,
         |  $b.n_codes AS n_codes_batch,
         |  sa.n_sat * 1000 // sa.n_codes AS sat_pm_index,
         |  $b.n_sat * 1000 // $b.n_codes AS sat_pm_batch,
         |  ($b.n_sat * 1000 // $b.n_codes)
         |    - (sa.n_sat * 1000 // sa.n_codes) > 10 AS retrain_needed
         |FROM sa, $b""".stripMargin
    s"""WITH $pqPpSql,
       |cutc AS (SELECT (max(vec_id) * 4) // 5 AS cutv FROM embeddings),
       |ppa AS (SELECT pp.vec_id, pp.vn FROM pp, cutc WHERE vec_id < cutv),
       |ppb AS (SELECT pp.vec_id, pp.vn FROM pp, cutc WHERE vec_id >= cutv),
       |dr0 AS (SELECT vec_id,
       |          CAST(embedding AS DOUBLE[])[1:24]
       |            || [${Seq.fill(40)("0.0").mkString(", ")}] AS v
       |        FROM embeddings),
       |dr1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM dr0),
       |ppd AS (SELECT dr1.vec_id, list_transform(v, x -> x / nrm) AS vn
       |        FROM dr1, cutc WHERE nrm > 0 AND vec_id >= cutv),
       |${sqBoundsSql("ppa")},
       |${sqEncSql("ppa", "enca")},
       |${sqEncSql("ppb", "encb")},
       |${sqEncSql("ppd", "encd")},
       |${satCte("sa", "enca")},
       |${satCte("sb", "encb")},
       |${satCte("sd", "encd")}
       |${row("none", "sb")}
       |UNION ALL
       |${row("planted", "sd")}
       |ORDER BY scenario""".stripMargin
  }

  /** The normalized-vector projection every PQ oracle starts from.
    * (A def, not a val: it is interpolated by `pqTopKOracle` and
    * `pqEncodeIncOracle`, which initialize earlier in declaration order.)
    */
  private def pqPpSql: String =
    """emb0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                          CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |pp AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
      |       FROM emb0 WHERE nrm > 0)""".stripMargin

  /** One subspace's full PQ chain (init + Lloyd iterations + final
    * centroids `s{s}h{PqIters}` + corpus encoding `s{s}e`), trained over
    * the normalized-vector CTE `pSrc`. Shared by the top-k and the
    * incremental-encode oracles.
    */
  private def pqSubChainSql(pSrc: String)(s: Int): String = {
    import graft.operators.Similarity.{PqSubDim, PqCodebook, PqIters, PqTrainSample}
    val Scale = "1048576.0" // 2^20, the fixed-point mean scale
    val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
    // tb = the bounded training sample (md5-order prefix, the Spark
    // side's pqTrainCorpus); seeding keeps its rn <= PqCodebook prefix.
    // Lloyd assignment/update run over tb; the final encode (s{s}e)
    // still covers all of sb. MATERIALIZED throughout: each CTE is
    // referenced more than once and DuckDB's default inlining re-derives
    // the whole chain per reference.
    val init =
      s"""sb$s AS MATERIALIZED (SELECT vec_id, vn[$lo:$hi] AS sv FROM $pSrc),
           |tb$s AS MATERIALIZED (SELECT vec_id, sv, rn
           |  FROM (SELECT vec_id, sv, row_number() OVER
           |          (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           |        FROM sb$s)
           |  WHERE rn <= $PqTrainSample),
           |s${s}cp0 AS MATERIALIZED (SELECT CAST(q.rn - 1 AS BIGINT) AS cell,
           |    t.i + 1 AS pos, q.sv[t.i + 1] AS cx
           |  FROM tb$s q
           |  CROSS JOIN unnest(range($PqSubDim)) AS t(i)
           |  WHERE q.rn <= $PqCodebook)""".stripMargin
      val iters = (0 until PqIters).map { k =>
        s"""s${s}h$k AS MATERIALIZED (SELECT cell, list(cx ORDER BY pos) AS cv,
           |    list_dot_product(list(cx ORDER BY pos),
           |                     list(cx ORDER BY pos)) / 2.0 AS ch
           |  FROM s${s}cp$k GROUP BY cell),
           |s${s}a${k + 1} AS MATERIALIZED (SELECT vec_id, cell FROM (
           |    SELECT p.vec_id, n.cell, row_number() OVER (PARTITION BY p.vec_id
           |      ORDER BY round(list_dot_product(p.sv, n.cv) - n.ch, 6) DESC,
           |               n.cell DESC) AS rn
           |    FROM tb$s p CROSS JOIN s${s}h$k n) WHERE rn = 1),
           |s${s}cp${k + 1} AS MATERIALIZED (SELECT prev.cell, prev.pos,
           |    CASE WHEN x.n IS NULL THEN prev.cx
           |         ELSE CAST(x.sx AS DOUBLE) / (CAST(x.n AS DOUBLE) * $Scale)
           |    END AS cx
           |  FROM s${s}cp$k prev LEFT JOIN (
           |    SELECT a.cell, t.i + 1 AS pos,
           |      sum(CAST(round(p.sv[t.i + 1] * $Scale, 0) AS BIGINT)) AS sx,
           |      count(*) AS n
           |    FROM s${s}a${k + 1} a JOIN tb$s p USING (vec_id)
           |    CROSS JOIN unnest(range($PqSubDim)) AS t(i)
           |    GROUP BY 1, 2) x
           |  ON prev.cell = x.cell AND prev.pos = x.pos)""".stripMargin
      }
      val finals =
        s"""s${s}h$PqIters AS MATERIALIZED (SELECT cell, list(cx ORDER BY pos) AS cv,
           |    list_dot_product(list(cx ORDER BY pos),
           |                     list(cx ORDER BY pos)) / 2.0 AS ch
           |  FROM s${s}cp$PqIters GROUP BY cell),
           |s${s}e AS MATERIALIZED (SELECT vec_id, cell FROM (
           |    SELECT p.vec_id, n.cell, row_number() OVER (PARTITION BY p.vec_id
           |      ORDER BY round(list_dot_product(p.sv, n.cv) - n.ch, 6) DESC,
           |               n.cell DESC) AS rn
           |    FROM sb$s p CROSS JOIN s${s}h$PqIters n) WHERE rn = 1)""".stripMargin
      (Seq(init) ++ iters ++ Seq(finals)).mkString(",\n")
  }

  /** Full SQL replay of [[graft.operators.Similarity.lshTopK]]: the same
    * deterministic hyperplane buckets as [[lshBucketCtes]], hamming-1
    * multi-probe (bucket XOR each single plane bit), rounded-cosine
    * ranking. Every probe bucket is distinct, so no pair dedup is needed —
    * same as the Spark side.
    */
  private val lshTopKOracle: String = {
    val flips = 0L +: (0 until graft.operators.Similarity.NumPlanes)
      .map(i => 1L << i)
    s"""WITH $lshBucketCtes,
       |n AS (SELECT vec_id, ve, bucket,
       |        sqrt(list_dot_product(ve, ve)) AS nrm FROM b),
       |pr AS (SELECT q.vec_id AS query_id, q.ve AS qv, q.nrm AS qn,
       |         xor(q.bucket, f.f) AS q_bucket
       |       FROM n q CROSS JOIN (SELECT CAST(unnest([${flips.mkString(", ")}])
       |                                   AS BIGINT) AS f) f
       |       WHERE q.vec_id < 20),
       |sc AS (SELECT pr.query_id, nn.vec_id AS neighbor_id,
       |         round(list_dot_product(pr.qv, nn.ve) / (pr.qn * nn.nrm), 6) AS cos_r
       |       FROM pr JOIN n nn ON nn.bucket = pr.q_bucket
       |                        AND nn.vec_id <> pr.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM sc)
       |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** Full SQL replay of [[graft.operators.Similarity.ivfTopK]] on top of
    * [[kmeansClusterOracle]]'s trained centroids: per-vector cell ranking
    * by rounded cosine (ties → higher cell), corpus membership = rank-1
    * cell, queries probe their `IvfProbes` nearest cells, candidates
    * ranked by rounded cosine with vec_id ties. With the quantizer now
    * md5-seeded, every stage from init to final rank is engine-portable.
    */
  private val ivfTopKOracle: String = {
    val probes = graft.operators.Similarity.IvfProbes
    // kmeansClusterOracle ends with the final-assignment SELECT; reuse its
    // CTE chain up to the trained-centroid table n3 by rebuilding the
    // prefix here (cheap string surgery keeps one source of truth)
    val ctePrefix = kmeansClusterOracle.substring(0,
      kmeansClusterOracle.indexOf(",\naf AS"))
    s"""$ctePrefix,
       |av AS (SELECT vec_id, cell, rn FROM (
       |  SELECT p.vec_id, n.cell,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      (CASE WHEN isfinite(list_dot_product(p.v, n.cv) / (p.nrm * n.cn))
       |            THEN round(list_dot_product(p.v, n.cv) / (p.nrm * n.cn), 6)
       |            ELSE -1e308 END) DESC, n.cell DESC) AS rn
       |  FROM p CROSS JOIN n${graft.operators.Similarity.IvfKmeansIters} n)),
       |corp AS (SELECT vec_id, cell FROM av WHERE rn = 1),
       |qpr AS (SELECT vec_id AS query_id, cell AS q_cell FROM av
       |        WHERE rn <= $probes AND vec_id < 20),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         round(list_dot_product(pq.v, pc.v) / (pq.nrm * pc.nrm), 6) AS cos_r
       |       FROM qpr q JOIN corp c ON c.cell = q.q_cell
       |                             AND c.vec_id <> q.query_id
       |       JOIN p pq ON pq.vec_id = q.query_id
       |       JOIN p pc ON pc.vec_id = c.vec_id),
       |r AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, neighbor_id) AS BIGINT) AS "rank"
       |      FROM sc)
       |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** Cross-set LSH cosine screen (hyperplane buckets replayed in SQL,
    * hamming ≤ 1 candidates, exact verify); `restrict` narrows the
    * training side (the frozen-bucket batch probe — per-doc purity
    * makes the restriction exact).
    */
  private def decontaminateSemLshOracle(restrict: String = ""): String =
    s"""WITH $lshBucketCtes,
       |f AS (SELECT b.*,
       |    CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) % 10000 < 1000 AS is_eval
       |  FROM b)
       |SELECT t.vec_id, CAST(count(DISTINCT e.vec_id) AS BIGINT) AS n_eval_hits
       |FROM f t JOIN f e ON (NOT t.is_eval) AND e.is_eval
       | AND bit_count(xor(t.bucket, e.bucket)) <= 1
       |WHERE list_cosine_similarity(t.ve, e.ve) >= 0.4
       |$restrict
       |GROUP BY t.vec_id ORDER BY t.vec_id""".stripMargin

  private val lshPairOracle: String =
    s"""WITH $lshBucketCtes
       |SELECT x.vec_id AS vec_i, y.vec_id AS vec_j
       |FROM b x JOIN b y ON x.vec_id < y.vec_id
       | AND bit_count(xor(x.bucket, y.bucket)) <= 1
       |WHERE list_cosine_similarity(x.ve, y.ve) >= 0.4
       |ORDER BY vec_i, vec_j""".stripMargin

  /** Transitive closure over the LSH-verified cosine pair graph, keep-min
    * per component — the SemDeDup admission contract.
    */
  /** Whole-corpus semantic-dedup closure; `restrict` filters the OUTPUT
    * rows (the closure always sees the full corpus) — which is precisely
    * the incremental operator's contract.
    */
  private def semanticDedupOracle(restrict: String = ""): String =
    s"""WITH RECURSIVE
       |$lshBucketCtes,
       |p AS (SELECT x.vec_id AS u, y.vec_id AS w
       |      FROM b x JOIN b y ON x.vec_id < y.vec_id
       |       AND bit_count(xor(x.bucket, y.bucket)) <= 1
       |      WHERE list_cosine_similarity(x.ve, y.ve) >= 0.4),
       |e AS (SELECT u, w FROM p UNION SELECT w, u FROM p),
       |reach(a, z) AS (
       |  SELECT u, w FROM e
       |  UNION
       |  SELECT r.a, e.w FROM reach r JOIN e ON r.z = e.u),
       |lab AS (SELECT a AS vec_id, least(a, min(z)) AS cid
       |        FROM reach GROUP BY a)
       |SELECT emb.vec_id, coalesce(l.cid, emb.vec_id) AS cluster_id,
       |       (coalesce(l.cid, emb.vec_id) = emb.vec_id) AS kept
       |FROM emb LEFT JOIN lab l ON emb.vec_id = l.vec_id
       |$restrict
       |ORDER BY emb.vec_id""".stripMargin

  /** Eval-overlap contamination oracle: 8-gram join on shingle TEXT (the
    * Spark sides join on xxhash64 of the same strings — identical result
    * barring a 64-bit collision, the dedup_ngram_jaccard precedent).
    * Shared by the Column-API query and its SQL-text twin.
    */
  private val decontaminateOracle: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 10000 < 1000 AS is_eval
      |  FROM documents),
      |t AS (SELECT doc_id, is_eval, string_split(text, ' ') AS w FROM b),
      |sh AS MATERIALIZED (SELECT doc_id, is_eval,
      |  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
      |    || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' '
      |    || w[i+7] for i in range(1, len(w) - 6)])) AS ng
      |  FROM t WHERE len(w) >= 8)
      |SELECT tr.doc_id,
      |  CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs,
      |  CAST(count(DISTINCT tr.ng) AS BIGINT) AS n_shared_ngrams
      |FROM sh tr JOIN sh ev ON tr.ng = ev.ng
      |WHERE NOT tr.is_eval AND ev.is_eval
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  /** Shared perceptual-hash CTE chain → `ph(doc_id, w, h, phash)`: the
    * 8×8 average hash recomputed from the hash-fixture pixel recipe
    * (`Multimodal.makePhashPpm` — planted twins at doc_id ≡ 9 mod 10),
    * independently of the binary decode path. Used by `multimodal_phash`
    * and `multimodal_image_dups`.
    */
  private val phashCtes: String =
    """pd AS (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 9 THEN doc_id - 9 ELSE doc_id END AS e,
      |        CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS planted
      |      FROM documents),
      |pg AS (SELECT doc_id, e, planted, 16 + e % 17 AS w, 12 + e % 13 AS h,
      |        gi // 8 AS gy, gi % 8 AS gx
      |      FROM pd CROSS JOIN unnest(range(64)) AS t(gi)),
      |pp AS (SELECT doc_id, w, h, gy, gx, e, planted,
      |        ((gy * h) // 8) * w + (gx * w) // 8 AS pi
      |      FROM pg),
      |pc AS (SELECT doc_id, w, h, gy, gx,
      |        CASE WHEN planted = 1 AND pi IN (0, 5, 11)
      |             THEN least((e*7 + pi*13) % 256, 223) + 32
      |             ELSE (e*7 + pi*13) % 256 END AS r,
      |        (e*11 + pi*17) % 256 AS g_,
      |        (e*3 + pi*29) % 256 AS b
      |      FROM pp),
      |pl AS (SELECT doc_id, w, h, gy, gx,
      |        (299*r + 587*g_ + 114*b) // 1000 AS luma FROM pc),
      |pm AS (SELECT doc_id, sum(luma) // 64 AS mean FROM pl GROUP BY doc_id),
      |pb AS (SELECT pl.doc_id, max(w) AS w, max(h) AS h, gy,
      |        CAST(sum(CASE WHEN luma > mean THEN 1 ELSE 0 END
      |          * (CASE gx WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 32
      |                     WHEN 3 THEN 16 WHEN 4 THEN 8 WHEN 5 THEN 4
      |                     WHEN 6 THEN 2 ELSE 1 END)) AS BIGINT) AS byte
      |      FROM pl JOIN pm ON pl.doc_id = pm.doc_id
      |      GROUP BY pl.doc_id, gy),
      |ph AS (SELECT doc_id, max(w) AS w, max(h) AS h,
      |        string_agg(lower(lpad(hex(byte), 2, '0')), '' ORDER BY gy) AS phash
      |      FROM pb GROUP BY doc_id)""".stripMargin

  /** Shared acoustic-fingerprint CTE chain → `afp(doc_id, nf, afp)`: the
    * 32-bit energy-contour fingerprint recomputed from the fingerprint
    * fixture recipe (`Multimodal.fpSamples` — planted gain-scaled twins
    * at doc_id ≡ 7 mod 10), independently of the WAV binary path. Used
    * by `multimodal_audio_fp` and `multimodal_audio_dups`.
    */
  private val audioFpCtes: String =
    """ad AS (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 7 THEN doc_id - 7 ELSE doc_id END AS e,
      |        CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END AS planted
      |      FROM documents),
      |an AS (SELECT doc_id, e, planted, 544 + e % 225 AS n FROM ad),
      |asm AS (SELECT doc_id, i // 16 AS f,
      |        CASE WHEN planted = 1
      |             THEN ((((e * 31 + 7) * (i + 1) * (i + 2) % 4001) - 2000) * 31) // 32
      |             ELSE ((e * 31 + 7) * (i + 1) * (i + 2) % 4001) - 2000 END AS s
      |      FROM an CROSS JOIN unnest(range(768)) AS t(i)
      |      WHERE i < (n // 16) * 16),
      |fe AS (SELECT doc_id, f, CAST(sum(s * s) AS BIGINT) AS en
      |       FROM asm GROUP BY doc_id, f),
      |fn AS (SELECT doc_id, count(*) AS nf FROM fe GROUP BY doc_id),
      |fd AS (SELECT doc_id, f, en,
      |        lead(en) OVER (PARTITION BY doc_id ORDER BY f) AS nen FROM fe),
      |av AS (SELECT doc_id,
      |        CAST(sum(CASE WHEN f < 32 AND nen IS NOT NULL AND nen > en
      |                 THEN CAST(1 AS BIGINT) << CAST(31 - f AS INT)
      |                 ELSE 0 END) AS BIGINT) AS v
      |      FROM fd GROUP BY doc_id),
      |afp AS (SELECT av.doc_id, nf, lower(lpad(hex(v), 8, '0')) AS afp
      |        FROM av JOIN fn ON av.doc_id = fn.doc_id)""".stripMargin

  /** 64-bit acoustic-fingerprint CTE chain → `afp64(doc_id, nf, afp)`:
    * the [[audioFpCtes]] recipe with the longer clips
    * (`Multimodal.fpSamples64` — 1056 + e mod 225 samples, 66–80 frames)
    * and the contour extended to 64 deltas. The fingerprint is
    * assembled from two 32-bit halves (deltas 0–31 → high word,
    * 32–63 → low word) because DuckDB's BIGINT left-shift cannot
    * represent bit 63 (`1 << 63` overflows); Spark's `f"%016x"` of the
    * long is exactly the concatenated unsigned halves.
    */
  private val audioFp64Ctes: String =
    """ad64 AS (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 7 THEN doc_id - 7 ELSE doc_id END AS e,
      |        CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END AS planted
      |      FROM documents),
      |an64 AS (SELECT doc_id, e, planted, 1056 + e % 225 AS n FROM ad64),
      |asm64 AS (SELECT doc_id, i // 16 AS f,
      |        CASE WHEN planted = 1
      |             THEN ((((e * 31 + 7) * (i + 1) * (i + 2) % 4001) - 2000) * 31) // 32
      |             ELSE ((e * 31 + 7) * (i + 1) * (i + 2) % 4001) - 2000 END AS s
      |      FROM an64 CROSS JOIN unnest(range(1280)) AS t(i)
      |      WHERE i < (n // 16) * 16),
      |fe64 AS (SELECT doc_id, f, CAST(sum(s * s) AS BIGINT) AS en
      |       FROM asm64 GROUP BY doc_id, f),
      |fn64 AS (SELECT doc_id, count(*) AS nf FROM fe64 GROUP BY doc_id),
      |fd64 AS (SELECT doc_id, f, en,
      |        lead(en) OVER (PARTITION BY doc_id ORDER BY f) AS nen FROM fe64),
      |av64 AS (SELECT doc_id,
      |        CAST(sum(CASE WHEN f < 32 AND nen IS NOT NULL AND nen > en
      |                 THEN CAST(1 AS BIGINT) << CAST(31 - f AS INT)
      |                 ELSE 0 END) AS BIGINT) AS vhi,
      |        CAST(sum(CASE WHEN f >= 32 AND f < 64 AND nen IS NOT NULL
      |                      AND nen > en
      |                 THEN CAST(1 AS BIGINT) << CAST(63 - f AS INT)
      |                 ELSE 0 END) AS BIGINT) AS vlo
      |      FROM fd64 GROUP BY doc_id),
      |afp64 AS (SELECT av64.doc_id, nf,
      |          lower(lpad(hex(vhi), 8, '0') || lpad(hex(vlo), 8, '0')) AS afp
      |        FROM av64 JOIN fn64 ON av64.doc_id = fn64.doc_id)""".stripMargin

  /** Shared video CTE chain → `vs(doc_id, f, n, mean_luma_milli, sad,
    * npy)`: per-frame statistics recomputed from the video fixture
    * recipe (`Multimodal.videoDims`/`videoLuma` — scene cut at
    * `nf div 2` for doc_id ≢ 0 mod 3), independently of the Y4M binary
    * path. Used by `multimodal_video_frames` and
    * `multimodal_video_scenes`.
    */
  private val videoCtes: String =
    """vd AS (SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h,
      |        4 + doc_id % 5 AS nf,
      |        CASE WHEN doc_id % 3 = 0 THEN -1
      |             ELSE (4 + doc_id % 5) // 2 END AS sc
      |      FROM documents),
      |vf AS (SELECT doc_id, w, h, nf, sc, f
      |      FROM vd CROSS JOIN unnest(range(8)) AS t(f) WHERE f < nf),
      |vp AS (SELECT doc_id, w, h, f, i,
      |        CASE WHEN sc >= 0 AND f >= sc
      |             THEN (doc_id * 17 + i * 11) % 200 + 2 * (f - sc)
      |             ELSE (doc_id * 13 + i * 7) % 200 + 2 * f END AS y
      |      FROM vf CROSS JOIN unnest(range(192)) AS t(i) WHERE i < w * h),
      |vq AS (SELECT doc_id, f, i, y, w * h AS n,
      |        lag(y) OVER (PARTITION BY doc_id, i ORDER BY f) AS py
      |      FROM vp),
      |vs AS (SELECT doc_id, f, max(n) AS n,
      |        CAST(sum(y) * 1000 // max(n) AS BIGINT) AS mean_luma_milli,
      |        CAST(coalesce(sum(abs(y - py)), 0) AS BIGINT) AS sad,
      |        count(py) AS npy
      |      FROM vq GROUP BY doc_id, f)""".stripMargin

  /** Shared video-fingerprint CTE chain → `vfp(doc_id, nf, vfp)`: the
    * 32-bit temporal luma-contour fingerprint recomputed from the
    * fingerprint fixture recipe (`Multimodal.vfpDims`/`vfpLuma` —
    * planted brightness-shifted twins at doc_id ≡ 8 mod 10),
    * independently of the Y4M binary path. Used by
    * `multimodal_video_fp` and `multimodal_video_dups`.
    */
  private val videoFpCtes: String =
    """vfd AS (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 8 THEN doc_id - 8 ELSE doc_id END AS e,
      |        CASE WHEN doc_id % 10 = 8 THEN 1 ELSE 0 END AS planted
      |      FROM documents),
      |vfn AS (SELECT doc_id, e, planted, 6 + e % 5 AS w, 4 + e % 5 AS h,
      |        34 + e % 15 AS nf FROM vfd),
      |vfs AS (SELECT doc_id, nf, f,
      |        CAST(sum(((e*31 + 7) * (f+1) * (f+2) + 13*i) % 200
      |          + planted * 5) AS BIGINT) AS s
      |      FROM vfn CROSS JOIN unnest(range(48)) AS tf(f)
      |      CROSS JOIN unnest(range(80)) AS ti(i)
      |      WHERE f < nf AND i < w * h
      |      GROUP BY doc_id, nf, f),
      |vfe AS (SELECT doc_id, nf, f, s,
      |        lead(s) OVER (PARTITION BY doc_id ORDER BY f) AS ns FROM vfs),
      |vfv AS (SELECT doc_id, max(nf) AS nf,
      |        CAST(sum(CASE WHEN f < 32 AND ns IS NOT NULL AND ns > s
      |                 THEN CAST(1 AS BIGINT) << CAST(31 - f AS INT)
      |                 ELSE 0 END) AS BIGINT) AS v
      |      FROM vfe GROUP BY doc_id),
      |vfp AS (SELECT doc_id, nf, lower(lpad(hex(v), 8, '0')) AS vfp
      |        FROM vfv)""".stripMargin

  /** Shared smaller-id fingerprint-neighbor CTE chains (require
    * `phashCtes` / `audioFpCtes` / `videoFpCtes` earlier in the WITH):
    * banded candidates → Hamming ≤ 3 → `im`/`am`/`vm` (doc_id, canon =
    * min smaller neighbor). Used by the admission oracles and
    * `pipeline_multimodal`.
    */
  private val imageNeighborCtes: String =
    """ibands AS (SELECT doc_id, phash, bi,
      |            substring(phash, CAST(bi * 4 + 1 AS INT), 4) AS bv
      |          FROM ph CROSS JOIN unnest(range(4)) AS t(bi)),
      |icand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |                x.phash AS ha, y.phash AS hb
      |         FROM ibands x JOIN ibands y
      |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
      |ihm AS (SELECT doc_a, doc_b,
      |         CAST(sum(bit_count(xor(
      |           strpos('0123456789abcdef', substring(ha, CAST(i + 1 AS INT), 1)) - 1,
      |           strpos('0123456789abcdef', substring(hb, CAST(i + 1 AS INT), 1)) - 1)))
      |           AS BIGINT) AS hamming
      |       FROM icand CROSS JOIN unnest(range(16)) AS t(i)
      |       GROUP BY doc_a, doc_b),
      |im AS (SELECT doc_b AS doc_id, min(doc_a) AS canon
      |       FROM ihm WHERE hamming <= 3 GROUP BY doc_b)""".stripMargin

  private val audioNeighborCtes: String =
    """abands AS (SELECT doc_id, afp, bi,
      |            substring(afp, CAST(bi * 2 + 1 AS INT), 2) AS bv
      |          FROM afp CROSS JOIN unnest(range(4)) AS t(bi)),
      |acand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |                x.afp AS fa, y.afp AS fb
      |         FROM abands x JOIN abands y
      |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
      |ahm AS (SELECT doc_a, doc_b,
      |         CAST(sum(bit_count(xor(
      |           strpos('0123456789abcdef', substring(fa, CAST(i + 1 AS INT), 1)) - 1,
      |           strpos('0123456789abcdef', substring(fb, CAST(i + 1 AS INT), 1)) - 1)))
      |           AS BIGINT) AS hamming
      |       FROM acand CROSS JOIN unnest(range(8)) AS t(i)
      |       GROUP BY doc_a, doc_b),
      |am AS (SELECT doc_b AS doc_id, min(doc_a) AS canon
      |       FROM ahm WHERE hamming <= 3 GROUP BY doc_b)""".stripMargin

  private val videoNeighborCtes: String =
    """vbands AS (SELECT doc_id, vfp, bi,
      |            substring(vfp, CAST(bi * 2 + 1 AS INT), 2) AS bv
      |          FROM vfp CROSS JOIN unnest(range(4)) AS t(bi)),
      |vcand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |                x.vfp AS fa, y.vfp AS fb
      |         FROM vbands x JOIN vbands y
      |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
      |vhm AS (SELECT doc_a, doc_b,
      |         CAST(sum(bit_count(xor(
      |           strpos('0123456789abcdef', substring(fa, CAST(i + 1 AS INT), 1)) - 1,
      |           strpos('0123456789abcdef', substring(fb, CAST(i + 1 AS INT), 1)) - 1)))
      |           AS BIGINT) AS hamming
      |       FROM vcand CROSS JOIN unnest(range(8)) AS t(i)
      |       GROUP BY doc_a, doc_b),
      |vm AS (SELECT doc_b AS doc_id, min(doc_a) AS canon
      |       FROM vhm WHERE hamming <= 3 GROUP BY doc_b)""".stripMargin

  /** Shared language-ID CTE chain → `lang(doc_id, pred_lang, c_*)`.
    * Used by `text_langid` and `sample_stratified`.
    */
  private val langCtes: String =
    """lt AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |ls AS (SELECT doc_id,
      |  len(list_filter(w, x -> x IN ('the', 'a'))) AS c_en,
      |  len(list_filter(w, x -> x IN ('data', 'query'))) AS c_es,
      |  len(list_filter(w, x -> x IN ('window', 'batch'))) AS c_de,
      |  len(list_filter(w, x -> x IN ('merge', 'join'))) AS c_fr,
      |  len(list_filter(w, x -> x IN ('hash', 'scan'))) AS c_zh
      |FROM lt),
      |lang AS (SELECT doc_id,
      |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
      |       WHEN c_es >= c_de AND c_es >= c_fr AND c_es >= c_zh THEN 'es'
      |       WHEN c_de >= c_fr AND c_de >= c_zh THEN 'de'
      |       WHEN c_fr >= c_zh THEN 'fr'
      |       ELSE 'zh' END AS pred_lang,
      |  c_en, c_es, c_de, c_fr, c_zh
      |FROM ls)""".stripMargin

  /** Shared near-dup cluster CTE chain (word-3-gram Jaccard ≥ ½ pairs →
    * symmetric edges → recursive transitive closure). Used by
    * `dedup_clusters` and the `pipeline_clean_corpus` funnel.
    */
  private val clusterCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id,
      |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                        for i in range(1, len(w) - 1)]) AS s
      |       FROM t WHERE len(w) >= 3),
      |p AS MATERIALIZED (SELECT a.doc_id AS u, b.doc_id AS v
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 2 * len(list_intersect(a.s, b.s))
      |            >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
      |e AS MATERIALIZED (SELECT u, v FROM p UNION SELECT v, u FROM p),
      |reach(a, b) AS (
      |  SELECT u, v FROM e
      |  UNION
      |  SELECT r.a, e.v FROM reach r JOIN e ON r.b = e.u)""".stripMargin

  /** Whole-corpus transitive closure restricted to the batch ids — the
    * union-vs-incremental equivalence contract shared by the
    * document-corpus and artifact-table incremental near-dup paths.
    */
  private val incrementalNearDupOracle: String =
    s"""WITH RECURSIVE
       |$clusterCtes,
       |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cid
       |        FROM reach GROUP BY a)
       |SELECT d.doc_id, coalesce(l.cid, d.doc_id) AS cluster_id,
       |       (coalesce(l.cid, d.doc_id) = d.doc_id) AS admitted
       |FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
       |WHERE d.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
       |ORDER BY d.doc_id""".stripMargin

  /** Brute-force word-3-gram Jaccard ≥ 1/2 pairs — ground truth for both
    * the MinHash+LSH and inverted-index near-dup queries (the LSH banding
    * at 32×4 has miss probability ≈1.5e-15 for this data's ≥0.9 planted
    * pairs, so the approximate and exact pipelines coincide).
    */
  private val gapfillOracle: String =
    """WITH b AS (SELECT event_type, date_trunc('day', ts) AS day, value
      |           FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
      |d AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events,
      |        CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |      FROM b GROUP BY 1, 2),
      |span AS (SELECT min(day) AS lo, max(day) AS hi FROM b),
      |days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM span),
      |types AS (SELECT DISTINCT event_type FROM b)
      |SELECT t.event_type, dy.day,
      |  coalesce(d.n_events, 0) AS n_events,
      |  coalesce(d.cents, 0) / 100.0 AS sum_value
      |FROM types t CROSS JOIN days dy
      |LEFT JOIN d ON d.event_type = t.event_type AND d.day = dy.day
      |ORDER BY 1, 2""".stripMargin

  private val markovOracle: String =
    """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
      |           WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |             AND event_id IS NOT NULL AND event_type IS NOT NULL),
      |p AS (SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |        event_type AS next_type FROM e),
      |c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
      |      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |  CAST((n * 20000 + sum(n) OVER (PARTITION BY prev_type))
      |    // (2 * sum(n) OVER (PARTITION BY prev_type)) AS BIGINT) AS prob_bp
      |FROM c ORDER BY 1, 2""".stripMargin

  private val rangeJoinOracle: String =
    """SELECT a.event_id AS purchase_id, a.user_id, a.ts AS purchase_ts,
      |  b.event_id AS error_id, b.ts AS error_ts
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'purchase' AND b.event_type = 'error'
      | AND abs(date_diff('microsecond', b.ts, a.ts)) <= 7200000000
      |ORDER BY purchase_id, error_id""".stripMargin

  /** Brute cross-set 3-shingle Jaccard grouped per training doc;
    * `restrict` narrows the training side (the frozen-artifact batch
    * screen — per-doc purity makes the restriction exact).
    */
  private def decontaminateFuzzyOracle(restrict: String = ""): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
       |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) % 10000 < 1000 AS is_eval
       |  FROM documents),
       |sh AS MATERIALIZED (SELECT doc_id, is_eval,
       |     list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                    for i in range(1, len(w) - 1)]) AS s
       |   FROM t WHERE len(w) >= 3),
       |p AS (SELECT tr.doc_id AS doc_id,
       |        len(list_intersect(tr.s, ev.s)) AS inter,
       |        len(tr.s) + len(ev.s) - len(list_intersect(tr.s, ev.s)) AS u
       |      FROM sh tr JOIN sh ev ON (NOT tr.is_eval) AND ev.is_eval
       |      $restrict)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_neardups,
       |  CAST(max((inter * 20000 + u) // (2 * u)) AS BIGINT) AS max_jac_bp
       |FROM p WHERE inter * 2 >= u
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The frozen-artifact exact screen replayed: the whole-corpus
    * decontamination CTE chain restricted to the batch slice (per-doc
    * purity makes the restriction exact). Shared by the single-shot
    * incremental screen and the streamed loop.
    */
  private val decontaminateIncOracle: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 10000 < 1000 AS is_eval
      |  FROM documents),
      |t AS (SELECT doc_id, is_eval, string_split(text, ' ') AS w FROM b),
      |sh AS MATERIALIZED (SELECT doc_id, is_eval,
      |  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
      |    || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' '
      |    || w[i+7] for i in range(1, len(w) - 6)])) AS ng
      |  FROM t WHERE len(w) >= 8)
      |SELECT tr.doc_id,
      |  CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs,
      |  CAST(count(DISTINCT tr.ng) AS BIGINT) AS n_shared_ngrams
      |FROM sh tr JOIN sh ev ON tr.ng = ev.ng
      |WHERE NOT tr.is_eval AND ev.is_eval
      |  AND tr.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  /** Frozen-artifact importance admission replayed end to end: weights +
    * threshold from the pool slice only, batch scored against them.
    * Shared by the single-shot incremental call and the streamed
    * admission loop (stateless over the same artifacts, so batching
    * cannot change a verdict).
    */
  private val importanceIncrementalOracle: String =
    """WITH cutv AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
      |t AS (SELECT doc_id, lang, string_split(text, ' ') AS w,
      |        doc_id < (SELECT c FROM cutv) AS in_pool
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, lang, in_pool, unnest(w) AS feat FROM t
      |  UNION ALL
      |  SELECT doc_id, lang, in_pool,
      |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS feat
      |  FROM t WHERE len(w) >= 2),
      |bo AS (SELECT doc_id, lang, in_pool,
      |    CAST(('0x' || substring(md5(feat), 1, 15)) AS BIGINT) % 4096 AS b
      |  FROM occ),
      |cnt AS (SELECT b,
      |    CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS cnt_t,
      |    CAST(count(*) AS BIGINT) AS cnt_r
      |  FROM bo WHERE in_pool GROUP BY b),
      |wt AS (SELECT b,
      |    (1000 * (cnt_t + 1) * ((SELECT sum(cnt_r) FROM cnt) + 4096))
      |      // ((cnt_r + 1) * ((SELECT sum(cnt_t) FROM cnt) + 4096))
      |      AS w_milli
      |  FROM cnt),
      |ds AS (SELECT doc_id, in_pool, CAST(count(*) AS BIGINT) AS n_feats,
      |    CAST(sum(w_milli) // count(*) AS BIGINT) AS w_avg_milli
      |  FROM bo JOIN wt USING (b) GROUP BY doc_id, in_pool),
      |hist AS (SELECT w_avg_milli AS s, count(*) AS cnt FROM ds
      |  WHERE in_pool GROUP BY 1),
      |thr AS (SELECT max(s) AS thr FROM (
      |  SELECT s, sum(cnt) OVER (ORDER BY s DESC) AS cum,
      |         sum(cnt) OVER () AS total FROM hist)
      |  WHERE cum * 10000 >= total * 2500)
      |SELECT doc_id, n_feats, w_avg_milli FROM ds
      |WHERE NOT in_pool AND w_avg_milli >= (SELECT thr FROM thr)
      |ORDER BY doc_id""".stripMargin

  private val bruteJaccardOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id,
      |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                        for i in range(1, len(w) - 1)]) AS s
      |       FROM t WHERE len(w) >= 3),
      |p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
      |        len(list_intersect(a.s, b.s)) AS inter,
      |        len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT doc_i, doc_j, (inter * 20000 + u) // (2 * u) AS jac_bp
      |FROM p WHERE inter * 2 >= u ORDER BY doc_i, doc_j""".stripMargin
}
