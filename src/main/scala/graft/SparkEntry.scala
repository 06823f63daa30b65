package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sessions

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
  )

  // ------------------------------------------------------------ oracle SQL

  /** Gap-and-islands sessionization oracle (SURVEY.md §5.2): new session
    * when the microsecond diff to the previous event is >= the gap — same
    * half-open boundary as Spark's `session_window`. `gsecSql` is a SQL
    * expression (over `user_id`) yielding the gap in whole seconds.
    */
  private def sessionOracle(gsecSql: String, having: String = "",
                            keepFirst: Boolean = false): String = {
    val agg = s"""
      |WITH e AS (
      |  SELECT user_id, ts, value, CAST(($gsecSql) AS BIGINT) AS gsec
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), flagged AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |       OR date_diff('microsecond', lag(ts) OVER w, ts) >= gsec * 1000000
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
      |     round(sum(value) * 100, 0) / 100.0 AS session_sum,
      |     floor(round(sum(value) * 100, 0) / count(*) + 0.5) / 100.0 AS session_avg
      |  FROM sess GROUP BY user_id, sid
      |)""".stripMargin
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
    "t2_big_customers" -> sessionOracle("7200",
      having = "WHERE session_sum >= 300.0", keepFirst = true),
    "t3_dynamic_gap_ref" -> sessionOracle(refGapSql),
    "t3_dynamic_gap_scaled" -> sessionOracle(scaledGapSql),
  )
}
