package graft

import graft.operators.Relational

/** The measured skew chooser: profile first, then route between the plain
  * single-shuffle aggregate and the two-stage salted template. Both
  * branches are forced explicitly via `saltAbove`, and each must equal the
  * plain plan's result (the same contract the DuckDB oracle pins for
  * `q_adaptive_user_totals` on whichever branch the fixture selects).
  */
class AdaptiveSkewSpec extends SparkSpec {
  import spark.implicits._

  // one mega-user (60 rows) + 12 singleton users:
  // skew_ratio = 60 * 13 / 72 ≈ 10.83 — fires at the default 4x
  private def skewed =
    ((1L to 60L).map(i => (1L, i, 1.00 + i)) ++
      (2L to 13L).map(u => (u, 100L + u, 5.0)))
      .toDF("user_id", "event_id", "value")

  // ten users, two rows each: skew_ratio = 1.0 exactly
  private def uniform =
    (1L to 20L).map(i => (i % 10, i, 2.50)).toDF("user_id", "event_id", "value")

  private def branchOf(df: org.apache.spark.sql.DataFrame): String =
    if (df.queryExecution.analyzed.toString.contains("salt")) "salted"
    else "plain"

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

  test("skewed key at the default threshold routes to the salted branch") {
    val out = Relational.adaptiveUserTotals(skewed)
    assert(branchOf(out) == "salted", "10.8x skew must trigger salting")
    assert(rowsOf(out) == rowsOf(Relational.userTotals(skewed)),
      "salted branch == plain aggregation")
  }

  test("uniform key at the default threshold routes to the plain branch") {
    val out = Relational.adaptiveUserTotals(uniform)
    assert(branchOf(out) == "plain", "ratio 1.0 must NOT trigger salting")
    assert(rowsOf(out) == rowsOf(Relational.userTotals(uniform)))
  }

  test("each branch forced on the OTHER dataset still equals the plain plan") {
    // skewed data, threshold out of reach -> plain branch
    val plainForced = Relational.adaptiveUserTotals(skewed, saltAbove = 1e9)
    assert(branchOf(plainForced) == "plain")
    assert(rowsOf(plainForced) == rowsOf(Relational.userTotals(skewed)))
    // uniform data, threshold below 1.0 -> salted branch
    val saltForced = Relational.adaptiveUserTotals(uniform, saltAbove = 0.5)
    assert(branchOf(saltForced) == "salted")
    assert(rowsOf(saltForced) == rowsOf(Relational.userTotals(uniform)))
  }

  test("empty input: quiet plain branch, zero rows") {
    val out = Relational.adaptiveUserTotals(skewed.limit(0))
    assert(branchOf(out) == "plain" && out.count() == 0L)
  }

  // the session-window member of the playbook: same trigger, the
  // two-phase slice fold instead of key salting (a session window cannot
  // salt — the within-key merge is order-dependent)
  private def sessBranchOf(df: org.apache.spark.sql.DataFrame): String =
    if (df.queryExecution.analyzed.toString.contains("island")) "salted"
    else "plain"

  private def withTs(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ts",
      org.apache.spark.sql.functions.expr(
        "timestamp_micros(1704067200000000 + event_id * 1000000)"))

  private def sessRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq

  test("adaptive session fold: trigger routing, both branches bit-equal") {
    import graft.operators.Sessions
    import org.apache.spark.sql.functions.lit
    val sk = withTs(skewed)
    val un = withTs(uniform)
    val out = Sessions.adaptiveSessionAgg(sk, 30L)
    assert(sessBranchOf(out) == "salted", "10.8x skew must take the slice fold")
    assert(sessRows(out) == sessRows(Sessions.sessionAgg(sk, lit("30 seconds"))))
    val outU = Sessions.adaptiveSessionAgg(un, 30L)
    assert(sessBranchOf(outU) == "plain", "ratio 1.0 must take the plain fold")
    assert(sessRows(outU) == sessRows(Sessions.sessionAgg(un, lit("30 seconds"))))
    // force each branch on the OTHER dataset: results stay identical
    val forcedPlain = Sessions.adaptiveSessionAgg(sk, 30L, saltAbove = 1e9)
    assert(sessBranchOf(forcedPlain) == "plain" &&
      sessRows(forcedPlain) == sessRows(out))
    val forcedSalt = Sessions.adaptiveSessionAgg(un, 30L, saltAbove = 0.5)
    assert(sessBranchOf(forcedSalt) == "salted" &&
      sessRows(forcedSalt) == sessRows(outU))
  }
}
