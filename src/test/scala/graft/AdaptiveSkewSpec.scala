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
}
