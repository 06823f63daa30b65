package graft

/** Physical-plan regression guard over the ENTIRE driver query surface:
  * at 100 TB the difference between an equi-join and a nested-loop join
  * is the difference between a shuffle and a disaster, and plan shapes
  * regress silently (a dropped equi-key or a widened condition still
  * returns correct rows at test SF). Every `SparkEntry.queries` entry is
  * planned here and must avoid cartesian/nested-loop joins — except the
  * explicitly-annotated brute-force baselines, whose corpus ×
  * broadcast(20 queries) nested loop IS the intended exact-scoring shape.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Brute-force ANN scores every (query, corpus) pair by design; the
    * nested-loop side is the 20-row broadcast query set, not the corpus.
    */
  private val nestedLoopAllowed = Set("ann_topk_brute", "ann_recall_floor")

  test("no driver query plans a cartesian or nested-loop join (except brute baselines)") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!nestedLoopAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }

  test("filters reach the parquet scan in filtered relational queries") {
    val plan = SparkEntry.queries("q3_top_revenue")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"),
      "q3_top_revenue should push filters into the scan")
  }
}
