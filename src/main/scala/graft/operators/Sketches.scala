package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregates (north-star extension): the mergeable, constant-size
  * summaries that replace exact aggregation at 100 TB — HyperLogLog++
  * cardinality (`approx_count_distinct`) and quantile sketches
  * (`approx_percentile`). Both are builtin, partial-aggregating, and
  * shuffle O(sketch) bytes per group instead of O(distinct values) —
  * the entire point at scale, where exact `count(DISTINCT ...)` is a
  * full re-shuffle of the key universe.
  *
  * Correctness gate: sketches are approximate by design, so (like the ANN
  * recall floor) the oracle-checkable query emits exact values alongside
  * BOUND CHECKS — deterministic booleans with wide margin over the
  * measured error (HLL rsd 1% config measures ≤0.67% on this data,
  * gated at 3%; approx-median measures ≤0.25 absolute, gated at 1.0).
  */
object Sketches {

  def sketchAccuracy(events: DataFrame): DataFrame = {
    val typed = events.filter(col("event_type").isNotNull)
    // exact distinct SEPARATE from the sketch aggregates: mixing
    // count_distinct with object-buffer aggregates (Percentile) makes the
    // planner rewrite through Expand (rows ×2) into one sort-based
    // ObjectHashAggregate — 6× the cost of these two small aggregations
    // joined on the (tiny) group key
    val exact = typed.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users_exact"))
    val sketches = typed.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("hll"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50a"),
        expr("percentile(value, 0.5)").as("p50e"))
    exact.join(sketches, "event_type")
      .select(col("event_type"), col("n_users_exact"),
        (abs(col("hll") - col("n_users_exact")) * 100
          <= col("n_users_exact") * 3).as("hll_within_3pct"),
        (abs(col("p50a") - col("p50e")) <= 1.0).as("p50_within_1"))
      .orderBy(col("event_type"))
  }
}
