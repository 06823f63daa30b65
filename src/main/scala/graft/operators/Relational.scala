package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish star schema: scan +
  * pushdown aggregation, shuffle/broadcast joins, semi/anti joins, SQL
  * window functions, rollup. The reference itself has none of these
  * (SURVEY.md §2.5) — these are the extension surface a real analytics
  * engine needs, shaped for scale:
  *
  *  - dimensions (`customer` at bench SF, `nation`, `region`) are
  *    explicitly `broadcast()` so the fact-side scan never shuffles for
  *    them; at 100 TB the lineitem⋈orders join is the only repartitioning.
  *  - filters sit directly on the scans (Catalyst pushes them into parquet
  *    `PushedFilters`), aggregates are partial-then-final (map-side combine
  *    for free).
  *  - money arithmetic uses the integer-cents convention (see
  *    [[Sessions]]) so DuckDB-oracle hashes match bit-for-bit.
  */
object Relational {

  /** round(sum(c)*100) — an exact integer in every engine. */
  private def sumCents(c: Column): Column = round(sum(c) * 100, 0)

  /** TPC-H Q1-flavored pricing summary (scan → pushed filter → 6-group agg). */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 0).cast("long").as("sum_qty"),
        sumCents(col("l_extendedprice")).as("sum_base_cents"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100, 0)
          .as("sum_disc_cents"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        (col("sum_base_cents") / 100.0).as("sum_base_price"),
        (col("sum_disc_cents") / 100.0).as("sum_disc_price"),
        (floor(col("sum_base_cents") / col("count_order") + 0.5) / 100.0).as("avg_price"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-flavored top-revenue orders: broadcast the filtered customer
    * dimension, shuffle-join lineitem⋈orders, aggregate, top-10 on the
    * rounded revenue with a key tie-break (deterministic across engines).
    */
  def topRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    val c = customer.filter(col("c_mktsegment") === "BUILDING")
    val o = orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem.filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100, 0) / 100.0)
        .as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** Keyset-deterministic pagination: page `pageIdx` (0-based) of parts
    * by descending retail price. Global sort + offset is fine for result
    * presentation; at scale, pagination over big results should switch to
    * keyset continuation (WHERE (price, key) < last-seen) — offset N
    * still sorts/skips N rows on the driver path.
    */
  def partsPage(part: DataFrame, pageSize: Int, pageIdx: Int): DataFrame =
    part.select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(desc("p_retailprice"), col("p_partkey"))
      .offset(pageSize * pageIdx)
      .limit(pageSize)

  /** SQL window function (ranking): top-3 parts by retail price per brand. */
  def top3PartsPerBrand(part: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(desc("p_retailprice"), col("p_partkey"))
    part
      .select(col("p_brand"), col("p_partkey"), col("p_name"), col("p_retailprice"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("p_brand"), col("rnk"))
  }

  /** Hierarchical ROLLUP(region, nation) over broadcast dimensions; NULL
    * grouping slots are coalesced to 'ALL' so engine NULL-sort-order
    * differences can't bite.
    */
  def acctbalRollup(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        (sumCents(col("c_acctbal")) / 100.0).as("total_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"), col("total_acctbal"))
      .orderBy(col("region_name"), col("nation_name"))

  /** Anti join: customers with no recent orders (NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
      orders.filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
      col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Semi join: customers with at least one urgent order (EXISTS). */
  def urgentCustomers(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
      orders.filter(col("o_orderpriority") === "1-URGENT"),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** As-of (backward) join: each event picks the latest order of the same
    * user with `o_orderdate <= ts` — the canonical time-series enrichment
    * operator Spark has no builtin for.
    *
    * Implementation is composition, not a custom SparkPlan (preference (a)
    * of the custom-operator ladder): tag both inputs, union, and take
    * `last(..., ignoreNulls)` over a per-key time-ordered running window.
    * ONE shuffle on the key (vs the naive range-join + per-event top-1,
    * which explodes quadratically on hot keys); at 100 TB this is the
    * sort-merge shape an as-of wants, and AQE handles key skew.
    *
    * Determinism: orders are first reduced to one row per (key, date) via
    * `max_by(orderkey)`, and ties between an event and an order at the
    * same instant resolve to the order (inclusive `<=`), so the DuckDB
    * `ASOF LEFT JOIN` oracle matches exactly.
    */
  def asofLatestOrder(events: DataFrame, orders: DataFrame): DataFrame = {
    val o1 = orders.groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
      .agg(max(col("o_orderkey")).as("ord_key"),
        expr("max_by(o_totalprice, o_orderkey)").as("ord_total"))
      .withColumn("is_event", lit(0))
    val e1 = events.select(col("user_id").as("k"), col("ts").as("t"),
      col("event_id"), col("value")).withColumn("is_event", lit(1))
    val unioned = e1.unionByName(o1, allowMissingColumns = true)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_event")) // order sorts before same-instant event
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("asof_orderkey", last(col("ord_key"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last(col("ord_total"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("asof_orderkey"), col("asof_totalprice"))
      .orderBy(col("event_id"))
  }

  /** Sliding (hopping) window activity: 1-day windows every 6 hours —
    * each event contributes to 4 overlapping windows (Spark duplicates
    * rows per window; the 4× fan-out is the slide ratio, constant).
    */
  def slidingActivity(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 day", "6 hours"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(col("value")) * 100, 0) / 100.0).as("sum_value"))
      .select(col("window.start").as("w_start"), col("n_events"), col("sum_value"))
      .orderBy(col("w_start"))

  /** Exact percentiles of `value` per event type. Spark's `percentile`
    * and DuckDB's `quantile_cont` both use R-7 linear interpolation over
    * the sorted values; the interpolation runs on identical doubles, so
    * results agree bit-for-bit (no rounding needed — but outputs are
    * still cents-rounded for uniformity with the rest of the suite).
    */
  def valuePercentiles(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        (round(expr("percentile(value, 0.5)") * 100, 0) / 100.0).as("p50"),
        (round(expr("percentile(value, 0.9)") * 100, 0) / 100.0).as("p90"),
        (round(expr("percentile(value, 0.99)") * 100, 0) / 100.0).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Set operations (INTERSECT / EXCEPT / UNION ALL): classify heavy
    * purchasers vs heavy error-producers (>15 events of the type — the
    * threshold keeps all three segments non-empty on the fixtures). Each
    * set op is a builtin (hash-aggregated distinct + shuffle on the key).
    */
  def userSegments(events: DataFrame): DataFrame = {
    def ids(t: String) = events.filter(col("event_type") === t)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 15).select(col("user_id"))
    val p = ids("purchase")
    val e = ids("error")
    p.intersect(e).withColumn("segment", lit("both"))
      .unionAll(p.except(e).withColumn("segment", lit("purchase_only")))
      .unionAll(e.except(p).withColumn("segment", lit("error_only")))
      .orderBy(col("segment"), col("user_id"))
  }

  /** CUBE over (mktsegment, orderpriority) with NULL-safe labels. */
  def ordersCube(customer: DataFrame, orders: DataFrame): DataFrame =
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (round(sum(col("o_totalprice")) * 100, 0) / 100.0).as("total_price"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("mktsegment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("mktsegment"), col("orderpriority"))

  /** Status × priority count matrix via `pivot` — the wide-format OLAP
    * reshape. The pivot VALUES are declared (the fixed TPC-H priority
    * domain), which skips the distinct-discovery scan Spark otherwise
    * runs to find pivot columns and keeps the schema static; the plan is
    * then one hash aggregation (PivotFirst) over the same single shuffle
    * as a plain groupBy. Empty cells are filled to 0 so the wide counts
    * match a SQL `count(*) FILTER` replica exactly.
    */
  def pivotPriorityMatrix(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderstatus").as("orderstatus"),
        col("1-URGENT").as("p1_urgent"), col("2-HIGH").as("p2_high"),
        col("3-MEDIUM").as("p3_medium"),
        col("4-NOT SPECIFIED").as("p4_not_specified"),
        col("5-LOW").as("p5_low"))
      .orderBy(col("orderstatus"))

  /** Tumbling-window (calendar-day) activity rollup — the batch twin of a
    * streaming `window(ts, "1 day")` aggregation; Spark's epoch-aligned
    * 1-day windows coincide with `date_trunc('day')` in UTC.
    */
  def dailyActivity(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(col("value")) * 100, 0) / 100.0).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("day"), col("n_events"),
        col("sum_value"), col("n_users"))
      .orderBy(col("day"))

  /** Per-user cumulative running total (integer cents — order-independent
    * partial sums) and inter-event gap in microseconds — the lag/lead
    * window-function family over the event stream. One hash shuffle on
    * `user_id`, one in-partition sort shared by both window frames;
    * (ts, event_id) ordering makes every frame deterministic.
    */
  def userRunningTotals(events: DataFrame): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        (sum(expr("cast(round(value * 100, 0) as bigint)")).over(cum) / 100.0)
          .as("running_value"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(order)))
          .as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Per-user totals via EXPLICIT two-stage salting — the hot-key
    * mitigation pattern as a first-class operator: stage 1 aggregates on
    * (user_id, salt) so a mega-user's rows spread over `salts` reducers,
    * stage 2 combines the per-salt partials. Results are identical to the
    * plain groupBy (integer-cents partials are order-independent), which
    * the oracle asserts; the payoff is worst-case reducer input dropping
    * from |hottest key| to |hottest key| / salts at 100 TB. (For built-in
    * aggregates AQE's skew handling often suffices — the explicit form is
    * the template for aggregates AQE can't split.)
    */
  def saltedUserTotals(events: DataFrame, salts: Int = 16): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salts)))
      .groupBy(col("user_id"), col("salt"))
      .agg(sum(expr("cast(round(value * 100, 0) as bigint)")).as("c"),
        count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg((sum(col("c")) / 100.0).as("total_value"),
        sum(col("n")).as("n_events"))
      .orderBy(col("user_id"))

  /** Plain (unsalted) per-user totals — the single-shuffle aggregate
    * [[saltedUserTotals]] is result-identical to; also the branch
    * [[adaptiveUserTotals]] routes to when the key is uniform.
    */
  def userTotals(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg((sum(expr("cast(round(value * 100, 0) as bigint)")) / 100.0)
        .as("total_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** Adaptive skew playbook: MEASURE, then choose the plan. Runs
    * [[graft.operators.Sketches.skewProfile]] (two partial-aggregated
    * passes, a 1-row scalar back to the driver — the sanctioned bounded
    * collect) and routes to [[saltedUserTotals]] only when its
    * `needs_salting` trigger fires; uniform keys take the plain
    * single-shuffle [[userTotals]], because salting a uniform key just
    * doubles the shuffle for nothing. Both branches are result-identical
    * by construction (integer-cents partials are order-independent), so
    * ONE plain-SQL oracle covers whichever branch the data selects —
    * `AdaptiveSkewSpec` forces each branch explicitly via `saltAbove`.
    * This is the decision step the profile's Scaladoc prescribes,
    * packaged: at 100 TB the profile is cheap (O(distinct keys) second
    * pass) next to the aggregate it protects, and the choice is made
    * from measurement, not guesswork.
    */
  def adaptiveUserTotals(events: DataFrame, saltAbove: Double = 4.0,
                         salts: Int = 16): DataFrame = {
    val trigger = graft.operators.Sketches.skewProfile(events, saltAbove)
      .select(col("needs_salting")).head()
    val salted = !trigger.isNullAt(0) && trigger.getBoolean(0)
    if (salted) saltedUserTotals(events, salts) else userTotals(events)
  }

  /** Interval (range) join: each purchase event paired with same-user
    * error events within ±2 hours — the "errors around a purchase"
    * correlation query.
    *
    * Scalable shape: a naive `|t1 - t2| <= 2h` join condition plans as a
    * nested-loop join. Instead both sides are binned to 2-hour epoch
    * buckets — the error side explodes to (bin-1, bin, bin+1) — so the
    * match becomes an EQUI-join on (user, bin) followed by the exact
    * interval filter. Each qualifying pair matches in exactly one
    * exploded bin (the purchase's own), so no dedup is needed. Bin
    * fan-out is the interval/bin ratio (3×) — constant, not
    * data-dependent; AQE handles per-user skew.
    */
  def purchaseErrorPairs(events: DataFrame): DataFrame = {
    val BinMicros = 7200000000L // 2 hours
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        (unix_micros(col("ts")) / BinMicros).cast("long").as("bin"))
    val er = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("error_ts"),
        (unix_micros(col("ts")) / BinMicros).cast("long").as("ebin"))
      .withColumn("bin", explode(array(col("ebin") - 1, col("ebin"), col("ebin") + 1)))
    p.join(er, col("user_id") === col("e_user") && p("bin") === er("bin"))
      .filter(abs(unix_micros(col("purchase_ts")) - unix_micros(col("error_ts"))) <= BinMicros)
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("error_id"), col("error_ts"))
      .orderBy(col("purchase_id"), col("error_id"))
  }

  /** Window funnel (ClickHouse `windowFunnel` flavor): how far along the
    * `steps` sequence does each user get, with each step required to land
    * strictly after the previous step's first qualifying time and within
    * `stepWithinSec` of it? Output is the funnel histogram
    * `(funnel_step, n_users)` — the conversion report an event-analytics
    * engine serves directly. Semantics here are the deterministic greedy
    * chain (each stage anchors on the EARLIEST qualifying event), which
    * makes the result oracle-expressible as a join chain rather than a
    * per-user sequence scan.
    *
    * Scale shape: one filtered aggregation plus one equi-join per step,
    * every one of them hash-partitioned on `user_id` — the exchange is
    * reusable across stages (same key), so a 1000-executor run shuffles
    * the events table once per step filter and nothing else; per-stage
    * state is one timestamp per surviving user. No windows, no sequence
    * UDF, no per-user sort.
    */
  def windowFunnel(events: DataFrame,
                   steps: Seq[String] = Seq("view", "click", "purchase"),
                   stepWithinSec: Long = 1800): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    // stages(i): users whose first i+1 steps chain within the window
    val stages = steps.tail.zipWithIndex.scanLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = col(s"t${i + 1}")
        events.filter(col("event_type") === step)
          .join(prev, "user_id")
          .where(col("ts") > tPrev &&
            col("ts") <= tPrev + expr(s"INTERVAL $stepWithinSec SECONDS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"t${i + 2}"))
    }
    val joined = stages.tail.zipWithIndex.foldLeft(stages.head) {
      case (acc, (s, i)) =>
        acc.join(s.select(col("user_id"), col(s"t${i + 2}")),
          Seq("user_id"), "left")
    }
    val maxStep = (2 to steps.length).foldLeft(lit(1)) {
      case (acc, i) => when(col(s"t$i").isNotNull, lit(i)).otherwise(acc)
    }
    joined.select(maxStep.cast("long").as("funnel_step"))
      .groupBy(col("funnel_step")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("funnel_step"))
  }

  /** JSON scalar extraction (events.props) + per-type aggregate — the
    * `get_json_object` path stays codegen'd; no UDF.
    */
  def eventsJsonEnrich(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        (sumCents(col("value")) / 100.0).as("sum_value"))
      .orderBy(col("event_type"))

  /** Arbitrary GROUPING SETS (beyond the rollup/cube lattices): status
    * totals, priority totals, and the grand total in ONE pass — Spark
    * plans a single `Expand` + hash aggregation, not three scans. The
    * `gid` column (`grouping()` bits) disambiguates "genuinely null
    * grouping value" from "aggregated away", the standard grouping-sets
    * pitfall.
    */
  def orderGroupingSets(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (sumCents(col("o_totalprice")) / 100.0).as("total_price"),
        (grouping(col("o_orderstatus")) * 2 +
          grouping(col("o_orderpriority"))).cast("long").as("gid"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n_orders"), col("total_price"), col("gid"))
      .orderBy(col("gid"), col("orderstatus"), col("orderpriority"))

  /** Full outer join: event activity per user ⋈ the customer dimension —
    * rows survive from BOTH unmatched sides (active non-customers, and
    * customers with no events), the one outer-join shape the semi/anti/
    * left family doesn't cover. Equi-join on the key, so the full outer
    * is a plain shuffled hash/merge join (no nested loop).
    */
  def userCustomerCoverage(events: DataFrame, customer: DataFrame): DataFrame = {
    val activity = events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val cust = customer.select(col("c_custkey"),
      (round(col("c_acctbal") * 100, 0) / 100.0).as("acctbal"))
    activity.join(cust, activity("user_id") === cust("c_custkey"), "full_outer")
      .select(
        coalesce(col("user_id"), col("c_custkey")).as("key_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("user_id").isNotNull.as("has_events"),
        col("c_custkey").isNotNull.as("is_customer"),
        col("acctbal"))
      .orderBy(col("key_id"))
  }

  /** Distribution-rank analytics: decile bucket (`ntile`), `percent_rank`
    * and `cume_dist` of every event's value within its event type — the
    * remaining third of the window-function family (ranking / analytic /
    * aggregate frames are covered elsewhere). The (value, event_id)
    * ordering leaves no ties, so all three functions are deterministic
    * and engine-portable ((rank-1)/(n-1) is one exact-int double
    * division in both engines).
    *
    * Scale shape: one hash shuffle on `event_type` + one in-partition
    * sort shared by all three functions. A skewed type is the
    * single-key-window limit (like sessionization, an order-dependent
    * window can't split a key); the mitigation at 100 TB is bucketing by
    * a coarser key upstream, not a different operator.
    */
  def valueDistribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    events
      .filter(col("event_type").isNotNull && col("value").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"),
        ntile(10).over(w).cast("long").as("decile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("event_id"))
  }

  /** Time-RANGE window frame: per-user trailing-1-hour event count and
    * value sum at every event — the "rate over a sliding physical-time
    * horizon" analytic that ROWS frames can't express (a frame of k rows
    * spans wildly different wall-clock at varying event rates). Ordered
    * by epoch microseconds with `rangeBetween`, so ties (same-µs events)
    * all see the same frame — deterministic without an event_id
    * tie-break, which RANGE frames don't allow.
    *
    * Scale shape: one hash shuffle on `user_id` + one in-partition sort —
    * identical cost to [[userRunningTotals]]; the frame bound adds no
    * extra pass (Spark maintains a sliding frame over the sorted run).
    */
  def trailingHourStats(events: DataFrame): DataFrame = {
    val frame = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L + 1, Window.currentRow)
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(frame).as("n_trailing_1h"),
        (sum(expr("cast(round(value * 100, 0) as bigint)")).over(frame)
          / 100.0).as("sum_trailing_1h"))
      .orderBy(col("event_id"))
  }

  /** Unpivot (wide → long): the per-status priority-count matrix melted
    * back to (status, priority, n) rows — the inverse of
    * [[pivotPriorityMatrix]], closing the reshape family. Map-only over
    * the (tiny) pivoted frame; at scale unpivot over a fact table stays
    * map-only too (each input row fans out to k fixed rows, no shuffle).
    */
  def unpivotPriorityMatrix(orders: DataFrame): DataFrame =
    pivotPriorityMatrix(orders)
      .unpivot(
        Array(col("orderstatus")),
        Array(col("p1_urgent"), col("p2_high"), col("p3_medium"),
          col("p4_not_specified"), col("p5_low")),
        "priority_col", "n_orders")
      .orderBy(col("orderstatus"), col("priority_col"))

  /** Cohort retention matrix: users grouped by first-activity day, then
    * for every (cohort, day-offset) the count of cohort members active
    * that day — the standard product-analytics retention triangle. Day
    * offsets are exact integer epoch-microsecond arithmetic over
    * `date_trunc` boundaries (no calendar functions whose week/month
    * conventions differ across engines).
    *
    * Scale shape: activity dedup and cohort assignment are two hash
    * aggregations keyed on `user_id` (+day); the activity⋈cohort join is
    * an equi-join on `user_id`, both sides user-proportional — AQE
    * broadcasts the cohort side when the user dimension is small, and
    * the final (cohort, offset) rollup is bounded by days², not users.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val activity = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, "user_id")
      .select(col("cohort_day"),
        expr("(unix_micros(day) - unix_micros(cohort_day)) div 86400000000")
          .as("offset_days"),
        col("user_id"))
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  /** Explicit salted JOIN — the third leg of the skew playbook after the
    * profile ([[graft.operators.Sketches.skewProfile]]) and the salted
    * AGGREGATION ([[saltedUserTotals]]): when a shuffle join's stream
    * side has a mega-key and the build side is too large to broadcast,
    * salt the stream side (spreading the hot key over `salts` reducers)
    * and REPLICATE the build side once per salt, joining on (key, salt).
    * Results are identical to the plain join — the oracle asserts the
    * plain formulation — and worst-case reducer input drops from
    * |hottest key| to |hottest key| / salts. The build side is pinned to
    * a shuffle-hash join: letting AQE broadcast the test-scale dimension
    * would silently turn the template into a no-op (broadcast joins
    * don't shuffle and cannot skew). AQE's own skew-join handles the
    * sort-merge cases; this explicit form is the fallback it can't
    * reach (e.g. a skewed stream side under a join followed by a
    * same-key aggregation, where AQE declines to split).
    */
  def saltedEnrichJoin(events: DataFrame, customer: DataFrame,
                       salts: Int = 8): DataFrame = {
    val fact = events
      .filter(col("user_id").isNotNull)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salts)).cast("int"))
    val dim = customer
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
      .hint("shuffle_hash")
    fact.join(dim, Seq("user_id", "salt"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_events"),
        (sum(expr("cast(round(value * 100, 0) as bigint)")) / 100.0)
          .as("sum_value"))
      .orderBy(col("segment"))
  }

  /** Time-series densification (gap fill): the per-type daily rollup
    * joined onto the COMPLETE day × type grid, so days with no events
    * appear as explicit zero rows — the shape every charting/forecast
    * consumer wants and plain `groupBy` can't produce.
    *
    * Scale shape: the fact side collapses to (type × day) rows before any
    * join, and the generated grid is dimension-sized (|types| · |days|),
    * so the outer join is a broadcast of the rollup under AQE — the only
    * full-corpus work is the one aggregating shuffle.
    */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val base = events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("value"))
    val daily = base.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
    val days = base
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val types = base.select(col("event_type")).distinct()
    types.crossJoin(days)
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        (coalesce(col("cents"), lit(0L)) / 100.0).as("sum_value"))
      .orderBy(col("event_type"), col("day"))
  }

  /** First-order Markov transition matrix over each user's event-type
    * sequence: count and empirical probability (basis points, half-up —
    * integer-exact for the oracle) of `prev_type → next_type` steps.
    * One hash shuffle on `user_id` for the lag, then a dimension-sized
    * (|types|²) aggregation; (ts, event_id) ordering pins ties.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        col("event_type").as("next_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("(n * 20000 + row_total) div (2 * row_total)").as("prob_bp"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Per-user inter-event cadence profile: count, min/max/mean/median of
    * the microsecond gaps between consecutive events. Mean is half-up
    * integer division; the exact interpolated median is carried doubled
    * (`p50_gap_us_x2`) so the only possible fraction (.5 at even counts)
    * stays integer-exact for the oracle hash. Same single `user_id`
    * shuffle + in-partition sort as [[userRunningTotals]].
    */
  def interEventGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull)
      .select(col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        expr("(sum(gap_us) * 2 + count(1)) div (2 * count(1))")
          .as("mean_gap_us"),
        expr("cast(percentile(gap_us, 0.5d) * 2 as bigint)")
          .as("p50_gap_us_x2"))
      .orderBy(col("user_id"))
  }

  /** Funnel time-to-convert: for every user whose first `firstStep` is
    * eventually followed by a `lastStep`, the timestamps of both and the
    * whole-second conversion latency (floor — integer-exact). The first
    * touch is attached per-user with an unbounded window aggregate (no
    * self-join), then the conversion is a plain min over the filtered
    * later events — one `user_id` shuffle end-to-end.
    */
  def funnelConversionTime(events: DataFrame,
                           firstStep: String = "view",
                           lastStep: String = "purchase"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .withColumn("first_touch",
        min(when(col("event_type") === firstStep, col("ts"))).over(w))
      .filter(col("event_type") === lastStep &&
        col("first_touch").isNotNull && col("ts") >= col("first_touch"))
      .groupBy(col("user_id"), col("first_touch"))
      .agg(min(col("ts")).as("converted_at"))
      .select(col("user_id"), col("first_touch"), col("converted_at"),
        expr("(unix_micros(converted_at) - unix_micros(first_touch)) div 1000000")
          .as("secs_to_convert"))
      .orderBy(col("user_id"))
  }

  /** Weekday × hour seasonality profile: the load heatmap capacity
    * planning reads. One partial-aggregated scan to a 7×24-bounded
    * output; ISO weekday (1 = Monday) keeps the day numbering
    * engine-portable (Spark's `dayofweek` counts from Sunday, DuckDB's
    * `dayofweek` from 0 — `weekday + 1 ≡ isodow` sidesteps both).
    */
  def weekdayHourProfile(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull)
      .groupBy((weekday(col("ts")) + 1).cast("long").as("iso_dow"),
        hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        (sum(expr("cast(round(value * 100, 0) as bigint)")) / 100.0)
          .as("sum_value"))
      .orderBy(col("iso_dow"), col("hour"))

  /** Month-over-month order growth: monthly totals with the
    * previous-month delta in basis points — the lag-over-aggregate BI
    * pattern. Growth goes negative, so the integral division semantics
    * matter: Spark's `div` and DuckDB's `//` BOTH truncate toward zero
    * on integers (verified, not assumed — `-7 // 2 = -3` in DuckDB), so
    * the plain operator is engine-portable as-is. The month rollup is
    * one shuffle; the lag window ranges over the month dimension only.
    */
  def monthlyOrderGrowth(orders: DataFrame): DataFrame = {
    val w = Window.orderBy(col("month"))
    orders
      .filter(col("o_orderdate").isNotNull)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100, 0) as bigint)")).as("cents"))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .select(col("month"), col("n_orders"),
        (col("cents") / 100.0).as("total_price"),
        when(col("prev_cents").isNotNull && col("prev_cents") > 0,
          expr("((cents - prev_cents) * 10000) div prev_cents"))
          .as("growth_bp"))
      .orderBy(col("month"))
  }

  /** Robust outlier detection: events whose value deviates from the
    * per-type median by more than `k` × MAD (median absolute deviation).
    * The entire decision is integer-exact — values as cents, medians
    * carried ×2 and deviations ×4 so the interpolated .5 midpoints never
    * touch floating point — making the flagged set deterministic across
    * engines (a z-score twin would flip rows on 1-ulp noise at the
    * threshold).
    *
    * Scale shape: the medians are per-TYPE (dimension-sized), computed by
    * two tiny aggregations that AQE broadcasts back; the fact side is
    * scanned twice but never buffered per group. The exact `percentile`
    * is the correctness anchor — the at-scale twin swaps in
    * `approx_percentile` (see [[graft.operators.Sketches]]) without
    * changing the join shape.
    */
  def madOutliers(events: DataFrame, k: Int = 3): DataFrame = {
    val base = events
      .filter(col("event_id").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
    val med = base.groupBy(col("event_type"))
      .agg(expr("cast(percentile(cents, 0.5d) * 2 as bigint)").as("med_x2"))
    val dev = base.join(broadcast(med), "event_type")
      .withColumn("dev_x2", abs(col("cents") * 2 - col("med_x2")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("cast(percentile(dev_x2, 0.5d) * 2 as bigint)").as("mad_x4"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("dev_x2") * 2 > col("mad_x4") * k)
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("cents") / 100.0).as("value"), col("med_x2"), col("dev_x2"),
        col("mad_x4"))
      .orderBy(col("event_id"))
  }
}
