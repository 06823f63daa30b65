package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Micro-fixture pins for the composed join operators (boundaries that
  * the uniform testdata may never hit) + the SQL-text surface.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: inclusive boundary, backward-only, null before first order") {
    val events = Seq(
      (1L, ts("2024-01-05 00:00:00"), 10L, 1.0),  // after order  -> match
      (2L, ts("2024-01-01 00:00:00"), 10L, 1.0),  // exactly AT order ts -> match
      (3L, ts("2023-12-31 23:59:59"), 10L, 1.0))  // before any order -> null
      .toDF("event_id", "ts", "user_id", "value")
    val orders = Seq((10L, ts("2024-01-01 00:00:00"), 100L, 50.0))
      .toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val out = Relational.asofLatestOrder(events, orders)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(1L).contains(100L))
    assert(out(2L).contains(100L), "event at exactly the order instant matches (inclusive)")
    assert(out(3L).isEmpty, "no order before the event -> null (left as-of)")
  }

  test("range join: exactly-at-boundary pairs are included, beyond excluded") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "purchase", 1.0),
      (2L, ts("2024-01-01 12:00:00"), 5L, "error", 1.0),    // exactly +2h
      (3L, ts("2024-01-01 12:00:00.000001"), 5L, "error", 1.0), // 1µs beyond
      (4L, ts("2024-01-01 08:00:00"), 5L, "error", 1.0))    // exactly -2h
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.purchaseErrorPairs(events)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("error_id"))).toSet
    assert(out == Set((1L, 2L), (1L, 4L)),
      "±2h inclusive; 1µs past the boundary excluded")
  }

  test("retention cohorts: offset-0 row equals cohort size, offsets non-negative") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val m = graft.operators.Relational.retentionCohorts(events).collect()
      .map(r => ((r.getTimestamp(0), r.getLong(1)), r.getLong(2))).toMap
    assert(m.nonEmpty)
    assert(m.keys.forall(_._2 >= 0), "day offsets must be non-negative")
    // offset 0 of each cohort counts exactly the users whose first
    // activity day IS the cohort day
    val cohortSizes = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      .groupBy(col("cohort_day")).count().collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    cohortSizes.foreach { case (day, size) =>
      assert(m.get((day, 0L)).contains(size),
        s"cohort $day: offset-0 count ${m.get((day, 0L))} != size $size")
    }
    // retention never exceeds the cohort's size at any offset
    m.foreach { case ((day, off), n) =>
      assert(n <= cohortSizes(day), s"cohort $day offset $off overcounts")
    }
  }

  test("grouping sets: one Expand pass, gid bits disambiguate totals") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val df = graft.operators.Relational.orderGroupingSets(orders)
    // single Expand + aggregation, not a union of three scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"expected Expand in plan:\n$plan")
    assert("FileScan".r.findAllIn(plan).length == 1,
      "grouping sets must read the table once")
    val rows = df.collect()
    val byGid = rows.groupBy(_.getLong(4))
    assert(byGid.keySet == Set(1L, 2L, 3L), "status=1, priority=2, grand=3")
    val total = orders.count()
    assert(byGid(3L).map(_.getLong(2)).sum == total)
    assert(byGid(1L).map(_.getLong(2)).sum == total, "status rows partition")
    assert(byGid(2L).map(_.getLong(2)).sum == total, "priority rows partition")
  }

  test("full outer coverage keeps both unmatched sides") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
    val rows = graft.operators.Relational
      .userCustomerCoverage(events, customer).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    val activeUsers = events.filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val custKeys = customer.select(col("c_custkey")).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == activeUsers ++ custKeys, "key union")
    // flags must mirror set membership exactly — including the unmatched
    // sides (event-less customers always exist at this SF; active
    // non-customers exist only if the fixture id ranges diverge)
    rows.foreach { case (k, n, hasEv, isCust) =>
      assert(hasEv == activeUsers.contains(k), s"has_events flag for $k")
      assert(isCust == custKeys.contains(k), s"is_customer flag for $k")
      assert((n > 0) == hasEv, s"n_events consistency for $k")
    }
    assert(rows.exists(r => !r._3 && r._4), "event-less customer survives")
    // synthetic check for the other unmatched side, independent of fixture
    // id ranges: one active user that is definitely not a customer
    import spark.implicits._
    val ev1 = Seq((1L, new java.sql.Timestamp(0L), 999999L))
      .toDF("event_id", "ts", "user_id")
    val c1 = Seq((1L, 10.0)).toDF("c_custkey", "c_acctbal")
    val syn = graft.operators.Relational.userCustomerCoverage(ev1, c1)
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3)))
    assert(syn.toSet == Set((1L, false, true), (999999L, true, false)))
  }

  test("trailing-hour RANGE frame: exact horizon, ties share a frame") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: events at 0s, 1800s, 3600s, 3601s — the 3600s event still
    // sees 1s-after-epoch? frame is (ts-1h, ts]: at 3600s the 0s event is
    // EXACTLY 1h old -> excluded by the +1µs lower bound
    val ev = Seq(
      (1L, ts(0), 1L, 10.0), (2L, ts(1800), 1L, 20.0),
      (3L, ts(3600), 1L, 30.0), (4L, ts(3601), 1L, 40.0),
      // user 2: two events at the SAME microsecond -> same frame
      (5L, ts(100), 2L, 1.0), (6L, ts(100), 2L, 2.0))
      .toDF("event_id", "ts", "user_id", "value")
    val rows = graft.operators.Relational.trailingHourStats(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(rows(1L) == ((1L, 10.0)))
    assert(rows(2L) == ((2L, 30.0)))
    assert(rows(3L) == ((2L, 50.0)), "exactly-1h-old event must drop out")
    assert(rows(4L) == ((3L, 90.0)), "1800/3600/3601 within the hour")
    assert(rows(5L) == ((2L, 3.0)) && rows(6L) == ((2L, 3.0)),
      "same-microsecond ties share one frame")
  }

  test("unpivot is the exact long form of the pivot matrix") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val wide = graft.operators.Relational.pivotPriorityMatrix(orders)
      .collect().flatMap { r =>
        Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
          .zipWithIndex.map { case (c, i) => (r.getString(0), c) -> r.getLong(i + 1) }
      }.toMap
    val long = graft.operators.Relational.unpivotPriorityMatrix(orders)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(long == wide, "melt(pivot) must reproduce every cell")
  }

  test("value distribution: balanced deciles, rank endpoints, cume bounds") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = graft.operators.Relational.valueDistribution(events).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, grp) =>
      val sizes = grp.groupBy(_._2).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$tpe deciles unbalanced: $sizes")
      val pr = grp.map(_._3)
      assert(pr.min == 0.0 && pr.max == 1.0, s"$tpe percent_rank endpoints")
      assert(grp.map(_._4).forall(c => c > 0.0 && c <= 1.0), s"$tpe cume bounds")
    }
  }

  test("registerAll exposes the suite to SQL text") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) AS n FROM events e
        |JOIN orders o ON e.user_id = o.o_custkey""".stripMargin)
      .collect().head.getLong(0)
    assert(n > 0)
    // events view carries the converted timestamp type
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}
