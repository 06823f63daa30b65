package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{NearDup, Relational}

/** Micro-fixture pins for the round-8 analytics batch: gap fill, Markov
  * transitions, cadence gaps, funnel latency, MAD outliers, containment
  * dedup, word entropy. Every expectation below is hand-derived in the
  * comment next to it — these are the boundary cases the uniform testdata
  * never exercises (the sf0.01 oracle covers the bulk behavior).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("gap fill: missing day × type cells appear as explicit zero rows") {
    // type a on day 1 and day 3, type b on day 2 only -> 2 types × 3 days
    // grid = 6 rows, of which 3 are synthesized zeros
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "a", 2.0),
      (2L, ts("2024-03-03 10:00:00"), 1L, "a", 3.5),
      (3L, ts("2024-03-02 10:00:00"), 1L, "b", 1.25))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.gapFillDaily(events).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 6)
    assert(out(("a", "2024-03-01")) == (1L, 2.0))
    assert(out(("a", "2024-03-02")) == (0L, 0.0), "hole -> explicit zero")
    assert(out(("a", "2024-03-03")) == (1L, 3.5))
    assert(out(("b", "2024-03-01")) == (0L, 0.0))
    assert(out(("b", "2024-03-02")) == (1L, 1.25))
    assert(out(("b", "2024-03-03")) == (0L, 0.0))
  }

  test("markov transitions: per-prev probabilities, lag ignores other users") {
    // user 1: a -> b -> a  (pairs: a->b, b->a)
    // user 2: a -> a       (pair: a->a); no cross-user a->... leakage
    val events = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 00:00:02"), 1L, "b", 0.0),
      (3L, ts("2024-01-01 00:00:03"), 1L, "a", 0.0),
      (4L, ts("2024-01-01 00:00:01"), 2L, "a", 0.0),
      (5L, ts("2024-01-01 00:00:02"), 2L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // prev=a total 2: a->b once (5000 bp), a->a once (5000 bp); b->a 10000 bp
    assert(out == Map(
      ("a", "b") -> (1L, 5000L),
      ("a", "a") -> (1L, 5000L),
      ("b", "a") -> (1L, 10000L)))
  }

  test("inter-event gaps: mean half-up, doubled median exact at even counts") {
    // user 1 events at 0s, 1s, 4s -> gaps 1_000_000 and 3_000_000 µs:
    // mean = 2_000_000 exactly, p50 interpolated = 2_000_000 -> ×2 = 4_000_000
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 00:00:01"), 1L, "a", 0.0),
      (3L, ts("2024-01-01 00:00:04"), 1L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Relational.interEventGaps(events).collect()
    assert(r.length == 1)
    assert(r(0) == Row(1L, 2L, 1000000L, 3000000L, 2000000L, 4000000L))
  }

  test("inter-event gaps: half-up mean rounding on an odd sum") {
    // gaps 1 µs and 2 µs -> mean 1.5 rounds half-UP to 2
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00.000000"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 00:00:00.000001"), 1L, "a", 0.0),
      (3L, ts("2024-01-01 00:00:00.000003"), 1L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Relational.interEventGaps(events).collect()(0)
    assert(r.getLong(4) == 2L, "mean 1.5 µs -> half-up 2")
    assert(r.getLong(5) == 3L, "median 1.5 µs doubled -> exact 3")
  }

  test("funnel time: purchase strictly before first view does not convert") {
    val events = Seq(
      // user 1: purchase BEFORE any view, then view, then purchase after
      (1L, ts("2024-01-01 00:00:00"), 1L, "purchase", 0.0),
      (2L, ts("2024-01-01 01:00:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-01 01:00:10"), 1L, "purchase", 0.0),
      // user 2: view only -> no row
      (4L, ts("2024-01-01 00:00:00"), 2L, "view", 0.0),
      // user 3: purchase only (no view) -> no row
      (5L, ts("2024-01-01 00:00:00"), 3L, "purchase", 0.0),
      // user 4: purchase exactly AT the first view instant -> converts at 0 s
      (6L, ts("2024-01-01 00:00:00"), 4L, "view", 0.0),
      (7L, ts("2024-01-01 00:00:00"), 4L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.funnelConversionTime(events).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 10L, 4L -> 0L),
      "user 1 converts 10 s after its first view (the earlier purchase is ignored)")
  }

  test("MAD outliers: integer-exact decision, boundary dev == k·MAD excluded") {
    // one type, cents {10, 20, 30, 40, 1000}: median = 30 -> med_x2 = 60.
    // dev_x2 = |2c - 60| = {40, 20, 0, 20, 1940}; median(dev_x2) = 20
    // -> mad_x4 = 40. Outlier iff dev_x2·2 > mad_x4·3 = 120, i.e.
    // dev_x2 > 60: only the 1940 row (value 10.00 has dev_x2 40 — kept in).
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.10),
      (2L, ts("2024-01-01 00:00:01"), 1L, "a", 0.20),
      (3L, ts("2024-01-01 00:00:02"), 1L, "a", 0.30),
      (4L, ts("2024-01-01 00:00:03"), 1L, "a", 0.40),
      (5L, ts("2024-01-01 00:00:04"), 1L, "a", 10.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.madOutliers(events).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L))
    val r = out(0)
    assert(r.getAs[Long]("med_x2") == 60L)
    assert(r.getAs[Long]("dev_x2") == 1940L)
    assert(r.getAs[Long]("mad_x4") == 40L)
  }

  test("MAD outliers: interpolated even-count median stays integer-exact") {
    // cents {10, 20}: quantile_cont median = 15 -> med_x2 = 30 (odd — the
    // case the ×2 carry exists for); dev_x2 = {10, 10}, mad_x4 = 20;
    // threshold dev_x2 > 30 -> no outliers at all
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.10),
      (2L, ts("2024-01-01 00:00:01"), 1L, "a", 0.20))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Relational.madOutliers(events).count() == 0)
  }

  test("containment: small doc inside big doc fires where jaccard cannot") {
    // doc 1 = 5-word run inside doc 2's 40-word text: containment of doc 1
    // is 3/3 shingles = 10000 bp; jaccard = 3/38 — far below any threshold
    val inner = "w1 w2 w3 w4 w5"
    val outerText = (1 to 5).map(i => s"w$i").mkString(" ") + " " +
      (6 to 40).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, inner), (2L, outerText)).toDF("doc_id", "text")
    val out = NearDup.containmentNearDups(docs).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L), "inner is the smaller set")
    assert(r.getAs[Long]("cont_bp") == 10000L)
    // sanity: the jaccard operator does NOT pair them (union 38, inter 3)
    assert(NearDup.jaccardNearDupsExact(docs).count() == 0)
  }

  test("containment dominates jaccard: every jac-half pair is a cont-half pair") {
    // cont = inter/n_inner ≥ inter/union = jac, so at EQUAL thresholds the
    // jaccard pair set must embed in the containment pair set (unordered)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val jac = graft.operators.NearDup.jaccardNearDupsExact(docs).collect()
      .map(r => Set(r.getLong(0), r.getLong(1))).toSet
    val cont = graft.operators.NearDup
      .containmentNearDups(docs, thresholdBp = 5000L).collect()
      .map(r => Set(r.getLong(0), r.getLong(1))).toSet
    assert(jac.nonEmpty, "fixture must exercise the dominance check")
    assert(jac.subsetOf(cont),
      s"jaccard pairs missing from containment: ${jac -- cont}")
  }

  test("containment: equal-size tie keeps the lower doc_id as inner") {
    val a = "a b c d e f"
    val docs = Seq((7L, a), (3L, a)).toDF("doc_id", "text")
    val out = NearDup.containmentNearDups(docs).collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == (3L, 7L))
  }

  test("edit distance: head and tail anchors each recall their variant class") {
    val base = "x" * 30 + "middle middle middle" + "y" * 30
    val docs = Seq(
      (1L, base),
      (2L, base.replace("middle middle middle", "middle edited middle")),
      // head differs (first 24 chars rewritten), tail intact -> tail
      // anchor must still pair it with doc 1
      (3L, "z" * 30 + "middle middle middle" + "y" * 30),
      // edits at BOTH ends: outside the anchor contract, no candidate
      (4L, "z" * 30 + "middle middle middle" + "w" * 30))
      .toDF("doc_id", "text")
    val out = NearDup.editDistanceNearDups(docs, maxRelPct = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.contains((1L, 2L)), "mid-doc edit: shared head anchor")
    assert(out((1L, 2L)) == 5L,
      "levenshtein('middle','edited') = 5 (alignment beats naive substitution)")
    assert(out.contains((1L, 3L)), "head rewritten: shared tail anchor")
    assert(out((1L, 3L)) == 30L)
    assert(!out.contains((1L, 4L)),
      "edits at both ends break both anchors: doc 4 never pairs with doc 1")
  }

  test("edit distance: relative threshold is inclusive at exactly 10%") {
    // 100-char docs, default 10% -> edit_dist <= 10. All middles share the
    // 30-char head/tail anchors, so every pair is a candidate; the filter
    // decides. (Docs shorter than the 24-char anchor can never candidate —
    // any edit rewrites the whole anchor.)
    def doc(mid: String) = "h" * 30 + mid + "t" * 30
    val docs = Seq(
      (1L, doc("m" * 40)),
      (2L, doc("x" + "m" * 39)),          // dist 1  -> kept
      (3L, doc("x" * 10 + "m" * 30)),     // dist 10 -> boundary, kept
      (4L, doc("x" * 11 + "m" * 29)))     // dist 11 -> dropped
      .toDF("doc_id", "text")
    val out = NearDup.editDistanceNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 1L)
    assert(out((1L, 3L)) == 10L, "exactly 10% of 100 chars is kept")
    assert(!out.contains((1L, 4L)), "11% is dropped")
  }

  test("salted join: shuffle-hash on (key, salt), equal to the plain join") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
    val salted = graft.operators.Relational.saltedEnrichJoin(events, customer)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "the hint must pin a shuffle join — a broadcast would make salting a no-op")
    assert(!plan.contains("BroadcastHashJoin [user_id"),
      "the dimension must not ride a broadcast on the join key")
    val plain = events.filter(col("user_id").isNotNull)
      .join(customer.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment")), "user_id")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_events"),
        (sum(expr("cast(round(value * 100, 0) as bigint)")) / 100.0)
          .as("sum_value"))
      .orderBy(col("segment"))
    assert(salted.collect().map(_.toSeq).toSeq ==
      plain.collect().map(_.toSeq).toSeq,
      "salting must be invisible in the result")
  }

  test("weekday profile: ISO numbering (2024-01-01 is Monday = 1)") {
    val events = Seq(
      (1L, ts("2024-01-01 13:00:00"), 1L, "a", 1.0),  // Monday 13h
      (2L, ts("2024-01-07 05:30:00"), 1L, "a", 2.0))  // Sunday 5h
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.weekdayHourProfile(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 13L) -> 1L, (7L, 5L) -> 1L))
  }

  test("monthly growth: truncating basis points, engine-matched on negatives") {
    val orders = Seq(
      (1L, ts("2024-01-10 00:00:00"), 3.00),
      (2L, ts("2024-02-10 00:00:00"), 1.00),   // -200/300 -> trunc -6666
      (3L, ts("2024-03-10 00:00:00"), 1.50))   // +50/100  -> 5000 exact
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Relational.monthlyOrderGrowth(orders).collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    assert(out(0).isEmpty, "first month has no previous")
    assert(out(1).contains(-6666L),
      "-6666.67 truncates toward zero in BOTH Spark div and DuckDB //")
    assert(out(2).contains(5000L))
  }

  test("vocab growth: new types counted once, at their first bucket") {
    val docs = Seq(
      (0L, "a b"), (1L, "a c"),   // bucket 0: 4 tokens, new types {a,b,c}
      (2L, "a d"),                // bucket 1: 2 tokens, new {d}
      (4L, "a b"))                // bucket 2: 2 tokens, nothing new
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, bucketSize = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 4L, 3L, 4L, 3L),
      (1L, 2L, 1L, 6L, 4L),
      (2L, 2L, 0L, 8L, 4L)),
      "cumulative type curve must flatten once the vocab is exhausted")
  }

  test("word entropy: uniform two-word doc = 1 bit, constant doc = 0 bits") {
    val docs = Seq(
      (1L, "a b a b"),          // p = {1/2, 1/2} -> H = 1.0
      (2L, "a a a a"),          // single type -> H = 0.0
      (3L, "a b c d"))          // uniform over 4 -> H = 2.0
      .toDF("doc_id", "text")
    val out = TextAnalysis.wordEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (4L, 2L, 1.0))
    assert(out(2L) == (4L, 1L, 0.0))
    assert(out(3L) == (4L, 4L, 2.0))
  }
}
