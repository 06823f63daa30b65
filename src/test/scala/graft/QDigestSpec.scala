package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** The deterministic q-digest quantile sketch: build/merge invariants,
  * exactness regimes, and the rank-error theorem the oracle gate rests on.
  */
class QDigestSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, "/root/testdata/sf0.001")

  private def ev(values: Seq[Double]) =
    values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("event_id", "value")

  private def nodes(state: org.apache.spark.sql.DataFrame) =
    state.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("driver-path compression equals the distributed spelling node-for-node") {
    // the adaptive dispatch routes fixture-sized material to the driver
    // loop; this pins the two spellings equal on real data (build) and on
    // mixed-level material (a merge), so the dispatch can never change
    // results — only job counts
    val leaves = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("value").isNotNull)
      .select((expr("cast(round(value * 100, 0) as bigint)")
        + 4611686018427387904L).as("prefix"))
      .groupBy(col("prefix")).agg(count(lit(1)).as("cnt"))
      .select(lit(0L).as("level"), col("prefix"), col("cnt"))
      .localCheckpoint()
    val n = leaves.agg(sum(col("cnt"))).head().getLong(0)
    val t = math.max(1L, (n + 255) / 256)
    val a = nodes(Sketches.qdCompressLocal(leaves, t)).toSet
    val b = nodes(Sketches.qdCompressDistributed(leaves, t)).toSet
    assert(a == b, s"driver and distributed compress diverge: ${a.diff(b)} / ${b.diff(a)}")
    // mixed-level material: merge the two halves' artifacts
    val mixed = Sketches.qdigestState(events.filter(col("event_id") % 2 === 0))
      .unionByName(Sketches.qdigestState(events.filter(col("event_id") % 2 === 1)))
      .localCheckpoint()
    val nm = mixed.agg(sum(col("cnt"))).head().getLong(0)
    val tm = math.max(1L, (nm + 255) / 256)
    val am = nodes(Sketches.qdCompressLocal(mixed, tm)).toSet
    val bm = nodes(Sketches.qdCompressDistributed(mixed, tm)).toSet
    assert(am == bm, "merge-shaped material diverges between the spellings")
  }

  test("no compression needed: artifact IS the exact value counts") {
    // 6 distinct cents, sigma 256 -> t = 1: every level-0 group reaches t
    val st = Sketches.qdigestState(ev(Seq(0.01, 0.02, 0.02, 0.03, 0.50, 9.99)))
    val got = nodes(st).toSet
    assert(got.map(_._1) == Set(0L), "everything frozen at level 0")
    assert(got.map(n => (n._2 - 4611686018427387904L, n._3)) ==
      Set((1L, 1L), (2L, 2L), (3L, 1L), (50L, 1L), (999L, 1L)))
  }

  test("mass conservation and internal-node invariant under forced compression") {
    // 2048 distinct cents, sigma 4 -> t = 512: level-0 blocks of 128 push up
    val vals = (1 to 2048).map(_ / 100.0)
    val st = Sketches.qdigestState(ev(vals), sigma = 4)
    val ns = nodes(st)
    assert(ns.map(_._3).sum == 2048L, "no mass lost or invented")
    assert(ns.length < 2048, "compression actually happened")
    val t = (2048 + 3) / 4
    ns.filter(_._1 > 0).foreach { case (l, p, c) =>
      assert(c < t, s"internal node (level $l, prefix $p) holds $c >= t=$t")
    }
  }

  test("a heavy exact value stays a level-0 node: its quantile is exact") {
    val vals = Seq.fill(1000)(5.00) ++ (1 to 50).map(i => 10.0 + i / 100.0)
    val st = Sketches.qdigestState(ev(vals), sigma = 4)
    assert(nodes(st).contains((0L, 500L + 4611686018427387904L, 1000L)),
      "the heavy value must survive as an exact leaf")
    val q50 = Sketches.qdigestQuantiles(st).filter(col("q") === 50L).head()
    assert(q50.getLong(2) == 500L, "median lands exactly on the heavy cents")
  }

  test("negative and zero values round-trip through the offset universe") {
    val vals = Seq(-3.00, -1.50, 0.0, 1.50, 3.00)
    val st = Sketches.qdigestState(ev(vals))
    val uppers = Sketches.qdigestQuantiles(st, Seq(1, 50, 99))
      .collect().map(_.getLong(2)).toSeq
    assert(uppers == Seq(-300L, 0L, 300L),
      s"exact small-n readout over a signed domain, got $uppers")
  }

  test("rank theorem gate holds on the fixture, one-shot and incremental") {
    Sketches.qdigestGate(events).collect().foreach { r =>
      assert(r.getBoolean(6), s"q=${r.getLong(0)}: lo_ok must be exact-true")
      assert(r.getBoolean(7), s"q=${r.getLong(0)}: hi_ok outside 16t")
    }
    Sketches.qdigestGateIncremental(events).collect().foreach { r =>
      assert(r.getBoolean(6) && r.getBoolean(7),
        s"merged artifact breaks the 32t rank bound at q=${r.getLong(0)}")
    }
  }

  test("merge invariants: mass preserved, internal nodes < 2t, gate still holds") {
    val a = ev((1 to 1500).map(_ / 100.0))
    val b = ev((1200 to 2400).map(_ / 100.0))
    val merged = Sketches.qdigestUpdate(Sketches.qdigestState(a, 8), b, 8)
    val ns = nodes(merged)
    assert(ns.map(_._3).sum == 1500L + 1201L)
    val t = (1500 + 1201 + 7) / 8
    ns.filter(_._1 > 0).foreach { case (l, p, c) =>
      assert(c < 2 * t, s"merged internal node (level $l) holds $c >= 2t=${2 * t}")
    }
  }

  test("empty input: empty artifact, empty gate — no null poison") {
    assert(Sketches.qdigestState(events.limit(0)).count() == 0L)
    assert(Sketches.qdigestGate(events.limit(0)).count() == 0L)
  }

  test("artifact size is sigma-bounded, not data-bounded") {
    // 20k distinct values, sigma 16: stored nodes must track sigma (x128
    // branching headroom), not the 20k distinct leaves
    val st = Sketches.qdigestState(ev((1 to 20000).map(_ / 100.0)), sigma = 16)
    val size = st.count()
    assert(size < 1000, s"artifact has $size nodes for sigma=16")
  }
}
