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
