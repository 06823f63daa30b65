package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Property tests for the round-9 sketches over seeded random inputs —
  * the oracle gate checks one fixture; these sweep distributions the
  * fixture can't reach (heavy-tailed, negative-domain, duplicate-heavy)
  * and random split points for the merge laws. (Plain seeded-Random
  * generation — the scalacheck bridge isn't on the offline classpath.)
  */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  private def events(seed: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val n = 400 + rnd.nextInt(600)
    Seq.tabulate(n) { i =>
      val v = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 100.0 // uniform
        case 1 => 1.0 / (rnd.nextDouble() + 1e-3) // heavy tail
        case 2 => (rnd.nextDouble() - 0.5) * 2000.0 // signed
        case _ => Seq(0.0, 1.0, 1.0, 99.99)(rnd.nextInt(4)) // dup-heavy
      }
      (i.toLong, math.round(v * 100.0) / 100.0)
    }.toDF("event_id", "value")
  }

  test("q-digest laws hold over seeded random distributions") {
    for (seed <- 1 to 5; sigma <- Seq(16, 128)) {
      val df = events(seed)
      val n = df.count()
      val st = Sketches.qdigestState(df, sigma)
      val ns = st.collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(ns.map(_._2).sum == n, s"seed $seed sigma $sigma: mass lost")
      val t = math.max(1L, (n + sigma - 1) / sigma)
      ns.filter(_._1 > 0).foreach { case (l, c) =>
        assert(c < t, s"seed $seed sigma $sigma: level-$l node holds $c >= $t")
      }
      Sketches.qdigestGate(df, sigma).collect().foreach { r =>
        assert(r.getBoolean(6) && r.getBoolean(7),
          s"seed $seed sigma $sigma q=${r.getLong(0)}: rank theorem broken " +
            s"(est=${r.getLong(3)} le=${r.getLong(4)} lt=${r.getLong(5)})")
      }
      Sketches.qdigestGateIncremental(df, sigma).collect().foreach { r =>
        assert(r.getBoolean(6) && r.getBoolean(7),
          s"seed $seed sigma $sigma merged q=${r.getLong(0)}: 2t bound broken")
      }
    }
  }

  test("q-digest merge conserves mass and the 2t invariant at random splits") {
    for (seed <- 6 to 9) {
      val rnd = new scala.util.Random(seed)
      val df = events(seed)
      val cut = rnd.nextInt(300) + 50
      val sigma = 32
      val merged = Sketches.qdigestUpdate(
        Sketches.qdigestState(df.filter(col("event_id") < cut), sigma),
        df.filter(col("event_id") >= cut), sigma)
      val ns = merged.collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(ns.map(_._2).sum == df.count(), s"seed $seed: merge lost mass")
      val t = math.max(1L, (df.count() + sigma - 1) / sigma)
      ns.filter(_._1 > 0).foreach { case (l, c) =>
        assert(c < 2 * t, s"seed $seed: merged level-$l node holds $c >= 2t")
      }
    }
  }

  test("count-min laws hold over seeded random corpora and random splits") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val docs = Seq.tabulate(120 + rnd.nextInt(80)) { i =>
        // zipf-ish vocabulary: token t0..t2 frequent, long random tail
        val toks = Seq.fill(5 + rnd.nextInt(20)) {
          if (rnd.nextDouble() < 0.5) s"t${rnd.nextInt(3)}"
          else s"w${rnd.nextInt(500)}"
        }
        (i.toLong, toks.mkString(" "))
      }.toDF("doc_id", "text")
      Sketches.cmsketchGate(docs).collect().foreach { r =>
        assert(r.getBoolean(3),
          s"seed $seed: CM underestimated '${r.getString(0)}'")
      }
      val cut = rnd.nextInt(100) + 10
      val inc = Sketches.cmsketchUpdate(
        Sketches.cmsketchState(docs.filter(col("doc_id") < cut)),
        docs.filter(col("doc_id") >= cut)).collect().map(_.toSeq).toSet
      val one = Sketches.cmsketchState(docs).collect().map(_.toSeq).toSet
      assert(inc == one, s"seed $seed: CM merge not bit-exact at cut $cut")
    }
  }
}
