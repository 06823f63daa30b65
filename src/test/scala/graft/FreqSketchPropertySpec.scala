package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FreqSummary, MisraGries}

/** Property tests for the Misra–Gries summary as a PURE function (no
  * Spark): the oracle gate checks the theorems on one corpus and one
  * partitioning; these check them over seeded random streams, random
  * split points, and random merge trees — the partition shapes a real
  * cluster would produce. (Plain seeded-Random generation — the
  * scalatest/scalacheck bridge isn't on the offline classpath.)
  */
class FreqSketchPropertySpec extends AnyFunSuite {

  private def bounds(summary: Map[String, Long], stream: Seq[String],
                     k: Int, label: String): Unit = {
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    assert(summary.size <= k, s"$label: summary exceeded k")
    summary.foreach { case (t, c) =>
      assert(c >= 1L, s"$label: non-positive counter survived")
      assert(c <= exact.getOrElse(t, 0L), s"$label: overestimate for '$t'")
    }
    exact.foreach { case (t, cnt) =>
      val est = summary.getOrElse(t, 0L)
      assert((cnt - est) * (k + 1) <= n,
        s"$label: undercount of '$t' beyond N/(k+1): exact=$cnt est=$est n=$n")
    }
  }

  test("MG bounds hold over random streams, split points, and merge trees") {
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(8)
      val mg = new MisraGries(k)
      // zipf-ish stream: small ids frequent, long tail of rare tokens
      val stream = Seq.fill(200 + rnd.nextInt(300)) {
        val r = rnd.nextDouble()
        if (r < 0.5) s"t${rnd.nextInt(3)}"
        else if (r < 0.8) s"t${3 + rnd.nextInt(10)}"
        else s"t${13 + rnd.nextInt(200)}"
      }
      // sequential fold
      val whole = stream.foldLeft(mg.zero)(mg.reduce)
      bounds(whole.m, stream, k, s"seed=$seed sequential")
      // random partitioning into 1-6 chunks, merged left-to-right
      val nChunks = 1 + rnd.nextInt(6)
      val chunks = stream.grouped(math.max(1, stream.size / nChunks)).toSeq
      val partials = chunks.map(c => c.foldLeft(mg.zero)(mg.reduce))
      val merged = partials.reduce(mg.merge)
      bounds(merged.m, stream, k, s"seed=$seed merged($nChunks)")
      // skewed merge tree: fold the partials in reverse
      val mergedRev = partials.reverse.reduce(mg.merge)
      bounds(mergedRev.m, stream, k, s"seed=$seed merged-reverse")
      // merging with the empty summary is the identity
      assert(mg.merge(whole, mg.zero).m == whole.m)
      assert(mg.merge(mg.zero, whole).m == whole.m)
    }
  }

  test("MG captures every guaranteed-heavy token regardless of arrival order") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val k = 4
      val mg = new MisraGries(k)
      // one token at 40% of a 150-element stream: 60 > 150/5 = heavy
      val stream = rnd.shuffle(
        Seq.fill(60)("hot") ++ Seq.fill(90)(s"f${rnd.nextInt(80)}") ++
          Seq.empty[String])
      val summary = stream.foldLeft(mg.zero)(mg.reduce).m
      assert(summary.contains("hot"),
        s"seed=$seed: guaranteed-heavy token missing from $summary")
    }
  }
}
