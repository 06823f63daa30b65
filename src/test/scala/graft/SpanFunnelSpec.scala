package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Relational}

/** Hand-computed contracts for the round-5 additions: sub-document span
  * dedup, unigram typicality, and the chained window funnel.
  */
class SpanFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("spanDedup keeps each span's first (doc_id, pos) occurrence corpus-wide") {
    val d = docs(
      0L -> "a b c d",  // chunks(2): "a b", "c d" — both first
      1L -> "a b x y",  // "a b" repeats doc0 → only "x y" survives
      2L -> "p q p q",  // within-doc repeat → first "p q" survives
      3L -> "a b c d")  // every span seen earlier → fully dropped
    val out = Dedup.spanDedup(d, spanTokens = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, "a b c d", 2L, 0L),
      (1L, "x y", 1L, 1L),
      (2L, "p q", 1L, 1L),
      (3L, "", 0L, 2L)))
  }

  test("spanDedup tail chunk is short, not padded; empty corpus is empty") {
    val out = Dedup.spanDedup(docs(0L -> "a b c"), spanTokens = 2).collect()
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a b c", 2L))) // chunks "a b" + "c"
    assert(Dedup.spanDedup(docs(), spanTokens = 2).count() == 0)
  }

  test("typicality is exact integer ppm math") {
    // corpus: 4 token occurrences; tf: x=2, y=1, z=1
    // ppm: x=500000, y=250000, z=250000 (floor of tf*1e6/4)
    val out = TextAnalysis.typicality(docs(0L -> "x x y", 1L -> "z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      // doc0: mean = round-half-up(1250000/3) = 416667, min 250000
      (0L, 3L, 416667L, 250000L, 0L),
      (1L, 1L, 250000L, 250000L, 0L)))
    assert(TextAnalysis.typicality(docs()).count() == 0)
  }

  test("topNgrams counts occurrences and doc frequency with text tie-breaks") {
    val d = docs(
      0L -> "a b c a b c", // grams: "a b c","b c a","c a b","a b c"
      1L -> "a b c x y z", // grams: "a b c","b c x","c x y","x y z"
      2L -> "q r")         // too short for a trigram
    val out = TextAnalysis.topNgrams(d, n = 3, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head == ("a b c", 3L, 2L, 1L))
    // singles tie at 1 occurrence; rank order falls back to gram text
    assert(out.toSeq.drop(1) == Seq(("b c a", 1L, 1L, 2L), ("b c x", 1L, 1L, 3L)))
  }

  test("incremental span dedup equals whole-corpus span dedup restricted to the batch") {
    val index = docs(
      0L -> "a b c d",   // owns "a b", "c d"
      1L -> "p q r s")   // owns "p q", "r s"
    val batch = docs(
      10L -> "a b x y",  // "a b" indexed → only "x y" kept
      11L -> "x y c d",  // "x y" lost in-batch to doc10; "c d" indexed → all dropped
      12L -> "n e w w")  // untouched
    val inc = Dedup.spanDedupIncremental(index, batch, spanTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val whole = Dedup.spanDedup(index.unionAll(batch), spanTokens = 2)
      .filter(col("doc_id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(inc.toSeq == whole.toSeq)
    assert(inc.toSeq == Seq(
      (10L, "x y", 1L, 1L), (11L, "", 0L, 2L), (12L, "n e w w", 2L, 0L)))
    // supplied-artifact path decides identically
    val art = Dedup.spanDedupIncremental(index, batch,
      Some(Dedup.spanChunkWinners(index, 2)), spanTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(art.toSeq == inc.toSeq)
    // interleaved ids violate the invariant loudly
    intercept[IllegalArgumentException] {
      Dedup.spanDedupIncremental(batch, index, spanTokens = 2).collect()
    }
  }

  test("portable SimHash: exact-duplicate pair at hamming 0, disjoint texts unpaired") {
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma delta epsilon zeta eta theta", // exact dup
      2L -> "one two three four five six seven eight")       // unrelated
    val out = graft.operators.NearDup.simhashNearDupsPortable(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L, 0L)))
  }

  test("windowFunnel chains greedily from each stage's earliest qualifying event") {
    def e(id: Long, t: String, u: Long, typ: String) =
      (id, ts(t), u, typ, 1.0, "{}")
    val events = Seq(
      // user 1: full chain inside the 30-min windows → step 3
      e(0, "2024-01-01 10:00:00", 1, "view"),
      e(1, "2024-01-01 10:10:00", 1, "click"),
      e(2, "2024-01-01 10:20:00", 1, "purchase"),
      // user 2: click before the view and one 40 min after → step 1
      e(3, "2024-01-01 09:55:00", 2, "click"),
      e(4, "2024-01-01 10:00:00", 2, "view"),
      e(5, "2024-01-01 10:40:00", 2, "click"),
      // user 3: view only → step 1
      e(6, "2024-01-01 10:00:00", 3, "view"),
      // user 4: no view → not in the funnel at all
      e(7, "2024-01-01 10:00:00", 4, "click"),
      e(8, "2024-01-01 10:01:00", 4, "purchase"),
      // user 5: view+click chain, purchase 40 min after the click → step 2
      e(9, "2024-01-01 10:00:00", 5, "view"),
      e(10, "2024-01-01 10:05:00", 5, "click"),
      e(11, "2024-01-01 10:45:00", 5, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.windowFunnel(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("windowFunnel anchors on the FIRST view even when a later view would chain") {
    // greedy contract: user's first view at 10:00 gets no click within 30
    // min; the 11:00 view would chain, but the anchor is the earliest view
    val events = Seq(
      (0L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (1L, ts("2024-01-01 11:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 11:05:00"), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.windowFunnel(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L)))
  }
}
