package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A Misra–Gries frequent-items summary: at most `k` (token, counter)
  * pairs. Wrapped in a case class so the buffer/output ride the product
  * encoder (map field included) through partial aggregation.
  */
case class FreqSummary(m: Map[String, Long])

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * frequent-ITEMS member of the mergeable-summary family next to HLL
  * (cardinality, [[graft.operators.Sketches.vocabSketchState]]) and GK
  * (quantiles, `approx_percentile`). The buffer is ≤ `k` counters;
  * partial aggregation means each map task ships one ≤`k`-entry map per
  * group, never the token universe — the entire point at 100 TB, where
  * exact per-token counts are a full distinct shuffle.
  *
  * Deterministic GUARANTEES (what the oracle gate checks — the counter
  * values themselves legitimately vary with partitioning):
  *  - stored count ≤ true count (counters only ever shed), and
  *  - true count − stored count ≤ N/(k+1) for EVERY token, absent tokens
  *    included (est 0) — so any token with true count > N/(k+1) is
  *    guaranteed present.
  * The merge rule (sum counters, then subtract the (k+1)-th largest from
  * all, dropping ≤ 0) preserves both bounds under arbitrary merge trees —
  * Agarwal et al., "Mergeable Summaries" (PODS '12). The same rule in
  * DataFrame form is [[graft.operators.Sketches.heavyHitterUpdate]], so
  * stored artifacts fold batches without rescanning the corpus.
  */
class MisraGries(k: Int) extends Aggregator[String, FreqSummary, FreqSummary] {
  require(k >= 1, s"Misra-Gries needs k >= 1, got $k")

  override def zero: FreqSummary = FreqSummary(Map.empty)

  override def reduce(b: FreqSummary, tok: String): FreqSummary = {
    val m = b.m
    if (m.contains(tok)) FreqSummary(m.updated(tok, m(tok) + 1L))
    else if (m.size < k) FreqSummary(m.updated(tok, 1L))
    else // classic MG step: a full summary + unseen token decrements all
      FreqSummary(m.collect { case (t, c) if c > 1L => t -> (c - 1L) })
  }

  override def merge(a: FreqSummary, b: FreqSummary): FreqSummary = {
    val combined = b.m.foldLeft(a.m) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) FreqSummary(combined)
    else {
      // value-based pruning (ties at the threshold drop to 0 and leave),
      // so the result is independent of map iteration order
      val threshold = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      FreqSummary(combined.collect {
        case (t, c) if c > threshold => t -> (c - threshold)
      })
    }
  }

  override def finish(r: FreqSummary): FreqSummary = r
  override def bufferEncoder: Encoder[FreqSummary] = Encoders.product[FreqSummary]
  override def outputEncoder: Encoder[FreqSummary] = Encoders.product[FreqSummary]
}
