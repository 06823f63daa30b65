package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Deduplication operators over `documents` (north-star extension; the
  * reference's only dedup is the keyed keep-first alert set,
  * `flink_stream_task2.py:72,85-90`, covered by [[Sessions.bigCustomers]]).
  *
  * Scale shapes:
  *  - exact / fingerprint dedup = one hash aggregation on the dedup key —
  *    a single shuffle with map-side partial aggregation; at 100 TB prefer
  *    the md5 fingerprint key (fixed 32 bytes) over shuffling full texts.
  *  - near-dup (MinHash/SimHash/Jaccard) lives beside this in
  *    [[NearDup]] — candidate generation via banding joins, never O(n²).
  */
object Dedup {

  /** Exact dedup by full text: canonical (min) doc id + multiplicity per
    * distinct text. Shuffles only the md5 key + id, not the text bytes.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .select(md5(col("text")).as("text_key"), col("doc_id"))
      .groupBy(col("text_key"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))

  /** Normalized-fingerprint dedup (whitespace/case-insensitive). */
  def fingerprintDedup(documents: DataFrame): DataFrame =
    documents
      .select(TextAnalysis.fingerprintCol.as("fingerprint"), col("doc_id"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))

  /** Incremental exact admission — the daily-run twin of
    * [[NearDup.incrementalNearDups]] for the exact-key family: admit a new
    * batch against a persisted canonical key table WITHOUT re-aggregating
    * the whole corpus.
    *
    * Contract (oracle-checked as `dedup_incremental_exact`): incremental
    * admission ≡ whole-corpus exact dedup of index ∪ batch restricted to
    * batch ids, under the same append-only monotone-ids invariant as the
    * near-dup operator (guarded loudly). A batch doc's canonical is the
    * index canonical when its key is already indexed, else the minimum
    * batch id sharing the key; `admitted` = the doc IS that canonical.
    *
    * Scale shape: one hash aggregation over the batch (map-side combined)
    * plus an equi-join against the key table on the fixed 32-byte md5 key —
    * O(batch) work given the persisted table (`indexKeys`); the rebuild
    * default aggregates the index once, same as the near-dup twin.
    *
    * @param indexKeys yesterday's persisted key table
    *   `(text_key, canonical_id)`; rebuilt from `indexDocs` when absent.
    */
  def incrementalExact(indexDocs: DataFrame, batchDocs: DataFrame,
                       indexKeys: Option[DataFrame] = None): DataFrame = {
    // supplied-table path: bound the guard by the stored canonical ids
    // (the minima being protected) so the index corpus is never scanned
    NearDup.requireMonotoneIds(
      indexKeys.map(_.select(col("canonical_id")))
        .getOrElse(indexDocs.select(col("doc_id"))),
      batchDocs, "incrementalExact")
    val idx = indexKeys.getOrElse(
        indexDocs.select(md5(col("text")).as("text_key"), col("doc_id"))
          .groupBy(col("text_key")).agg(min(col("doc_id")).as("canonical_id")))
      .select(col("text_key"), col("canonical_id").as("idx_canonical"))
    val bk = batchDocs.select(col("doc_id"), md5(col("text")).as("text_key"))
    val batchCanon = bk.groupBy(col("text_key"))
      .agg(min(col("doc_id")).as("batch_min"))
    bk.join(batchCanon, "text_key")
      .join(idx, Seq("text_key"), "left")
      .select(col("doc_id"),
        coalesce(col("idx_canonical"), col("batch_min")).as("canonical_id"),
        (coalesce(col("idx_canonical"), col("batch_min")) === col("doc_id"))
          .as("admitted"))
      .orderBy(col("doc_id"))
  }

  /** Sub-document exact dedup — remove duplicate token SPANS across the
    * corpus, keeping each span's first occurrence (suffix-array dedup à la
    * Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    * Better", approximated with fixed non-overlapping `spanTokens`-token
    * chunks — the practical Spark form: boilerplate that repeats across
    * documents is dropped from every doc but the earliest).
    *
    * Semantics (oracle-checked as `dedup_spans`): chunk each doc's
    * whitespace tokens into consecutive groups of `spanTokens`; a chunk
    * occurrence survives iff it is the lexicographically-first
    * `(doc_id, pos)` occurrence of that exact chunk text corpus-wide;
    * `clean_text` is the surviving chunks rejoined in position order
    * (empty string when every span was seen earlier).
    *
    * Scale shape — aggregation-only, no self-join: the winner per distinct
    * chunk is `min(struct(doc_id, pos))`, a partial-aggregable hash
    * aggregate, so a boilerplate chunk with a billion occurrences
    * collapses map-side instead of flooding one reducer (the skew that
    * kills the naive `row_number() over (partition by chunk)` spelling).
    * Survivors ARE the winner rows — no join back to occurrences is ever
    * needed; reassembly is one `groupBy(doc_id)` over ≤ n_chunks surviving
    * rows plus an equi-join to the per-doc chunk counts (computed
    * row-locally on the base table). Shuffled bytes are bounded by the
    * chunk text (≤ `spanTokens` tokens), never the document.
    */
  def spanDedup(documents: DataFrame, spanTokens: Int = 10): DataFrame = {
    val base = chunkBase(documents, spanTokens)
    finishSpanDedup(base, winnersOf(chunkOccurrences(base, spanTokens)))
  }

  /** `(doc_id, w, n_chunks)` — tokens + chunk count, row-local. */
  private def chunkBase(documents: DataFrame, n: Int): DataFrame =
    documents.select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n_chunks",
        expr(s"cast((size(w) + ${n - 1}) div $n as bigint)"))

  /** One row per chunk occurrence `(doc_id, pos, chunk)` — map-only. */
  private def chunkOccurrences(base: DataFrame, n: Int): DataFrame =
    base.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, int(n_chunks) - 1), " +
          s"i -> array_join(slice(w, i * $n + 1, $n), ' '))"))
        .as(Seq("pos", "chunk")))

  /** First `(doc_id, pos)` occurrence per distinct chunk — the
    * skew-collapsing aggregate of the whole-corpus path, and the persisted
    * ARTIFACT of the incremental path (yesterday's winner table).
    */
  def spanChunkWinners(documents: DataFrame, spanTokens: Int = 10): DataFrame =
    winnersOf(chunkOccurrences(chunkBase(documents, spanTokens), spanTokens))

  private def winnersOf(occurrences: DataFrame): DataFrame =
    occurrences
      .groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first_at"))
      .select(col("first_at.doc_id").as("doc_id"),
        col("first_at.pos").as("pos"), col("chunk"))

  /** Rebuild per-doc clean text + kept/dropped counts from winner rows. */
  private def finishSpanDedup(base: DataFrame, winners: DataFrame): DataFrame = {
    val rebuilt = winners.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("spans_kept"),
        array_join(
          expr("transform(array_sort(collect_list(struct(pos, chunk))), x -> x.chunk)"),
          " ").as("clean_text"))
    base.select(col("doc_id"), col("n_chunks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("spans_kept"), lit(0L)).as("spans_kept"),
        (col("n_chunks") - coalesce(col("spans_kept"), lit(0L)))
          .as("spans_dropped"))
      .orderBy(col("doc_id"))
  }

  /** Incremental span dedup — the daily-run twin of [[spanDedup]]: clean a
    * new batch against an existing corpus WITHOUT re-aggregating it.
    *
    * Contract (oracle-checked as `dedup_spans_incremental`): output ≡
    * whole-corpus [[spanDedup]] of index ∪ batch restricted to batch ids,
    * under the same append-only monotone-ids invariant as the other
    * incremental operators (guarded loudly). Index ids < batch ids means
    * an index occurrence of a chunk beats EVERY batch occurrence, so a
    * batch doc keeps a chunk iff the chunk is absent from the index AND
    * the doc is its first in-batch occurrence — which is exactly what the
    * whole-corpus winner aggregation decides.
    *
    * Scale shape: one hash aggregation over the batch's chunks plus one
    * anti equi-join against the index chunk set — O(batch) given the
    * persisted winner table ([[spanChunkWinners]]); the rebuild default
    * aggregates the index once, like the near-dup/exact twins. The guard
    * is two scalar aggregates over ids, bounded by the artifact in the
    * supplied-table path.
    */
  def spanDedupIncremental(indexDocs: DataFrame, batchDocs: DataFrame,
                           indexWinners: Option[DataFrame] = None,
                           spanTokens: Int = 10): DataFrame = {
    NearDup.requireMonotoneIds(
      indexWinners.map(_.select(col("doc_id")))
        .getOrElse(indexDocs.select(col("doc_id"))),
      batchDocs, "spanDedupIncremental")
    val idx = indexWinners.getOrElse(spanChunkWinners(indexDocs, spanTokens))
    val batchBase = chunkBase(batchDocs, spanTokens)
    val inBatch = winnersOf(chunkOccurrences(batchBase, spanTokens))
    val kept = inBatch.join(idx.select(col("chunk")), Seq("chunk"), "left_anti")
    finishSpanDedup(batchBase, kept)
  }
}
