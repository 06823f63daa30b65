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
    * Semantics (oracle-checked as `text_span_dedup`): chunk each doc's
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
    val n = spanTokens
    val base = documents.select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n_chunks",
        expr(s"cast((size(w) + ${n - 1}) div $n as bigint)"))
    val occurrences = base.select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, int(n_chunks) - 1), " +
            s"i -> array_join(slice(w, i * $n + 1, $n), ' '))"))
          .as(Seq("pos", "chunk")))
    val winners = occurrences
      .groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first_at"))
      .select(col("first_at.doc_id").as("doc_id"),
        col("first_at.pos").as("pos"), col("chunk"))
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
}
