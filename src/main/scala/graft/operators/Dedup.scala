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
}
