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
}
