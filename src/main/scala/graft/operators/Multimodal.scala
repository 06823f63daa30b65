package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media blob + typed metadata (the multimodal row contract). */
case class MediaRow(doc_id: Long, media: Array[Byte])

/** Extracted feature vector for one media blob. */
case class MediaFeatures(doc_id: Long, features: Array[Double])

/** Multimodal-column operators (north-star extension): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction / frame-sampling are engine operators over those
  * columns.
  *
  * The decode step itself is STUBBED — this container has no image/audio
  * codecs — with a clearly-marked deterministic fake ([[Multimodal.decodeStub]]).
  * Everything around it is real Spark plumbing and is what's under test:
  * binary column handling, metadata schema, iterator-based `mapPartitions`
  * batching (the Scala analogue of `mapInPandas`: one JVM-side batch loop
  * per partition, no per-row closure dispatch), and frame explosion that
  * keeps byte-slicing inside codegen'd builtins (`substring` on binary).
  *
  * Scale: media tables at 100 TB are dominated by blob bytes — the rules
  * encoded here are (1) never shuffle the blob: derive features/frames in
  * a map-only stage straight off the scan; (2) metadata lives in a struct
  * column so pruning drops the blob when a query only needs dimensions.
  */
object Multimodal {

  val FrameBytes = 16

  /** Synthesize a media table from `documents` (no binary fixtures ship
    * with the testdata): media = UTF-8 bytes of the text, metadata derived
    * deterministically from `n_chars`.
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        (lit(64L) + pmod(col("n_chars"), lit(576))).as("width"),
        (lit(48L) + pmod(col("n_chars"), lit(432))).as("height"),
        (expr("n_chars div 100") + 1L).as("n_frames")).as("meta"))

  /** Metadata + content-key projection. Reads width/height/kind from the
    * struct (column pruning can drop `media` if a caller selects only
    * these) plus blob-derived size and md5 content key.
    */
  def mediaMeta(documents: DataFrame): DataFrame =
    mediaTable(documents).select(
      col("doc_id"),
      col("meta.kind").as("kind"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_frames").as("n_frames"),
      length(col("media")).cast("long").as("media_bytes"),
      md5(col("media")).as("content_key"))
      .orderBy(col("doc_id"))

  /** Frame sampling: explode `n_frames` fixed-stride byte windows out of
    * the blob; the per-frame key is md5 of the frame's own bytes. Byte
    * slicing stays in builtin `substring`-on-binary — map-only, no UDF.
    */
  def sampleFrames(documents: DataFrame): DataFrame =
    mediaTable(documents)
      .select(col("doc_id"), col("media"),
        explode(sequence(lit(0L), col("meta.n_frames") - 1L)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        substring_frame(col("media"), col("frame_idx")).as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_key"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private def substring_frame(media: org.apache.spark.sql.Column,
                              idx: org.apache.spark.sql.Column) =
    substring(media, (idx * FrameBytes + 1).cast("int"), lit(FrameBytes).cast("int"))

  /** Resize: halve the declared dimensions and keep a quarter-length byte
    * thumbnail, reported as a flat summary row (doc_id, new dimensions,
    * byte counts, thumbnail content key). The byte "downsample" is a stub
    * (no codecs — a real implementation decodes, scales, re-encodes inside
    * the same map-only projection); the dimension arithmetic and the
    * builtin `substring`-on-binary slice are the real contract, and
    * nothing shuffles. (`mediaTable` guarantees width ≥ 64 / height ≥ 48,
    * so one halving needs no lower clamp.)
    */
  def resize(documents: DataFrame): DataFrame =
    mediaTable(documents).select(
      col("doc_id"),
      expr("meta.width div 2").as("new_width"),
      expr("meta.height div 2").as("new_height"),
      length(col("media")).cast("long").as("orig_bytes"),
      expr("substring(media, 1, cast((length(media) + 3) div 4 as int))").as("thumb"))
      .select(col("doc_id"), col("new_width"), col("new_height"),
        col("orig_bytes"),
        length(col("thumb")).cast("long").as("thumb_bytes"),
        md5(col("thumb")).as("thumb_key"))
      .orderBy(col("doc_id"))

  /** ??? STUB — the real implementation would decode the media bytes with
    * an image/audio library (not present in this container) and pool model
    * features. Deterministic fake keyed on blob length so tests and the
    * DuckDB oracle can replicate it exactly: f(k) = ((len*31 + k) % 1000) / 1000.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Double] =
    Array.tabulate(dim)(k => ((bytes.length.toLong * 31 + k) % 1000) / 1000.0)

  /** Batched feature extraction over the binary column — the
    * `mapInPandas`-shaped path: one iterator per partition, batch-friendly,
    * blob never shuffles (map-only stage straight off the scan).
    *
    * Output is one scalar column per feature (`f0..f{dim-1}`), not an
    * `array<double>` — flat scalars sort/hash in any downstream engine,
    * and a fixed feature width is the common contract for feature stores.
    */
  def extractFeatures(documents: DataFrame, dim: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] =
      mediaTable(documents).select(col("doc_id"), col("media")).as[MediaRow]
    val cols = col("doc_id") +:
      (0 until dim).map(k => element_at(col("features"), k + 1).as(s"f$k"))
    media.mapPartitions { it =>
      it.map(r => MediaFeatures(r.doc_id, decodeStub(r.media, dim)))
    }.toDF().select(cols: _*).orderBy(col("doc_id"))
  }
}
