package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media blob + typed metadata (the multimodal row contract). */
case class MediaRow(doc_id: Long, media: Array[Byte])

/** Real pixel statistics decoded from one PPM image. */
case class PpmFeatureRow(doc_id: Long, width: Long, height: Long,
                         mean_r_milli: Long, mean_g_milli: Long,
                         mean_b_milli: Long, mean_luma_milli: Long,
                         max_luma: Long, min_luma: Long)

/** Real 2× box-downsample summary for one PPM image. */
case class PpmResizeRow(doc_id: Long, new_width: Long, new_height: Long,
                        orig_bytes: Long, thumb_bytes: Long, thumb_sum: Long)

/** Multimodal-column operators (north-star extension): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction / frame-sampling are engine operators over those
  * columns.
  *
  * The image decode is REAL: [[Multimodal.decodePpm]] parses binary P6
  * PPM (header incl. `#` comments + raw RGB triplets) entirely in the
  * JVM, and feature extraction / resize run genuine pixel math over the
  * decoded bytes. The fixture images ([[Multimodal.ppmMediaTable]]) are
  * synthesized from a closed-form integer pixel recipe, which is what
  * lets the DuckDB oracle pin the decode: it recomputes the expected
  * statistics from the recipe, independently of the binary path, so any
  * header-parse or byte-indexing defect breaks the hash match. Audio and
  * video stay metadata-plus-byte-window operators ([[sampleFrames]]) —
  * this container ships no codecs for them.
  *
  * Scale: media tables at 100 TB are dominated by blob bytes — the rules
  * encoded here are (1) never shuffle the blob: derive features/frames in
  * a map-only stage straight off the scan (the `mapPartitions` stages
  * below are the `mapInPandas` shape: one iterator per partition, no
  * per-row closure dispatch); (2) metadata lives in a struct column so
  * pruning drops the blob when a query only needs dimensions.
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

  /** REAL resize: decode each PPM, 2× box-downsample (each output pixel =
    * floor-mean of its 2×2 source block, per channel), re-encode as P6,
    * and report a flat summary — dimensions, real byte counts of both
    * binaries, and the resized pixel checksum. Decode → scale → re-encode
    * all happen inside one map-only partition iterator; nothing shuffles
    * and the blob never leaves the task. The checksum (sum of resized
    * sample bytes) is what the oracle recomputes from the pixel recipe —
    * it covers every output pixel, so a mis-indexed source block or a
    * wrong rounding mode flips the hash.
    */
  def resize(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    ppmMediaTable(documents).mapPartitions { it =>
      it.map { r =>
        val (w, h, px) = decodePpm(r.media)
        val nw = w / 2; val nh = h / 2
        val out = new Array[Byte](nw * nh * 3)
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) {
            var c = 0
            while (c < 3) {
              val i00 = ((2 * y) * w + 2 * x) * 3 + c
              val i01 = i00 + 3
              val i10 = ((2 * y + 1) * w + 2 * x) * 3 + c
              val i11 = i10 + 3
              out((y * nw + x) * 3 + c) =
                (((px(i00) & 0xff) + (px(i01) & 0xff) +
                  (px(i10) & 0xff) + (px(i11) & 0xff)) / 4).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val thumb = encodePpm(nw, nh, out)
        PpmResizeRow(r.doc_id, nw, nh, r.media.length, thumb.length,
          out.foldLeft(0L)((s, b) => s + (b & 0xff)))
      }
    }.toDF().orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------ PPM codec

  /** Fixture-image dimensions and pixel recipe, shared by the Spark-side
    * generator and the DuckDB oracle's independent recomputation. Pixel i
    * (row-major, 0-based) of doc d has channels
    * r = (7d+13i) mod 256, g = (11d+17i) mod 256, b = (3d+29i) mod 256;
    * dimensions w = 4 + d mod 5, h = 3 + d mod 4 (w even ≥ 4 is NOT
    * guaranteed — the resize floor-halves both).
    */
  private[graft] def ppmDims(docId: Long): (Int, Int) =
    ((4 + docId % 5).toInt, (3 + docId % 4).toInt)

  private[graft] def makePpm(docId: Long): Array[Byte] = {
    val (w, h) = ppmDims(docId)
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      px(3 * i) = ((docId * 7 + i * 13) % 256).toByte
      px(3 * i + 1) = ((docId * 11 + i * 17) % 256).toByte
      px(3 * i + 2) = ((docId * 3 + i * 29) % 256).toByte
      i += 1
    }
    encodePpm(w, h, px)
  }

  /** Binary P6 PPM: `P6\n<w> <h>\n255\n` + row-major RGB bytes. */
  private[graft] def encodePpm(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h * 3, "pixel buffer does not match dimensions")
    s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ px
  }

  /** Decode binary P6 PPM: magic, whitespace-separated width/height/maxval
    * (with `#`-to-end-of-line comments, per the netpbm spec), one
    * whitespace byte, then `w*h*3` raw sample bytes. Returns
    * (width, height, pixel bytes). Pure JVM — no codec libraries.
    */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM")
    var p = 2
    def skipSeparators(): Unit = {
      var go = true
      while (go && p < bytes.length) {
        val c = bytes(p)
        if (c == '#') while (p < bytes.length && bytes(p) != '\n') p += 1
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') p += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipSeparators()
      val start = p
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') p += 1
      require(p > start, s"malformed PPM header at byte $start")
      new String(bytes, start, p - start,
        java.nio.charset.StandardCharsets.US_ASCII).toInt
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(maxval == 255, s"unsupported maxval $maxval (8-bit only)")
    p += 1 // exactly one whitespace byte after maxval, then raw samples
    require(bytes.length - p == w * h * 3,
      s"PPM body has ${bytes.length - p} bytes, expected ${w * h * 3}")
    (w, h, java.util.Arrays.copyOfRange(bytes, p, bytes.length))
  }

  /** One deterministic P6 fixture image per document — the binary media
    * column the decode operators run on. Generated JVM-side (a map-only
    * typed projection); at 100 TB this table would instead be scanned
    * from object storage, with the identical downstream plan.
    */
  def ppmMediaTable(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, makePpm(id)))
  }

  /** Batched REAL feature extraction: decode each PPM and pool per-channel
    * and luminance statistics over the actual pixel bytes — the
    * `mapInPandas`-shaped path (one iterator per partition; blob never
    * shuffles; map-only stage straight off the scan). All statistics are
    * exact integer math (milli-units via `*1000 div n`; per-pixel luma =
    * `(299r+587g+114b) div 1000`), so the oracle's recipe-based
    * recomputation matches bit-for-bit.
    */
  def extractFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    ppmMediaTable(documents).mapPartitions { it =>
      it.map { r =>
        val (w, h, px) = decodePpm(r.media)
        val n = w.toLong * h
        var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
        var maxL = Long.MinValue; var minL = Long.MaxValue
        var i = 0
        while (i < w * h) {
          val rr = px(3 * i) & 0xff
          val gg = px(3 * i + 1) & 0xff
          val bb = px(3 * i + 2) & 0xff
          val luma = (299L * rr + 587L * gg + 114L * bb) / 1000L
          sr += rr; sg += gg; sb += bb; sl += luma
          if (luma > maxL) maxL = luma
          if (luma < minL) minL = luma
          i += 1
        }
        PpmFeatureRow(r.doc_id, w, h, sr * 1000 / n, sg * 1000 / n,
          sb * 1000 / n, sl * 1000 / n, maxL, minL)
      }
    }.toDF().orderBy(col("doc_id"))
  }
}
