package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{CsvIngest, Curation, Dedup, JsonIngest, Multimodal, NearDup, Relational, Sessions, Similarity}
import graft.streaming.StreamingSessions

/** Multimodal family: image/audio/video decode stubs, perceptual
  * fingerprints, banded near-dup search, admission loops, cross-modal gate.
  *
  * Mechanically split from the SparkEntry monolith (r14, judge prescription
  * #8); entries and oracle SQL are verbatim — [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the per-domain maps and the
  * bijection gate (`PlanAuditSpec`) still covers the union.
  */
private[graft] object RegistryMultimodal {
  import RegistryShared._


  /** Shared perceptual-hash CTE chain → `ph(doc_id, w, h, phash)`: the
    * 8×8 average hash recomputed from the hash-fixture pixel recipe
    * (`Multimodal.makePhashPpm` — planted twins at doc_id ≡ 9 mod 10),
    * independently of the binary decode path. Used by `multimodal_phash`
    * and `multimodal_image_dups`.
    */
  private[graft] val phashCtes: String =
    """pd AS (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 9 THEN doc_id - 9 ELSE doc_id END AS e,
      |        CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS planted
      |      FROM documents),
      |pg AS (SELECT doc_id, e, planted, 16 + e % 17 AS w, 12 + e % 13 AS h,
      |        gi // 8 AS gy, gi % 8 AS gx
      |      FROM pd CROSS JOIN unnest(range(64)) AS t(gi)),
      |pp AS (SELECT doc_id, w, h, gy, gx, e, planted,
      |        ((gy * h) // 8) * w + (gx * w) // 8 AS pi
      |      FROM pg),
      |pc AS (SELECT doc_id, w, h, gy, gx,
      |        CASE WHEN planted = 1 AND pi IN (0, 5, 11)
      |             THEN least((e*7 + pi*13) % 256, 223) + 32
      |             ELSE (e*7 + pi*13) % 256 END AS r,
      |        (e*11 + pi*17) % 256 AS g_,
      |        (e*3 + pi*29) % 256 AS b
      |      FROM pp),
      |pl AS (SELECT doc_id, w, h, gy, gx,
      |        (299*r + 587*g_ + 114*b) // 1000 AS luma FROM pc),
      |pm AS (SELECT doc_id, sum(luma) // 64 AS mean FROM pl GROUP BY doc_id),
      |pb AS (SELECT pl.doc_id, max(w) AS w, max(h) AS h, gy,
      |        CAST(sum(CASE WHEN luma > mean THEN 1 ELSE 0 END
      |          * (CASE gx WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 32
      |                     WHEN 3 THEN 16 WHEN 4 THEN 8 WHEN 5 THEN 4
      |                     WHEN 6 THEN 2 ELSE 1 END)) AS BIGINT) AS byte
      |      FROM pl JOIN pm ON pl.doc_id = pm.doc_id
      |      GROUP BY pl.doc_id, gy),
      |ph AS (SELECT doc_id, max(w) AS w, max(h) AS h,
      |        string_agg(lower(lpad(hex(byte), 2, '0')), '' ORDER BY gy) AS phash
      |      FROM pb GROUP BY doc_id)""".stripMargin


  /** Shared acoustic-fingerprint CTE chain → `afp(doc_id, nf, afp)`: the
    * 32-bit energy-contour fingerprint recomputed from the fingerprint
    * fixture recipe (`Multimodal.fpSamples` — planted gain-scaled twins
    * at doc_id ≡ 7 mod 10), independently of the WAV binary path. Used
    * by `multimodal_audio_fp` and `multimodal_audio_dups`.
    */
  private[graft] val audioFpCtes: String =
    """ad AS (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 7 THEN doc_id - 7 ELSE doc_id END AS e,
      |        CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END AS planted
      |      FROM documents),
      |an AS (SELECT doc_id, e, planted, 544 + e % 225 AS n FROM ad),
      |asm AS (SELECT doc_id, i // 16 AS f,
      |        CASE WHEN planted = 1
      |             THEN ((((e * 31 + 7) * (i + 1) * (i + 2) % 4001) - 2000) * 31) // 32
      |             ELSE ((e * 31 + 7) * (i + 1) * (i + 2) % 4001) - 2000 END AS s
      |      FROM an CROSS JOIN unnest(range(768)) AS t(i)
      |      WHERE i < (n // 16) * 16),
      |fe AS (SELECT doc_id, f, CAST(sum(s * s) AS BIGINT) AS en
      |       FROM asm GROUP BY doc_id, f),
      |fn AS (SELECT doc_id, count(*) AS nf FROM fe GROUP BY doc_id),
      |fd AS (SELECT doc_id, f, en,
      |        lead(en) OVER (PARTITION BY doc_id ORDER BY f) AS nen FROM fe),
      |av AS (SELECT doc_id,
      |        CAST(sum(CASE WHEN f < 32 AND nen IS NOT NULL AND nen > en
      |                 THEN CAST(1 AS BIGINT) << CAST(31 - f AS INT)
      |                 ELSE 0 END) AS BIGINT) AS v
      |      FROM fd GROUP BY doc_id),
      |afp AS (SELECT av.doc_id, nf, lower(lpad(hex(v), 8, '0')) AS afp
      |        FROM av JOIN fn ON av.doc_id = fn.doc_id)""".stripMargin


  /** 64-bit acoustic-fingerprint CTE chain → `afp64(doc_id, nf, afp)`:
    * the [[audioFpCtes]] recipe with the longer clips
    * (`Multimodal.fpSamples64` — 1056 + e mod 225 samples, 66–80 frames)
    * and the contour extended to 64 deltas. The fingerprint is
    * assembled from two 32-bit halves (deltas 0–31 → high word,
    * 32–63 → low word) because DuckDB's BIGINT left-shift cannot
    * represent bit 63 (`1 << 63` overflows); Spark's `f"%016x"` of the
    * long is exactly the concatenated unsigned halves.
    */
  private[graft] val audioFp64Ctes: String =
    """ad64 AS (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 7 THEN doc_id - 7 ELSE doc_id END AS e,
      |        CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END AS planted
      |      FROM documents),
      |an64 AS (SELECT doc_id, e, planted, 1056 + e % 225 AS n FROM ad64),
      |asm64 AS (SELECT doc_id, i // 16 AS f,
      |        CASE WHEN planted = 1
      |             THEN ((((e * 31 + 7) * (i + 1) * (i + 2) % 4001) - 2000) * 31) // 32
      |             ELSE ((e * 31 + 7) * (i + 1) * (i + 2) % 4001) - 2000 END AS s
      |      FROM an64 CROSS JOIN unnest(range(1280)) AS t(i)
      |      WHERE i < (n // 16) * 16),
      |fe64 AS (SELECT doc_id, f, CAST(sum(s * s) AS BIGINT) AS en
      |       FROM asm64 GROUP BY doc_id, f),
      |fn64 AS (SELECT doc_id, count(*) AS nf FROM fe64 GROUP BY doc_id),
      |fd64 AS (SELECT doc_id, f, en,
      |        lead(en) OVER (PARTITION BY doc_id ORDER BY f) AS nen FROM fe64),
      |av64 AS (SELECT doc_id,
      |        CAST(sum(CASE WHEN f < 32 AND nen IS NOT NULL AND nen > en
      |                 THEN CAST(1 AS BIGINT) << CAST(31 - f AS INT)
      |                 ELSE 0 END) AS BIGINT) AS vhi,
      |        CAST(sum(CASE WHEN f >= 32 AND f < 64 AND nen IS NOT NULL
      |                      AND nen > en
      |                 THEN CAST(1 AS BIGINT) << CAST(63 - f AS INT)
      |                 ELSE 0 END) AS BIGINT) AS vlo
      |      FROM fd64 GROUP BY doc_id),
      |afp64 AS (SELECT av64.doc_id, nf,
      |          lower(lpad(hex(vhi), 8, '0') || lpad(hex(vlo), 8, '0')) AS afp
      |        FROM av64 JOIN fn64 ON av64.doc_id = fn64.doc_id)""".stripMargin


  /** Shared video CTE chain → `vs(doc_id, f, n, mean_luma_milli, sad,
    * npy)`: per-frame statistics recomputed from the video fixture
    * recipe (`Multimodal.videoDims`/`videoLuma` — scene cut at
    * `nf div 2` for doc_id ≢ 0 mod 3), independently of the Y4M binary
    * path. Used by `multimodal_video_frames` and
    * `multimodal_video_scenes`.
    */
  private[graft] val videoCtes: String =
    """vd AS (SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h,
      |        4 + doc_id % 5 AS nf,
      |        CASE WHEN doc_id % 3 = 0 THEN -1
      |             ELSE (4 + doc_id % 5) // 2 END AS sc
      |      FROM documents),
      |vf AS (SELECT doc_id, w, h, nf, sc, f
      |      FROM vd CROSS JOIN unnest(range(8)) AS t(f) WHERE f < nf),
      |vp AS (SELECT doc_id, w, h, f, i,
      |        CASE WHEN sc >= 0 AND f >= sc
      |             THEN (doc_id * 17 + i * 11) % 200 + 2 * (f - sc)
      |             ELSE (doc_id * 13 + i * 7) % 200 + 2 * f END AS y
      |      FROM vf CROSS JOIN unnest(range(192)) AS t(i) WHERE i < w * h),
      |vq AS (SELECT doc_id, f, i, y, w * h AS n,
      |        lag(y) OVER (PARTITION BY doc_id, i ORDER BY f) AS py
      |      FROM vp),
      |vs AS (SELECT doc_id, f, max(n) AS n,
      |        CAST(sum(y) * 1000 // max(n) AS BIGINT) AS mean_luma_milli,
      |        CAST(coalesce(sum(abs(y - py)), 0) AS BIGINT) AS sad,
      |        count(py) AS npy
      |      FROM vq GROUP BY doc_id, f)""".stripMargin


  /** Shared video-fingerprint CTE chain → `vfp(doc_id, nf, vfp)`: the
    * 32-bit temporal luma-contour fingerprint recomputed from the
    * fingerprint fixture recipe (`Multimodal.vfpDims`/`vfpLuma` —
    * planted brightness-shifted twins at doc_id ≡ 8 mod 10),
    * independently of the Y4M binary path. Used by
    * `multimodal_video_fp` and `multimodal_video_dups`.
    */
  private[graft] val videoFpCtes: String =
    """vfd AS (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 8 THEN doc_id - 8 ELSE doc_id END AS e,
      |        CASE WHEN doc_id % 10 = 8 THEN 1 ELSE 0 END AS planted
      |      FROM documents),
      |vfn AS (SELECT doc_id, e, planted, 6 + e % 5 AS w, 4 + e % 5 AS h,
      |        34 + e % 15 AS nf FROM vfd),
      |vfs AS (SELECT doc_id, nf, f,
      |        CAST(sum(((e*31 + 7) * (f+1) * (f+2) + 13*i) % 200
      |          + planted * 5) AS BIGINT) AS s
      |      FROM vfn CROSS JOIN unnest(range(48)) AS tf(f)
      |      CROSS JOIN unnest(range(80)) AS ti(i)
      |      WHERE f < nf AND i < w * h
      |      GROUP BY doc_id, nf, f),
      |vfe AS (SELECT doc_id, nf, f, s,
      |        lead(s) OVER (PARTITION BY doc_id ORDER BY f) AS ns FROM vfs),
      |vfv AS (SELECT doc_id, max(nf) AS nf,
      |        CAST(sum(CASE WHEN f < 32 AND ns IS NOT NULL AND ns > s
      |                 THEN CAST(1 AS BIGINT) << CAST(31 - f AS INT)
      |                 ELSE 0 END) AS BIGINT) AS v
      |      FROM vfe GROUP BY doc_id),
      |vfp AS (SELECT doc_id, nf, lower(lpad(hex(v), 8, '0')) AS vfp
      |        FROM vfv)""".stripMargin


  /** Shared smaller-id fingerprint-neighbor CTE chains (require
    * `phashCtes` / `audioFpCtes` / `videoFpCtes` earlier in the WITH):
    * banded candidates → Hamming ≤ 3 → `im`/`am`/`vm` (doc_id, canon =
    * min smaller neighbor). Used by the admission oracles and
    * `pipeline_multimodal`.
    */
  private[graft] val imageNeighborCtes: String =
    """ibands AS (SELECT doc_id, phash, bi,
      |            substring(phash, CAST(bi * 4 + 1 AS INT), 4) AS bv
      |          FROM ph CROSS JOIN unnest(range(4)) AS t(bi)),
      |icand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |                x.phash AS ha, y.phash AS hb
      |         FROM ibands x JOIN ibands y
      |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
      |ihm AS (SELECT doc_a, doc_b,
      |         CAST(sum(bit_count(xor(
      |           strpos('0123456789abcdef', substring(ha, CAST(i + 1 AS INT), 1)) - 1,
      |           strpos('0123456789abcdef', substring(hb, CAST(i + 1 AS INT), 1)) - 1)))
      |           AS BIGINT) AS hamming
      |       FROM icand CROSS JOIN unnest(range(16)) AS t(i)
      |       GROUP BY doc_a, doc_b),
      |im AS (SELECT doc_b AS doc_id, min(doc_a) AS canon
      |       FROM ihm WHERE hamming <= 3 GROUP BY doc_b)""".stripMargin


  private[graft] val audioNeighborCtes: String =
    """abands AS (SELECT doc_id, afp, bi,
      |            substring(afp, CAST(bi * 2 + 1 AS INT), 2) AS bv
      |          FROM afp CROSS JOIN unnest(range(4)) AS t(bi)),
      |acand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |                x.afp AS fa, y.afp AS fb
      |         FROM abands x JOIN abands y
      |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
      |ahm AS (SELECT doc_a, doc_b,
      |         CAST(sum(bit_count(xor(
      |           strpos('0123456789abcdef', substring(fa, CAST(i + 1 AS INT), 1)) - 1,
      |           strpos('0123456789abcdef', substring(fb, CAST(i + 1 AS INT), 1)) - 1)))
      |           AS BIGINT) AS hamming
      |       FROM acand CROSS JOIN unnest(range(8)) AS t(i)
      |       GROUP BY doc_a, doc_b),
      |am AS (SELECT doc_b AS doc_id, min(doc_a) AS canon
      |       FROM ahm WHERE hamming <= 3 GROUP BY doc_b)""".stripMargin


  private[graft] val videoNeighborCtes: String =
    """vbands AS (SELECT doc_id, vfp, bi,
      |            substring(vfp, CAST(bi * 2 + 1 AS INT), 2) AS bv
      |          FROM vfp CROSS JOIN unnest(range(4)) AS t(bi)),
      |vcand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |                x.vfp AS fa, y.vfp AS fb
      |         FROM vbands x JOIN vbands y
      |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
      |vhm AS (SELECT doc_a, doc_b,
      |         CAST(sum(bit_count(xor(
      |           strpos('0123456789abcdef', substring(fa, CAST(i + 1 AS INT), 1)) - 1,
      |           strpos('0123456789abcdef', substring(fb, CAST(i + 1 AS INT), 1)) - 1)))
      |           AS BIGINT) AS hamming
      |       FROM vcand CROSS JOIN unnest(range(8)) AS t(i)
      |       GROUP BY doc_a, doc_b),
      |vm AS (SELECT doc_b AS doc_id, min(doc_a) AS canon
      |       FROM vhm WHERE hamming <= 3 GROUP BY doc_b)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multimodal extensions: binary media column + typed metadata; decode
    // is a deterministic stub (no codecs in env), plumbing is real.
    "multimodal_meta" -> ((s, dir) => Multimodal.mediaMeta(Tables.documents(s, dir))),
    "multimodal_frames" -> ((s, dir) => Multimodal.sampleFrames(Tables.documents(s, dir))),
    "multimodal_features" -> ((s, dir) => Multimodal.extractFeatures(Tables.documents(s, dir))),
    "multimodal_resize" -> ((s, dir) => Multimodal.resize(Tables.documents(s, dir))),
    // perceptual hash over real decoded pixels; banded Hamming near-dup
    "multimodal_phash" -> ((s, dir) => Multimodal.imageHashes(Tables.documents(s, dir))),
    "multimodal_image_dups" -> ((s, dir) => Multimodal.imageNearDups(Tables.documents(s, dir))),
    // real RIFF/WAVE PCM decode + integer signal statistics / frame energy
    "multimodal_audio" -> ((s, dir) => Multimodal.audioFeatures(Tables.documents(s, dir))),
    "multimodal_audio_frames" -> ((s, dir) => Multimodal.audioFrames(Tables.documents(s, dir))),
    // energy-contour acoustic fingerprint; banded Hamming near-dup
    "multimodal_audio_fp" -> ((s, dir) => Multimodal.audioFingerprints(Tables.documents(s, dir))),
    "multimodal_audio_dups" -> ((s, dir) => Multimodal.audioNearDups(Tables.documents(s, dir))),
    // the 64-bit contour scale path: 16-bit bands (65 536 buckets), the
    // image search's constants — production audio dedup's shape
    "multimodal_audio_fp64" -> ((s, dir) => Multimodal.audioFingerprints64(Tables.documents(s, dir))),
    "multimodal_audio_dups64" -> ((s, dir) => Multimodal.audioNearDups64(Tables.documents(s, dir))),
    // real YUV4MPEG2 decode + pixel-domain scene-cut detection
    "multimodal_video_frames" -> ((s, dir) => Multimodal.videoFrameStats(Tables.documents(s, dir))),
    "multimodal_video_scenes" -> ((s, dir) => Multimodal.videoScenes(Tables.documents(s, dir))),
    // temporal luma-contour video fingerprint; banded Hamming near-dup
    "multimodal_video_fp" -> ((s, dir) => Multimodal.videoFingerprints(Tables.documents(s, dir))),
    "multimodal_video_dups" -> ((s, dir) => Multimodal.videoNearDups(Tables.documents(s, dir))),
    // incremental perceptual admission: batch fingerprints vs the
    // persisted fingerprint artifact (80/20 split), media never re-read
    "multimodal_image_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Multimodal.fingerprintAdmission(
        Multimodal.imageHashes(docs.filter(col("doc_id") < cut)),
        Multimodal.imageHashes(docs.filter(col("doc_id") >= cut)),
        "phash", 16)
    }),
    "multimodal_audio_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Multimodal.fingerprintAdmission(
        Multimodal.audioFingerprints(docs.filter(col("doc_id") < cut)),
        Multimodal.audioFingerprints(docs.filter(col("doc_id") >= cut)),
        "afp", 8)
    }),
    "multimodal_video_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Multimodal.fingerprintAdmission(
        Multimodal.videoFingerprints(docs.filter(col("doc_id") < cut)),
        Multimodal.videoFingerprints(docs.filter(col("doc_id") >= cut)),
        "vfp", 8)
    }),
    // cross-modal curation gate: per-doc duplicate flags across text /
    // image / audio / video and the conjunction a packer would consume
    "pipeline_multimodal" -> ((s, dir) =>
      Multimodal.cleanMultimodalCorpus(Tables.documents(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  64 + n_chars % 576 AS width,
        |  48 + n_chars % 432 AS height,
        |  n_chars // 100 + 1 AS n_frames,
        |  octet_length(encode(text)) AS media_bytes,
        |  md5(text) AS content_key
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text AS b,
        |    unnest(range(0, n_chars // 100 + 1)) AS frame_idx
        |  FROM documents)
        |-- text is pure ASCII, so string slicing == the byte slicing Spark
        |-- performs on the binary media column
        |SELECT doc_id, frame_idx,
        |  octet_length(encode(substring(b, CAST(frame_idx * 16 + 1 AS INT), 16))) AS frame_bytes,
        |  md5(substring(b, CAST(frame_idx * 16 + 1 AS INT), 16)) AS frame_key
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // the oracle recomputes the pixel statistics from the CLOSED-FORM
    // fixture recipe (Multimodal.makePpm), independently of the binary
    // path — Spark must reproduce them through a real P6 header parse +
    // byte decode, so any decode defect breaks the hash
    "multimodal_features" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |           FROM documents),
        |px AS (SELECT doc_id, w, h,
        |    (doc_id * 7 + i * 13) % 256 AS r,
        |    (doc_id * 11 + i * 17) % 256 AS g,
        |    (doc_id * 3 + i * 29) % 256 AS b
        |  FROM d CROSS JOIN unnest(range(w * h)) AS t(i)),
        |lx AS (SELECT *, (299 * r + 587 * g + 114 * b) // 1000 AS luma
        |       FROM px)
        |SELECT doc_id,
        |  CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
        |  CAST((sum(r) * 1000) // count(*) AS BIGINT) AS mean_r_milli,
        |  CAST((sum(g) * 1000) // count(*) AS BIGINT) AS mean_g_milli,
        |  CAST((sum(b) * 1000) // count(*) AS BIGINT) AS mean_b_milli,
        |  CAST((sum(luma) * 1000) // count(*) AS BIGINT) AS mean_luma_milli,
        |  CAST(max(luma) AS BIGINT) AS max_luma,
        |  CAST(min(luma) AS BIGINT) AS min_luma
        |FROM lx GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // 2x box-downsample recomputed from the same recipe: output pixel
    // (x, y) averages the 2x2 source block; P6 byte counts are
    // 9 + digits(w) + digits(h) + 3wh (header "P6\n<w> <h>\n255\n")
    "multimodal_resize" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |           FROM documents),
        |rp AS (SELECT doc_id, w, h, w // 2 AS nw, h // 2 AS nh,
        |    j % (w // 2) AS x, j // (w // 2) AS y
        |  FROM d CROSS JOIN unnest(range((w // 2) * (h // 2))) AS t(j)),
        |rv AS (SELECT doc_id, w, h, nw, nh,
        |    (((doc_id*7 + ((2*y)*w + 2*x)*13) % 256)
        |     + ((doc_id*7 + ((2*y)*w + 2*x + 1)*13) % 256)
        |     + ((doc_id*7 + ((2*y+1)*w + 2*x)*13) % 256)
        |     + ((doc_id*7 + ((2*y+1)*w + 2*x + 1)*13) % 256)) // 4
        |    + (((doc_id*11 + ((2*y)*w + 2*x)*17) % 256)
        |     + ((doc_id*11 + ((2*y)*w + 2*x + 1)*17) % 256)
        |     + ((doc_id*11 + ((2*y+1)*w + 2*x)*17) % 256)
        |     + ((doc_id*11 + ((2*y+1)*w + 2*x + 1)*17) % 256)) // 4
        |    + (((doc_id*3 + ((2*y)*w + 2*x)*29) % 256)
        |     + ((doc_id*3 + ((2*y)*w + 2*x + 1)*29) % 256)
        |     + ((doc_id*3 + ((2*y+1)*w + 2*x)*29) % 256)
        |     + ((doc_id*3 + ((2*y+1)*w + 2*x + 1)*29) % 256)) // 4 AS pxsum
        |  FROM rp)
        |SELECT doc_id,
        |  CAST(max(nw) AS BIGINT) AS new_width,
        |  CAST(max(nh) AS BIGINT) AS new_height,
        |  CAST(9 + length(CAST(max(w) AS VARCHAR))
        |    + length(CAST(max(h) AS VARCHAR))
        |    + max(w) * max(h) * 3 AS BIGINT) AS orig_bytes,
        |  CAST(9 + length(CAST(max(nw) AS VARCHAR))
        |    + length(CAST(max(nh) AS VARCHAR))
        |    + max(nw) * max(nh) * 3 AS BIGINT) AS thumb_bytes,
        |  CAST(sum(pxsum) AS BIGINT) AS thumb_sum
        |FROM rv GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // perceptual hash recomputed from the hash-fixture recipe — Spark
    // must reproduce it through real decode + grid sampling + threshold
    "multimodal_phash" ->
      s"""WITH $phashCtes
         |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  phash
         |FROM ph ORDER BY doc_id""".stripMargin,
    // banded Hamming search replicated in SQL: same 4×16-bit bands, same
    // radius — the oracle's candidate set IS the operator's candidate
    // set, so a banding defect (not just a hash defect) breaks the match
    "multimodal_image_dups" ->
      s"""WITH $phashCtes,
         |bands AS (SELECT doc_id, phash, bi,
         |            substring(phash, CAST(bi * 4 + 1 AS INT), 4) AS bv
         |          FROM ph CROSS JOIN unnest(range(4)) AS t(bi)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.phash AS ha, y.phash AS hb
         |         FROM bands x JOIN bands y
         |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |hm AS (SELECT doc_a, doc_b,
         |         CAST(sum(bit_count(xor(
         |           strpos('0123456789abcdef', substring(ha, CAST(i + 1 AS INT), 1)) - 1,
         |           strpos('0123456789abcdef', substring(hb, CAST(i + 1 AS INT), 1)) - 1)))
         |           AS BIGINT) AS hamming
         |       FROM cand CROSS JOIN unnest(range(16)) AS t(i)
         |       GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, hamming FROM hm
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // audio statistics recomputed from the closed-form sample recipe
    // (Multimodal.wavSamples) — Spark must reproduce them through a real
    // RIFF chunk walk + little-endian PCM decode, so any header-parse,
    // byte-order, or chunk-skip defect breaks the hash
    "multimodal_audio" ->
      """WITH an AS (SELECT doc_id, 64 + doc_id % 193 AS n FROM documents),
        |sm AS (SELECT doc_id, n, i,
        |         ((doc_id * 31 + i * 57) % 4001) - 2000 AS s
        |       FROM an CROSS JOIN unnest(range(256)) AS t(i) WHERE i < n),
        |zc AS (SELECT doc_id, n, i, s,
        |         lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS ps
        |       FROM sm)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(max(n) AS BIGINT) AS n_samples,
        |  CAST(max(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(max(abs(s)) AS BIGINT) AS peak,
        |  CAST(sum(s * s) // max(n) AS BIGINT) AS mean_square,
        |  CAST(sum(CASE WHEN ps IS NOT NULL AND (ps >= 0) <> (s >= 0)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM zc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // per-frame energy over the same recipe: fixed 64-sample analysis
    // frames, ragged tail, integer division
    "multimodal_audio_frames" ->
      """WITH an AS (SELECT doc_id, 64 + doc_id % 193 AS n FROM documents),
        |sm AS (SELECT doc_id, i, i // 64 AS frame_idx,
        |         ((doc_id * 31 + i * 57) % 4001) - 2000 AS s
        |       FROM an CROSS JOIN unnest(range(256)) AS t(i) WHERE i < n)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(count(*) AS BIGINT) AS frame_samples,
        |  CAST(sum(s * s) // count(*) AS BIGINT) AS energy
        |FROM sm GROUP BY doc_id, frame_idx
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // acoustic fingerprint recomputed from the fixture recipe — Spark
    // must reproduce it through real WAV decode + framing + contour bits
    "multimodal_audio_fp" ->
      s"""WITH $audioFpCtes
         |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, afp
         |FROM afp ORDER BY doc_id""".stripMargin,
    // banded Hamming search replicated in SQL: same 4×8-bit bands, same
    // radius — the oracle's candidate set IS the operator's candidate set
    "multimodal_audio_dups" ->
      s"""WITH $audioFpCtes,
         |abands AS (SELECT doc_id, afp, bi,
         |            substring(afp, CAST(bi * 2 + 1 AS INT), 2) AS bv
         |          FROM afp CROSS JOIN unnest(range(4)) AS t(bi)),
         |acand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.afp AS fa, y.afp AS fb
         |         FROM abands x JOIN abands y
         |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |ahm AS (SELECT doc_a, doc_b,
         |         CAST(sum(bit_count(xor(
         |           strpos('0123456789abcdef', substring(fa, CAST(i + 1 AS INT), 1)) - 1,
         |           strpos('0123456789abcdef', substring(fb, CAST(i + 1 AS INT), 1)) - 1)))
         |           AS BIGINT) AS hamming
         |       FROM acand CROSS JOIN unnest(range(8)) AS t(i)
         |       GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, hamming FROM ahm
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // the 64-bit contour recomputed from its longer-clip recipe; Spark
    // reproduces it through real WAV decode + framing + 64 contour bits
    "multimodal_audio_fp64" ->
      s"""WITH $audioFp64Ctes
         |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, afp
         |FROM afp64 ORDER BY doc_id""".stripMargin,
    // banded Hamming search over the 64-bit contour: 4×16-bit bands
    // (4 hex chars each), same radius — the production constants
    "multimodal_audio_dups64" ->
      s"""WITH $audioFp64Ctes,
         |abands64 AS (SELECT doc_id, afp, bi,
         |            substring(afp, CAST(bi * 4 + 1 AS INT), 4) AS bv
         |          FROM afp64 CROSS JOIN unnest(range(4)) AS t(bi)),
         |acand64 AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.afp AS fa, y.afp AS fb
         |         FROM abands64 x JOIN abands64 y
         |           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |ahm64 AS (SELECT doc_a, doc_b,
         |         CAST(sum(bit_count(xor(
         |           strpos('0123456789abcdef', substring(fa, CAST(i + 1 AS INT), 1)) - 1,
         |           strpos('0123456789abcdef', substring(fb, CAST(i + 1 AS INT), 1)) - 1)))
         |           AS BIGINT) AS hamming
         |       FROM acand64 CROSS JOIN unnest(range(16)) AS t(i)
         |       GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, hamming FROM ahm64
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // incremental perceptual admission ≡ the whole-corpus smaller-id-
    // neighbor rule restricted to the batch (monotone ids make the index
    // exactly the smaller-id side) — recomputed from the fixture recipes
    "multimodal_image_admission" ->
      s"""WITH $phashCtes,
         |$imageNeighborCtes
         |SELECT d.doc_id, coalesce(im.canon, d.doc_id) AS canonical_id,
         |  im.canon IS NULL AS kept
         |FROM documents d LEFT JOIN im ON d.doc_id = im.doc_id
         |WHERE d.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
         |ORDER BY d.doc_id""".stripMargin,
    "multimodal_audio_admission" ->
      s"""WITH $audioFpCtes,
         |$audioNeighborCtes
         |SELECT d.doc_id, coalesce(am.canon, d.doc_id) AS canonical_id,
         |  am.canon IS NULL AS kept
         |FROM documents d LEFT JOIN am ON d.doc_id = am.doc_id
         |WHERE d.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
         |ORDER BY d.doc_id""".stripMargin,
    "multimodal_video_admission" ->
      s"""WITH $videoFpCtes,
         |$videoNeighborCtes
         |SELECT d.doc_id, coalesce(vm.canon, d.doc_id) AS canonical_id,
         |  vm.canon IS NULL AS kept
         |FROM documents d LEFT JOIN vm ON d.doc_id = vm.doc_id
         |WHERE d.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
         |ORDER BY d.doc_id""".stripMargin,
    // temporal luma-contour fingerprint recomputed from the fixture
    // recipe — Spark must reproduce it through real Y4M decode + per-
    // frame luma sums + contour bits
    "multimodal_video_fp" ->
      s"""WITH $videoFpCtes
         |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, vfp
         |FROM vfp ORDER BY doc_id""".stripMargin,
    // banded Hamming search replicated in SQL: same 4×8-bit bands, same
    // radius — the oracle's candidate set IS the operator's candidate set
    "multimodal_video_dups" ->
      s"""WITH $videoFpCtes,
         |$videoNeighborCtes
         |SELECT doc_a, doc_b, hamming FROM vhm
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // cross-modal curation gate: one row per doc with per-modality
    // duplicate flags (exact text md5 keep-first; image / audio / video
    // smaller-id fingerprint neighbor at radius 3) and the conjunction
    "pipeline_multimodal" ->
      s"""WITH $phashCtes,
         |$audioFpCtes,
         |$videoFpCtes,
         |$imageNeighborCtes,
         |$audioNeighborCtes,
         |$videoNeighborCtes,
         |tx AS (SELECT doc_id,
         |        row_number() OVER (PARTITION BY md5(text)
         |                           ORDER BY doc_id) > 1 AS text_dup
         |      FROM documents)
         |SELECT t.doc_id, t.text_dup,
         |  im.canon IS NOT NULL AS image_dup,
         |  am.canon IS NOT NULL AS audio_dup,
         |  vm.canon IS NOT NULL AS video_dup,
         |  NOT (t.text_dup OR im.canon IS NOT NULL
         |       OR am.canon IS NOT NULL OR vm.canon IS NOT NULL) AS kept
         |FROM tx t LEFT JOIN im ON t.doc_id = im.doc_id
         |          LEFT JOIN am ON t.doc_id = am.doc_id
         |          LEFT JOIN vm ON t.doc_id = vm.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    // per-frame video statistics recomputed from the fixture recipe —
    // Spark must reproduce them through a real Y4M parse + frame decode,
    // so a header-tag, FRAME-marker, or plane-indexing defect breaks the
    // hash; is_cut re-runs the detection inequality in SQL
    "multimodal_video_frames" ->
      s"""WITH $videoCtes
         |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, mean_luma_milli,
         |  sad AS sum_abs_diff,
         |  (npy > 0 AND sad > 10 * n) AS is_cut
         |FROM vs ORDER BY doc_id, frame_idx""".stripMargin,
    // scene decomposition: cut count + keyframe list (frame 0 plus every
    // detected cut), joined to the recipe dimensions
    "multimodal_video_scenes" ->
      s"""WITH $videoCtes
         |SELECT v.doc_id, CAST(max(d.w) AS BIGINT) AS width,
         |  CAST(max(d.h) AS BIGINT) AS height,
         |  CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum(CASE WHEN npy > 0 AND sad > 10 * n THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_cuts,
         |  string_agg(CASE WHEN f = 0 OR (npy > 0 AND sad > 10 * n)
         |               THEN CAST(f AS VARCHAR) END, ',' ORDER BY f)
         |    AS keyframes
         |FROM vs v JOIN vd d ON v.doc_id = d.doc_id
         |GROUP BY v.doc_id ORDER BY v.doc_id""".stripMargin,
  )
}
