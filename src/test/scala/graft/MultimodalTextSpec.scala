package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Multimodal

class MultimodalTextSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick fox", 13L),
    (1L, "a a a a", 7L)
  ).toDF("doc_id", "text", "n_chars")

  test("media table: binary payload + metadata derived from n_chars") {
    val m = Multimodal.mediaMeta(docs).collect()
    val r0 = m.find(_.getLong(0) == 0L).get
    assert(r0.getAs[String]("kind") == "image")       // doc_id 0 % 3
    assert(r0.getAs[Long]("width") == 64 + 13)
    assert(r0.getAs[Long]("media_bytes") == 13L)      // ASCII text
    assert(r0.getAs[Long]("n_frames") == 1L)
  }

  test("frame sampling: n_frames rows per doc, stable md5 frame keys") {
    val big = Seq((7L, "x" * 250, 250L)).toDF("doc_id", "text", "n_chars")
    val f = Multimodal.sampleFrames(big).collect()
    assert(f.length == 3) // 250 div 100 + 1
    assert(f.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 1L, 2L))
    // frames 0 and 1 are identical 16-byte runs of 'x' → same key
    assert(f(0).getAs[String]("frame_key") == f(1).getAs[String]("frame_key"))
  }

  test("decodePpm parses header (incl. comments) and round-trips encodePpm") {
    val px = Array[Byte](0, 50, 100, -1, -106, 42) // 2x1, (255,150,42) 2nd px
    val enc = Multimodal.encodePpm(2, 1, px)
    val (w, h, got) = Multimodal.decodePpm(enc)
    assert((w, h) == (2, 1) && got.toSeq == px.toSeq)
    // a netpbm comment between magic and dims must be skipped
    val commented =
      "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++ px
    val (w2, h2, got2) = Multimodal.decodePpm(commented)
    assert((w2, h2) == (2, 1) && got2.toSeq == px.toSeq)
    // truncated body fails loudly rather than decoding garbage
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(enc.dropRight(1))
    }
  }

  test("feature extraction decodes real pixels: doc 0 statistics by hand") {
    // doc 0: w=4, h=3, r=13i%256, g=17i%256, b=29i%256 over i=0..11;
    // r,g never wrap (sum(i)=66 -> means 858,1122); b wraps from i=9
    // (261,290,319 -> 5,34,63), sum_b=1146; per-pixel luma floors
    // (299r+587g+114b)/1000 -> sum 1041, max at i=11 (159)
    val row = Multimodal.extractFeatures(docs).collect()
      .find(_.getLong(0) == 0L).get
    assert(row.getAs[Long]("width") == 4L)
    assert(row.getAs[Long]("height") == 3L)
    assert(row.getAs[Long]("mean_r_milli") == 71500L)
    assert(row.getAs[Long]("mean_g_milli") == 93500L)
    assert(row.getAs[Long]("mean_b_milli") == 95500L)
    assert(row.getAs[Long]("mean_luma_milli") == 86750L)
    assert(row.getAs[Long]("max_luma") == 159L)
    assert(row.getAs[Long]("min_luma") == 0L)
  }

  test("resize box-downsamples real pixels: doc 0 summary by hand") {
    // doc 0: 4x3 -> 2x1; block means: (32,42,72) and (58,76,130);
    // thumb_sum=410; orig="P6\n4 3\n255\n"+36=47; thumb="P6\n2 1\n255\n"+6=17
    val r = Multimodal.resize(docs).collect().find(_.getLong(0) == 0L).get
    assert(r.getAs[Long]("new_width") == 2L)
    assert(r.getAs[Long]("new_height") == 1L)
    assert(r.getAs[Long]("orig_bytes") == 47L)
    assert(r.getAs[Long]("thumb_bytes") == 17L)
    assert(r.getAs[Long]("thumb_sum") == 410L)
  }

  test("decodeWav round-trips makeWav, walks the odd-pad LIST chunk") {
    // doc 0 carries the LIST chunk (0 % 4 == 0) with its odd-size pad
    // byte; doc 1 is the plain fmt+data layout — both must decode to the
    // recipe samples at the recipe rate
    Seq(0L, 1L).foreach { d =>
      val (rate, s) = Multimodal.decodeWav(Multimodal.makeWav(d))
      assert(rate == Multimodal.WavRate)
      assert(s.toSeq == Multimodal.wavSamples(d).toSeq)
    }
    // corruption fails loudly rather than decoding garbage
    val wav = Multimodal.makeWav(1L)
    intercept[IllegalArgumentException] { // truncated: RIFF size mismatch
      Multimodal.decodeWav(wav.dropRight(2))
    }
    intercept[IllegalArgumentException] { // stereo fmt is rejected
      val bad = wav.clone(); bad(22) = 2 // fmt channels field
      Multimodal.decodeWav(bad)
    }
  }

  test("audio features decode real PCM: doc 0 statistics by hand") {
    // doc 0: n=64, s_i = 57i - 2000 (57*63 = 3591 < 4001, no wrap);
    // peak 2000 (i=0), one sign change at i=36 (s_35 = -5, s_36 = 52),
    // sum s^2 = 73,634,656 -> mean_square 1,150,541; 64 samples at
    // 8 kHz -> 8 ms
    val row = Multimodal.audioFeatures(docs).collect()
      .find(_.getLong(0) == 0L).get
    assert(row.getAs[Long]("sample_rate") == 8000L)
    assert(row.getAs[Long]("n_samples") == 64L)
    assert(row.getAs[Long]("duration_ms") == 8L)
    assert(row.getAs[Long]("peak") == 2000L)
    assert(row.getAs[Long]("mean_square") == 1150541L)
    assert(row.getAs[Long]("zero_crossings") == 1L)
  }

  test("audio frames: ragged tail frame carries its own exact energy") {
    // doc 1: n = 65 -> frames of 64 + 1; the tail sample is
    // s_64 = (31 + 64*57) % 4001 - 2000 = 1679 -> energy 1679^2
    val f = Multimodal.audioFrames(docs).collect()
      .filter(_.getLong(0) == 1L)
    assert(f.map(r => (r.getAs[Long]("frame_idx"),
      r.getAs[Long]("frame_samples"))).toSeq == Seq((0L, 64L), (1L, 1L)))
    assert(f.last.getAs[Long]("energy") == 1679L * 1679L)
    // frame 0 of doc 0 covers the whole 64-sample clip -> equals the
    // clip-level mean_square
    val f0 = Multimodal.audioFrames(docs).collect()
      .find(r => r.getLong(0) == 0L && r.getLong(1) == 0L).get
    assert(f0.getAs[Long]("energy") == 1150541L)
  }

  // Driver-side reference aHash straight from the fixture recipe —
  // independent of the operator's decode/sampling/hex code paths.
  private def refPhash(d: Long): (Long, Long, String) = {
    val planted = d % 10 == 9
    val e = if (planted) d - 9 else d
    val w = 16 + e % 17; val h = 12 + e % 13
    val lum = (0 until 64).map { gi =>
      val i = (gi / 8) * h / 8 * w + (gi % 8) * w / 8
      val r0 = (e * 7 + i * 13) % 256
      val r = if (planted && Set(0L, 5L, 11L)(i)) math.min(r0, 223) + 32 else r0
      (299 * r + 587 * ((e * 11 + i * 17) % 256) +
        114 * ((e * 3 + i * 29) % 256)) / 1000
    }
    val mean = lum.sum / 64
    val hex = (0 until 8).map { gy =>
      f"${(0 until 8).map(gx => if (lum(gy * 8 + gx) > mean) 1 << (7 - gx) else 0).sum}%02x"
    }.mkString
    (w, h, hex)
  }

  test("image hashes match a recipe-level reference; layout-invariant") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Multimodal.imageHashes(real).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
    assert(got.length == 500)
    got.foreach { case (d, t) => assert(t == refPhash(d), s"doc $d") }
    // map-only derivation: partitioning must not move or change rows
    val re = Multimodal.imageHashes(real.repartition(13)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
    assert(re.toSeq == got.toSeq)
  }

  test("banded image near-dup equals brute-force Hamming at radius 3") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Multimodal.imageNearDups(real).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // every planted twin is found (twin hamming ≤ 3 over the shipped
    // corpora), at the distance the reference hash computes
    val hashes = (0L until 500L).map(d => d -> refPhash(d)._3).toMap
    def ham(a: String, b: String): Long =
      java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^
          java.lang.Long.parseUnsignedLong(b, 16)).toLong
    (9L until 500L by 10L).foreach { d =>
      assert(pairs.get((d - 9, d)).contains(ham(hashes(d - 9), hashes(d))),
        s"planted twin ($d - 9, $d) missing or mis-distanced")
    }
    // pigeonhole completeness: the banded candidate set loses NOTHING at
    // radius ≤ 3 — brute-force over all hash pairs gives the same set
    val brute = (for {
      a <- 0L until 500L; b <- (a + 1) until 500L
      h = ham(hashes(a), hashes(b)) if h <= 3
    } yield (a, b) -> h).toMap
    assert(pairs == brute)
    // radius > 3 would break the 4-band pigeonhole guarantee — rejected
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDups(real, maxHamming = 4)
    }
  }

  // Driver-side reference fingerprint straight from the fixture recipe —
  // independent of the operator's WAV decode / framing / bit-packing.
  private def refAudioFp(d: Long): (Long, String) = {
    val planted = d % 10 == 7
    val e = if (planted) d - 7 else d
    val n = (544 + e % 225).toInt
    val s = (0 until n).map { i =>
      val b = ((e * 31 + 7) * (i + 1L) * (i + 2L) % 4001) - 2000
      if (planted) b * 31 / 32 else b
    }
    val nf = n / 16
    val en = (0 until nf).map(f =>
      (f * 16 until f * 16 + 16).map(i => s(i) * s(i)).sum)
    val v = (0 until math.min(32, nf - 1))
      .filter(b => en(b + 1) > en(b)).map(b => 1L << (31 - b)).sum
    (nf.toLong, f"$v%08x")
  }

  test("audio fingerprints match a recipe-level reference") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Multimodal.audioFingerprints(real).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
    assert(got.length == 500)
    got.foreach { case (d, t) => assert(t == refAudioFp(d), s"doc $d") }
  }

  test("banded audio near-dup equals brute-force Hamming at radius 3") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Multimodal.audioNearDups(real).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val fps = (0L until 500L).map(d => d -> refAudioFp(d)._2).toMap
    def ham(a: String, b: String): Long =
      java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^
          java.lang.Long.parseUnsignedLong(b, 16)).toLong
    // every planted gain-twin is found: a uniform gain preserves the
    // energy contour up to truncation ties (measured: Hamming ≤ 1 over
    // the shipped corpora)
    (7L until 500L by 10L).foreach { d =>
      val h = pairs.get((d - 7, d))
      assert(h.contains(ham(fps(d - 7), fps(d))) && h.get <= 1L,
        s"planted gain-twin ($d - 7, $d) missing or mis-distanced")
    }
    // pigeonhole completeness at radius ≤ 3
    val brute = (for {
      a <- 0L until 500L; b <- (a + 1) until 500L
      h = ham(fps(a), fps(b)) if h <= 3
    } yield (a, b) -> h).toMap
    assert(pairs == brute)
    intercept[IllegalArgumentException] {
      Multimodal.audioNearDups(real, maxHamming = 4)
    }
  }

  // 64-bit twin of refAudioFp over the longer-clip recipe.
  private def refAudioFp64(d: Long): (Long, String) = {
    val planted = d % 10 == 7
    val e = if (planted) d - 7 else d
    val n = (1056 + e % 225).toInt
    val s = (0 until n).map { i =>
      val b = ((e * 31 + 7) * (i + 1L) * (i + 2L) % 4001) - 2000
      if (planted) b * 31 / 32 else b
    }
    val nf = n / 16
    val en = (0 until nf).map(f =>
      (f * 16 until f * 16 + 16).map(i => s(i) * s(i)).sum)
    val v = (0 until math.min(64, nf - 1))
      .filter(b => en(b + 1) > en(b)).map(b => 1L << (63 - b))
      .foldLeft(0L)(_ | _)
    (nf.toLong, f"$v%016x")
  }

  test("64-bit audio path: recipe-level parity, brute equality, twins found") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Multimodal.audioFingerprints64(real).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
    assert(got.length == 500)
    got.foreach { case (d, t) => assert(t == refAudioFp64(d), s"doc $d") }
    // clips long enough for a complete 64-delta contour
    got.foreach { case (d, (nf, _)) => assert(nf >= 65, s"doc $d nf=$nf") }
    val pairs = Multimodal.audioNearDups64(real).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val fps = (0L until 500L).map(d => d -> refAudioFp64(d)._2).toMap
    def ham(a: String, b: String): Long =
      java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^
          java.lang.Long.parseUnsignedLong(b, 16)).toLong
    // the longer contour keeps every planted gain-twin within the radius
    (7L until 500L by 10L).foreach { d =>
      val h = pairs.get((d - 7, d))
      assert(h.contains(ham(fps(d - 7), fps(d))) && h.get <= 3L,
        s"planted gain-twin ($d - 7, $d) missing or mis-distanced")
    }
    // pigeonhole completeness at radius ≤ 3 over 4×16-bit bands
    val brute = (for {
      a <- 0L until 500L; b <- (a + 1) until 500L
      h = ham(fps(a), fps(b)) if h <= 3
    } yield (a, b) -> h).toMap
    assert(pairs == brute)
  }

  test("fingerprint admission equals the smaller-id-neighbor rule") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val cut = 499L * 4 / 5 // the 80/20 split the queries use
    val got = Multimodal.fingerprintAdmission(
      Multimodal.audioFingerprints(real.filter(col("doc_id") < cut)),
      Multimodal.audioFingerprints(real.filter(col("doc_id") >= cut)),
      "afp", 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    def ham(a: String, b: String): Long =
      java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^
          java.lang.Long.parseUnsignedLong(b, 16)).toLong
    val fps = (0L until 500L).map(d => d -> refAudioFp(d)._2).toMap
    val exp = (cut until 500L).map { d =>
      val canon = (0L until d).find(a => ham(fps(a), fps(d)) <= 3)
      d -> (canon.getOrElse(d), canon.isEmpty)
    }.toMap
    assert(got == exp)
    // the planted gain-twins in the batch are refused against their
    // index-side source without the index media ever being re-decoded
    assert((cut until 500L).filter(_ % 10 == 7).forall(d => !got(d)._2))
  }

  /** Reference video fingerprint straight from the fixture recipe —
    * frame luma sums via [[Multimodal.vfpLuma]], contour bit f (MSB
    * first) iff frame f+1 is strictly brighter — independent of the
    * Y4M binary decode path under test.
    */
  private def refVideoFp(d: Long): String = {
    val (w, h, nf) = Multimodal.vfpDims(d)
    val sums = (0 until nf).map(f =>
      (0 until w * h).map(i => Multimodal.vfpLuma(d, f, i).toLong).sum)
    var fp = 0L
    for (b <- 0 until 32 if b + 1 < nf)
      if (sums(b + 1) > sums(b)) fp |= 1L << (31 - b)
    f"$fp%08x"
  }

  test("cross-modal gate composes per-modality duplicate flags") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Multimodal.cleanMultimodalCorpus(real).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got.size == 500)
    def ham(a: String, b: String): Long =
      java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^
          java.lang.Long.parseUnsignedLong(b, 16)).toLong
    val texts = real.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ph = (0L until 500L).map(d => d -> refPhash(d)._3).toMap
    val af = (0L until 500L).map(d => d -> refAudioFp(d)._2).toMap
    val vf = (0L until 500L).map(d => d -> refVideoFp(d)).toMap
    (0L until 500L).foreach { d =>
      val t = (0L until d).exists(a => texts(a) == texts(d))
      val i = (0L until d).exists(a => ham(ph(a), ph(d)) <= 3)
      val u = (0L until d).exists(a => ham(af(a), af(d)) <= 3)
      val v = (0L until d).exists(a => ham(vf(a), vf(d)) <= 3)
      assert(got(d) == ((t, i, u, v, !(t || i || u || v))), s"doc $d")
    }
    // the planted brightness-shifted twins (doc ≡ 8 mod 10 replays
    // doc−8's clip at +5 luma) must be flagged as video duplicates
    assert((8L until 500L by 10L).forall(d => got(d)._4))
  }

  test("decodeY4m parses header tags and FRAME markers; rejects corruption") {
    // doc 0: single-scene (0 % 3 == 0) AND carries the private Xgrft
    // header tag (0 % 5 == 0) the decoder must skip; doc 1: scene cut
    Seq(0L, 1L).foreach { d =>
      val (w, h, nf, sc) = Multimodal.videoDims(d)
      val (gw, gh, frames) = Multimodal.decodeY4m(Multimodal.makeY4m(d))
      assert((gw, gh, frames.length) == (w, h, nf), s"doc $d dims")
      for (f <- 0 until nf; i <- 0 until w * h)
        assert((frames(f)(i) & 0xff) == Multimodal.videoLuma(d, sc, f, i),
          s"doc $d frame $f pixel $i")
    }
    val y4m = Multimodal.makeY4m(1L)
    intercept[IllegalArgumentException] { // truncated last frame
      Multimodal.decodeY4m(y4m.dropRight(1))
    }
    intercept[IllegalArgumentException] { // non-mono chroma is rejected
      val s = new String(y4m, "ISO-8859-1").replace("Cmono", "C420j")
      Multimodal.decodeY4m(s.getBytes("ISO-8859-1"))
    }
  }

  test("video frame stats match a recipe-level reference on sf0.001") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Multimodal.videoFrameStats(real).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    (0L until 500L).foreach { d =>
      val (w, h, nf, sc) = Multimodal.videoDims(d)
      val n = w * h
      (0 until nf).foreach { f =>
        val ys = (0 until n).map(i => Multimodal.videoLuma(d, sc, f, i))
        val sad = if (f == 0) 0L else (0 until n).map(i =>
          math.abs(ys(i) - Multimodal.videoLuma(d, sc, f - 1, i)).toLong).sum
        val exp = (ys.map(_.toLong).sum * 1000 / n, sad,
          f > 0 && sad > Multimodal.VideoCutThreshold * n)
        assert(got((d, f.toLong)) == exp, s"doc $d frame $f")
      }
    }
    // detection result across the corpus: exactly one cut at nf/2 for
    // d % 3 != 0 (the margin is deterministic: 2n drift vs ~50n cut)
    val cuts = got.collect { case ((d, f), (_, _, true)) => (d, f) }.toSet
    assert(cuts == (0L until 500L).filter(_ % 3 != 0)
      .map(d => (d, (Multimodal.videoDims(d)._3 / 2).toLong)).toSet)
  }

  test("video scenes: cut count and keyframe list per clip") {
    val s = Multimodal.videoScenes(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4),
        r.getAs[String]("keyframes"))).toMap
    assert(s(0L) == ((4L, 0L, "0")))      // d=0: nf=4, single scene
    assert(s(1L) == ((5L, 1L, "0,2")))    // d=1: nf=5, cut at 5/2=2
  }

  test("langId: argmax with fixed tie-break order") {
    val d = Seq(
      (0L, "the a the"),          // en markers dominate
      (1L, "hash scan hash"),     // zh markers dominate
      (2L, "nothing matches")     // all-zero → tie → 'en' first
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    assert(out == Map(0L -> "en", 1L -> "zh", 2L -> "en"))
  }

  test("quality: integer round-half-up basis points") {
    // "a a a a": 4 tokens, 1 distinct → ttr 2500 bp exactly
    val out = TextAnalysis.qualityScore(docs).collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Long]("n_tokens") == 4L)
    assert(r1.getAs[Long]("ttr_bp") == 2500L)
    assert(r1.getAs[Long]("stop_cnt") == 4L)
  }

  test("repetition: hand-computed grams on planted repeats; short docs skipped") {
    val d = Seq(
      (0L, "x y x y x y"),  // 2-grams: 3×"x y", 2×"y x" of 5; 3-grams: 2 distinct of 4
      (1L, "a b c d"),      // no repeats: top2 1/3, dup3 0/2
      (2L, "p q")           // < 3 tokens → skipped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (0L, 6L, 6000L, 5000L),   // (3*20000+5) div 10 = 6000; (2*20000+4) div 8 = 5000
      (1L, 4L, 3333L, 0L)))     // (1*20000+3) div 6 = 3333
  }

  test("pii: planted positives are counted and redacted byte-for-byte") {
    val d = Seq((1L, "reach doc5@mail.example or 555-1234 at 10.1.2.3 ok"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(d).collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == ((1L, 1L, 1L)))
    val expected = Seq("reach <EMAIL> or <PHONE> at <IP> ok").toDF("t")
      .select(md5(col("t"))).head().getString(0)
    assert(out.getString(4) == expected)
  }

  test("pii: synthetic injection yields the id-derived counts on sf0.001") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.piiRedact(TextAnalysis.withSyntheticPii(real))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 2L else 1L), s"emails doc $id")
      assert(r.getLong(2) == 1L, s"phones doc $id")
      assert(r.getLong(3) == 1L, s"ips doc $id")
    }
  }

  test("bigram LM: exact conditional ppm on a fixed fixture") {
    import spark.implicits._
    val fixture = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    // c1: a=2 b=2 c=1 d=1; c2: "a b"=2, "b c"=1, "b d"=1
    // cond_ppm: a->b = 2e6/2 = 1000000; b->c = b->d = 1e6/2 = 500000
    val got = TextAnalysis.bigramLmScore(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 750000L, 500000L),
      (2L, 2L, 750000L, 500000L)), s"got ${got.toSeq}")
    // fluency discrimination: a doc of repeated high-probability
    // transitions outscores one pairing the same tokens randomly
    val d2 = Seq((1L, "x y x y x y x y"), (2L, "y y x x y x y x"))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.bigramLmScore(d2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(1L) > scores(2L),
      s"fluent chain must outscore shuffled tokens: $scores")
  }

  test("bm25 search: rare-term docs outrank common-term docs, ranks dense") {
    import spark.implicits._
    // 'rare' appears in one doc, 'common' in all; same lengths — the
    // rare-term doc must win on idf alone
    val fixture = Seq(
      (1L, "common alpha beta gamma"), (2L, "common rare beta gamma"),
      (3L, "common alpha beta gamma"), (4L, "common alpha beta gamma"))
      .toDF("doc_id", "text")
    val hits = TextAnalysis.searchBm25(fixture, Seq("common", "rare"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(hits.head._1 == 2L, s"rare-term doc must rank first: ${hits.toSeq}")
    assert(hits.head._3 == 2L, "top doc hits both terms")
    assert(hits.map(_._4).toSeq == (1L to hits.length).toSeq, "dense ranks")
    // real corpus: every hit contains at least one query term; scores
    // are non-increasing in rank
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val top = TextAnalysis.searchBm25(real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.nonEmpty)
    assert(top.sliding(2).forall { case Array(a, b) => a._2 >= b._2 },
      "scores must be non-increasing in rank order")
    val ids = top.map(_._1).toSeq
    val withTerm = real
      .filter(col("doc_id").isin(ids: _*))
      .filter(col("text").contains("customer") || col("text").contains("join")
        || col("text").contains("dup"))
      .count()
    assert(withTerm == ids.length, "every hit contains a query term")
  }
}
