package graft

import graft.functions.TextAnalysis

/** Deterministic word-level BPE: training argmax order, greedy merge
  * application, pre-tokenization normalization, and the id-encoding
  * contract — all against hand-computed expectations (the Sennrich et al.
  * 2016 low/lower/newest/widest corpus, adapted to the no-end-of-word
  * variant this engine ships).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word counts: low×5, lower×2, newest×6, widest×3
  private def sennrichDocs = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  test("trainBpeMerges reproduces the hand-computed merge table") {
    val got = TextAnalysis.trainBpeMerges(sennrichDocs, numMerges = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // overlap-weighted pair counts, argmax (count DESC, lhs, rhs):
    // round 1: (e,s)=9 ties (s,t)=9, lex picks (e,s); then each cascade
    // below follows from re-counting after the greedy application.
    val expected = Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L),
      (5L, "e", "w", "ew", 6L),
      (6L, "ew", "est", "ewest", 6L),
      (7L, "n", "ewest", "newest", 6L),
      (8L, "d", "est", "dest", 3L),
      (9L, "i", "dest", "idest", 3L),
      (10L, "w", "idest", "widest", 3L))
    assert(got.toSeq == expected)
  }

  test("encodeBpe emits dense count-ranked ids in word order") {
    // after 10 merges: low→[low], lower→[low,e,r], newest→[newest],
    // widest→[widest]; symbol counts: low=7, newest=6, widest=3, e=2, r=2
    // → ids low=1, newest=2, widest=3, e=4, r=5
    val got = TextAnalysis.encodeBpe(sennrichDocs, numMerges = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val expected = Seq(
      (1L, 5L, 5L, "1 1 1 1 1"),
      (2L, 2L, 6L, "1 4 5 1 4 5"),
      (3L, 6L, 6L, "2 2 2 2 2 2"),
      (4L, 3L, 3L, "3 3 3"))
    assert(got.toSeq == expected)
  }

  test("merge application is greedy leftmost (aaa -> aa,a)") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // (a,a) counts BOTH overlapping positions per word: 2 words × 2 = 4;
    // applying it pairs leftmost-first, so round 2 merges (aa,a), not
    // (a,aa)
    val merges = TextAnalysis.trainBpeMerges(docs, numMerges = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(merges.toSeq == Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "aa", "a", "aaa", 2L)))
    val enc = TextAnalysis.encodeBpe(docs, numMerges = 1).collect()
    // one merge: aaa → [aa, a] per word; counts aa=2, a=2 → ids aa=2, a=1
    // ((count DESC, sym ASC): tie at 2 → "a" before "aa")
    assert(enc.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSeq == Seq((1L, 2L, 4L, "2 1 2 1")))
  }

  test("pre-tokenization lowercases and drops non-[a-z]+ words") {
    val docs = Seq(
      (1L, "The the THE x9 ab!c the"),
      (2L, "9000 !!")).toDF("doc_id", "text")
    // only 'the'×4 survives; pairs (t,h)=4 and (h,e)=4 tie → lex (h,e)
    val merges = TextAnalysis.trainBpeMerges(docs, numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq == Seq(("h", "e", 4L)))
    // doc 2 has no alphabetic words: it drops out of the encoding
    val enc = TextAnalysis.encodeBpe(docs, numMerges = 1)
    assert(enc.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("training fails loudly when pairs run out") {
    val docs = Seq((1L, "a b ab")).toDF("doc_id", "text")
    // exactly one adjacent pair (a,b) exists; round 2 finds nothing
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.trainBpeMerges(docs, numMerges = 2).collect()
    }
    assert(e.getMessage.contains("exhausted"))
  }

  test("kernel application equals the chained-replace spelling on arbitrary tables") {
    import org.apache.spark.sql.functions.col
    // the semantics pin: graft_bpe_encode must match the chained
    // numMerges-replace projection (the oracle's shape) for ANY table —
    // including the rank-SKIP case that separates chained semantics from
    // an HF-style from-zero min-rank loop: here rank 3 CREATES the
    // symbol "abc" that rank 2's pair (x, abc) wants, but chained passed
    // rank 2 already, so the word must stay [x, abc], never [xabc]
    val adv = Seq(("a", "b"), ("x", "abc"), ("ab", "c"))
    val advDf = Seq("xabc").toDF("word")
    val advGot = advDf.select(
      graft.functions.BpeOps.encodeNative(spark, col("word"), adv).as("k"),
      TextAnalysis.bpeChainedSyms(col("word"), adv).as("c")).head()
    assert(advGot.getSeq[String](0) == Seq("x", "abc"),
      s"kernel must skip already-passed ranks, got ${advGot.getSeq[String](0)}")
    assert(advGot.getSeq[String](0) == advGot.getSeq[String](1))
    // random tables (duplicate pairs allowed) × random words: parity holds
    // for every table, trained or not
    val rnd = new scala.util.Random(20260815L)
    def sym(): String =
      (0 until (1 + rnd.nextInt(2))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    (1 to 12).foreach { t =>
      val merges = (0 until (1 + rnd.nextInt(12))).map(_ => (sym(), sym()))
      val words = (0 until 60).map(_ =>
        (0 until (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val rows = words.toDF("word").select(col("word"),
        graft.functions.BpeOps.encodeNative(spark, col("word"), merges).as("k"),
        TextAnalysis.bpeChainedSyms(col("word"), merges).as("c")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"table $t diverged on '${r.getString(0)}' under $merges: " +
            s"kernel ${r.getSeq[String](1)} vs chained ${r.getSeq[String](2)}")
      }
    }
  }

  test("kernel at 1k+ merges equals a driver-side chained reference") {
    import org.apache.spark.sql.functions.col
    // the production-vocabulary regime the chained plan cannot reach (a
    // 1200-replace projection): train 1200 merges locally on a synthetic
    // rich vocabulary (the sf0.001 fixture exhausts pairs at 89), then
    // pin the kernel word-for-word to a plain-Scala full-pass-per-rank
    // reference
    val rnd = new scala.util.Random(42L)
    val types: Array[(String, Long)] = (0 until 4000).map { _ =>
      val w = (0 until (4 + rnd.nextInt(11)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w, (1 + rnd.nextInt(50)).toLong)
    }.distinct.toArray
    val merges = TextAnalysis.bpeMergesLocal(types, numMerges = 1200)
      .map(m => (m._2, m._3))
    def chainedRef(word: String): Seq[String] = {
      var syms = word.map(_.toString).toArray
      merges.foreach { case (l, r) =>
        if (syms.length > 1) {
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
      }
      syms.toSeq
    }
    val got = types.map(_._1).toSeq.toDF("word")
      .select(col("word"),
        graft.functions.BpeOps.encodeNative(spark, col("word"), merges).as("k"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    types.map(_._1).foreach { w =>
      assert(got(w) == chainedRef(w), s"1200-merge divergence on '$w'")
    }
  }

  test("property: engine BPE equals a driver-side reference on random corpora") {
    // independent reference implementation: mutable pair counting +
    // cursor-based greedy-leftmost application over symbol vectors (no
    // string replace / no delimiter encoding — a genuinely different
    // spelling of the same contract)
    def refBpe(counts: Map[String, Long], k: Int)
        : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
      var symsOf = counts.keys.map(w => w -> w.map(_.toString).toVector).toMap
      val merges = Seq.newBuilder[(String, String, Long)]
      for (_ <- 1 to k) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        symsOf.foreach { case (w, ss) =>
          ss.zip(ss.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + counts(w))
        }
        assert(pc.nonEmpty, "reference ran out of pairs — weaken the fixture")
        val ((lhs, rhs), cnt) = pc.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((lhs, rhs, cnt))
        symsOf = symsOf.map { case (w, ss) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == lhs && ss(i + 1) == rhs) {
              out += lhs + rhs; i += 2
            } else { out += ss(i); i += 1 }
          }
          w -> out.result()
        }
      }
      (merges.result(), symsOf)
    }
    for (seed <- 1L to 5L) {
      val rnd = new scala.util.Random(seed)
      // 8 distinct word types over {a,b,c} (index-keyed last char keeps
      // them distinct so the pair pool cannot collapse), sampled into docs
      val pool = (0 until 8).map(i =>
        List.fill(3 + rnd.nextInt(3))("abc" (rnd.nextInt(3))).mkString
          + ("abc" (i % 3)))
      val docs = (0L until 6L).map(d =>
        (d, List.fill(12)(pool(rnd.nextInt(pool.size))).mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      val counts = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val k = 4
      val (wantMerges, finalSyms) = refBpe(counts, k)
      val gotMerges = TextAnalysis.trainBpeMerges(df, k).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(gotMerges == wantMerges, s"seed $seed merge tables differ")
      // id contract: dense (count desc, sym) over the final inventory
      val symCounts = docs.flatMap(_._2.split(" "))
        .flatMap(finalSyms).groupBy(identity).view.mapValues(_.size).toSeq
      val idOf = symCounts.sortBy { case (s, n) => (-n, s) }
        .zipWithIndex.map { case ((s, _), i) => s -> (i + 1L) }.toMap
      val got = TextAnalysis.encodeBpe(df, k).collect()
      assert(got.length == docs.size)
      got.foreach { r =>
        val want = docs.toMap.apply(r.getLong(0)).split(" ").toSeq
          .flatMap(finalSyms).map(idOf)
        assert(r.getString(3).split(" ").map(_.toLong).toSeq == want,
          s"seed $seed doc ${r.getLong(0)} encoding differs")
      }
    }
  }

  test("distributed training path equals the driver-side path") {
    // bpeMerges auto-selects the driver-side path for every corpus this
    // suite can build (the cutover is 100k word types), so the distributed
    // loop — the 100 TB path — needs its own parity pin against the same
    // inputs, including an argmax tie (sennrich: (e,s) vs (s,t))
    import org.apache.spark.sql.functions._
    def typeCounts(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val corpora = Seq(
      sennrichDocs -> 10,
      Seq((1L, "aaa aaa")).toDF("doc_id", "text") -> 2) ++
      (1L to 3L).map { seed =>
        val rnd = new scala.util.Random(seed)
        val pool = (0 until 8).map(i =>
          List.fill(3 + rnd.nextInt(3))("abc" (rnd.nextInt(3))).mkString
            + ("abc" (i % 3)))
        (0L until 6L).map(d =>
          (d, List.fill(12)(pool(rnd.nextInt(pool.size))).mkString(" ")))
          .toDF("doc_id", "text") -> 4
      }
    corpora.foreach { case (df, k) =>
      val tc = typeCounts(df)
      val local = TextAnalysis.bpeMergesLocal(
        tc.collect().map(r => (r.getString(0), r.getLong(1))), k)
      val dist = TextAnalysis.bpeMergesDistributed(tc, k)
      assert(dist == local)
    }
  }

  test("property: frozen-artifact encode equals a frozen driver reference") {
    // train on the first 4 docs, encode the last 2 with the frozen
    // tables; the reference applies the trained merges cursor-based to
    // each BATCH word (including words the training corpus never saw)
    // and maps symbols through the frozen id table with OOV -> 0
    for (seed <- 11L to 15L) {
      val rnd = new scala.util.Random(seed)
      val pool = (0 until 8).map(i =>
        List.fill(3 + rnd.nextInt(3))("abc" (rnd.nextInt(3))).mkString
          + ("abcd" (i % 4))) // 'd' appears in some words: real OOV odds
      val docs = (0L until 6L).map(d =>
        (d, List.fill(12)(pool(rnd.nextInt(pool.size))).mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      val trainDocs = docs.filter(_._1 < 4L)
      val k = 4
      val counts = trainDocs.flatMap(_._2.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      // reference merges + frozen vocab over the TRAINING corpus
      def applyMerges(word: String,
                      merges: Seq[(String, String)]): Vector[String] =
        merges.foldLeft(word.map(_.toString).toVector) { case (ss, (l, r)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
              out += l + r; i += 2
            } else { out += ss(i); i += 1 }
          }
          out.result()
        }
      var symsOf = counts.keys.map(w => w -> w.map(_.toString).toVector).toMap
      val refMerges = Seq.newBuilder[(String, String)]
      for (_ <- 1 to k) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        symsOf.foreach { case (w, ss) =>
          ss.zip(ss.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + counts(w))
        }
        val ((lhs, rhs), _) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        refMerges += ((lhs, rhs))
        symsOf = symsOf.map { case (w, _) =>
          w -> applyMerges(w, refMerges.result())
        }
      }
      val merges = refMerges.result()
      val frozenCounts = counts.toSeq
        .flatMap { case (w, c) => symsOf(w).map(_ -> c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val idOf = frozenCounts.sortBy { case (s, n) => (-n, s) }
        .zipWithIndex.map { case ((s, _), i) => s -> (i + 1L) }.toMap
      val (mDf, vDf) = TextAnalysis.bpeArtifacts(df.filter($"doc_id" < 4L), k)
      val got = TextAnalysis.encodeBpeWith(
        mDf, vDf, df.filter($"doc_id" >= 4L)).collect()
      assert(got.length == 2, s"seed $seed batch row count")
      got.foreach { r =>
        val want = docs.toMap.apply(r.getLong(0)).split(" ").toSeq
          .flatMap(w => applyMerges(w, merges))
          .map(s => idOf.getOrElse(s, 0L))
        assert(r.getString(3).split(" ").map(_.toLong).toSeq == want,
          s"seed $seed doc ${r.getLong(0)} frozen encoding differs")
      }
    }
  }

  test("frozen artifacts reproduce whole-corpus encode when batch = corpus") {
    // when the batch IS the training corpus, the frozen vocabulary's
    // token-weighted type counts equal encodeBpe's per-token counts, so
    // the two paths must agree id-for-id
    val (m, v) = TextAnalysis.bpeArtifacts(sennrichDocs, numMerges = 10)
    val inc = TextAnalysis.encodeBpeWith(m, v, sennrichDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val whole = TextAnalysis.encodeBpe(sennrichDocs, numMerges = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(inc.toSeq == whole.toSeq)
  }

  test("frozen artifacts survive a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_art_")
    try {
      val (m, v) = TextAnalysis.bpeArtifacts(sennrichDocs, numMerges = 4)
      m.write.parquet(dir.resolve("merges").toString)
      v.write.parquet(dir.resolve("vocab").toString)
      val inc = TextAnalysis.encodeBpeWith(
        spark.read.parquet(dir.resolve("merges").toString),
        spark.read.parquet(dir.resolve("vocab").toString),
        sennrichDocs).collect().map(r => (r.getLong(0), r.getString(3)))
      val whole = TextAnalysis.encodeBpe(sennrichDocs, numMerges = 4)
        .collect().map(r => (r.getLong(0), r.getString(3)))
      assert(inc.toSeq == whole.toSeq)
    } finally
      graft.streaming.StreamingSessions.deleteRecursively(dir)
  }

  test("frozen vocab encodes unseen batch symbols as OOV id 0") {
    // training corpus is 'abc'×4 only: merges (a,b)→ab then (ab,c)→abc
    // consume 'ab' entirely, so the frozen vocabulary is exactly {abc}
    val train = Seq((1L, "abc abc abc abc")).toDF("doc_id", "text")
    val (m, v) = TextAnalysis.bpeArtifacts(train, numMerges = 2)
    assert(v.select("sym").as[String].collect().toSeq == Seq("abc"))
    // batch: 'ab' survives as a standalone symbol after merge 1 (merge 2
    // finds no following c) → OOV 0; 'z' was never a training symbol →
    // OOV 0; 'abc' encodes as id 1
    val batch = Seq((10L, "ab abc z")).toDF("doc_id", "text")
    val got = TextAnalysis.encodeBpeWith(m, v, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((10L, 3L, 3L, "0 1 0")))
  }

  test("byte-level training merges multi-byte UTF-8 sequences") {
    // é = c3 a9: the word 'éé' is bytes [c3, a9, c3, a9]; pair counts over
    // 2 occurrences: (c3,a9)=4 (two per word), (a9,c3)=2 → merge 1 fuses
    // the é bytes back into one symbol, merge 2 fuses the two és
    val docs = Seq((1L, "éé éé")).toDF("doc_id", "text")
    val got = TextAnalysis.trainBpeBytesMerges(docs, numMerges = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "c3", "a9", "c3a9", 4L),
      (2L, "c3a9", "c3a9", "c3a9c3a9", 2L)))
  }

  test("byte-level encode: dense ids over hex symbols, no OOV possible") {
    // after merge 1 ((c3,a9)→c3a9): 'éé'→[c3a9,c3a9], 'é'→[c3a9] —
    // vocabulary is exactly {c3a9} with count 3 → id 1
    val docs = Seq((1L, "éé é")).toDF("doc_id", "text")
    val got = TextAnalysis.encodeBpeBytes(docs, numMerges = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 2L, 3L, "1 1 1")))
  }

  test("byte-level pre-tokenization keeps every non-empty token") {
    // unlike the char-level [a-z]+ filter, byte BPE closes over ALL input:
    // digits, punctuation, and CJK all tokenize (that is its point)
    val docs = Seq((1L, "x9 ab!c 漢字"), (2L, "!!")).toDF("doc_id", "text")
    val enc = TextAnalysis.encodeBpeBytes(docs, numMerges = 1).collect()
    assert(enc.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (2L, 1L)))
    // 漢字 is 6 UTF-8 bytes; total byte count survives a 0-fire merge only
    // if no pair repeats — here (21,21) from '!!' fires, so just check
    // every doc's n_tokens ≤ its UTF-8 byte count and > 0
    enc.foreach(r => assert(r.getLong(2) > 0L))
  }

  test("byte-level kernel equals the chained-replace spelling (incl. rank skip)") {
    import org.apache.spark.sql.functions.col
    // the char-level rank-skip case transcribed to the hex domain
    // (a=61 b=62 c=63 x=78, word "xabc"): rank 3 creates '616263' that
    // rank 2's pair (78, 616263) wants, but chained already passed rank 2
    // — the word must stay [78, 616263], never [78616263]
    val adv = Seq(("61", "62"), ("78", "616263"), ("6162", "63"))
    val advGot = Seq("xabc").toDF("word").select(
      graft.functions.BpeOps.encodeNative(spark, col("word"), adv,
        byteLevel = true).as("k"),
      TextAnalysis.bpeChainedSymsBytes(col("word"), adv).as("c")).head()
    assert(advGot.getSeq[String](0) == Seq("78", "616263"),
      s"byte kernel rank handling: got ${advGot.getSeq[String](0)}")
    assert(advGot.getSeq[String](0) == advGot.getSeq[String](1))
    // random multi-byte words × random hex-domain tables: parity holds
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "aéø字!"
    def hexSym(): String = {
      val ch = alphabet(rnd.nextInt(alphabet.length)).toString
      val hx = ch.getBytes("UTF-8").map(b => f"${b & 0xff}%02x")
      val from = rnd.nextInt(hx.length)
      hx.slice(from, from + 1 + rnd.nextInt(2)).mkString
    }
    (1 to 8).foreach { t =>
      val merges = (0 until (1 + rnd.nextInt(10))).map(_ => (hexSym(), hexSym()))
      val words = (0 until 40).map(_ =>
        (0 until (1 + rnd.nextInt(6)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val rows = words.toDF("word").select(col("word"),
        graft.functions.BpeOps.encodeNative(spark, col("word"), merges,
          byteLevel = true).as("k"),
        TextAnalysis.bpeChainedSymsBytes(col("word"), merges).as("c")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"byte table $t diverged on '${r.getString(0)}' under $merges")
      }
    }
  }

  test("byte-level frozen artifacts reproduce whole-corpus encode; unseen merged symbol -> OOV 0") {
    // batch = training corpus: token-weighted frozen vocab counts equal
    // the per-token counts, so the two byte-level paths must agree
    val docs = Seq((1L, "éé é ab"), (2L, "ab éé"), (3L, "é ab ab"))
      .toDF("doc_id", "text")
    val (m, v) = TextAnalysis.bpeBytesArtifacts(docs, numMerges = 3)
    val inc = TextAnalysis.encodeBpeBytesWith(m, v, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val whole = TextAnalysis.encodeBpeBytes(docs, numMerges = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(inc.toSeq == whole.toSeq)
    // OOV: train on 'abc' only — merges (61,62)->6162, (6162,63)->616263
    // consume '6162' entirely, so a batch 'ab' (= standalone 6162) and a
    // byte never seen in training ('z' = 7a) both encode as id 0
    val train = Seq((1L, "abc abc abc abc")).toDF("doc_id", "text")
    val (m2, v2) = TextAnalysis.bpeBytesArtifacts(train, numMerges = 2)
    assert(v2.select("sym").as[String].collect().toSeq == Seq("616263"))
    val got = TextAnalysis.encodeBpeBytesWith(m2, v2,
      Seq((10L, "ab abc z")).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((10L, 3L, 3L, "0 1 0")))
  }

  test("byte-level path equals the char-level path on single-byte alphabets") {
    // for pure [a-z] corpora the two domains are isomorphic (char c ↔ its
    // one hex byte), so merge COUNTS and final token boundaries coincide;
    // ids coincide because both rank by (count DESC, sym ASC) over
    // order-isomorphic symbol sets (hex of [a-z] preserves lex order)
    val byteEnc = TextAnalysis.encodeBpeBytes(sennrichDocs, numMerges = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val charEnc = TextAnalysis.encodeBpe(sennrichDocs, numMerges = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(byteEnc.toSeq == charEnc.toSeq)
  }

  test("encoding round-trips: ids decode back to the document's words") {
    val docs = Seq(
      (1L, "streaming merge streaming window"),
      (2L, "window merge scan"),
      (3L, "scan scan streaming")).toDF("doc_id", "text")
    val k = 6
    val enc = TextAnalysis.encodeBpe(docs, numMerges = k).collect()
    // rebuild the id → symbol map exactly as encodeBpe defines it
    val merges = TextAnalysis.bpeMerges(docs, k)
    val symsOf: String => Seq[String] = { word =>
      var seq = word.flatMap(ch => s"..$ch") + ".."
      merges.foreach { case (_, lhs, rhs, _) =>
        seq = seq.replace(s".$lhs..$rhs.", s".$lhs$rhs.")
      }
      seq.split("\\.\\.").toSeq.filter(_.nonEmpty)
    }
    val words = docs.collect().flatMap(r =>
      r.getString(1).split(" ").filter(_.matches("[a-z]+"))
        .map(w => (r.getLong(0), w))).toSeq
    val counts = words.flatMap { case (_, w) => symsOf(w) }
      .groupBy(identity).view.mapValues(_.size).toSeq
    val idOf = counts.sortBy { case (s, n) => (-n, s) }
      .zipWithIndex.map { case ((s, _), i) => s -> (i + 1L) }.toMap
    val expect = words.groupBy(_._1).view.mapValues(ws =>
      ws.flatMap { case (_, w) => symsOf(w).map(idOf) }).toMap
    enc.foreach { r =>
      val ids = r.getString(3).split(" ").map(_.toLong).toSeq
      assert(ids == expect(r.getLong(0)),
        s"doc ${r.getLong(0)} id sequence mismatch")
      assert(r.getLong(2) == ids.size)
    }
  }
}
