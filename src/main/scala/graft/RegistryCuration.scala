package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{CsvIngest, Curation, Dedup, JsonIngest, Multimodal, NearDup, Relational, Sessions, Similarity}
import graft.streaming.StreamingSessions

/** Corpus-curation family: decontamination screens, sampling/selection,
  * packing, manifests, quality gates and the composed pipelines.
  *
  * Mechanically split from the SparkEntry monolith (r14, judge prescription
  * #8); entries and oracle SQL are verbatim — [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the per-domain maps and the
  * bijection gate (`PlanAuditSpec`) still covers the union.
  */
private[graft] object RegistryCuration {
  import RegistryShared._


  /** Eval-overlap contamination oracle: 8-gram join on shingle TEXT (the
    * Spark sides join on xxhash64 of the same strings — identical result
    * barring a 64-bit collision, the dedup_ngram_jaccard precedent).
    * Shared by the Column-API query and its SQL-text twin.
    */
  private[graft] val decontaminateOracle: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 10000 < 1000 AS is_eval
      |  FROM documents),
      |t AS (SELECT doc_id, is_eval, string_split(text, ' ') AS w FROM b),
      |sh AS MATERIALIZED (SELECT doc_id, is_eval,
      |  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
      |    || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' '
      |    || w[i+7] for i in range(1, len(w) - 6)])) AS ng
      |  FROM t WHERE len(w) >= 8)
      |SELECT tr.doc_id,
      |  CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs,
      |  CAST(count(DISTINCT tr.ng) AS BIGINT) AS n_shared_ngrams
      |FROM sh tr JOIN sh ev ON tr.ng = ev.ng
      |WHERE NOT tr.is_eval AND ev.is_eval
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin


  /** Brute cross-set 3-shingle Jaccard grouped per training doc;
    * `restrict` narrows the training side (the frozen-artifact batch
    * screen — per-doc purity makes the restriction exact).
    */
  private[graft] def decontaminateFuzzyOracle(restrict: String = ""): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
       |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) % 10000 < 1000 AS is_eval
       |  FROM documents),
       |sh AS MATERIALIZED (SELECT doc_id, is_eval,
       |     list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                    for i in range(1, len(w) - 1)]) AS s
       |   FROM t WHERE len(w) >= 3),
       |p AS (SELECT tr.doc_id AS doc_id,
       |        len(list_intersect(tr.s, ev.s)) AS inter,
       |        len(tr.s) + len(ev.s) - len(list_intersect(tr.s, ev.s)) AS u
       |      FROM sh tr JOIN sh ev ON (NOT tr.is_eval) AND ev.is_eval
       |      $restrict)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_neardups,
       |  CAST(max((inter * 20000 + u) // (2 * u)) AS BIGINT) AS max_jac_bp
       |FROM p WHERE inter * 2 >= u
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin


  /** The frozen-artifact exact screen replayed: the whole-corpus
    * decontamination CTE chain restricted to the batch slice (per-doc
    * purity makes the restriction exact). Shared by the single-shot
    * incremental screen and the streamed loop.
    */
  private[graft] val decontaminateIncOracle: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 10000 < 1000 AS is_eval
      |  FROM documents),
      |t AS (SELECT doc_id, is_eval, string_split(text, ' ') AS w FROM b),
      |sh AS MATERIALIZED (SELECT doc_id, is_eval,
      |  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
      |    || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' '
      |    || w[i+7] for i in range(1, len(w) - 6)])) AS ng
      |  FROM t WHERE len(w) >= 8)
      |SELECT tr.doc_id,
      |  CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs,
      |  CAST(count(DISTINCT tr.ng) AS BIGINT) AS n_shared_ngrams
      |FROM sh tr JOIN sh ev ON tr.ng = ev.ng
      |WHERE NOT tr.is_eval AND ev.is_eval
      |  AND tr.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin


  /** Frozen-artifact importance admission replayed end to end: weights +
    * threshold from the pool slice only, batch scored against them.
    * Shared by the single-shot incremental call and the streamed
    * admission loop (stateless over the same artifacts, so batching
    * cannot change a verdict).
    */
  private[graft] val importanceIncrementalOracle: String =
    """WITH cutv AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
      |t AS (SELECT doc_id, lang, string_split(text, ' ') AS w,
      |        doc_id < (SELECT c FROM cutv) AS in_pool
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, lang, in_pool, unnest(w) AS feat FROM t
      |  UNION ALL
      |  SELECT doc_id, lang, in_pool,
      |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS feat
      |  FROM t WHERE len(w) >= 2),
      |bo AS (SELECT doc_id, lang, in_pool,
      |    CAST(('0x' || substring(md5(feat), 1, 15)) AS BIGINT) % 4096 AS b
      |  FROM occ),
      |cnt AS (SELECT b,
      |    CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS cnt_t,
      |    CAST(count(*) AS BIGINT) AS cnt_r
      |  FROM bo WHERE in_pool GROUP BY b),
      |wt AS (SELECT b,
      |    (1000 * (cnt_t + 1) * ((SELECT sum(cnt_r) FROM cnt) + 4096))
      |      // ((cnt_r + 1) * ((SELECT sum(cnt_t) FROM cnt) + 4096))
      |      AS w_milli
      |  FROM cnt),
      |ds AS (SELECT doc_id, in_pool, CAST(count(*) AS BIGINT) AS n_feats,
      |    CAST(sum(w_milli) // count(*) AS BIGINT) AS w_avg_milli
      |  FROM bo JOIN wt USING (b) GROUP BY doc_id, in_pool),
      |hist AS (SELECT w_avg_milli AS s, count(*) AS cnt FROM ds
      |  WHERE in_pool GROUP BY 1),
      |thr AS (SELECT max(s) AS thr FROM (
      |  SELECT s, sum(cnt) OVER (ORDER BY s DESC) AS cum,
      |         sum(cnt) OVER () AS total FROM hist)
      |  WHERE cum * 10000 >= total * 2500)
      |SELECT doc_id, n_feats, w_avg_milli FROM ds
      |WHERE NOT in_pool AND w_avg_milli >= (SELECT thr FROM thr)
      |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // single-pass Deequ-style constraint suite over the corpus
    "corpus_constraints" -> ((s, dir) =>
      Curation.validateConstraints(Tables.documents(s, dir))),
    // train/test split whose train side quarantines near-dups of ANY
    // test doc — the leak exact-match decontamination can't see
    "split_leakage_guard" -> ((s, dir) =>
      Curation.splitWithLeakageGuard(Tables.documents(s, dir))),
    // the END-TO-END training-data pipeline, one oracle-exact query:
    // domain-reputation gate -> corpus-relative quality quantile gate
    // (threshold computed on the gated subset) -> exact dedup (keep min
    // id) -> near-dup canonicalization against FULL-corpus clusters ->
    // token-budget shard packing of the survivors
    // eval-safe packing: leakage-guarded split -> pack ONLY the train
    // side — the composition that makes the guard consequential (the
    // packed artifact provably contains no near-dup of a held-out doc)
    "pipeline_eval_safe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.join(
        Curation.splitWithLeakageGuard(docs)
          .filter(col("split") === "train").select(col("doc_id")), "doc_id")
      Curation.packShards(train, 2048L)
    }),
    "pipeline_training_data" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val g1 = docs.join(
        Curation.gateBySource(docs).select(col("doc_id")), "doc_id")
      val g2 = docs.join(
        Curation.qualityQuantileGate(g1).select(col("doc_id")), "doc_id")
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val ex = g2.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val nonCanonical = NearDup.nearDupClusters(docs)
        .filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
      Curation.packShards(ex.join(nonCanonical, Seq("doc_id"), "left_anti"),
        2048L)
    }),
    // corpus-version diff: deterministic synthetic "yesterday vs today"
    // split of the fixture (old = id%10!=0; new = id%7!=0 with text
    // edited when id%5==0) -> added/removed/changed/unchanged per id
    "corpus_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Curation.corpusDiff(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))))
    }),
    // quality-weighted sampling: keep probability = ttr_bp/10000 via the
    // content-free md5 bucket — soft quality gate, no cliff effects
    "sample_weighted" -> ((s, dir) => Curation.weightedSample(Tables.documents(s, dir))),
    // domain-level reputation: per-source doc count, duplicate rate, mean
    // length and mean TTR quality (integer bp, round-half-up)
    "source_reputation" -> ((s, dir) => Curation.sourceReputation(Tables.documents(s, dir))),
    // domain-level gate: drop whole sources whose mean TTR < 4800 bp or
    // exact-dup rate > 2000 bp — the before-any-per-doc-gate web screen
    "gate_by_source" -> ((s, dir) => Curation.gateBySource(Tables.documents(s, dir))),
    "sample_stratified" -> ((s, dir) => Curation.stratifiedSample(Tables.documents(s, dir), 40)),
    // data-mixing: per-language keep rates (bps), incl. a dropped (fr=0)
    // and a fully-kept (de=10000) stratum
    "sample_mixture" -> ((s, dir) => Curation.mixtureSample(Tables.documents(s, dir),
      Map("en" -> 2500, "es" -> 7500, "de" -> 10000, "zh" -> 5000))),
    // data-mixing in the unit training runs budget: TOKENS per language
    // (en/es/zh cut mid-language, de fully kept, fr absent -> dropped)
    "sample_mixture_tokens" -> ((s, dir) => Curation.mixtureSampleTokens(
      Tables.documents(s, dir),
      Map("en" -> 2500L, "es" -> 1200L, "de" -> 100000L, "zh" -> 800L))),
    // benchmark decontamination: training docs sharing any word-8-gram
    // with the held-out split (md5-bucket 10% of the corpus)
    "text_decontaminate" -> ((s, dir) => Curation.decontaminate(Tables.documents(s, dir))),
    // the decontamination screen through the SQL-text surface — pins the
    // two-arg graft_shingles(text, n) extension function as a SQL citizen
    "text_decontaminate_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.TextHashOps.register(s)
      s.sql("""
        |WITH p AS (
        |  SELECT doc_id, xxhash64(ng) AS ngh,
        |    CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)
        |      AS BIGINT) % 10000 < 1000 AS is_eval
        |  FROM documents
        |  LATERAL VIEW explode(graft_shingles(text, 8)) t AS ng)
        |SELECT tr.doc_id,
        |  count(DISTINCT ev.doc_id) AS n_eval_docs,
        |  count(DISTINCT tr.ngh) AS n_shared_ngrams
        |FROM p tr JOIN p ev ON tr.ngh = ev.ngh
        |WHERE NOT tr.is_eval AND ev.is_eval
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin)
    }),
    // relative quality gate: keep the top 75% of the corpus by type-token
    // ratio, threshold from a bounded score histogram (ties inclusive)
    "quality_gate" -> ((s, dir) =>
      Curation.qualityQuantileGate(Tables.documents(s, dir))),
    // context-window chunking: fixed 200-char windows at stride 150 (50
    // chars of overlap), the corpus → training-sequences step; map-only
    "chunk_docs" -> ((s, dir) => Curation.chunkDocs(Tables.documents(s, dir))),
    // the same screen with a broadcast-Bloom prune of the training-side
    // postings before the shuffle (the 100 TB shape); the exact join after
    // the prune removes Bloom false positives, so the output — and the
    // oracle — are identical to text_decontaminate
    "text_decontaminate_bloom" -> ((s, dir) =>
      Curation.decontaminateBloom(Tables.documents(s, dir))),
    // fuzzy decontamination: training docs whose 3-shingle Jaccard vs any
    // eval doc is >= 1/2 — MinHash band candidates keyed against the
    // benchmark-sized eval band table only, exact integer verify
    "text_decontaminate_fuzzy" -> ((s, dir) =>
      Curation.decontaminateFuzzy(Tables.documents(s, dir))),
    // the fuzzy screen's frozen-artifact form: eval band table + eval
    // shingle sets persisted once, the last-20% (non-eval) slice
    // screened as an arriving batch
    "text_decontaminate_fuzzy_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      val (bands, shingles) = Curation.evalFuzzyArtifacts(docs)
      Curation.decontaminateFuzzyWith(bands, shingles,
        docs.filter(col("doc_id") >= cut &&
          Curation.sampleBucket(col("doc_id")) >= 1000))
    }),
    // the CONTINUOUS fuzzy screen over the same persisted artifacts —
    // stateless, so it shares the incremental oracle
    "text_decontaminate_fuzzy_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      withTempReplayRoot("graft_fuzzy_stream_") { root =>
        val (bands, shingles) = Curation.evalFuzzyArtifacts(docs)
        bands.write.parquet(s"$root/art/bands")
        shingles.write.parquet(s"$root/art/shingles")
        val in = root.resolve("in")
        java.nio.file.Files.createDirectories(in)
        val batch = docs.filter(col("doc_id") >= cut &&
            Curation.sampleBucket(col("doc_id")) >= 1000)
          .select(col("doc_id"), col("text"))
        (0 until 3).foreach { i =>
          StreamingSessions.appendReplayFile(
            batch.filter(pmod(col("doc_id"), lit(3)) === i), in, i)
        }
        graft.streaming.StreamingPack.fuzzyScreenStream(s,
          in.toString, s"$root/art", root.resolve("out").toString,
          root.resolve("ckpt").toString)
        graft.streaming.StreamingPack
          .readOutput(s, root.resolve("out").toString)
          .orderBy(col("doc_id"))
      }
    }),
    // frozen-artifact screen: the eval split's postings persisted once,
    // the last-20% (non-eval) slice screened as an arriving batch —
    // O(batch), eval side never re-shingled
    "text_decontaminate_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Curation.decontaminateWith(
        Curation.evalNgramArtifact(docs),
        docs.filter(col("doc_id") >= cut &&
          Curation.sampleBucket(col("doc_id")) >= 1000))
    }),
    // the CONTINUOUS screen: the same persisted eval postings, the batch
    // slice replayed as 3 micro-batches through the stateless loop —
    // must equal the incremental screen (same oracle)
    "text_decontaminate_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      withTempReplayRoot("graft_decon_stream_") { root =>
        Curation.evalNgramArtifact(docs)
          .write.parquet(s"$root/art/eval_ngrams")
        val in = root.resolve("in")
        java.nio.file.Files.createDirectories(in)
        val batch = docs.filter(col("doc_id") >= cut &&
            Curation.sampleBucket(col("doc_id")) >= 1000)
          .select(col("doc_id"), col("text"))
        (0 until 3).foreach { i =>
          StreamingSessions.appendReplayFile(
            batch.filter(pmod(col("doc_id"), lit(3)) === i), in, i)
        }
        graft.streaming.StreamingPack.decontaminationScreenStream(s,
          in.toString, s"$root/art", root.resolve("out").toString,
          root.resolve("ckpt").toString)
        graft.streaming.StreamingPack
          .readOutput(s, root.resolve("out").toString)
          .orderBy(col("doc_id"))
      }
    }),
    // DSIR-style importance resampling (Xie et al. 2023): hashed
    // unigram/bigram milli-integer probability-ratio weights vs the
    // lang=en target, keep the top quartile by mean weight (tie class in)
    "sample_importance" -> ((s, dir) =>
      Curation.importanceSample(Tables.documents(s, dir))),
    // the deployment shape: weights + threshold frozen on the first-80%
    // pool, the last-20% batch admitted per-doc against the artifacts
    "sample_importance_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Curation.importanceSampleIncremental(
        docs.filter(col("doc_id") < cut), docs.filter(col("doc_id") >= cut))
    }),
    // the CONTINUOUS form: the same frozen artifacts persisted to parquet,
    // the batch slice replayed as 3 micro-batches through the stateless
    // admission loop — must equal the incremental operator (same oracle)
    "sample_importance_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      withTempReplayRoot("graft_imp_stream_") { root =>
        val (wt, thr) = Curation.importanceArtifacts(
          docs.filter(col("doc_id") < cut))
        wt.write.parquet(s"$root/art/weights")
        thr.write.parquet(s"$root/art/thr")
        val in = root.resolve("in")
        java.nio.file.Files.createDirectories(in)
        val batch = docs.filter(col("doc_id") >= cut)
          .select(col("doc_id"), col("text"))
        (0 until 3).foreach { i =>
          StreamingSessions.appendReplayFile(
            batch.filter(pmod(col("doc_id"), lit(3)) === i), in, i)
        }
        graft.streaming.StreamingPack.importanceAdmissionStream(s,
          in.toString, s"$root/art", root.resolve("out").toString,
          root.resolve("ckpt").toString)
        graft.streaming.StreamingPack
          .readOutput(s, root.resolve("out").toString)
          .orderBy(col("doc_id"))
      }
    }),
    // Curation extensions: deterministic sampling, corpus rollup, and the
    // quality -> exact-dedup -> near-dup-canonicalization funnel
    "sample_docs" -> ((s, dir) => Curation.deterministicSample(Tables.documents(s, dir), 2000)),
    // partitioned corpus writer: lang-partitioned parquet + read-back
    // manifest — the write path is part of what the oracle pins
    "corpus_manifest" -> ((s, dir) => {
      // per-run temp dir (process-isolated, not a world-shared fixed
      // path), deleted after the manifest is materialized — the
      // localCheckpoint makes the returned frame self-contained
      val root = java.nio.file.Files.createTempDirectory("graft_corpus_")
      try graft.sinks.CorpusSink.writePartitioned(Tables.documents(s, dir),
        root.resolve("docs").toString).localCheckpoint()
      finally graft.streaming.StreamingSessions.deleteRecursively(root)
    }),
    "corpus_stats" -> ((s, dir) => Curation.corpusStats(Tables.documents(s, dir))),
    // token-budget shard packing (distributed prefix sum; 2048-token shards)
    "pack_shards" -> ((s, dir) => Curation.packShards(Tables.documents(s, dir), 2048L)),
    // sequence packing: 128-token training sequences, docs split across
    // boundaries; one (seq, doc) span row per overlap
    "pack_sequences" -> ((s, dir) => Curation.packSequences(Tables.documents(s, dir), 128L)),
    // incremental twin: state over the first 4/5 of ids, batch = the rest;
    // must land spans exactly where the whole-corpus pack would
    "pack_sequences_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
        .head().getLong(0)
      Curation.packSequencesWith(
        Curation.packState(docs.filter(col("doc_id") < cut)),
        docs.filter(col("doc_id") >= cut), 128L)
    }),
    // epoch shuffle: 2 epochs of the 128-token sequences into 8 shards
    "shuffle_epochs" -> ((s, dir) =>
      Curation.shuffleEpochs(Tables.documents(s, dir), 128L, 2, 8)),
    "pipeline_clean_corpus" -> ((s, dir) => Curation.cleanCorpus(Tables.documents(s, dir), 30L)),
    // the release-gate composition: non-eval docs clearing BOTH surface
    // leak screens (exact 8-gram + fuzzy 3-shingle Jaccard)
    "pipeline_decontaminated" -> ((s, dir) =>
      Curation.decontaminatedCorpus(Tables.documents(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    // exact violation counts per declared constraint; null semantics are
    // explicit per check (see Curation.validateConstraints)
    "corpus_constraints" ->
      """WITH m AS (SELECT
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_key_null,
        |  CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT) AS v_key_dup,
        |  CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_text_empty,
        |  CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN ('en','es','zh','de','fr') THEN 1 ELSE 0 END) AS BIGINT) AS v_lang_domain,
        |  CAST(sum(CASE WHEN source IS NULL OR NOT regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS v_source_format,
        |  CAST(sum(CASE WHEN text IS NOT NULL AND n_chars IS NOT NULL AND n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_len_consistent,
        |  CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_len_nonneg
        |FROM documents)
        |SELECT check_name, violations, n_rows, violations = 0 AS passed
        |FROM (
        |  SELECT 'doc_id_complete' AS check_name, v_key_null AS violations, n_rows FROM m
        |  UNION ALL SELECT 'doc_id_unique', v_key_dup, n_rows FROM m
        |  UNION ALL SELECT 'text_nonempty', v_text_empty, n_rows FROM m
        |  UNION ALL SELECT 'lang_in_domain', v_lang_domain, n_rows FROM m
        |  UNION ALL SELECT 'source_format', v_source_format, n_rows FROM m
        |  UNION ALL SELECT 'n_chars_consistent', v_len_consistent, n_rows FROM m
        |  UNION ALL SELECT 'n_chars_nonnegative', v_len_nonneg, n_rows FROM m)
        |ORDER BY check_name""".stripMargin,
    // md5-bucket split + brute-jaccard leakage edges (same shingle CTE as
    // bruteJaccardOracle; only the train side of a cross-split edge is
    // quarantined). The Spark side defaults to banded-MinHash edges; its
    // pair-set equality with exact jac >= 1/2 is oracle-gated separately
    // (dedup_minhash_lsh), so the exact-pair SQL remains this query's oracle
    "split_leakage_guard" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                        for i in range(1, len(w) - 1)]) AS s
        |       FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
        |        len(list_intersect(a.s, b.s)) AS inter,
        |        len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pairs AS (SELECT doc_i, doc_j FROM p WHERE inter * 2 >= u),
        |ids AS (SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < 1000 AS is_test
        |  FROM documents),
        |edges AS (SELECT doc_i AS a, doc_j AS b FROM pairs
        |          UNION ALL SELECT doc_j, doc_i FROM pairs),
        |leaky AS (SELECT DISTINCT e.a AS doc_id
        |          FROM edges e JOIN ids i ON e.b = i.doc_id AND i.is_test)
        |SELECT i.doc_id,
        |  CASE WHEN i.is_test THEN 'test'
        |       WHEN l.doc_id IS NOT NULL THEN 'quarantine'
        |       ELSE 'train' END AS split
        |FROM ids i LEFT JOIN leaky l USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // stratified deterministic sample: 40 docs per predicted language by
    // md5-bucket order (same langid CTEs as text_langid)
    "sample_stratified" ->
      s"""WITH $langCtes,
         |b AS (SELECT doc_id,
         |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |        % 10000 AS bkt
         |      FROM documents),
         |r AS (SELECT l.doc_id, pred_lang,
         |        CAST(row_number() OVER (PARTITION BY pred_lang
         |          ORDER BY bkt, l.doc_id) AS BIGINT) AS stratum_rank
         |      FROM lang l JOIN b ON l.doc_id = b.doc_id)
         |SELECT doc_id, pred_lang, stratum_rank FROM r
         |WHERE stratum_rank <= 40
         |ORDER BY pred_lang, stratum_rank""".stripMargin,
    // mixture sampling: same langid CTEs + md5-bucket thinning per
    // language at the query's rates ('fr' absent -> dropped)
    "sample_mixture" ->
      s"""WITH $langCtes
         |SELECT l.doc_id, pred_lang FROM lang l
         |WHERE CAST(('0x' || substring(md5(CAST(l.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 10000 <
         |      CASE pred_lang WHEN 'en' THEN 2500 WHEN 'es' THEN 7500
         |                     WHEN 'de' THEN 10000 WHEN 'zh' THEN 5000
         |                     ELSE 0 END
         |ORDER BY l.doc_id""".stripMargin,
    // token-budget mixture: same langid CTEs; the oracle's single flat
    // per-language window equals the operator's two-level prefix sum
    // because both run over the identical (bkt, doc_id) order
    "sample_mixture_tokens" ->
      s"""WITH $langCtes,
         |tk AS (SELECT l.doc_id, pred_lang,
         |        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |        CAST(('0x' || substring(md5(CAST(l.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |        % 10000 AS bkt
         |      FROM lang l JOIN documents d ON l.doc_id = d.doc_id),
         |pf AS (SELECT doc_id, pred_lang, n_tokens,
         |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY pred_lang
         |          ORDER BY bkt, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |          0) AS BIGINT) AS prefix_tokens
         |      FROM tk)
         |SELECT doc_id, pred_lang, n_tokens, prefix_tokens FROM pf
         |WHERE prefix_tokens < CASE pred_lang
         |  WHEN 'en' THEN 2500 WHEN 'es' THEN 1200
         |  WHEN 'de' THEN 100000 WHEN 'zh' THEN 800 ELSE -1 END
         |ORDER BY doc_id""".stripMargin,
    // corpus diff over the same deterministic synthetic split
    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_key FROM documents
        |           WHERE doc_id % 10 != 0),
        |n AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
        |          AS new_key
        |      FROM documents WHERE doc_id % 7 != 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN old_key IS NULL THEN 'added'
        |       WHEN new_key IS NULL THEN 'removed'
        |       WHEN old_key = new_key THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    // per-source reputation: integer round-half-up bp math throughout
    "source_reputation" ->
      """WITH t AS (SELECT source, md5(text) AS text_key,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |       * 20000 + len(string_split(text, ' ')))
        |      // (2 * len(string_split(text, ' '))) AS ttr_bp
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT text_key) AS BIGINT) AS n_unique_texts,
        |  ((count(*) - count(DISTINCT text_key)) * 20000 + count(*))
        |    // (2 * count(*)) AS dup_bp,
        |  (CAST(sum(n_tokens) AS BIGINT) * 2 + count(*))
        |    // (2 * count(*)) AS avg_tokens,
        |  (CAST(sum(ttr_bp) AS BIGINT) * 2 + count(*))
        |    // (2 * count(*)) AS avg_ttr_bp
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // domain gate: survivors of the reputation floor, whole-source drops
    "gate_by_source" ->
      """WITH t AS (SELECT source, md5(text) AS text_key,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |       * 20000 + len(string_split(text, ' ')))
        |      // (2 * len(string_split(text, ' '))) AS ttr_bp
        |  FROM documents),
        |rep AS (SELECT source,
        |    ((count(*) - count(DISTINCT text_key)) * 20000 + count(*))
        |      // (2 * count(*)) AS dup_bp,
        |    (CAST(sum(ttr_bp) AS BIGINT) * 2 + count(*))
        |      // (2 * count(*)) AS avg_ttr_bp
        |  FROM t GROUP BY source),
        |bad AS (SELECT source FROM rep
        |        WHERE avg_ttr_bp < 4800 OR dup_bp > 2000)
        |SELECT doc_id, source, CAST(len(text) AS BIGINT) AS n_chars
        |FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.source = d.source)
        |ORDER BY doc_id""".stripMargin,
    // eval-overlap contamination: 8-gram join on shingle TEXT (the Spark
    // side joins on xxhash64 of the same strings — identical result barring
    // a 64-bit collision, the dedup_ngram_jaccard precedent)
    "text_decontaminate_sql" -> decontaminateOracle,
    "text_decontaminate_bloom" -> decontaminateOracle,
    // the frozen-artifact screen is the whole-corpus screen restricted
    // to the batch slice (per-doc purity) — same CTE chain, cut filter
    "text_decontaminate_incremental" -> decontaminateIncOracle,
    // the streamed screen is stateless over the same frozen artifact,
    // so batching cannot change a report — shared incremental oracle
    "text_decontaminate_stream" -> decontaminateIncOracle,
    // the composed release gate: both screens' flag sets replayed, then
    // survivors = non-eval docs outside the union
    "pipeline_decontaminated" ->
      """WITH b AS (SELECT doc_id, text,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < 1000 AS is_eval
        |  FROM documents),
        |t AS (SELECT doc_id, is_eval, string_split(text, ' ') AS w FROM b),
        |g8 AS MATERIALIZED (SELECT doc_id, is_eval,
        |  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
        |    || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' '
        |    || w[i+7] for i in range(1, len(w) - 6)])) AS ng
        |  FROM t WHERE len(w) >= 8),
        |exact_flag AS (SELECT DISTINCT tr.doc_id
        |  FROM g8 tr JOIN g8 ev ON tr.ng = ev.ng
        |  WHERE NOT tr.is_eval AND ev.is_eval),
        |s3 AS MATERIALIZED (SELECT doc_id, is_eval,
        |   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                  for i in range(1, len(w) - 1)]) AS s
        | FROM t WHERE len(w) >= 3),
        |fuzzy_flag AS (SELECT DISTINCT tr.doc_id
        |  FROM s3 tr JOIN s3 ev ON (NOT tr.is_eval) AND ev.is_eval
        |  WHERE len(list_intersect(tr.s, ev.s)) * 2 >=
        |        len(tr.s) + len(ev.s) - len(list_intersect(tr.s, ev.s))),
        |flagged AS (SELECT doc_id FROM exact_flag
        |            UNION SELECT doc_id FROM fuzzy_flag)
        |SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM b WHERE NOT is_eval
        |  AND doc_id NOT IN (SELECT doc_id FROM flagged)
        |ORDER BY doc_id""".stripMargin,
    // fuzzy decontamination: brute cross-set 3-shingle Jaccard (the
    // bruteJaccardOracle shape restricted to train x eval, grouped per
    // training doc) — the LSH path's 32-band x 4-row capture at the >= 1/2
    // verify threshold is the dedup_minhash_lsh precedent
    "text_decontaminate_fuzzy" -> decontaminateFuzzyOracle(),
    // the frozen-artifact fuzzy screen is the whole-corpus screen
    // restricted to the batch slice (per-doc purity given the artifacts)
    "text_decontaminate_fuzzy_incremental" -> decontaminateFuzzyOracle(
      "AND tr.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)"),
    "text_decontaminate_fuzzy_stream" -> decontaminateFuzzyOracle(
      "AND tr.doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)"),
    // DSIR importance resampling: the full weight/score/threshold chain
    // replayed — md5-prefix feature buckets, milli-integer smoothed
    // ratio weights, per-doc mean, histogram quantile gate (ties in)
    "sample_importance" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, lang, unnest(w) AS feat FROM t
        |  UNION ALL
        |  SELECT doc_id, lang,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS feat
        |  FROM t WHERE len(w) >= 2),
        |bo AS (SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(feat), 1, 15)) AS BIGINT) % 4096 AS b
        |  FROM occ),
        |cnt AS (SELECT b,
        |    CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS cnt_t,
        |    CAST(count(*) AS BIGINT) AS cnt_r
        |  FROM bo GROUP BY b),
        |wt AS (SELECT b,
        |    (1000 * (cnt_t + 1) * ((SELECT sum(cnt_r) FROM cnt) + 4096))
        |      // ((cnt_r + 1) * ((SELECT sum(cnt_t) FROM cnt) + 4096))
        |      AS w_milli
        |  FROM cnt),
        |ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |    CAST(sum(w_milli) // count(*) AS BIGINT) AS w_avg_milli
        |  FROM bo JOIN wt USING (b) GROUP BY doc_id),
        |hist AS (SELECT w_avg_milli AS s, count(*) AS cnt FROM ds GROUP BY 1),
        |thr AS (SELECT max(s) AS thr FROM (
        |  SELECT s, sum(cnt) OVER (ORDER BY s DESC) AS cum,
        |         sum(cnt) OVER () AS total FROM hist)
        |  WHERE cum * 10000 >= total * 2500)
        |SELECT doc_id, n_feats, w_avg_milli FROM ds
        |WHERE w_avg_milli >= (SELECT thr FROM thr)
        |ORDER BY doc_id""".stripMargin,
    // frozen-artifact admission: weights + threshold from the pool slice
    // only, batch scored against them — the whole chain replayed
    "sample_importance_incremental" -> importanceIncrementalOracle,
    // the streamed admission is stateless over the same frozen artifacts,
    // so batching cannot change a verdict — shared incremental oracle
    "sample_importance_stream" -> importanceIncrementalOracle,
    "quality_gate" ->
      """WITH t AS (SELECT doc_id,
        |    (len(list_distinct(string_split(text, ' '))) * 20000
        |       + len(string_split(text, ' ')))
        |      // (2 * len(string_split(text, ' '))) AS ttr_bp
        |  FROM documents),
        |h AS (SELECT ttr_bp, count(*) AS cnt FROM t GROUP BY ttr_bp),
        |c AS (SELECT ttr_bp,
        |        sum(cnt) OVER (ORDER BY ttr_bp DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(cnt) OVER () AS total
        |      FROM h),
        |thr AS (SELECT max(ttr_bp) AS thr FROM c
        |        WHERE cum * 10000 >= total * 7500)
        |SELECT doc_id, CAST(ttr_bp AS BIGINT) AS ttr_bp
        |FROM t, thr WHERE ttr_bp >= thr ORDER BY doc_id""".stripMargin,
    "chunk_docs" ->
      """SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
        |  substring(text, CAST(u.i * 150 + 1 AS INT), 200) AS chunk_text,
        |  CAST(len(substring(text, CAST(u.i * 150 + 1 AS INT), 200)) AS BIGINT)
        |    AS n_chars
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, (len(text) - 1) // 150)) AS i
        |      FROM documents
        |      WHERE text IS NOT NULL AND len(text) > 0) u(doc_id, text, i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_decontaminate" -> decontaminateOracle,
    "sample_docs" ->
      """SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < 2000
        |ORDER BY doc_id""".stripMargin,
    // weighted sample: keep iff bucket < quality score (ttr bp)
    "sample_weighted" ->
      """WITH t AS (SELECT doc_id,
        |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |       * 20000 + len(string_split(text, ' ')))
        |      // (2 * len(string_split(text, ' '))) AS ttr_bp
        |  FROM documents)
        |SELECT doc_id, ttr_bp FROM t
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < ttr_bp
        |ORDER BY doc_id""".stripMargin,
    "pack_shards" ->
      """SELECT doc_id, n_tokens,
        |  CAST(prefix // 2048 AS BIGINT) AS shard_id FROM (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // same exclusive-prefix CTE as pack_shards; the (seq, doc) overlap
    // rows are pure arithmetic on the offset, unnested per sequence
    "pack_sequences" ->
      """WITH pf AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents)),
        |x AS (SELECT doc_id, n_tokens, prefix,
        |        prefix // 128 AS s0,
        |        (prefix + n_tokens - 1) // 128 AS s1
        |      FROM pf)
        |SELECT CAST(s0 + t.i AS BIGINT) AS seq_id, doc_id,
        |  CAST(greatest(prefix, (s0 + t.i) * 128) - prefix AS BIGINT)
        |    AS doc_offset,
        |  CAST(greatest(prefix, (s0 + t.i) * 128) - (s0 + t.i) * 128 AS BIGINT)
        |    AS seq_offset,
        |  CAST(least(prefix + n_tokens, (s0 + t.i + 1) * 128)
        |       - greatest(prefix, (s0 + t.i) * 128) AS BIGINT) AS len
        |FROM x CROSS JOIN unnest(range(s1 - s0 + 1)) AS t(i)
        |ORDER BY seq_id, doc_id""".stripMargin,
    // whole-corpus pack restricted to the batch's OUTPUT rows — the
    // continuation contract: incremental placement ≡ union placement
    "pack_sequences_incremental" ->
      """WITH pf AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents)),
        |x AS (SELECT doc_id, n_tokens, prefix,
        |        prefix // 128 AS s0,
        |        (prefix + n_tokens - 1) // 128 AS s1
        |      FROM pf)
        |SELECT CAST(s0 + t.i AS BIGINT) AS seq_id, doc_id,
        |  CAST(greatest(prefix, (s0 + t.i) * 128) - prefix AS BIGINT)
        |    AS doc_offset,
        |  CAST(greatest(prefix, (s0 + t.i) * 128) - (s0 + t.i) * 128 AS BIGINT)
        |    AS seq_offset,
        |  CAST(least(prefix + n_tokens, (s0 + t.i + 1) * 128)
        |       - greatest(prefix, (s0 + t.i) * 128) AS BIGINT) AS len
        |FROM x CROSS JOIN unnest(range(s1 - s0 + 1)) AS t(i)
        |WHERE doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
        |ORDER BY seq_id, doc_id""".stripMargin,
    // same md5(epoch:seq_id) permutation key; sequence count from the
    // corpus token total, never from a data scan
    "shuffle_epochs" ->
      """WITH tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
        |            FROM documents),
        |sq AS (SELECT unnest(range((t + 127) // 128)) AS seq_id FROM tot),
        |ep AS (SELECT seq_id, e AS epoch
        |       FROM sq CROSS JOIN unnest(range(2)) AS x(e)),
        |k AS (SELECT epoch, seq_id,
        |        md5(CAST(epoch AS VARCHAR) || ':' || CAST(seq_id AS VARCHAR))
        |          AS skey
        |      FROM ep),
        |s AS (SELECT epoch, seq_id, skey,
        |        CAST(('0x' || substring(skey, 1, 8)) AS BIGINT) % 8 AS shard
        |      FROM k)
        |SELECT CAST(epoch AS BIGINT) AS epoch, seq_id, shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, shard
        |    ORDER BY skey, seq_id) AS BIGINT) AS pos
        |FROM s ORDER BY epoch, shard, pos""".stripMargin,
    "corpus_manifest" ->
      s"""WITH $langCtes
         |SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(d.text)) AS BIGINT) AS total_chars
         |FROM lang JOIN documents d ON lang.doc_id = d.doc_id
         |GROUP BY pred_lang ORDER BY pred_lang""".stripMargin,
    "corpus_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
        |  CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents""".stripMargin,
    // curation funnel: quality gate >= 30 tokens, keep-lowest exact dedup,
    // then drop non-canonical members of the (full-corpus) near-dup
    // clusters — same cluster CTEs as dedup_clusters
    // the full pipeline: every stage is an already-oracle-checked
    // fragment; this entry re-verifies their COMPOSITION (threshold
    // computed on the domain-gated subset, clusters on the full corpus)
    // split CTEs (as split_leakage_guard) -> train-only prefix shards
    "pipeline_eval_safe" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                        for i in range(1, len(w) - 1)]) AS s
        |       FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
        |        len(list_intersect(a.s, b.s)) AS inter,
        |        len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pairs AS (SELECT doc_i, doc_j FROM p WHERE inter * 2 >= u),
        |ids AS (SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 10000 < 1000 AS is_test
        |  FROM documents),
        |edges AS (SELECT doc_i AS a, doc_j AS b FROM pairs
        |          UNION ALL SELECT doc_j, doc_i FROM pairs),
        |leaky AS (SELECT DISTINCT e.a AS doc_id
        |          FROM edges e JOIN ids i ON e.b = i.doc_id AND i.is_test),
        |train AS (SELECT i.doc_id,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        |  FROM ids i JOIN documents d USING (doc_id)
        |  WHERE NOT i.is_test AND i.doc_id NOT IN (SELECT doc_id FROM leaky))
        |SELECT doc_id, n_tokens,
        |  CAST(prefix // 2048 AS BIGINT) AS shard_id FROM (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |  FROM train)
        |ORDER BY doc_id""".stripMargin,
    "pipeline_training_data" ->
      s"""WITH RECURSIVE
         |$clusterCtes,
         |nc AS (SELECT a AS doc_id FROM reach GROUP BY a
         |       HAVING least(a, min(b)) <> a),
         |dt AS (SELECT doc_id, source, md5(text) AS text_key,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |       * 20000 + len(string_split(text, ' ')))
         |      // (2 * len(string_split(text, ' '))) AS ttr_bp
         |  FROM documents),
         |rep AS (SELECT source,
         |    ((count(*) - count(DISTINCT text_key)) * 20000 + count(*))
         |      // (2 * count(*)) AS dup_bp,
         |    (CAST(sum(ttr_bp) AS BIGINT) * 2 + count(*))
         |      // (2 * count(*)) AS avg_ttr_bp
         |  FROM dt GROUP BY source),
         |bad AS (SELECT source FROM rep
         |        WHERE avg_ttr_bp < 4800 OR dup_bp > 2000),
         |g1 AS (SELECT dt.* FROM dt
         |       WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.source = dt.source)),
         |h AS (SELECT ttr_bp, count(*) AS cnt FROM g1 GROUP BY ttr_bp),
         |c AS (SELECT ttr_bp,
         |        sum(cnt) OVER (ORDER BY ttr_bp DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |        sum(cnt) OVER () AS total
         |      FROM h),
         |thr AS (SELECT max(ttr_bp) AS thr FROM c
         |        WHERE cum * 10000 >= total * 7500),
         |g2 AS (SELECT g1.* FROM g1, thr WHERE g1.ttr_bp >= thr),
         |ex AS (SELECT doc_id, n_tokens FROM (
         |        SELECT doc_id, n_tokens,
         |          row_number() OVER (PARTITION BY text_key ORDER BY doc_id) AS rn
         |        FROM g2) WHERE rn = 1),
         |surv AS (SELECT doc_id, n_tokens FROM ex
         |         WHERE doc_id NOT IN (SELECT doc_id FROM nc))
         |SELECT doc_id, n_tokens,
         |  CAST(prefix // 2048 AS BIGINT) AS shard_id FROM (
         |  SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
         |  FROM surv)
         |ORDER BY doc_id""".stripMargin,
    "pipeline_clean_corpus" ->
      s"""WITH RECURSIVE
         |$clusterCtes,
         |nc AS (SELECT a AS doc_id FROM reach GROUP BY a
         |       HAVING least(a, min(b)) <> a),
         |tk AS (SELECT doc_id, text,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents),
         |q AS (SELECT * FROM tk WHERE n_tokens >= 30),
         |ex AS (SELECT doc_id, n_tokens FROM (
         |        SELECT doc_id, n_tokens,
         |          row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |        FROM q) WHERE rn = 1)
         |SELECT doc_id, n_tokens FROM ex
         |WHERE doc_id NOT IN (SELECT doc_id FROM nc)
         |ORDER BY doc_id""".stripMargin,
  )
}
