package graft

/** Physical-plan regression guard over the ENTIRE driver query surface:
  * at 100 TB the difference between an equi-join and a nested-loop join
  * is the difference between a shuffle and a disaster, and plan shapes
  * regress silently (a dropped equi-key or a widened condition still
  * returns correct rows at test SF). Every `SparkEntry.queries` entry is
  * planned here and must avoid cartesian/nested-loop joins — except the
  * explicitly-annotated brute-force baselines, whose corpus ×
  * broadcast(20 queries) nested loop IS the intended exact-scoring shape.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Brute-force ANN scores every (query, corpus) pair by design; the
    * nested-loop side is the 20-row broadcast query set, not the corpus.
    * The gap-fill grid is |event types| × |days| — a deliberate
    * dimension × dimension cross product (both sides are post-aggregate
    * scalars of the corpus, never corpus-proportional).
    */
  /** `ann_topk_pq` is deliberately brute force over 128×-compressed codes
    * (ADC), but since the literal-LUT rewrite its scan is a map-only
    * codegen'd explode — no BNLJ left to exempt, and the audit must catch
    * any regression back to that shape.
    */
  /** The overlap readouts pair the per-source sketch ARTIFACTS on a
    * sources × sources grid — dimension-bounded (KB rows per source,
    * never corpus-proportional), the same sanctioned shape as the
    * gap-fill dim grids.
    */
  private val nestedLoopAllowed =
    Set("ann_topk_brute", "ann_recall_floor", "q_timeseries_gapfill",
      "q_gapfill_sql", "vocab_overlap_sketch", "vocab_overlap_incremental")

  /** No exemptions left: since round 9 every declared query carries a
    * DuckDB oracle (`dedup_simhash` now runs the md5-portable kernel; the
    * xxhash64 kernel remains spec-pinned in NearDupSpec as the perf twin).
    */
  private val oracleExempt = Set.empty[String]

  test("every query has an oracle (or a documented exemption); no orphan oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == oracleExempt,
      s"queries without an oracle beyond the documented exemption: ${(q -- o) -- oracleExempt}")
    assert((o -- q).isEmpty, s"oracles for nonexistent queries: ${o -- q}")
  }

  test("no driver query plans a cartesian or nested-loop join (except brute baselines)") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!nestedLoopAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }

  test("filters reach the parquet scan in filtered relational queries") {
    val plan = SparkEntry.queries("q3_top_revenue")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"),
      "q3_top_revenue should push filters into the scan")
  }

  test("no explicit broadcast hints on corpus-proportional dedup frames") {
    // An explicit broadcast() on a frame whose size tracks the corpus's
    // duplicate rate (candidate pairs, df-capped shingles, non-canonical
    // cluster members) is an executor-OOM path at 100 TB; these joins
    // must stay hint-free and let AQE pick the strategy. The checked
    // plans are the UNcheckpointed building blocks — the public query
    // entries localCheckpoint their results, which would hide any hint.
    import graft.operators.{Curation, NearDup}
    val docs = Tables.documents(spark, dir)
    val sh = NearDup.shingled(docs)
    val checked = Seq(
      "verifyJaccard" ->
        NearDup.verifyJaccard(
          NearDup.lshCandidates(NearDup.minhashSignatures(sh)), sh),
      "jaccardNearDupsExact(dfCap)" ->
        NearDup.jaccardNearDupsExact(docs, maxDocFreq = 100L),
      "cleanCorpus" -> Curation.cleanCorpus(docs, 30L))
    checked.foreach { case (name, df) =>
      val analyzed = df.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"),
        s"$name carries an explicit join-strategy hint on a corpus-proportional frame")
    }
  }

  test("column pruning reaches the scan — sample_docs must not read document text") {
    // a 2-column projection that drags the text blob through the scan is
    // the "reads all columns for a 2-column projection" anti-pattern; at
    // 100 TB the text column IS the table
    val plan = SparkEntry.queries("sample_docs")(spark, dir)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no ReadSchema in plan"))
    assert(!readSchema.contains("text"),
      s"sample_docs scan reads the text column: $readSchema")
    assert(readSchema.contains("doc_id") && readSchema.contains("n_chars"),
      s"sample_docs scan should read exactly (doc_id, n_chars): $readSchema")
  }

  test("stratified sampler pre-prunes inside sub-strata before the per-stratum rank") {
    val plan = SparkEntry.queries("sample_stratified")(spark, dir)
      .queryExecution.executedPlan.toString
    val windows = plan.sliding("Window".length).count(_ == "Window")
    assert(windows >= 2,
      s"expected the two-level (sub-stratum, stratum) window shape, got $windows Window nodes")
    assert(plan.contains("local_rank"),
      "the sub-stratum local_rank prune is missing — the per-stratum window " +
        "would sort its whole population on one reducer")
  }
}
