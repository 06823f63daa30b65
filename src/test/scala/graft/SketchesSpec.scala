package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch aggregates + the key-skew diagnostic. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, "/root/testdata/sf0.001")

  test("skew profile: hand-derived stats on a planted distribution") {
    // per-key counts [1, 1, 2, 8] plus one null-key row (excluded)
    val rows = Seq.fill(1)(10L) ++ Seq.fill(1)(20L) ++
      Seq.fill(2)(30L) ++ Seq.fill(8)(40L)
    val df = rows.map(Option(_)).appended(None).toDF("user_id")
    val r = Sketches.skewProfile(df).head()
    assert(r.getLong(0) == 4L, "n_keys")
    assert(r.getLong(1) == 12L, "n_rows excludes the null key")
    assert(r.getLong(2) == 8L, "max_key_rows")
    // sorted counts [1,1,2,8]: p50 at pos 1.5 -> 1.5; p99 at pos 2.97 ->
    // 2 + 0.97*(8-2) = 7.82 (interpolated, DuckDB quantile_cont parity)
    assert(r.getDouble(3) == 1.5, "p50_key_rows")
    assert(r.getDouble(4) == 7.82, "p99_key_rows")
    assert(r.getDouble(5) == 2.6667, "skew_ratio = 8*4/12 to 4 dp")
    assert(!r.getBoolean(6), "8*4 = 32 < 12*4.0 = 48: no salting at 4x")
    assert(Sketches.skewProfile(df, saltAbove = 2.0).head().getBoolean(6),
      "32 > 24: fires at a 2x threshold")
  }

  test("skew profile on the fixture: internally consistent, salting not needed") {
    val r = Sketches.skewProfile(events).head()
    val ratio = r.getLong(2).toDouble * r.getLong(0) / r.getLong(1)
    assert(math.abs(r.getDouble(5) - math.round(ratio * 10000) / 10000.0) < 1e-9)
    assert(r.getDouble(4) >= r.getDouble(3), "p99 >= p50")
    assert(r.getLong(2) >= 1L && r.getLong(1) >= r.getLong(0))
  }

  test("vocab sketches are mergeable: incremental update ≡ whole-corpus state") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    def estimates(state: org.apache.spark.sql.DataFrame) =
      Sketches.vocabSketchEstimates(state).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val incremental = estimates(Sketches.vocabSketchUpdate(
      Sketches.vocabSketchState(a), b))
    val whole = estimates(Sketches.vocabSketchState(docs))
    assert(incremental == whole,
      "HLL union is register-wise max: batching must not change any estimate")
    assert(whole.contains("TOTAL") && whole.size > 1)
    // the merge phase reads artifacts, not documents: updating with an
    // empty batch must not scan the corpus parquet
    val emptyBatch = docs.filter(lit(false))
    val plan = Sketches.vocabSketchUpdate(Sketches.vocabSketchState(docs)
      .localCheckpoint(), emptyBatch)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet") ||
      "Scan parquet".r.findAllIn(plan).size <= 1,
      "stored-state path must not rescan the summarized corpus")
  }

  test("vocab cardinality gate: every estimate within bound on the fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Sketches.vocabCardinalitySketch(docs).collect()
    assert(rows.length > 1 && rows.head.getString(0) == "TOTAL")
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)}: sketch estimate outside 5% of ${r.getLong(1)}"))
    val total = rows.head.getLong(1)
    val perSource = rows.tail.map(_.getLong(1))
    assert(total <= perSource.sum && total >= perSource.max,
      "global distinct bounded by per-source distincts")
  }

  test("degenerate inputs: empty corpus contracts are explicit, not null-poisoned") {
    val emptyEv = Tables.events(spark, "/root/testdata/sf0.001").limit(0)
    val r = Sketches.skewProfile(emptyEv).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L,
      "empty stream: zero keys/rows/max, not nulls")
    assert(r.getDouble(5) == 0.0 && !r.getBoolean(6),
      "empty stream: ratio 0, salting never triggered")
    val emptyDocs = Tables.documents(spark, "/root/testdata/sf0.001").limit(0)
    assert(Sketches.vocabSketchState(emptyDocs).count() == 0L)
    assert(Sketches.vocabSketchEstimates(
      Sketches.vocabSketchState(emptyDocs)).count() == 0L,
      "empty artifact table: no per-source rows and no phantom TOTAL")
    assert(Sketches.vocabCardinalitySketch(emptyDocs).count() == 0L,
      "no tokens: no checks to report")
  }

  test("sketch accuracy gate: every bound check holds on the fixture") {
    val rows = Sketches.sketchAccuracy(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: HLL outside 3%")
      assert(r.getBoolean(3), s"${r.getString(0)}: approx p50 off by > 1.0")
    }
  }
}
