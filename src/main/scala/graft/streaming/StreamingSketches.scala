package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Sketches

/** Streaming twin of the day-over-day drift monitor
  * ([[graft.operators.Sketches.valueDriftDaily]]): a `foreachBatch` loop
  * maintains the day-keyed histogram artifact table incrementally
  * ([[graft.operators.Sketches.valueHistDailyUpdate]] — O(micro-batch)
  * scan + O(types · days · bins) merge per trigger), and the drift alarm
  * reads PURELY from artifacts
  * ([[graft.operators.Sketches.valueDriftFromState]]).
  *
  * `foreachBatch` is the right Spark shape: the fold is an arbitrary
  * batch join/aggregate against driver-held state, not a keyed
  * per-row update — the same pattern as the dedup admission loops
  * ([[StreamingDedup]]). Because the merge is an exactly-associative
  * integer vector add, ANY batching of the input lands on the same
  * artifact — `StreamingSpec` pins artifact-after-N-batches ≡ one-shot
  * build, and the drift readout therefore shares `value_drift_daily`'s
  * DuckDB oracle verbatim.
  *
  * At 100 TB the artifact table is O(types · days · 128·octaves) rows —
  * KBs per day — so the per-trigger merge cost is the micro-batch scan;
  * a production deployment checkpoints the artifact to a table instead
  * of `localCheckpoint` (same two-line swap as the dedup key store).
  */
object StreamingSketches {

  /** Replay `events` through the incremental histogram maintainer:
    * deterministic `nBatches`-way split on `xxhash64(event_id)`, one
    * parquet file per micro-batch (mtime-ordered), fold each batch into
    * the artifact with [[graft.operators.Sketches.valueHistDailyUpdate]].
    * Returns the FINAL artifact table; `localCheckpoint` per fold keeps
    * lineage O(1) in the number of batches.
    */
  def replayHistDaily(events: DataFrame, nBatches: Int = 4): DataFrame = {
    val spark = events.sparkSession
    val root = java.nio.file.Files.createTempDirectory("graft_drift_")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    (0 until nBatches).foreach { i =>
      StreamingSessions.appendReplayFile(
        events.filter(pmod(xxhash64(col("event_id")), lit(nBatches)) === i),
        inDir, i + 1)
    }
    var state = Sketches.valueHistDailyState(events.limit(0)).localCheckpoint()
    val src = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = Sketches.valueHistDailyUpdate(state, batch).localCheckpoint()
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state
  }

  /** The streaming drift monitor end-to-end: incremental artifact
    * maintenance over the replay, then the artifact-only drift readout —
    * result-identical to the one-shot [[graft.operators.Sketches.valueDriftDaily]]
    * by merge associativity, hence oracle-shared.
    */
  def replayDriftMonitor(events: DataFrame, nBatches: Int = 4): DataFrame =
    Sketches.valueDriftFromState(replayHistDaily(events, nBatches))

  /** Streamed q-digest maintenance: two micro-batches split on the
    * engine-portable `event_id % 2`, each folded with
    * [[graft.operators.Sketches.qdigestUpdate]] (sketch the batch, merge
    * artifacts under the combined `t`). Because the first fold against
    * the empty state re-compresses `build(batch0)` idempotently, the
    * final artifact is EXACTLY `merge(build(A), build(B))` — the shape
    * the `quantile_qdigest_stream` oracle replays two-phase; the rank
    * theorem holds at the merged 2t-per-node slack.
    */
  def replayQDigest(events: DataFrame, nBatches: Int = 2,
                    sigma: Int = 256): DataFrame = {
    val spark = events.sparkSession
    val root = java.nio.file.Files.createTempDirectory("graft_qd_")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    (0 until nBatches).foreach { i =>
      StreamingSessions.appendReplayFile(
        events.filter(pmod(col("event_id"), lit(nBatches)) === i), inDir, i + 1)
    }
    var state = Sketches.qdigestState(events.limit(0), sigma)
    val src = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = Sketches.qdigestUpdate(state, batch, sigma)
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state
  }

  /** Generic document-stream fold: split `documents` into `nBatches`
    * deterministic micro-batches and fold each into an artifact with
    * `step` — the shared harness behind the Count-Min, Misra–Gries and
    * HLL streamed maintainers.
    */
  private def replayDocFold(documents: DataFrame, nBatches: Int,
                            empty: DataFrame,
                            step: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val root = java.nio.file.Files.createTempDirectory("graft_fold_")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    (0 until nBatches).foreach { i =>
      StreamingSessions.appendReplayFile(
        documents.filter(pmod(xxhash64(col("doc_id")), lit(nBatches)) === i),
        inDir, i + 1)
    }
    var state = empty.localCheckpoint()
    val src = spark.readStream.schema(documents.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = step(state, batch).localCheckpoint()
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state
  }

  /** Streamed Misra–Gries maintenance: per-batch summaries folded with
    * the value-based artifact merge
    * ([[graft.operators.Sketches.heavyHitterUpdate]]). Counter values
    * vary with batching; the MG theorems the gate checks do not.
    */
  def replayHeavyHitters(documents: DataFrame, nBatches: Int = 3,
                         k: Int = 8): DataFrame =
    replayDocFold(documents, nBatches,
      Sketches.heavyHitterState(documents.limit(0), k),
      (st, b) => Sketches.heavyHitterUpdate(st, b, k))

  /** Streamed HLL vocabulary maintenance: per-batch sketches folded with
    * `hll_union_agg` ([[graft.operators.Sketches.vocabSketchUpdate]]) —
    * register-wise max, so the streamed artifact is bit-identical to the
    * one-shot build (`StreamingSpec` pins it).
    */
  def replayVocabSketch(documents: DataFrame, nBatches: Int = 3): DataFrame =
    replayDocFold(documents, nBatches,
      Sketches.vocabSketchState(documents.limit(0)),
      (st, b) => Sketches.vocabSketchUpdate(st, b))

  /** Streamed Count-Min maintenance: fold each document micro-batch into
    * the (row, col, cnt) artifact with
    * [[graft.operators.Sketches.cmsketchUpdate]]. CM merge is an EXACT
    * vector add, so the final artifact is bit-identical to the one-shot
    * build — `StreamingSpec` pins that cell-for-cell, and the gate read
    * from the streamed artifact shares `vocab_cmsketch`'s oracle.
    */
  def replayCmSketch(documents: DataFrame, nBatches: Int = 3): DataFrame =
    replayDocFold(documents, nBatches,
      Sketches.cmsketchState(documents.limit(0)),
      (st, b) => Sketches.cmsketchUpdate(st, b))
}
