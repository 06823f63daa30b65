package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming document ingest with exact-dedup admission — the production
  * loop a training-data pipeline runs continuously: documents arrive as
  * micro-batches, each batch is admitted against the PERSISTED canonical
  * key table ([[graft.operators.Dedup.incrementalExact]]'s supplied-table
  * path, so per-batch work is O(batch) + one key-table join), and the
  * table is extended with the batch's newly-admitted keys before the next
  * batch fires.
  *
  * `foreachBatch` is the right Spark shape here: admission needs a join
  * against mutable on-disk state AND a write-back to it, which the pure
  * streaming operators (`dropDuplicates` state store) cannot express
  * across restarts of different queries sharing one index. Batch-local
  * dedup, index join, and the append are all the engine's own relational
  * operators.
  *
  * Exactly-once caveat (documented, not hidden): plain parquet appends
  * make a replayed micro-batch append twice; a production deployment puts
  * a transactional table format or batch-id-keyed idempotent writer under
  * the same loop. To keep that failure BOUNDED to the output dir, the key
  * table is canonicalized on read (min canonical_id per text_key) — a
  * replayed append can duplicate key rows on disk, but later batches
  * still see one row per key, so their admission joins never fan out.
  * The admission LOGIC is unchanged either way, which is what the spec
  * pins (stream ≡ whole-corpus batch dedup).
  */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val keySchema: StructType = StructType(Seq(
    StructField("text_key", StringType), StructField("canonical_id", LongType)))

  /** Run the ingest-admission loop over parquet files appearing in `inDir`
    * (one file per micro-batch, mtime order) until drained
    * (`Trigger.AvailableNow`). Admissions append to `outDir`; the
    * canonical key table lives (and persists across calls) in `keyDir`.
    */
  def exactAdmissionStream(spark: SparkSession, inDir: String, keyDir: String,
                           outDir: String, ckptDir: String): Unit = {
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val step: (DataFrame, Long) => Unit = (batch, _) => {
      val b = batch.persist()
      try {
        val sess = b.sparkSession
        // Hadoop FS existence check (not java.io.File) so the key table can
        // live on HDFS/S3 in a cluster deployment, per the docstring above.
        val keyPath = new org.apache.hadoop.fs.Path(keyDir)
        val fs = keyPath.getFileSystem(sess.sparkContext.hadoopConfiguration)
        val idx =
          if (fs.exists(keyPath))
            // canonicalize on read: a replayed append may have written a
            // key twice; min(canonical_id) per key keeps admission joins
            // one-row-per-key regardless (min of duplicates == the value)
            sess.read.schema(keySchema).parquet(keyDir)
              .groupBy(col("text_key"))
              .agg(min(col("canonical_id")).as("canonical_id"))
          else sess.createDataFrame(
            sess.sparkContext.emptyRDD[org.apache.spark.sql.Row], keySchema)
        val admitted = graft.operators.Dedup
          .incrementalExact(b.limit(0), b, indexKeys = Some(idx))
          .persist()
        try {
          admitted.write.mode("append").parquet(outDir)
          // extend the index with this batch's newly-admitted canonicals
          admitted.filter(col("admitted")).join(b, "doc_id")
            .select(md5(col("text")).as("text_key"),
              col("doc_id").as("canonical_id"))
            .write.mode("append").parquet(keyDir)
        } finally admitted.unpersist()
      } finally b.unpersist()
    }
    val q = stream.writeStream.foreachBatch(step)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .start()
    q.awaitTermination()
  }

  private val shingleSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("shingles", org.apache.spark.sql.types.ArrayType(StringType))))
  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", org.apache.spark.sql.types.ArrayType(LongType))))
  private val labelSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("cluster_id", LongType)))

  /** Streaming NEAR-dup admission — the continuous form of
    * [[graft.operators.NearDup.incrementalNearDupsIndexed]]: each
    * micro-batch is admitted against the persisted artifact tables
    * (`indexDir/shingles`, `indexDir/sigs`, `indexDir/labels/batch=N`),
    * then the artifacts are extended — shingles/signatures append
    * (map-only over the batch), and the label table is snapshotted under
    * the micro-batch's id.
    *
    * Replay safety, by construction rather than by luck:
    *  - the batch is first filtered to ids ABOVE the signature artifact's
    *    frontier (`max(doc_id)` — parquet footer stats), so a replayed
    *    micro-batch whose artifacts already landed processes an empty
    *    effective batch instead of tripping the monotone-id guard;
    *  - the label snapshot (versioned `batch=N`, overwrite) is written
    *    BEFORE the artifact appends, and the snapshot math is idempotent
    *    (labels only decrease; union + min per doc), so every crash point
    *    replays to the same state;
    *  - the one non-idempotent write is the output append — same
    *    documented caveat as the exact loop (duplicate OUTPUT rows, never
    *    corrupted index state).
    */
  def nearDupAdmissionStream(spark: SparkSession, inDir: String,
                             indexDir: String, outDir: String,
                             ckptDir: String): Unit = {
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val step: (DataFrame, Long) => Unit = (batch, batchId) => {
      val b = batch.persist()
      try {
        val sess = b.sparkSession
        val conf = sess.sparkContext.hadoopConfiguration
        def readOr(sub: String, schema: StructType): DataFrame = {
          val p = new org.apache.hadoop.fs.Path(indexDir, sub)
          if (p.getFileSystem(conf).exists(p))
            sess.read.schema(schema).parquet(p.toString)
          else sess.createDataFrame(
            sess.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        }
        val labRoot = new org.apache.hadoop.fs.Path(indexDir, "labels")
        val labFs = labRoot.getFileSystem(conf)
        // latest complete label snapshot (highest batch=N); a replayed
        // batch N reads the same N-1 state it saw the first time only if
        // its own overwrite hasn't landed — either way the snapshot it
        // writes is derived from monotone-decreasing labels, so re-running
        // against its own output is a no-op (min is idempotent)
        val latest: Option[org.apache.hadoop.fs.Path] =
          if (!labFs.exists(labRoot)) None
          else labFs.listStatus(labRoot).toSeq
            .filter(_.getPath.getName.startsWith("batch="))
            .sortBy(_.getPath.getName.stripPrefix("batch=").toLong)
            .lastOption.map(_.getPath)
        val idxLab = latest
          .map(p => sess.read.schema(labelSchema).parquet(p.toString))
          .getOrElse(sess.createDataFrame(
            sess.sparkContext.emptyRDD[org.apache.spark.sql.Row], labelSchema))
        val idxSigs = readOr("sigs", sigSchema)
        // replay frontier: docs at-or-below the signature artifact's max id
        // were already admitted AND indexed by an earlier (crashed-after-
        // append) attempt of this batch — reprocessing them would trip the
        // monotone-id guard and double-index them
        val frontier = idxSigs.agg(max(col("doc_id"))).head()
        val eff = (if (frontier.isNullAt(0)) b
                   else b.filter(col("doc_id") > frontier.getLong(0))).persist()
        try {
          val (admissions, newLabels) = graft.operators.NearDup
            .incrementalNearDupsIndexed(
              readOr("shingles", shingleSchema), idxSigs, idxLab, eff)
          admissions.write.mode("append").parquet(outDir)
          // snapshot labels BEFORE the artifact appends: if the append
          // crashes, the replayed batch re-derives the identical snapshot
          // (ignored-extra label rows + min-idempotence), never a stale one
          newLabels.write.mode("overwrite")
            .parquet(new org.apache.hadoop.fs.Path(labRoot, s"batch=$batchId").toString)
          // extend the artifacts with this batch (map-only passes)
          val bSh = graft.operators.NearDup.shingled(eff).persist()
          try {
            bSh.write.mode("append")
              .parquet(new org.apache.hadoop.fs.Path(indexDir, "shingles").toString)
            graft.operators.NearDup.minhashSignatures(bSh).write.mode("append")
              .parquet(new org.apache.hadoop.fs.Path(indexDir, "sigs").toString)
          } finally bSh.unpersist()
        } finally eff.unpersist()
      } finally b.unpersist()
    }
    val q = stream.writeStream.foreachBatch(step)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .start()
    q.awaitTermination()
  }
}
