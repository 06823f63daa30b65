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
}
