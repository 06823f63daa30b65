package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CsvIngest

/** Event-stream sources (S1/S2 in SURVEY.md §2.1).
  *
  * The reference's only ingress is a Kafka topic of CSV lines
  * (`flink_stream_task1.py:13-19`); this environment ships no
  * spark-sql-kafka jar (SURVEY.md §7.5.6), so the source layer is built
  * the way a Spark library should be anyway: every reader — batch or
  * streaming, file or socket or Kafka — lands on ONE canonical schema,
  * and everything downstream is source-agnostic.
  *
  * With a Kafka jar on the classpath the reference topology is exactly:
  * {{{
  * spark.readStream.format("kafka")
  *   .option("subscribe", "events")
  *   .option("startingOffsets", "earliest").load()
  *   .selectExpr("CAST(value AS STRING) AS value")
  *   .transform(CsvIngest.parsePermissive)   // same parse stage as batch
  * }}}
  */
object EventSource {

  /** Canonical event schema (FIXTURES.md §2). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Batch parquet reader (driver testdata). */
  def batch(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)

  /** Streaming file source over a parquet directory — the no-Kafka twin
    * of the reference topology; new files play the role of new offsets.
    *
    * Handles every timestamp layout the driver fixtures have shipped in,
    * detected from the batch-read footer schema so the caller never has to
    * know which one a directory holds (same normalization as
    * [[graft.Tables.events]]):
    *   - `TimestampType` — already converted, read as-is;
    *   - INT64 TIMESTAMP(NANOS) — read as long under the legacy conf,
    *     floored to micros;
    *   - timestamp[us] without UTC adjustment (`TIMESTAMP_NTZ`) — read NTZ
    *     and cast; under the UTC session timezone used throughout this
    *     library the cast is a pure reinterpretation, no instant shift.
    */
  def parquetStream(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case e: Throwable => restoreConf(spark, key, prev); throw e }
    tsType match {
      case LongType =>
        // TIMESTAMP(NANOS) directory: the conf must REMAIN set — every
        // micro-batch's parquet read consults it to admit INT64-nanos
        // columns as LongType, so restoring here would fail the stream at
        // execution time. This is the same session-wide setting
        // [[graft.Tables.apply]] makes for all driver testdata reads.
        val nanosSchema = StructType(schema.map(f =>
          if (f.name == "ts") StructField("ts", LongType) else f))
        spark.readStream.schema(nanosSchema).parquet(dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        restoreConf(spark, key, prev)
        val ntzSchema = StructType(schema.map(f =>
          if (f.name == "ts") StructField("ts", TimestampNTZType) else f))
        spark.readStream.schema(ntzSchema).parquet(dir)
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        // directory holds already-converted TimestampType events: the
        // legacy conf was only needed for the footer probe — restore it
        restoreConf(spark, key, prev)
        spark.readStream.schema(schema).parquet(dir)
    }
  }

  private def restoreConf(spark: SparkSession, key: String,
                          prev: Option[String]): Unit = prev match {
    case Some(v) => spark.conf.set(key, v)
    case None => spark.conf.unset(key)
  }

  /** Streaming CSV-line source over a text directory, going through the
    * SAME permissive parse as the reference (P1/P2): schema-on-read with
    * malformed-line drop.
    */
  def csvLineStream(spark: SparkSession, dir: String): DataFrame =
    CsvIngest.parsePermissive(spark.readStream.text(dir).toDF("value"))

  /** ORC interchange twin of the parquet path — the second builtin
    * columnar format a pipeline upstream may hand over. Snappy ORC with
    * the canonical [[schema]]; timestamps survive at microsecond
    * precision (ORC carries nanos on the wire), so a write → read
    * round-trip is exactly the identity on normalized events — the
    * `orc_roundtrip_events` query pins that against the DuckDB oracle.
    * Both sides are plain format dispatch on the builtin file source:
    * every scan optimization the parquet path gets (pushdown, pruning,
    * vectorized read) applies unchanged.
    */
  def writeOrc(events: DataFrame, dir: String): Unit =
    events.write.mode("overwrite").orc(dir)

  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schema).orc(dir)

  /** Streaming ORC file source with the canonical schema — the ORC twin
    * of [[parquetStream]]'s already-normalized branch.
    */
  def orcStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).orc(dir)

  /** Deterministic synthetic workload (S2 twin of `generator1.py`): the
    * rate source drives event ids; payload derives from userID exactly
    * like the reference generator (`generator1.py:20`), and traffic is
    * BURSTY per tenant (one tenant active per 200-event burst, like the
    * generator's phases) so session windows actually close while other
    * tenants are quiet.
    */
  /** Events per tenant burst in [[syntheticStream]]. */
  val BurstLength = 200

  def syntheticStream(spark: SparkSession, rowsPerSecond: Int): DataFrame = {
    val tenant = pmod(expr(s"value div $BurstLength"), lit(15))
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        tenant.as("user_id"),
        lit("view").as("event_type"),
        (tenant * 10.0).as("value"),
        lit("{}").as("props"))
  }
}
