package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timestamp-layout drift protection: the driver has regenerated the
  * events fixture in different parquet timestamp encodings across rounds
  * (INT64 TIMESTAMP(NANOS) → timestamp[us]/TIMESTAMP_NTZ), and each drift
  * silently broke every `ts` consumer until the next driver run surfaced
  * it. This suite pins [[Tables.events]] and
  * [[graft.sources.EventSource.parquetStream]] to ONE normalized output
  * contract — microsecond `TimestampType`, identical instants — across
  * every layout that has shipped, so the next drift fails here, in
  * `sbt test`, not a round later in the correctness report.
  */
class TsLayoutSpec extends SparkSpec {
  import spark.implicits._

  // one event at 2024-01-01T00:00:01.234567Z plus one a minute later
  private val microsA = 1704067201234567L
  private val microsB = microsA + 60L * 1000000L

  /** Write `events.parquet` under a fresh dir with `ts` encoded per
    * `layout`, returning the dir usable as an sfDir.
    */
  private def writeLayout(layout: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ts-$layout")
    val base = Seq(
      (1L, microsA, 7L, "view", 1.5, "{}"),
      (2L, microsB, 8L, "click", 2.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val df = layout match {
      case "nanos_long" =>
        // the INT64-nanos fixture reads as LongType under the legacy
        // conf; a plain long column round-trips to the same read shape
        base.withColumn("ts", col("us") * 1000L)
      case "ntz" =>
        base.withColumn("ts",
          timestamp_micros(col("us")).cast(TimestampNTZType))
      case "timestamp" =>
        base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir.toString
  }

  private val layouts = Seq("nanos_long", "ntz", "timestamp")

  test("Tables.events normalizes every shipped ts layout to the same instants") {
    layouts.foreach { layout =>
      val ev = Tables.events(spark, writeLayout(layout))
      assert(ev.schema("ts").dataType == TimestampType,
        s"layout $layout: wrong normalized type")
      val got = ev.orderBy("event_id")
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq
      assert(got == Seq(microsA, microsB),
        s"layout $layout: instants shifted")
    }
  }

  test("parquetStream normalizes every shipped ts layout to the same instants") {
    layouts.foreach { layout =>
      val dir = s"${writeLayout(layout)}/events.parquet"
      val streamed = graft.sources.EventSource.parquetStream(spark, dir)
      assert(streamed.schema("ts").dataType == TimestampType,
        s"layout $layout: wrong streaming type")
      val q = streamed.writeStream.format("memory")
        .queryName(s"ts_layout_$layout").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(s"ts_layout_$layout").orderBy("event_id")
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq
      assert(got == Seq(microsA, microsB), s"layout $layout streamed")
    }
  }
}
