package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingSessions

/** Timestamp-layout drift protection: the driver has regenerated the
  * events fixture in different parquet timestamp encodings across rounds
  * (INT64 TIMESTAMP(NANOS) → timestamp[us]/TIMESTAMP_NTZ), and each drift
  * silently broke every `ts` consumer until the next driver run surfaced
  * it. This suite pins [[Tables.events]] and
  * [[graft.sources.EventSource.parquetStream]] to ONE normalized output
  * contract — microsecond `TimestampType`, identical instants — across
  * every layout that has shipped, so the next drift fails here, in
  * `sbt test`, not a round later in the correctness report.
  *
  * The NANOS layout is a COMMITTED pyarrow-written fixture
  * (`src/test/resources/events_ts_nanos.parquet`, physical type
  * `INT64 TIMESTAMP(isAdjustedToUTC=false, NANOS)`) because Spark cannot
  * write that annotation itself — a plain long column would read as
  * LongType with or without `spark.sql.legacy.parquet.nanosAsLong` and
  * would never exercise the legacy-conf admission path the real round-1
  * fixtures require.
  */
class TsLayoutSpec extends SparkSpec {
  import spark.implicits._

  // one event at 2024-01-01T00:00:01.234567Z plus one a minute later —
  // the same rows the committed nanos fixture holds
  private val microsA = 1704067201234567L
  private val microsB = microsA + 60L * 1000000L

  /** Write (or copy) `events.parquet` under `root` with `ts` encoded per
    * `layout`, returning the dir usable as an sfDir.
    */
  private def writeLayout(root: java.nio.file.Path, layout: String): String = {
    val dir = root.resolve(layout)
    layout match {
      case "nanos" =>
        // the committed fixture FILE goes inside an events.parquet
        // DIRECTORY (like Spark-written tables) so the streaming file
        // source — which requires a directory — reads it too
        val table = dir.resolve("events.parquet")
        java.nio.file.Files.createDirectories(table)
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(
            getClass.getResource("/events_ts_nanos.parquet").toURI),
          table.resolve("part-00000.parquet"))
      case _ =>
        val base = Seq(
          (1L, microsA, 7L, "view", 1.5, "{}"),
          (2L, microsB, 8L, "click", 2.5, "{}"))
          .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        val withTs = layout match {
          case "ntz" => base.withColumn("ts",
            timestamp_micros(col("us")).cast(TimestampNTZType))
          case "timestamp" => base.withColumn("ts", timestamp_micros(col("us")))
        }
        withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("overwrite")
          .parquet(dir.resolve("events.parquet").toString)
    }
    dir.toString
  }

  private val layouts = Seq("nanos", "ntz", "timestamp")

  test("Tables.events normalizes every shipped ts layout to the same instants") {
    val root = java.nio.file.Files.createTempDirectory("graft-ts-batch")
    try layouts.foreach { layout =>
      val ev = Tables.events(spark, writeLayout(root, layout))
      assert(ev.schema("ts").dataType == TimestampType,
        s"layout $layout: wrong normalized type")
      val got = ev.orderBy("event_id")
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq
      assert(got == Seq(microsA, microsB),
        s"layout $layout: instants shifted")
    } finally StreamingSessions.deleteRecursively(root)
  }

  test("parquetStream normalizes every shipped ts layout to the same instants") {
    val root = java.nio.file.Files.createTempDirectory("graft-ts-stream")
    try layouts.foreach { layout =>
      val dir = s"${writeLayout(root, layout)}/events.parquet"
      val streamed = graft.sources.EventSource.parquetStream(spark, dir)
      assert(streamed.schema("ts").dataType == TimestampType,
        s"layout $layout: wrong streaming type")
      val q = streamed.writeStream.format("memory")
        .queryName(s"ts_layout_$layout").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(s"ts_layout_$layout").orderBy("event_id")
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq
      assert(got == Seq(microsA, microsB), s"layout $layout streamed")
    } finally StreamingSessions.deleteRecursively(root)
  }

  test("fixture drift tripwire: every driver table keeps its canonical field types") {
    // the OTHER half of the r7 lesson: a regenerated documents/embeddings
    // fixture must fail ONE readable test here, not 15 scattered analysis
    // errors a round later. Checked across sf dirs because regeneration
    // rewrites all of them.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      assert(Tables.events(spark, dir).schema == graft.sources.EventSource.schema,
        s"$sf/events drifted: ${Tables.events(spark, dir).schema.simpleString}")
      val doc = Tables.documents(spark, dir).schema
      assert(doc.map(f => f.name -> f.dataType) == Seq(
        "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType),
        s"$sf/documents drifted: ${doc.simpleString}")
      val em = Tables.embeddings(spark, dir).schema
      assert(em.fieldNames.toSeq == Seq("vec_id", "embedding", "label") &&
        em("vec_id").dataType == LongType &&
        em("label").dataType == IntegerType,
        s"$sf/embeddings drifted: ${em.simpleString}")
      em("embedding").dataType match {
        case ArrayType(FloatType, _) => // list<float>, the operators' contract
        case other => fail(s"$sf/embeddings.embedding drifted: $other")
      }
    }
  }
}
