package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CSV wire-format parity (P1/P2): the reference's events travel as CSV
  * lines `timestamp,userID,sessionID,payload` (`generator1.py:21`) and are
  * parsed permissively — wrong arity / failed casts drop the row instead of
  * failing the job (`flink_stream_task1.py:21-36,45-46`).
  *
  * Spark-first shape: the parse is a pure `DataFrame → DataFrame` stage over
  * a single string column, so the same code serves `spark.read.text`, a
  * Kafka `CAST(value AS STRING)` stream (no kafka jar in this env — SURVEY.md
  * §7.5.6), or an in-memory rendered frame. Everything is builtin codegen'd
  * expressions (`split`/`try_cast`/`try_to_timestamp`) — no UDFs, so the
  * parse stays inside whole-stage codegen at 100 TB.
  */
object CsvIngest {

  val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Render driver events in the reference wire format (workload-generator
    * twin of `generator1.py:17-21`, with `event_id` standing in for
    * `sessionID` per FIXTURES.md §2).
    */
  def renderCsv(events: DataFrame): DataFrame =
    events.select(concat_ws(",",
      date_format(col("ts"), TsFormat),
      col("user_id"), col("event_id"), col("value")).as("value"))

  /** Permissive parse with malformed-row drop. `try_*` variants keep ANSI
    * mode on (Spark 4 default) while mapping cast failures to NULL → filter,
    * exactly the reference's None-and-filter behavior.
    */
  def parsePermissive(lines: DataFrame): DataFrame = {
    val parts = split(trim(col("value")), ",")
    lines
      .withColumn("p", parts)
      .filter(size(col("p")) === 4) // arity check, flink_stream_task1.py:25
      .select(
        try_to_timestamp(trim(element_at(col("p"), 1)), lit(TsFormat)).as("ts"),
        expr("try_cast(trim(p[1]) AS BIGINT)").as("user_id"),
        expr("try_cast(trim(p[2]) AS BIGINT)").as("transaction_id"),
        expr("try_cast(trim(p[3]) AS DOUBLE)").as("payload_value"))
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("transaction_id").isNotNull && col("payload_value").isNotNull)
  }

  /** The malformed fixtures every parse test must drop (FIXTURES.md §1). */
  val malformedFixtures: Seq[String] = Seq(
    "2024-01-01 00:00:00.000000,1,2",            // arity 3
    "2024-01-01 00:00:00.000000,1,2,3,4",        // arity 5
    "not-a-date,1,2,3.5",                        // bad timestamp
    "2024-01-01 00:00:00.000000,x,2,3.5",        // bad user id
    "2024-01-01 00:00:00.000000,1,y,3.5",        // bad transaction id
    "2024-01-01 00:00:00.000000,1,2,zz",         // bad payload
    "",                                          // blank line
    ",,,")                                       // empty fields
}
