package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Continuous report output (S3 in SURVEY.md §2.1): the reference prints a
  * fixed-width header once, then one formatted row per closed session
  * (`flink_stream_task1.py:75-85`); tasks 2/3 print `tabulate`-style grids
  * (`flink_stream_task2.py:100`).
  *
  * In an engine, formatting is the SINK's job, not the operator's — the
  * session operators stay relational and this layer renders. Both renders
  * are plain projections (codegen'd `format_string`), so a report stream is
  * just `writeStream` over the rendered frame.
  */
object ReportSink {

  /** Task-1 style fixed-width row (`flink_stream_task1.py:75`):
    * `%-10s %-15s %-15s` over (user, sum, avg).
    */
  def fixedWidth(sessions: DataFrame): DataFrame =
    sessions.select(format_string("%-10s %-15s %-15s",
      col("user_id"), col("session_sum"), col("session_avg")).as("line"))

  val header: String =
    String.format("%-10s %-15s %-15s", "User ID", "Session Sum", "Session Avg")

  /** Tabulate-grid style (tasks 2/3): pipe-separated cells. */
  def grid(sessions: DataFrame): DataFrame =
    sessions.select(format_string("| %-8s | %-13s | %-13s |",
      col("user_id"), col("session_sum"), col("session_avg")).as("line"))

  /** Continuous console report for a streaming session frame — the
    * `print()` sink twin. Caller starts/stops the returned writer.
    */
  def consoleReport(sessions: DataFrame): DataStreamWriter[Row] =
    fixedWidth(sessions).writeStream
      .format("console").option("truncate", "false")
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .outputMode("append")
}
