package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed parity of the reference's duck-typed session reduce
  * (`flink_stream_task1.py:53-62`: merge raw events and partial
  * aggregates into `{session_sum, count}`). Spark separates input /
  * buffer / output types, so the dict duck-typing disappears: this is an
  * `Aggregator[Double, (Double, Long), SessionStats]` usable from the
  * typed Dataset API (`ds.groupByKey(...).agg(SessionReduce.toColumn)`)
  * or registered as a UDAF.
  *
  * The relational path ([[graft.operators.Sessions.sessionAgg]]) remains
  * the production route — builtin sum/count get partial aggregation and
  * codegen; this exists for Dataset-API parity (SURVEY.md §7.4,
  * "nice-to-have") and is exercised in `SessionsSpec`.
  */
case class SessionStats(session_sum: Double, count: Long, session_avg: Double)

object SessionReduce extends Aggregator[Double, (Double, Long), SessionStats] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), value: Double): (Double, Long) =
    (b._1 + value, b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): SessionStats = {
    val cents = math.round(r._1 * 100).toDouble
    SessionStats(cents / 100.0, r._2,
      math.floor(cents / math.max(1L, r._2) + 0.5) / 100.0)
  }
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[SessionStats] = Encoders.product[SessionStats]
}
