package graft

import org.apache.spark.sql.functions._

import graft.sources.EventSource
import graft.streaming.StreamingSessions

/** ORC interchange path: write → read is the identity on normalized
  * events (microsecond timestamps intact), and the streaming ORC source
  * feeds the same session pipeline as the parquet stream.
  */
class OrcSpec extends SparkSpec {

  test("ORC write -> read round-trips events exactly") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-orc")
    try {
      val dir = root.resolve("events").toString
      EventSource.writeOrc(ev, dir)
      val back = EventSource.readOrc(spark, dir)
      assert(back.schema == EventSource.schema)
      val a = ev.orderBy("event_id").collect()
      val b = back.orderBy("event_id").collect()
      assert(a.length == b.length && a.sameElements(b))
    } finally StreamingSessions.deleteRecursively(root)
  }

  test("streaming ORC source through session agg equals the batch result") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-orc-s")
    try {
      val dir = root.resolve("events").toString
      EventSource.writeOrc(ev, dir)
      val streamed = StreamingSessions.sessionAggStream(
        EventSource.orcStream(spark, dir), lit("2 hours"))
      val q = streamed.writeStream.format("memory")
        .queryName("orc_sess").outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("orc_sess")
        .orderBy("user_id", "session_start").collect()
      val want = graft.operators.Sessions.sessionAgg(ev, lit("2 hours"))
        .orderBy("user_id", "session_start").collect()
      assert(got.length == want.length && got.sameElements(want))
    } finally StreamingSessions.deleteRecursively(root)
  }
}
