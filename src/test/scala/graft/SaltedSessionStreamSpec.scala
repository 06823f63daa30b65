package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessions
import graft.streaming.{SaltedSessionStream, StreamingSessions}

/** Pins the streaming salted session fold: bounded-disorder replay ≡
  * batch sessionization, exactly-once emission across batches, and the
  * skip-committed-replay guard.
  */
class SaltedSessionStreamSpec extends SparkSpec {

  // deterministic skewed corpus in the events-table schema: ~90% of
  // events on user 4, irregular spacing, 3 replay slices so sessions
  // straddle micro-batch boundaries
  private def corpus(n: Long) = spark.range(n).selectExpr(
    "id as event_id",
    "timestamp_micros(1704067200000000 + (id * 17 + pmod(hash(id), 45)) * 1000000) as ts",
    "CASE WHEN pmod(id, 10) < 9 THEN 4 ELSE pmod(id, 7) END as user_id",
    "'view' as event_type",
    "cast(pmod(hash(id * 31), 10000) as double) / 100.0 as value",
    "'{}' as props")

  private def sorted(d: org.apache.spark.sql.DataFrame) =
    d.select(col("user_id"), col("session_start"), col("session_end"),
      col("event_count"), col("session_sum"), col("session_avg"))
      .orderBy(col("user_id"), col("session_start")).collect().toSeq

  test("replay ≡ batch sessionAgg on a skewed corpus (static gap)") {
    val ev = corpus(3000)
    val got = sorted(SaltedSessionStream.replaySaltedSessions(
      ev, lit("30 seconds"), sliceSeconds = 60L))
    val want = sorted(Sessions.sessionAgg(ev, lit("30 seconds")))
    assert(got.nonEmpty && got == want)
  }

  test("replay ≡ batch under per-user dynamic bands") {
    val ev = corpus(2000).withColumn("user_id",
      when(pmod(col("event_id"), lit(40)) === 19, 9999L)
        .when(pmod(col("event_id"), lit(40)) === 29, 5L)
        .otherwise(col("user_id")))
    val got = sorted(SaltedSessionStream.replaySaltedSessions(
      ev, Sessions.referenceDynamicGap, sliceSeconds = 600L))
    val want = sorted(Sessions.sessionAgg(ev, Sessions.referenceDynamicGap))
    assert(got.nonEmpty && got == want)
  }

  test("committed batches skip on replay; sessions emit exactly once") {
    val ev = corpus(1500)
    val root = StreamingSessions.writeReplaySlices(ev, 300L * 1000000, 3)
    try {
      def runOnce(ckpt: String): Unit = SaltedSessionStream.run(spark,
        root.resolve("in").toString, root.resolve("state").toString,
        root.resolve("out").toString, root.resolve(ckpt).toString,
        ev.schema, lit("30 seconds"), 600L * 1000000, 60L)
      runOnce("ckpt")
      def out() = graft.streaming.StreamingDedup
        .readOutput(spark, root.resolve("out").toString)
        .filter(!(col("user_id") <=> lit(StreamingSessions.FlushUser)))
      val first = sorted(out())
      // every session appears EXACTLY once across all batch outputs
      assert(first.size == first.distinct.size)
      assert(first == sorted(Sessions.sessionAgg(ev, lit("30 seconds"))))
      // a full replay with a fresh checkpoint re-delivers every batch id;
      // the marker's last_batch_id marks them all committed -> no state
      // churn, no duplicate output rows
      runOnce("ckpt2")
      assert(sorted(out()) == first)
      // bounded retention: at most two committed state snapshots
      val stateDirs = java.nio.file.Files.list(root.resolve("state"))
        .toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => p.getFileName.toString.startsWith("batch=") &&
          java.nio.file.Files.exists(p.resolve("_SUCCESS")))
      assert(stateDirs.nonEmpty && stateDirs.size <= 2)
    } finally StreamingSessions.deleteRecursively(root)
  }

  test("early-close rule: a session closes only past the watermark") {
    // two events for one user 25 h apart with a 2 h gap: the first
    // session's end (ts+2h) is far below the final watermark, the
    // sentinel closes the second too; both emit, counts exact
    val ev = spark.range(2).selectExpr(
      "id as event_id",
      "timestamp_micros(1704067200000000 + id * 90000000000) as ts",
      "cast(7 as bigint) as user_id", "'view' as event_type",
      "cast(1.5 as double) as value", "'{}' as props")
    val got = sorted(SaltedSessionStream.replaySaltedSessions(
      ev, lit("2 hours"), sliceSeconds = 3600L))
    assert(got == sorted(Sessions.sessionAgg(ev, lit("2 hours"))))
    assert(got.size == 2)
  }
}
