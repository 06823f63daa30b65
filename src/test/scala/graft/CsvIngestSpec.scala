package graft

import org.apache.spark.sql.functions.col

import graft.operators.JsonIngest
import graft.sources.EventSource

class JsonIngestSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl roundtrip preserves micros and field-level nulls; drops garbage") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val lines = JsonIngest.renderJsonl(events)
      .union(JsonIngest.malformedFixtures.toDF("value"))
      .union(Seq("""{"event_id": 424242}""").toDF("value")) // sparse object
    val parsed = JsonIngest.parseJsonl(lines, EventSource.schema)
    assert(parsed.count() == events.count() + 1, "garbage dropped, sparse kept")
    val sparse = parsed.filter(col("event_id") === 424242L).collect()
    assert(sparse.length == 1 && sparse.head.isNullAt(1), "missing fields stay null")
    val roundtripped = parsed.filter(col("event_id") =!= 424242L ||
        col("event_id").isNull)
      .collect().map(_.toSeq).toSet
    assert(roundtripped == events.collect().map(_.toSeq).toSet,
      "roundtrip is lossless incl. microsecond timestamps")
  }
}

import org.apache.spark.sql.functions._

import graft.operators.CsvIngest

class CsvIngestSpec extends SparkSpec {
  import spark.implicits._

  test("malformed rows are dropped, well-formed survive exactly") {
    val good = Seq(
      "2024-01-01 08:00:00.000000,4,417312,40.5",
      "2024-01-01 08:05:00.123456,9999,1,2.25")
    val lines = (good ++ CsvIngest.malformedFixtures).toDF("value")
    val out = CsvIngest.parsePermissive(lines).orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(4L, 9999L))
    assert(out.head.getAs[Double]("payload_value") == 40.5)
    assert(out.head.getAs[java.sql.Timestamp]("ts") == ts("2024-01-01 08:00:00"))
  }

  test("render → parse roundtrips the events table at sf0.001") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val back = CsvIngest.parsePermissive(CsvIngest.renderCsv(ev))
    assert(back.count() == ev.count())
    // spot-check full-fidelity timestamp + value on a deterministic row
    val orig = ev.orderBy("event_id").limit(1).collect().head
    val rt = back.orderBy("transaction_id").limit(1).collect().head
    assert(rt.getAs[java.sql.Timestamp]("ts") == orig.getAs[java.sql.Timestamp]("ts"))
    assert(rt.getAs[Double]("payload_value") == orig.getAs[Double]("value"))
  }
}
