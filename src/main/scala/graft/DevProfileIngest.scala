package graft

// Scratch profiling harness (dev aid): stage-level timing of the
// CSV/JSONL round-trip queries on a fixture dir.
import org.apache.spark.sql.functions._

import graft.operators.{CsvIngest, JsonIngest}

object DevProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Dev.session()
    import Dev.time
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    println(s"events=${ev.count()}")
    time("warm")(ev.queryExecution.toRdd.count())
    time("render_json")(JsonIngest.renderJsonl(ev).queryExecution.toRdd.count())
    val lines = JsonIngest.renderJsonl(ev)
      .union(JsonIngest.malformedFixtures.toDF("value"))
    time("render+parse_json")(
      JsonIngest.parseJsonl(lines, graft.sources.EventSource.schema)
        .queryExecution.toRdd.count())
    time("full_jsonl_query")(
      JsonIngest.parseJsonl(lines, graft.sources.EventSource.schema)
        .orderBy(col("event_id")).queryExecution.toRdd.count())
    time("render_csv")(CsvIngest.renderCsv(ev).queryExecution.toRdd.count())
    val clines = CsvIngest.renderCsv(ev).union(CsvIngest.malformedFixtures.toDF("value"))
    time("render+parse_csv")(
      CsvIngest.parsePermissive(clines).queryExecution.toRdd.count())
    time("full_csv_query")(
      CsvIngest.parsePermissive(clines)
        .orderBy(col("event_id")).queryExecution.toRdd.count())
    spark.stop()
  }
}
