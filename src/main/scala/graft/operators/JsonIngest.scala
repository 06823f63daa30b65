package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL wire-format ingestion (north-star extension): the line-delimited
  * JSON shape LLM training corpora actually travel in. Mirrors
  * [[CsvIngest]]: render/parse are pure `DataFrame → DataFrame` stages
  * over one string column, so the same parse serves `spark.read.text`,
  * a Kafka value stream, or an in-memory frame — and stays inside
  * whole-stage codegen (`to_json`/`from_json` are builtin expressions).
  *
  * Permissiveness contract: an unparseable LINE drops (from_json yields a
  * null struct → filter); a parseable object with missing/null FIELDS
  * survives with nulls — JSON's optional-field semantics, distinct from
  * the CSV parser's all-fields-required arity rule.
  */
object JsonIngest {

  /** Microsecond-precision timestamp wire format: Spark's default JSON
    * timestamp pattern carries millis only, which would silently truncate
    * the events table's microsecond timestamps on the way out.
    *
    * `timestampNTZFormat` is pinned to the SAME pattern: `timestampFormat`
    * does not apply to a `TIMESTAMP_NTZ` column, so without it an NTZ
    * input renders with the default NTZ pattern and then fails the strict
    * micros parse on the way back in — every line lands in
    * `_corrupt_record` and the round-trip silently drops the whole corpus
    * (0 rows, schema still matching — the worst failure mode).
    */
  val JsonOptions: Map[String, String] = Map(
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Render rows as JSONL lines ({"event_id":...,"ts":"...",...}). */
  def renderJsonl(events: DataFrame): DataFrame =
    events.select(
      to_json(struct(events.columns.map(col): _*), JsonOptions).as("value"))

  /** Parse JSONL lines against `schema`; drop lines that are not JSON
    * objects, keep field-level nulls.
    *
    * Permissive-mode `from_json` reports an unparseable line as an
    * all-null row, indistinguishable from a legitimate `{}` — the
    * corrupt-record column is the builtin disambiguator: it is non-null
    * exactly for malformed lines, so filtering on it drops garbage while
    * keeping sparse-but-valid objects.
    */
  def parseJsonl(lines: DataFrame, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    lines
      .select(from_json(col("value"), withCorrupt,
        JsonOptions + ("columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
      .filter(col("r").isNotNull && col("r._corrupt_record").isNull)
      .select(schema.fieldNames.map(f => col(s"r.$f")): _*)
  }

  /** Lines every JSONL parse must drop (not valid JSON objects). */
  val malformedFixtures: Seq[String] = Seq(
    "{",                       // truncated object
    "not json at all",         // free text
    "[1,2,3",                  // truncated array
    "")                        // blank line
}
