package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{CsvIngest, Curation, Dedup, JsonIngest, Multimodal, NearDup, Relational, Sessions, Similarity}
import graft.streaming.StreamingSessions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the LLM-pipeline extensions) has an
  * entry in [[queries]]; SQL-expressible ones also have a DuckDB oracle in
  * [[oracleSql]]. Column names and arithmetic are kept bit-identical between
  * the Spark query and the oracle (integer-cents convention, explicit
  * `floor(x+0.5)` rounding — SURVEY.md §7.5.2).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("t1_sessions_2h")(spark, "/root/testdata/sf0.001")

  private def registries = Seq(
    RegistrySessions.queries, RegistryRelational.queries,
    RegistrySketches.queries, RegistryText.queries, RegistryDedup.queries,
    RegistryAnn.queries, RegistryMultimodal.queries, RegistryCuration.queries)

  private def oracleRegistries = Seq(
    RegistrySessions.oracles, RegistryRelational.oracles,
    RegistrySketches.oracles, RegistryText.oracles, RegistryDedup.oracles,
    RegistryAnn.oracles, RegistryMultimodal.oracles, RegistryCuration.oracles)

  /** Union of the per-domain registries (mechanical split, r14 — see
    * Registry*.scala; entries and oracle SQL are verbatim moves). The
    * require makes a cross-domain key collision loud: a duplicate key
    * would silently shadow one domain's query with another's.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = registries.reduce(_ ++ _)
    require(all.size == registries.map(_.size).sum,
      "duplicate query key across domain registries")
    all
  }

  def oracleSql: Map[String, String] = {
    val all = oracleRegistries.reduce(_ ++ _)
    require(all.size == oracleRegistries.map(_.size).sum,
      "duplicate oracle key across domain registries")
    all
  }
}
