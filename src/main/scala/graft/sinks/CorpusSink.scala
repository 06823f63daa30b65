package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Partitioned corpus writer — the output side of a training-data
  * pipeline (no reference equivalent; the reference's only egress is
  * stdout). A curated corpus at 100 TB ships as a partitioned columnar
  * layout so downstream consumers can prune whole directories
  * (per-language training mixes, per-language tokenizer runs) instead of
  * scanning the corpus.
  */
object CorpusSink {

  /** Write `docs` as a `pred_lang`-partitioned parquet corpus under
    * `outDir` and return the manifest (pred_lang, n_docs, total_chars),
    * computed FROM THE WRITTEN FILES — the read-back makes the manifest
    * an end-to-end check of the write path (partition values, row
    * fidelity), not a summary of the input frame.
    *
    * Scale notes: the language tag join is the langId map stage; the
    * write is `partitionBy` on a low-cardinality column (5 values), so
    * each task writes at most |langs| files — at cluster scale insert a
    * `repartition(n, col("pred_lang"))` sized to the target shard count
    * to control files-per-partition. The manifest aggregation reads only
    * (pred_lang, n_chars-bearing) columns back — partition pruning and
    * column pruning both apply to consumers.
    */
  def writePartitioned(docs: DataFrame, outDir: String): DataFrame = {
    val spark = docs.sparkSession
    val lang = TextAnalysis.langId(docs).select(col("doc_id"), col("pred_lang"))
    docs.select(col("doc_id"), col("text"))
      .join(lang, "doc_id")
      .write.mode("overwrite").partitionBy("pred_lang").parquet(outDir)
    // an empty corpus writes zero data files, and parquet cannot infer a
    // schema from none — the empty-daily-batch case must yield an empty
    // manifest, not an AnalysisException. The guard is NARROW: a read
    // failure with a non-empty input means the write path is broken and
    // must surface, never read as "corpus has zero docs".
    import spark.implicits._
    val readBack =
      try spark.read.parquet(outDir)
      catch { case _: org.apache.spark.sql.AnalysisException if docs.isEmpty =>
        Seq.empty[(Long, String, String)].toDF("doc_id", "text", "pred_lang")
      }
    readBack
      .groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .orderBy(col("pred_lang"))
  }
}
