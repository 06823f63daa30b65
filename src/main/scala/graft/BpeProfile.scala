package graft

// Scratch profiling harness (dev aid): splits the BPE bench queries into
// their stages to see where wall-time goes on a given fixture dir.
import org.apache.spark.sql.SparkSession

import graft.functions.TextAnalysis

object BpeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // corpus shape
    val stats = docs.selectExpr("count(*)", "sum(length(text))").head()
    println(s"docs=${stats.getLong(0)} chars=${stats.getLong(1)}")
    val types = time("word_type_count") {
      import org.apache.spark.sql.functions._
      docs.select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1))).count()
    }
    println(s"word types=$types")
    time("warm_train")(TextAnalysis.trainBpeMerges(docs).collect())
    time("train_bpe(vocab_bpe)")(TextAnalysis.trainBpeMerges(docs).collect())
    time("encode_bpe(tokenize_bpe)")(
      TextAnalysis.encodeBpe(docs).queryExecution.toRdd.count())
    spark.stop()
  }
}
