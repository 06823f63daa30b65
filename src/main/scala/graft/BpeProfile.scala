package graft

// Scratch profiling harness (dev aid): splits the BPE bench queries into
// their stages to see where wall-time goes on a given fixture dir.
import graft.functions.TextAnalysis

object BpeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Dev.session()
    import Dev.time
    val docs = Tables.documents(spark, sfDir)
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

    // Scale probe for the adaptive cutover: synthetic corpora just below
    // and far above BpeDriverTypeLimit word types (4-letter words drawn
    // from a hashed id space), exercising BOTH training paths at realistic
    // vocabulary sizes. 100k docs x 20 words = 2M corpus tokens.
    def synth(nDocs: Long, types: Int) = {
      import org.apache.spark.sql.functions._
      spark.range(nDocs).select(
        col("id").as("doc_id"),
        expr(s"""concat_ws(' ', transform(sequence(1, 20), i -> concat(
          chr(97 + pmod(xxhash64(id * 31 + i), $types) % 26),
          chr(97 + (pmod(xxhash64(id * 31 + i), $types) div 26) % 26),
          chr(97 + (pmod(xxhash64(id * 31 + i), $types) div 676) % 26),
          chr(97 + (pmod(xxhash64(id * 31 + i), $types) div 17576) % 26))))""")
          .as("text"))
    }
    Seq(("local_path_90k_types", 90000), ("distributed_300k_types", 300000))
      .foreach { case (name, types) =>
        val big = synth(100000L, types)
        val distinct = time(s"${name}_typecount") {
          import org.apache.spark.sql.functions._
          big.select(explode(split(col("text"), " "))).distinct().count()
        }
        println(s"  distinct types=$distinct")
        time(name)(TextAnalysis.trainBpeMerges(big).collect())
      }
    spark.stop()
  }
}
