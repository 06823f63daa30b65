package graft

// Dev phase-decomposition of the byte-level BPE tokenize query at sf0.1
// (numbers land in ARCHITECTURE.md): training vs kernel-encode vs vocab
// collect vs per-doc reassembly, on the planted-non-ASCII corpus the
// tokenize_bpe_bytes query uses.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevBpeBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).withColumn("text",
      replace(replace(col("text"), lit("a"), lit("ä")), lit("o"), lit("ø")))
      .localCheckpoint()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpebytes] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val merges = time("train")(
      graft.functions.TextAnalysis.bpeBytesMerges(docs, 10))
    val words = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val symArrs = time("kernel encode + ckpt")(
      words.select(col("doc_id"), col("pos"),
        graft.functions.BpeOps.encodeNative(spark, col("word"),
          merges.map(m => (m._2, m._3)), byteLevel = true).as("syms"))
        .localCheckpoint())
    val idOf = time("vocab collect")(
      symArrs.select(explode(col("syms")).as("sym"))
        .groupBy(col("sym")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("sym"))
        .collect()
        .zipWithIndex.map { case (r, i) => r.getString(0) -> (i + 1L) }.toMap)
    println(s"[bpebytes] vocab size = ${idOf.size}")
    val idMap = typedlit(idOf)
    time("reassembly agg")(
      symArrs
        .withColumn("ids", transform(col("syms"), s => element_at(idMap, s)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(size(col("ids"))).cast("long").as("n_tokens"),
          concat_ws(" ", transform(
            flatten(transform(
              array_sort(collect_list(struct(col("pos"), col("ids")))),
              s => s.getField("ids"))),
            i => i.cast("string"))).as("ids_str"))
        .orderBy(col("doc_id")).count())
    // full operator for comparison, then the char twin
    time("encodeBpeBytes total")(
      graft.functions.TextAnalysis.encodeBpeBytes(docs, 10).count())
    time("encodeBpe (char twin)")(
      graft.functions.TextAnalysis.encodeBpe(
        Tables.documents(spark, sfDir), 10).count())
    spark.stop()
  }
}
