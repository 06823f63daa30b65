package graft

// Scratch profiling harness (dev aid).
import org.apache.spark.sql.SparkSession
import graft.operators.NearDup

object DevProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    time("ngram_full")(NearDup.jaccardNearDupsExact(docs).count())
    time("minhash_full")(NearDup.minhashNearDups(docs).count())
    // ngram internals: posting count and pair fan-out
    locally {
      import org.apache.spark.sql.functions._
      val sh = NearDup.shingled(docs)
      val posting = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n"),
        explode(col("shingles")).as("s"))
        .select(col("doc_id"), col("n"), xxhash64(col("s")).as("sh"))
      time("ngram_postings")(posting.count())
      time("ngram_pairrows")(posting.as("x").join(posting.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id")).count())
    }
    time("simhash_full")(NearDup.simhashNearDups(docs).count())
    spark.stop()
  }
}
