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
    time("shingled")(NearDup.shingled(docs).count())
    val sh = NearDup.shingled(docs)
    time("signatures")(NearDup.minhashSignatures(sh).count())
    val sigs = NearDup.minhashSignatures(sh)
    time("candidates")(NearDup.lshCandidates(sigs).count())
    val cands = NearDup.lshCandidates(sigs)
    time("verify")(NearDup.verifyJaccard(cands, sh).count())
    time("full")(NearDup.minhashNearDups(docs).count())
    spark.stop()
  }
}
