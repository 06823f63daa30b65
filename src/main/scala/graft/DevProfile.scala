package graft

// Scratch profiling harness (dev aid).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.NearDup

object DevProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    // warmup scheduler/codegen
    docs.count()
    val sh = NearDup.shingled(docs)
    time("shingled")(sh.count())
    val sigs = NearDup.minhashSignatures(sh)
    time("signatures")(sigs.count())
    val shP = sh.persist(); shP.count()
    val sigsP = NearDup.minhashSignatures(shP).persist()
    time("signatures_cachedsh")(sigsP.count())
    time("lsh_candidates")(NearDup.lshCandidates(sigsP).count())
    time("verify_only")(NearDup.verifyJaccard(NearDup.lshCandidates(sigsP), shP).count())
    shP.unpersist(); sigsP.unpersist()
    time("minhash_full")(NearDup.minhashNearDups(docs).count())
    time("clusters_full")(NearDup.nearDupClusters(docs).count())
    time("ngram_full")(NearDup.jaccardNearDupsExact(docs).count())
    locally {
      val s2 = NearDup.shingled(docs)
      val posting = s2.select(col("doc_id"), size(col("shingles")).cast("long").as("n"),
        explode(col("shingles")).as("s"))
        .select(col("doc_id"), col("n"), xxhash64(col("s")).as("sh"))
      time("ngram_postings")(posting.count())
      time("ngram_pairrows")(posting.as("x").join(posting.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id")).count())
    }
    spark.stop()
  }
}
