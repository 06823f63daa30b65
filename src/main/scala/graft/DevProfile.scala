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
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    docs.count() // warmup
    val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
      .head().getLong(0)
    val idx = docs.filter(col("doc_id") < cut)
    val batch = docs.filter(col("doc_id") >= cut)
    // whole-query, twice (cold/warm)
    time("incremental_1")(NearDup.incrementalNearDups(idx, batch).count())
    time("incremental_2")(NearDup.incrementalNearDups(idx, batch).count())
    // stage decomposition
    val idxSh = NearDup.shingled(idx).persist()
    time("idx_shingled")(idxSh.count())
    val idxSigs = NearDup.minhashSignatures(idxSh).persist()
    time("idx_sigs")(idxSigs.count())
    val cand = NearDup.lshCandidates(idxSigs)
    time("idx_lsh_cands")(cand.count())
    val pairs = NearDup.verifyJaccard(NearDup.lshCandidates(idxSigs), idxSh)
    time("idx_verified_pairs")(pairs.count())
    time("idx_labels_clusters")(NearDup.clustersFromPairs(
      NearDup.verifyJaccard(NearDup.lshCandidates(idxSigs), idxSh)).count())
    val idxLab = NearDup.clustersFromPairs(
      NearDup.verifyJaccard(NearDup.lshCandidates(idxSigs), idxSh))
      .localCheckpoint()
    time("incremental_with_labels")(
      NearDup.incrementalNearDups(idx, batch, indexLabels = Some(idxLab)).count())
    idxSigs.unpersist(); idxSh.unpersist()
    spark.stop()
  }
}
