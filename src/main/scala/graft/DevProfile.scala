package graft

// Scratch profiling harness (dev aid): times the round-6 additions at the
// 500k-doc / 500k-vector DevScale corpora (reuses /tmp/scale_docs and
// /tmp/scale_vecs if a DevScale run already wrote them). The replay-trio
// decomposition this file previously held is recorded in
// ARCHITECTURE.md; rewrite freely per measurement need.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dc = spark.read.parquet("/tmp/scale_docs")
    val ve = spark.read.parquet("/tmp/scale_vecs")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    dc.count(); ve.count()

    time("pack_sequences_500k")(
      graft.operators.Curation.packSequences(dc, 4096L).count())
    time("mixture_tokens_500k")(
      graft.operators.Curation.mixtureSampleTokens(dc,
        Map("en" -> 500000L, "es" -> 500000L, "de" -> 1000000L,
            "zh" -> 2000000L)).count())
    time("cluster_assign_build") {
      graft.operators.Similarity.clusterArtifacts(
        ve.filter(col("vec_id") < 400000L))
        .write.mode("overwrite").parquet("/tmp/scale_cents")
      spark.read.parquet("/tmp/scale_cents").count()
    }
    time("cluster_assign_inc_500k")(
      graft.operators.Similarity.assignWith(
        spark.read.parquet("/tmp/scale_cents"),
        ve.filter(col("vec_id") >= 400000L)).count())
    // reference point for the assign gap: whole-corpus retrain
    time("cluster_embeddings_500k")(
      graft.operators.Similarity.clusterEmbeddings(ve).count())
    spark.stop()
  }
}
