package graft

// Focused ANN-at-scale harness (dev aid): times the PQ family over the
// 500k-vector table DevScale writes to /tmp/scale_vecs, so the PQ rows
// can be re-measured without the full 20-minute DevScale sweep.
import org.apache.spark.sql.SparkSession

object DevScaleAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "10m" = the order-of-magnitude-up residual audit: generate (once)
    // a 10M-vector table with DevScale's deterministic generator and run
    // the production composition on it — the row that proves the per-cell
    // mean aggregate (64 sum expressions per cell) and the codes-only
    // search survive 20x the 500k table
    val tenM = args.contains("10m")
    val path =
      args.find(a => a != "10m").getOrElse(
        if (tenM) "/tmp/scale_vecs_10m" else "/tmp/scale_vecs")
    if (tenM && !new java.io.File(path + "/_SUCCESS").exists()) {
      import org.apache.spark.sql.functions._
      val nVecs = 10000000L
      def vecAt(idCol: org.apache.spark.sql.Column) =
        transform(sequence(lit(0), lit(63)), d =>
          (pmod(xxhash64(idCol * 64 + d), lit(2001)) - lit(1000)) / 1000.0)
      spark.range(nVecs).select(col("id").as("vec_id"),
          vecAt(col("id")).as("embedding"))
        .write.mode("overwrite").parquet(path)
    }
    val ve = spark.read.parquet(path)
    val n = ve.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-26s ${sec}%8.2f s  rows=$rows  (${n / sec}%,.0f vecs/s)")
      // each operator localCheckpoints multi-GB frames; without freeing
      // them between rows the LATER rows fight block eviction (at 10M the
      // 3rd query measured 3x its clean-JVM cost) — rows must be
      // independent measurements
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    if (!tenM)
      time("pq_topk")(graft.operators.Similarity.pqTopK(ve, 20, 10).count())
    time("ivfpq_topk")(graft.operators.Similarity.ivfPqTopK(ve, 20, 10).count())
    time("ivfpq_res_topk")(
      graft.operators.Similarity.ivfPqResTopK(ve, 20, 10).count())
    time("ivfpq_res_refine_topk")(
      graft.operators.Similarity.ivfPqResRefineTopK(ve, 20, 10).count())
    time("ivfpq_res_encode_inc")(
      graft.operators.Similarity.ivfPqResEncodeIncremental(ve).count())
    spark.stop()
  }
}
