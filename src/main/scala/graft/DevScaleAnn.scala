package graft

// Focused ANN-at-scale harness (dev aid): times the PQ family over the
// 500k-vector table DevScale writes to /tmp/scale_vecs, so the PQ rows
// can be re-measured without the full 20-minute DevScale sweep.
import org.apache.spark.sql.SparkSession

object DevScaleAnn {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/scale_vecs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ve = spark.read.parquet(path)
    val n = ve.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-26s ${sec}%8.2f s  rows=$rows  (${n / sec}%,.0f vecs/s)")
    }
    time("pq_topk")(graft.operators.Similarity.pqTopK(ve, 20, 10).count())
    time("ivfpq_topk")(graft.operators.Similarity.ivfPqTopK(ve, 20, 10).count())
    time("ivfpq_res_topk")(
      graft.operators.Similarity.ivfPqResTopK(ve, 20, 10).count())
    time("ivfpq_res_encode_inc")(
      graft.operators.Similarity.ivfPqResEncodeIncremental(ve).count())
    spark.stop()
  }
}
