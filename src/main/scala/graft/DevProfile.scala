package graft

// Scratch profiling harness (dev aid).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // 500k-vector LSH plane curve (recall + wall-clock per plane count)
    val nVecs = 500000L
    def vecAt(idCol: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(63)), d =>
        (pmod(xxhash64(idCol * 64 + d), lit(2001)) - lit(1000)) / 1000.0)
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      when(pmod(col("id"), lit(100)) === 1,
        transform(vecAt(col("id") - 1), (x, i) =>
          x + when(i === 0, lit(0.01)).otherwise(lit(0.0))))
        .otherwise(vecAt(col("id"))).as("embedding"))
    vecs.write.mode("overwrite").parquet("/tmp/scale_vecs")
    val ve = spark.read.parquet("/tmp/scale_vecs")
    ve.count()
    val autoP = graft.operators.Similarity.autoPlanes(nVecs)
    println(s"autoPlanes($nVecs) = $autoP")
    for (p <- Seq(autoP - 4, autoP, autoP + 4)) {
      time(s"semdedup_planes_$p") {
        val out = graft.operators.Similarity.semanticDedup(ve, 0.9, numPlanes = p)
        val dropped = out.filter(!col("kept")).count()
        println(f"  (p=$p: dropped $dropped of ~5000 planted dups)")
        out.count()
      }
    }
    spark.stop()
  }
}
