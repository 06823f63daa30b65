package graft

// Scratch sample-code drive (dev aid): exercises the public library
// surface the way an external user would.
import org.apache.spark.sql.SparkSession

object DevDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 1. SQL-text path through extensions
    println("graft_dot SQL = " + spark.sql(
      "SELECT graft_dot(array(1.0d,2.0d,3.0d), array(4.0d,5.0d,6.0d)) AS d")
      .collect().head.getDouble(0))
    // 2. typed Dataset aggregation path
    val stats = Seq((1L, 0.02), (1L, 0.03)).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.SessionReduce.toColumn).collect()
    println("typed session stats = " + stats.mkString(","))
    // 3. ingest-time variant through the operator API
    val ingest = graft.operators.Sessions.sessionAggBy(
      Tables.events(spark, "/root/testdata/sf0.001"),
      org.apache.spark.sql.functions.lit("30 seconds"),
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("event_id") * 10000L))
    println("ingest sessions rows = " + ingest.count())
    spark.stop()
  }
}
