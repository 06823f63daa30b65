package graft

/** Dev aid: time named SparkEntry queries on a fixture dir.
  * Usage: runMain graft.TimeQ <sfDir> <query>...
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Dev.session()
    spark.range(1000).selectExpr("sum(id)").collect()
    args.drop(1).foreach { name =>
      Dev.time(name)(
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
