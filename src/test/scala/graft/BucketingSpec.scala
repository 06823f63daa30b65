package graft

import org.apache.spark.sql.functions._

/** Bucketing = the 100 TB co-location story: a corpus written bucketed by
  * its key lets every per-key operator (sessionization, per-user joins,
  * totals) run WITHOUT a shuffle — the scan itself reports the hash
  * partitioning the aggregation/join needs. These tests pin that the
  * engine's operators actually consume bucketing (no Exchange in the
  * physical plan), so "pre-bucket the fact table" remains a real deployment
  * lever rather than a doc claim.
  */
class BucketingSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withBucketedEvents(test: String => Unit): Unit = {
    val table = "events_bucketed_spec"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    events.write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable(table)
    try test(table)
    finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("per-user aggregation over a bucketed table plans with no shuffle") {
    withBucketedEvents { table =>
      val totals = spark.table(table)
        .groupBy(col("user_id"))
        .agg(sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"),
          count(lit(1)).as("n"))
      val plan = planOf(totals)
      assert(!plan.contains("Exchange"),
        s"bucketed per-user totals should not shuffle:\n$plan")
      // and the result equals the unbucketed computation
      val viaBucket = totals.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val viaScan = Tables.events(spark, "/root/testdata/sf0.001")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaBucket == viaScan)
    }
  }

  test("sessionization over a bucketed table plans with no shuffle") {
    withBucketedEvents { table =>
      val sess = graft.operators.Sessions.sessionAgg(
        spark.table(table), lit("30 seconds"))
      val plan = planOf(sess)
      assert(!plan.contains("Exchange"),
        s"session_window over bucketed events should not shuffle:\n$plan")
      // same sessions as the plain parquet path (modulo row order); the
      // scan side gets the same null filters the bucketed write applied
      val viaBucket = sess.collect().map(_.toSeq).toSet
      val viaScan = graft.operators.Sessions.sessionAgg(
          Tables.events(spark, "/root/testdata/sf0.001")
            .filter(col("user_id").isNotNull && col("ts").isNotNull),
          lit("30 seconds"))
        .collect().map(_.toSeq).toSet
      assert(viaBucket == viaScan)
    }
  }

  test("bucketed-bucketed join on the bucket key plans with no shuffle") {
    withBucketedEvents { table =>
      val dim = "user_dim_bucketed_spec"
      Tables.events(spark, "/root/testdata/sf0.001")
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("lifetime_events"))
        .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
        .saveAsTable(dim)
      try {
        // disable auto-broadcast so the test exercises the co-located
        // sort-merge path a 100 TB × 100 GB join would actually take
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val joined = spark.table(table).join(spark.table(dim), "user_id")
          val plan = planOf(joined)
          assert(!plan.contains("Exchange"),
            s"bucketed-bucketed equi-join should not shuffle:\n$plan")
          assert(joined.count() ==
            spark.table(table).filter(col("user_id").isNotNull).count())
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      } finally spark.sql(s"DROP TABLE IF EXISTS $dim")
    }
  }

  test("exact admission vs a key table bucketed by text_key: index side never re-shuffles") {
    // the artifact-table daily-run shape: yesterday's canonical key table
    // is persisted bucketed by its join key, so today's admission join
    // shuffles ONLY the new batch — at 100 TB the index is the big side,
    // and this is the difference between O(batch) and O(corpus) shuffle
    val table = "dedup_keys_bucketed_spec"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cut = docs.agg(expr("(max(doc_id) * 4) div 5").cast("long"))
      .head().getLong(0)
    val idx = docs.filter(col("doc_id") < cut)
    val batch = docs.filter(col("doc_id") >= cut)
    val keys = idx.select(md5(col("text")).as("text_key"), col("doc_id"))
      .groupBy(col("text_key")).agg(min(col("doc_id")).as("canonical_id"))
    keys.write.mode("overwrite").bucketBy(8, "text_key").sortBy("text_key")
      .saveAsTable(table)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // align shuffle partitions with the bucket count, as a deployment
      // would — otherwise the probe side re-shuffles to the bucket count
      // and the index-side saving is masked by a new batch-side exchange
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        def keyExchanges(df: org.apache.spark.sql.DataFrame): Int =
          "Exchange hashpartitioning\\(text_key".r
            .findAllIn(planOf(df)).length
        val viaBucketed = graft.operators.Dedup.incrementalExact(
          idx, batch, Some(spark.table(table)))
        val viaInline = graft.operators.Dedup.incrementalExact(
          idx, batch, Some(keys))
        assert(keyExchanges(viaBucketed) == keyExchanges(viaInline) - 1,
          s"the bucketed key table must drop exactly its own exchange:\n" +
            planOf(viaBucketed))
        // identical admissions either way
        assert(viaBucketed.collect().map(_.toSeq).toSeq ==
          viaInline.collect().map(_.toSeq).toSeq)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
