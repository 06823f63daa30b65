package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver-generated testdata
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §2).
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, so every downstream operator should express
  * selection/projection relationally rather than materializing full rows.
  * On a real cluster the same code reads a partitioned table; nothing here
  * assumes single-node layout.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark 4
    // rejects by default; read nanos as long and convert below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize `ts` to microsecond TimestampType regardless of how the
    * driver generated the fixture. Two raw layouts have shipped:
    *   - INT64 TIMESTAMP(NANOS), read as LongType under the legacy conf:
    *     floor-divide to micros — the same floor DuckDB applies reading
    *     TIMESTAMP_NS into its microsecond TIMESTAMP, so oracles stay exact.
    *   - timestamp[us] without UTC adjustment, read as TIMESTAMP_NTZ: cast
    *     to TimestampType. Sessions here run with
    *     `spark.sql.session.timeZone=UTC`, so the cast reinterprets the
    *     wall-clock micros as the identical UTC instant DuckDB sees.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    convertEventTs(apply(spark, sfDir, "events"))

  private[graft] def convertEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (events with the converted
    * timestamp) so the whole suite is queryable from SQL text —
    * `spark.sql("SELECT ... FROM events ...")` — alongside the DataFrame
    * API. Combined with [[graft.plans.GraftExtensions]] this gives SQL
    * users the full engine including `graft_dot`.
    *
    * The expensive part of registration is schema inference (each bare
    * `spark.read.parquet` reads a footer), so the SCHEMAS are memoized per
    * (session, dir) and every call rebuilds the DataFrames with
    * `read.schema(...)` (no footer read) and re-applies the temp-view
    * binding — a cheap catalog write. A caller (or test) that dropped or
    * shadowed one of the ten views with its own data therefore gets the
    * real table back rather than silently querying foreign rows through a
    * stale memo-skip. The memo assumes the parquet under a given dir is
    * immutable (true for the driver-generated fixtures): rewriting a file
    * in place with a DIFFERENT schema would read through the stale cached
    * schema — switch dirs (the memo keys on dir) or restart the session to
    * pick up a schema change. Only `StructType`s are cached — a cached DataFrame
    * would strongly reference its own SparkSession and defeat the weak-key
    * eviction below (the WeakHashMap value-refers-to-key trap).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    val hit = cached.get(spark)
    val schemas =
      if (hit != null && hit._1 == sfDir) hit._2
      else {
        val built = all.map(name => name -> apply(spark, sfDir, name).schema).toMap
        cached.put(spark, (sfDir, built))
        built
      }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    all.foreach { name =>
      val raw = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
      val df = if (name == "events") convertEventTs(raw) else raw
      df.createOrReplaceTempView(name)
    }
  }

  // memoized (dir, table schemas) PER SESSION (views are session-scoped,
  // and a dir switch must rebuild); weak keys so a stopped session can be
  // GC'd — values hold no session reference
  private val cached = new java.util.WeakHashMap[
    SparkSession, (String, Map[String, org.apache.spark.sql.types.StructType])]()
}
