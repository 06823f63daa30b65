package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions.{call_function, lit}

/** Broadcast-Bloom membership pruning.
  *
  * The 100 TB shape for "filter a huge stream of keys against a small-ish
  * reference set" is NOT a shuffle join of the full key stream: build a
  * Bloom filter over the reference keys once (bits sized by `(items, fpp)`,
  * independent of the big side), ship it to every task inside the plan, and
  * drop non-members map-side before any shuffle. Spark's optimizer does
  * exactly this internally for runtime join filters
  * (`InjectRuntimeFilter`); these helpers expose the same codegen'd
  * predicate — [[BloomFilterMightContain]] — as a first-class graft
  * function, so operators can use it where the optimizer can't see the
  * opportunity (e.g. the key stream is exploded n-gram postings, orders of
  * magnitude wider than the scan the optimizer reasons about).
  *
  * False positives occur at ~`fpp`; false negatives never. Callers keep the
  * exact equi-join AFTER the Bloom prune, so results stay exact — the Bloom
  * only cuts the rows that reach the shuffle.
  */
object BloomOps {

  /** Idempotently register `graft_bloom_contains(bloom_binary, long_value)`. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs.head, exprs(1)), "built-in")
  }

  /** Aggregate a long column into a serialized Bloom filter. One job over
    * `df`; the returned byte array's size depends only on `(expectedItems,
    * fpp)` — ~9.6 bits per item at fpp 0.01 — so this is a bounded driver
    * object (the IVF-centroid-collect pattern), NOT proportional to the
    * corpus. Bloom construction is bitwise-OR merging, so the result is
    * insertion-order independent → deterministic for a fixed key set.
    */
  def buildLongBloom(df: DataFrame, colName: String, expectedItems: Long,
                     fpp: Double = 0.01): Array[Byte] = {
    val items = math.max(expectedItems, 64L)
    // Spark's stat.bloomFilter NPEs on an empty frame (its aggregate
    // returns no buffer to deserialize); an empty reference set means a
    // contains-nothing filter, so hand back a fresh empty bloom instead
    val bf =
      if (df.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(items, fpp)
      else df.stat.bloomFilter(colName, items, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `value ∈ bloom` as a codegen'd predicate over a broadcast-able binary
    * literal (the bloom rides the serialized plan, one copy per executor).
    */
  def mightContain(spark: SparkSession, bloomBytes: Array[Byte],
                   value: Column): Column = {
    register(spark)
    call_function("graft_bloom_contains", lit(bloomBytes), value)
  }
}
