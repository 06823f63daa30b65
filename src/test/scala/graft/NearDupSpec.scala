package graft

import graft.operators.NearDup

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tomorrow") // one-word edit
  private val other = "completely different words about spark catalyst planning and shuffles here"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, other)
  ).toDF("doc_id", "text")

  test("minhash LSH finds the planted near-dup pair and nothing else") {
    val out = NearDup.minhashNearDups(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
    val bp = out.head.getAs[Long]("jac_bp")
    assert(bp > 5000 && bp < 10000, s"one-word edit should be 0.5<jac<1, got $bp bp")
  }

  test("exact inverted-index Jaccard agrees with minhash on this corpus") {
    val lsh = NearDup.minhashNearDups(docs).collect().toSeq.map(_.toSeq)
    val exact = NearDup.jaccardNearDupsExact(docs).collect().toSeq.map(_.toSeq)
    assert(lsh == exact)
  }

  test("minhash matches exact Jaccard on the real sf0.001 corpus") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val lsh = NearDup.minhashNearDups(d).collect().toSeq.map(_.toSeq).sortBy(_.toString)
    val exact = NearDup.jaccardNearDupsExact(d).collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(lsh.nonEmpty, "sf0.001 should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash: identical docs at hamming 0; near-dups within 3; others absent") {
    val dupDocs = Seq((0L, base), (1L, base), (2L, other)).toDF("doc_id", "text")
    val out = NearDup.simhashNearDups(dupDocs).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == Set((0L, 1L, 0L)))
  }

  test("clusters: transitive chains collapse to the min doc id") {
    // A~B and B~C are near-dups; A~C are two edits apart (still >=0.5
    // here, but the invariant under test is the transitive labeling)
    val chain = Seq(
      (10L, base),
      (11L, base.replace("today", "tomorrow")),
      (12L, base.replace("today", "tomorrow").replace("dog", "cat")),
      (99L, other)).toDF("doc_id", "text")
    val out = NearDup.nearDupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(10L, 11L, 12L), "only docs in near-dup pairs are labeled")
    assert(out.values.toSet == Set(10L), "one component, canonical = min id")
  }

  test("maxDocFreq drops hot shingles from the exact pipeline") {
    // with df cap 1, every shared shingle is dropped → no pairs survive
    val out = NearDup.jaccardNearDupsExact(docs, maxDocFreq = 1L).collect()
    assert(out.isEmpty)
  }
}
