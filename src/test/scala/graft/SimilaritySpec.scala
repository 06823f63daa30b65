package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("cosine near-dup pairs: parallel vectors pair, orthogonal don't") {
    val df = vecs(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(2f, 0f, 0f, 0f)),   // cos(0,1) = 1
      (2L, Seq(0f, 1f, 0f, 0f)))   // cos(·,2) = 0
    val out = Similarity.cosineNearDupPairs(df, 0.9).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val df = vecs(
      (0L, Seq(1f, 0f)),           // query
      (1L, Seq(1f, 0.1f)),         // closest
      (2L, Seq(1f, 1f)),           // cos ≈ 0.707
      (3L, Seq(0f, 1f)))           // orthogonal
    val out = Similarity.bruteForceTopK(df, numQueries = 1, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("LSH top-k returns a rank-consistent subset of brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, 10, 5).collect()
    // every LSH hit must agree with brute force membership at same k is
    // not guaranteed (bucket pruning), but candidates must come from the
    // corpus and ranks must be 1..k without gaps per query
    val byQuery = lsh.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq)
    }
    // multi-probe recall floor: on 500 nearly-orthogonal vectors spread
    // over 64 buckets, ~20% top-5 recall is the expected regime (LSH
    // earns its keep at millions of vectors, not hundreds)
    val hits = lsh.map(r => (r.getLong(0), r.getLong(1))).count(brute.contains)
    assert(hits >= brute.size / 5,
      s"multi-probe LSH recall too low: $hits of ${brute.size}")
  }

  test("blocked pair grid equals a naive theta join on the real corpus") {
    import org.apache.spark.sql.functions._
    import graft.functions.ArrayOps
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pa = emb.select(col("vec_id").as("i"), col("embedding").cast("array<double>").as("vi"))
    val pb = emb.select(col("vec_id").as("j"), col("embedding").cast("array<double>").as("vj"))
    val naive = pa.join(pb, col("i") < col("j"))
      .filter(ArrayOps.dotNative(spark, col("vi"), col("vj")) /
        (sqrt(ArrayOps.dotNative(spark, col("vi"), col("vi"))) *
          sqrt(ArrayOps.dotNative(spark, col("vj"), col("vj")))) >= 0.4)
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.cosineNearDupPairs(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == naive)
  }

  test("LSH pair search: subset of exact, full recall on high-sim pairs, pruned candidates") {
    import org.apache.spark.sql.functions._
    // deterministic synthetic corpus: 60 near-identical pairs (cos ≈ 0.999)
    // plus the spread the gaussian directions give — the regime where
    // hyperplane LSH is sound (near-dup thresholds), unlike the testdata's
    // deliberately threshold-hugging cos≈0.4 pairs
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(60) { g =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val dup = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      Seq((2L * g, v.toSeq), (2L * g + 1, dup.toSeq))
    }.flatten
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDupPairs(df, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineNearDupPairsLsh(df, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 60, s"expected the 60 planted pairs, got ${exact.size}")
    assert(lsh == exact, "hamming<=1 probing must enumerate cos>=0.95 pairs here")
    // candidate pruning: pairs sharing a bucket within hamming 1 must be
    // a small fraction of all n(n-1)/2 pairs — that's the entire point
    val buckets = df
      .select(col("vec_id"),
        Similarity.bucketOf(df, col("embedding").cast("array<double>")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val cand = (for {
      (i, bi) <- buckets; (j, bj) <- buckets
      if i < j && java.lang.Long.bitCount(bi ^ bj) <= 1
    } yield 1).size
    val all = buckets.length * (buckets.length - 1) / 2
    assert(cand * 3 < all, s"candidates $cand not << all pairs $all")
  }

  test("semantic dedup equals a driver-side union-find over the LSH pair graph") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = Similarity.cosineNearDupPairsLsh(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty) // the fixture must exercise the non-trivial path
    // reference labeling: union-find on the collected pair set
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (i, j) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) { val (lo, hi) = (math.min(ri, rj), math.max(ri, rj))
        parent(hi) = lo }
    }
    val got = Similarity.semanticDedup(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == emb.count())
    got.foreach { case (id, cluster, kept) =>
      assert(cluster == find(id), s"vec $id labeled $cluster, want ${find(id)}")
      assert(kept == (cluster == id))
    }
  }

  test("NearestCells matches the sort_array-of-rounded-structs spelling") {
    import org.apache.spark.sql.functions._
    import graft.functions.ArrayOps
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0).toInt, r.getAs[scala.collection.Seq[Double]](1).toSeq))
      .sortBy(_._1).toSeq
    val prep = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(ArrayOps.dotNative(spark, col("v"), col("v"))))
    val viaStructs = prep.select(col("vec_id"),
        slice(sort_array(array(cents.map { case (cid, cv) =>
          val cnorm = math.sqrt(cv.map(x => x * x).sum)
          struct(round(ArrayOps.dotNative(spark, col("v"), typedlit(cv)) /
            (col("nrm") * cnorm), 6).as("score"), lit(cid).as("cid"))
        }: _*), asc = false), 1, 2))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getInt(1)).toSeq).toMap
    val viaNative = prep.select(col("vec_id"),
        ArrayOps.nearestCells(spark, col("v"), col("nrm"), cents.map(_._2), 2))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(viaNative == viaStructs)
  }

  test("IVF top-k: rank-consistent, non-trivial recall vs brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, 10, 5).collect()
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq)
    }
    val hits = ivf.map(r => (r.getLong(0), r.getLong(1))).count(brute.contains)
    assert(hits >= brute.size / 5,
      s"IVF recall too low: $hits of ${brute.size}")
  }

  test("k-means centroids are bit-identical across partitionings (fixed-point means)") {
    // double sums are aggregation-order-dependent; the trainer sums
    // round(x*2^20) longs instead, so centroids — and therefore IVF
    // assignments and recall — must not vary with the physical layout
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def prep(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(
        graft.functions.ArrayOps.dotNative(spark, col("v"), col("v"))))
    val a = graft.operators.Similarity.kmeansCentroids(prep(emb), 16, 3)
    val b = graft.operators.Similarity.kmeansCentroids(
      prep(emb.repartition(13)), 16, 3)
    assert(a == b, "centroids differ across partitionings")
  }

  test("clusterEmbeddings partitions the corpus exactly once, layout-invariant") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.clusterEmbeddings(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every vector lands in exactly one cell; cell ids are seed ranks
    assert(out.map(_._2).sum == emb.count())
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall { case (c, n, _) => c >= 0 && c < 16 && n > 0 })
    // physical layout must not move a single vector (fixed-point means +
    // rounded assignment are order-free)
    val re = Similarity.clusterEmbeddings(emb.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == re.toSeq)
  }
}
