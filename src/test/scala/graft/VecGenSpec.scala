package graft

import org.apache.spark.sql.functions._

class VecGenSpec extends SparkTestBase {

  test("deterministic across partitionings; unit-normalized") {
    val a = VecGen.vecs(spark, 200, nClusters = 16, parallelism = 2)
      .orderBy("vec_id").collect()
    val b = VecGen.vecs(spark, 200, nClusters = 16, parallelism = 7)
      .orderBy("vec_id").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      val v = r.getSeq[Float](2).map(_.toDouble)
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-5, s"norm of ${r.getLong(0)}")
    }
  }

  test("cluster structure: same-cluster cosine far above cross-cluster") {
    val rows = VecGen.vecs(spark, 300, nClusters = 8).collect()
      .map(r => (r.getLong(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum // unit vectors
    val pairs = for {
      i <- rows.indices; j <- (i + 1) until rows.length
    } yield (rows(i)._1 == rows(j)._1, cos(rows(i)._2, rows(j)._2))
    val (same, cross) = pairs.partition(_._1)
    val sameAvg = same.map(_._2).sum / same.size
    val crossAvg = cross.map(_._2).sum / cross.size
    assert(same.nonEmpty && cross.nonEmpty)
    assert(sameAvg > crossAvg + 0.5,
      f"same-cluster avg $sameAvg%.3f vs cross $crossAvg%.3f")
  }

  test("IVF on the clustered corpus recovers real recall at partial probe") {
    val corpus = VecGen.vecs(spark, 2000, nClusters = 16).drop("cluster")
    val queries = corpus.where(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(graft.ops.Similarity.bruteForceTopK(corpus, "vec_id",
      "embedding", queries, "vec_id", "embedding", k = 10))
    val ivf = pairs(graft.ops.Ivf.ivfTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4,
      kmeansIters = 1))
    val recall = (ivf & bf).size.toDouble / bf.size
    assert(recall > 0.5, f"ivf recall@10 on clustered corpus: $recall%.3f")
  }

  test("PQ ADC on the clustered corpus: sampled-trained codebooks rank well") {
    val corpus = VecGen.vecs(spark, 1500, nClusters = 16).drop("cluster")
    val queries = corpus.where(col("vec_id") < 8)
    val cb = graft.ops.Pq.train(
      corpus.where(pmod(xxhash64(col("vec_id"), lit(3L)), lit(5L)) === 0),
      "vec_id", "embedding", m = 8, ksub = 16, iters = 1)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(graft.ops.Similarity.bruteForceTopK(corpus, "vec_id",
      "embedding", queries, "vec_id", "embedding", k = 10))
    val encoded = graft.ops.Pq.encode(corpus, "vec_id", "embedding", cb)
    val pq = pairs(graft.ops.Pq.pqTopKEncoded(
      encoded, queries, "vec_id", "embedding", cb, k = 10))
    // raw ADC: same-cluster candidates are near-ties the quantized scores
    // cannot fully resolve — expect real signal (chance = 10/1500), not
    // high recall; the rerank below is what production retrieval uses
    val recall = (pq & bf).size.toDouble / bf.size
    assert(recall > 0.1, f"pq ADC recall@10 on clustered corpus: $recall%.3f")
    val rr = pairs(graft.ops.Pq.pqTopKReranked(encoded, corpus,
      "vec_id", "embedding", queries, "vec_id", "embedding", cb, k = 10))
    val rrRecall = (rr & bf).size.toDouble / bf.size
    assert(rrRecall > recall, "rerank must improve on raw ADC")
    assert(rrRecall > 0.8, f"pq reranked recall@10: $rrRecall%.3f")
  }

  test("pqTopKReranked: exact-reconstruction limit equals brute force; " +
    "shortlist = corpus degenerates to exact") {
    val corpus = VecGen.vecs(spark, 200, nClusters = 8).drop("cluster")
    val queries = corpus.where(col("vec_id") < 4)
    val cb = graft.ops.Pq.train(corpus, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 1)
    val encoded = graft.ops.Pq.encode(corpus, "vec_id", "embedding", cb)
    val rr = graft.ops.Pq.pqTopKReranked(encoded, corpus, "vec_id",
        "embedding", queries, "vec_id", "embedding", cb, k = 5,
        shortlist = 200)
      .select("query_id", "id", "rank").orderBy("query_id", "rank").collect()
    val bf = graft.ops.Similarity.bruteForceTopK(corpus, "vec_id",
        "embedding", queries, "vec_id", "embedding", k = 5)
      .select("query_id", "id", "rank").orderBy("query_id", "rank").collect()
    assert(rr.toSeq === bf.toSeq)
  }
}
