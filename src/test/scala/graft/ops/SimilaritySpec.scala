package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine math: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f), 0.0) // zero vector guarded
    ).toDF("a", "b", "expected")
    val bad = df.where(abs(Similarity.cosine($"a", $"b") - $"expected") > 1e-6).count()
    assert(bad === 0)
  }

  test("DotF64 expression ≡ HOF formula bit-for-bit (codegen + interpreted), " +
    "incl. null/length edges") {
    // real vectors: expression and HOF must agree to the BIT (the q_ann
    // oracles depend on the exact accumulation sequence)
    val vecs = embeddings.select($"vec_id", $"embedding")
    val pairs = vecs.crossJoin(
        vecs.select($"vec_id".as("id2"), $"embedding".as("e2")))
      .where($"vec_id" < 20 && $"id2" < 20)
    val mismatch = pairs.where(
      Similarity.dot($"embedding", $"e2") =!=
        Similarity.dotHof($"embedding", $"e2")).count()
    assert(mismatch === 0)
    // interpreted path (no codegen) — same rows via an eval on literals
    val a = Array(1.5, -2.25, 3.0); val b = Array(0.5, 4.0, -1.0)
    val expr = graft.expr.DotF64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(expr.eval(null) === (1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.0))
    // null-poisoning and unequal-length parity with the HOF
    val edges = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (Seq[java.lang.Double](), Seq[java.lang.Double]())
    ).toDF("a", "b")
    val eBad = edges.where(
      Similarity.dot($"a", $"b").isNotNull =!=
        Similarity.dotHof($"a", $"b").isNotNull ||
      (Similarity.dot($"a", $"b").isNotNull &&
        Similarity.dot($"a", $"b") =!= Similarity.dotHof($"a", $"b"))).count()
    assert(eBad === 0)
  }

  test("brute-force top-k on real embeddings table: ranks ordered, k respected") {
    val queries = embeddings.where($"vec_id" < 3)
    val topk = Similarity.bruteForceTopK(embeddings, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5).cache()
    assert(topk.groupBy("query_id").count().where($"count" =!= 5).count() === 0)
    // ranks are 1..5 with non-increasing cosine
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    val bad = topk.withColumn("prev", lag($"cosine", 1).over(w))
      .where($"prev".isNotNull && $"cosine" > $"prev" + 1e-9).count()
    assert(bad === 0)
  }

  test("LSH top-k recalls brute-force top-k on clustered vectors") {
    // 20 clusters × 10 members: center + deterministic small noise. Real
    // near-neighbor structure (cosine ≈ .95 within a cluster) — the regime
    // LSH is for; raw random 64-dim vectors have no neighbors to find.
    def rng(seed: Long): Double = {
      val x = seed * 6364136223846793005L + 1442695040888963407L
      ((math.abs(x >>> 11) % 2000000) / 1000000.0) - 1.0
    }
    val vecs = (0 until 200).map { i =>
      val c = i / 10
      val v = Array.tabulate(16)(d =>
        (rng(c * 31 + d) + 0.15 * rng(i * 97 + d + 7)).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = vecs.where($"vec_id" % 10 === 0).limit(10)
    val bf = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, planes = 8)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.7, s"LSH recall too low on clustered data: $recall")
  }

  test("LSH top-k smoke on the real embeddings table") {
    val queries = embeddings.where($"vec_id" < 5)
    val lsh = Similarity.lshTopK(embeddings, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, planes = 6)
    assert(lsh.count() > 0)
    assert(lsh.where($"rank" > 5).count() === 0)
  }

  /** Clustered corpus with real neighbor structure (same generator shape as
    * the lshTopK recall test): nClusters × perCluster members around
    * deterministic centers, cosine ≈ .95 within a cluster.
    */
  private def clusteredVecs(nClusters: Int, perCluster: Int) = {
    def rng(seed: Long): Double = {
      val x = seed * 6364136223846793005L + 1442695040888963407L
      ((math.abs(x >>> 11) % 2000000) / 1000000.0) - 1.0
    }
    (0 until nClusters * perCluster).map { i =>
      val c = i / perCluster
      val v = Array.tabulate(16)(d =>
        (rng(c * 31 + d) + 0.15 * rng(i * 97 + d + 7)).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("knnGraph: every row is a query, self excluded, neighbors are " +
    "cluster-mates on clustered vectors") {
    val vecs = clusteredVecs(10, 8)
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3).cache()
    // 80 queries × 3 neighbors, no self edges
    assert(g.count() === 240)
    assert(g.where($"query_id" === $"id").count() === 0)
    // exact graph on clustered data: neighbors share the query's cluster
    val wrongCluster = g.where(
      floor($"query_id" / 8) =!= floor($"id" / 8)).count()
    assert(wrongCluster === 0)
  }

  test("knnGraphLsh is salt-invariant: salt=1 ≡ salt=8 bit-for-bit") {
    val vecs = clusteredVecs(12, 6)
    def run(salt: Int) = Similarity.knnGraphLsh(vecs, "vec_id", "embedding",
        k = 4, planes = 5, salt = salt)
      .select($"query_id", $"id", $"rank", round($"cosine", 9).as("c"))
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(run(1) === run(8))
  }

  test("knnGraphLsh recall vs exact knnGraph is measured, not argued") {
    val vecs = clusteredVecs(20, 10)
    val exact = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val approx = Similarity.knnGraphLsh(vecs, "vec_id", "embedding",
        k = 5, planes = 6)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"knnGraphLsh recall too low on clustered data: $recall")
    // multiprobe off can only shrink the candidate (hence hit) set
    val noProbe = Similarity.knnGraphLsh(vecs, "vec_id", "embedding",
        k = 5, planes = 6, multiprobe = false)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val npRecall = (exact intersect noProbe).size.toDouble / exact.size
    assert(npRecall <= recall + 1e-12,
      s"multiprobe=false recall $npRecall exceeds multiprobe recall $recall")
  }

  test("knnGraphLsh hot-bucket cap: observe-counted drops, bounded pairs") {
    // one degenerate bucket: identical vectors all hash together
    val vecs = (0 until 64).map(i => (i.toLong, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val metrics = new graft.ObsMetrics(spark)
    val listener = new graft.ObsQueryListener(metrics)
    spark.listenerManager.register(listener)
    try {
      val rows = Similarity.knnGraphLsh(vecs, "vec_id", "embedding",
        k = 3, planes = 4, bucketCap = 10, salt = 4,
        obsTag = Some("graft_knn_cap")).count()
      // index side capped at 10 ⇒ any query sees ≤ 10 candidates (≤ 9 after
      // self-exclusion), and the 54 rows past the cap are counted as dropped
      assert(rows > 0 && rows <= 64L * 3)
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark.sparkContext)
      assert(metrics.dropped("knn_cap").value === 54L)
      assert(metrics.accepted("knn_cap").value === 64L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("LSH paths fail fast on non-positive planes (bucket-0 degeneracy)") {
    val vecs = Seq((1L, Array(1.0f, 0.5f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.knnGraphLsh(vecs, "vec_id", "embedding", planes = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(vecs, "vec_id", "embedding",
        vecs, "vec_id", "embedding", planes = -1)
    }
  }
}
