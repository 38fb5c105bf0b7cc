package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {

  private def vectors(n: Int, dim: Int = 16) = {
    import spark.implicits._
    (0 until n).map { i =>
      val v = Array.tabulate(dim) { d =>
        // deterministic pseudo-random floats in [-1, 1)
        ((((i * 2654435761L + d * 40503L + 7) % 2000) + 2000) % 2000) / 1000.0f - 1.0f
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("nProbe == nCells scans everything → identical to brute force") {
    val corpus = vectors(200)
    val queries = corpus.where(col("vec_id") < 4)
    val ivf = Ivf.ivfTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nCells = 8, nProbe = 8)
      .select("query_id", "id", "rank")
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .select("query_id", "id", "rank")
    assert(ivf.exceptAll(bf).isEmpty && bf.exceptAll(ivf).isEmpty)
  }

  test("nCells=256: constant-size expression tree survives realistic cell counts") {
    // round-2 bestCells built one cosine subtree per centroid — at 256
    // cells codegen/analysis would blow up; the transform-over-literal
    // shape is O(1) nodes, so this must run fast and stay ≡ brute force
    // at nProbe == nCells
    val corpus = vectors(400)
    val queries = corpus.where(col("vec_id") < 3)
    val ivf = Ivf.ivfTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nCells = 256, nProbe = 256,
        kmeansIters = 0)
      .select("query_id", "id", "rank")
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .select("query_id", "id", "rank")
    assert(ivf.exceptAll(bf).isEmpty && bf.exceptAll(ivf).isEmpty)
  }

  test("partial probe returns a subset of per-cell candidates with sane recall") {
    val corpus = vectors(300)
    val queries = corpus.where(col("vec_id") < 5)
    val ivf = Ivf.ivfTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, nCells = 16, nProbe = 6)
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    // every query answered
    assert(ivf.select("query_id").distinct().count() === 5)
    // recall@5 ≥ 40% on average (deterministic corpus → stable number)
    val hits = ivf.select("query_id", "id")
      .intersect(bf.select("query_id", "id")).count()
    assert(hits >= 10, s"recall too low: $hits/25")
  }

  test("persisted index: probes are partition-pruned and match in-memory ivf") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    val corpus = vectors(300)
    val queries = corpus.where(col("vec_id") < 5)
    Ivf.writeIndex(corpus, "vec_id", "embedding", dir, nCells = 16,
      kmeansIters = 1)
    val probed = Ivf.probeIndex(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 6)
    probed.count()
    // the cells scan carries the probe set in its partition filters —
    // unprobed cell partitions are never read
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell#"),
      plan.take(3000))
    val inMem = Ivf.ivfTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, nCells = 16, nProbe = 6,
      kmeansIters = 1)
    assert(probed.exceptAll(inMem).isEmpty && inMem.exceptAll(probed).isEmpty)
  }

  test("cell assignment is a narrow plan (no shuffle)") {
    val corpus = vectors(100)
    val centroids = Ivf.pickCentroids(corpus, "vec_id", "embedding", 8)
    assert(centroids.length === 8)
    val assigned = Ivf.assignCells(corpus, "vec_id", "embedding", centroids)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // every row lands in exactly one existing cell
    val cells = assigned.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 8).toSet))
  }
}
