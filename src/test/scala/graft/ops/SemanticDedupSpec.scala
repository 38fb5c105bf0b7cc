package graft.ops

import graft.{SparkTestBase, VecGen}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic dedup (round 4): kmeans cells → in-cell cosine
  * prune → component keep-set, cross-checked against a fully independent
  * driver-side replay (plain-double argmax assignment, quadratic in-cell
  * pair scan, union-find components) on a clustered [[VecGen]] corpus.
  */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val N = 240
  private def corpus =
    VecGen.vecs(spark, N, dim = 16, nClusters = 8, noise = 0.05)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0d; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  // the engine's exact IEEE sequence: sqrt of each sequential
  // sum-of-squares, multiply, divide (see Similarity.cosine /
  // TopCellsKernel — norms hoisted but the value is the same)
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    if (d == 0.0d) 0.0d else dot(a, b) / d
  }

  test("semanticDedup ≡ driver replay: argmax cells + in-cell pairs + union-find") {
    val t = 0.9
    val out = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      nCells = 8, threshold = t, kmeansIters = 2)
      .as[(Long, Int, Long, Boolean)].collect().toSet

    // same deterministic quantizer ARTIFACT (shared with the ANN index by
    // design); everything downstream of it replayed independently
    val cents = Ivf.kmeansCentroids(corpus, "vec_id", "embedding",
        nCells = 8, iters = 2)
      .map { case (c, v) => (c, v.map(_.toDouble)) }
    val vecs = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    // kernel tie rule: max (cos, cell)
    val cell = vecs.map { case (id, v) =>
      id -> cents.maxBy { case (c, cv) => (cos(v, cv), c) }._1
    }
    // union-find, larger root attached under smaller: root == component min
    val parent = scala.collection.mutable.Map(
      vecs.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    val ids = vecs.keys.toSeq.sorted
    for {
      a <- ids; b <- ids
      if a < b && cell(a) == cell(b) && cos(vecs(a), vecs(b)) >= t
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map { id =>
      val comp = find(id)
      (id, cell(id), comp, comp == id)
    }.toSet
    assert(out === expected)
    // the low-noise clustered corpus must actually deduplicate
    assert(out.count(_._4) < N / 2)
  }

  test("cell cap bounds the in-cell join: cap=1 yields no pairs, all keep") {
    val out = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      nCells = 4, threshold = 0.0, kmeansIters = 0, cellCap = 1)
      .as[(Long, Int, Long, Boolean)].collect()
    assert(out.length === N)
    assert(out.forall(r => r._4 && r._3 == r._1))
  }

  test("keep count is monotone non-decreasing in threshold") {
    val keeps = Seq(0.5, 0.8, 0.95).map { t =>
      Dedup.semanticDedup(corpus, "vec_id", "embedding", nCells = 8,
        threshold = t, kmeansIters = 1).where(col("keep")).count()
    }
    assert(keeps === keeps.sorted)
  }
}
