package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8
  private val m = 4 // dsub = 2

  /** Deterministic synthetic corpus: hash-derived unit-normalized vectors. */
  private def corpus(n: Int) = {
    val rows = (0L until n).map { id =>
      val raw = Array.tabulate(dim) { i =>
        ((math.abs((id * 2654435761L + i * 40503L).hashCode) % 2000) / 1000.0) - 1.0
      }
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (id, raw.map(x => (x / math.max(nrm, 1e-12)).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("train: codebook shape, dim-divisibility guard") {
    val cb = Pq.train(corpus(40), "vec_id", "embedding", m, ksub = 8)
    assert(cb.m === m && cb.dsub === dim / m && cb.ksub === 8)
    assert(cb.books.forall(_.forall(_.length === cb.dsub)))
    val e = intercept[IllegalArgumentException] {
      Pq.train(corpus(40), "vec_id", "embedding", 3, 8)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("encode matches a naive per-row argmin-L2 reconstruction") {
    val c = corpus(40)
    val cb = Pq.train(c, "vec_id", "embedding", m, ksub = 8)
    val got = Pq.encode(c, "vec_id", "embedding", cb)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    val vecs = c.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    vecs.zip(got).foreach { case ((vid, v), (gid, codes)) =>
      assert(vid === gid)
      (0 until m).foreach { j =>
        val sub = v.slice(j * cb.dsub, (j + 1) * cb.dsub)
        // argmin L2 with the engine's tie rule (larger code wins a tie)
        val best = cb.books(j).zipWithIndex.map { case (cw, code) =>
          val d2 = sub.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
          (d2, code)
        }.minBy { case (d2, code) => (d2, -code) }._2
        assert(codes(j) === best, s"id=$vid sub=$j")
      }
    }
  }

  test("adc score ≡ direct dot with the reconstruction") {
    val c = corpus(40)
    val cb = Pq.train(c, "vec_id", "embedding", m, ksub = 8)
    val q = c.where(col("vec_id") < 2)
    val got = Pq.pqTopK(c, "vec_id", "embedding", q, "vec_id", "embedding",
        cb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = c.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val codes = Pq.encode(c, "vec_id", "embedding", cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    got.foreach { case ((qid, id), score) =>
      val expected = (0 until m).map { j =>
        val cw = cb.books(j)(codes(id)(j))
        val qsub = vecs(qid).slice(j * cb.dsub, (j + 1) * cb.dsub)
        qsub.zip(cw).map { case (a, b) => a * b }.sum
      }.sum
      assert(math.abs(score - expected) < 1e-9, s"($qid,$id)")
    }
  }

  test("exact-reconstruction limit: PQ top-k ≡ brute force on unit vectors") {
    // tiny corpus, ksub = corpus size → every subvector is its own codeword,
    // reconstruction is exact, so ADC inner product ranks exactly like
    // cosine on unit-normalized vectors
    val c = corpus(12)
    val cb = Pq.train(c, "vec_id", "embedding", m, ksub = 12, iters = 0)
    val q = c.where(col("vec_id") < 3)
    val pq = Pq.pqTopK(c, "vec_id", "embedding", q, "vec_id", "embedding",
        cb, k = 4)
      .select("query_id", "id", "rank").orderBy("query_id", "rank").collect()
    val bf = Similarity.bruteForceTopK(c, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 4)
      .select("query_id", "id", "rank").orderBy("query_id", "rank").collect()
    assert(pq.toSeq === bf.toSeq)
  }

  test("ivfPqTopK: probed subset of exhaustive ADC; full probe ≡ pqTopK") {
    val c = corpus(60)
    val cb = Pq.train(c, "vec_id", "embedding", m, ksub = 8)
    val q = c.where(col("vec_id") < 3)
    val full = Pq.pqTopK(c, "vec_id", "embedding", q, "vec_id", "embedding",
      cb, k = 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allProbe = Pq.ivfPqTopK(c, "vec_id", "embedding", q, "vec_id",
        "embedding", cb, k = 5, nCells = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(allProbe === full) // nProbe = nCells scans everything
    val some = Pq.ivfPqTopK(c, "vec_id", "embedding", q, "vec_id",
        "embedding", cb, k = 5, nCells = 4, nProbe = 2)
      .collect()
    assert(some.nonEmpty)
    // every probed result's ADC score is a real pairwise score — recall
    // overlap with the exhaustive set is what q_ann_* measures; here just
    // require the probe path returns ≤ k per query with valid ranks
    some.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.length <= 5)
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length))
    }
  }

  test("plan shapes: encode is a zero-exchange projection; pqTopK has no " +
    "sort-merge join and bounded top-k partials") {
    val c = corpus(40)
    val cb = Pq.train(c, "vec_id", "embedding", m, ksub = 8)
    val enc = Pq.encode(c, "vec_id", "embedding", cb)
    val encPlan = enc.queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), encPlan.take(2000))
    val q = c.where(col("vec_id") < 2)
    val top = Pq.pqTopK(c, "vec_id", "embedding", q, "vec_id", "embedding",
      cb, k = 5)
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.toLowerCase.contains("window"), plan.take(3000))
  }
}
