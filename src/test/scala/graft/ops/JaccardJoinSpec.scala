package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact prefix-filtered Jaccard join ([[Dedup.jaccardNearDups]]) vs the
  * brute-force all-pairs oracle ([[Dedup.ngramJaccardAllPairs]]): the
  * contract is EXACTNESS — identical pair sets AND identical jaccard
  * values at every threshold, including the rounding-hostile boundary
  * where threshold·len is an exact integer and a pair sits exactly ON
  * the threshold.
  */
class JaccardJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

  private def bruteRows(df: DataFrame, threshold: Double,
                        k: Int): Set[(Long, Long, Double)] =
    rows(Dedup.ngramJaccardAllPairs(
      // brute oracle pairs empty docs (both-empty → 1.0 convention);
      // the prefix join's contract excludes zero-shingle docs — align.
      df.where(size(Dedup.wordShingles(col("text"), k)) > 0),
      "doc_id", "text", threshold, k))

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river shore"),
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "spark query engines shuffle data between executors for aggregation"),
    (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK"),
    (6L, ""),
    (7L, "   "),
    (8L, "tiny")
  ).toDF("doc_id", "text")

  test("prefix-filtered join ≡ brute force at several thresholds") {
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val fast = rows(Dedup.jaccardNearDups(corpus, "doc_id", "text", t))
      val slow = bruteRows(corpus, t, 3)
      assert(fast === slow, s"threshold $t: fast ${fast.size} vs brute ${slow.size}")
    }
  }

  test("threshold boundary: J exactly = t with t·len an exact integer") {
    // shingleK = 1 → tokens are words. |x| = 5, |y| = 4, overlap 4:
    // J = 4/5 = 0.8 exactly; 0.8·5 rounds to 4.0000000000000002 in
    // doubles, so a raw ceil() would shorten x's prefix below the lemma
    // bound and silently drop this pair — the 1e-9 nudge is load-bearing.
    val df = Seq((0L, "a b c d e"), (1L, "a b c d")).toDF("doc_id", "text")
    val got = rows(Dedup.jaccardNearDups(df, "doc_id", "text", 0.8, shingleK = 1))
    assert(got === Set((0L, 1L, 0.8)))
  }

  test("randomized corpus ≡ brute force (seeded)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0 until 40).map(i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    // plant near-dups: copies of earlier docs with one word appended
    val planted = (0 until 20).map(i =>
      ((100 + i).toLong, base(rnd.nextInt(base.size))._2 + " " + vocab(rnd.nextInt(vocab.size))))
    val df = (base ++ planted).toDF("doc_id", "text")
    for (t <- Seq(0.4, 0.7)) {
      val fast = rows(Dedup.jaccardNearDups(df, "doc_id", "text", t, shingleK = 2))
      val slow = bruteRows(df, t, 2)
      assert(fast === slow, s"threshold $t")
    }
  }

  test("zero-shingle docs are excluded, even from each other") {
    val df = Seq((0L, ""), (1L, ""), (2L, "  "), (3L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.jaccardNearDups(df, "doc_id", "text", 0.5).count() === 0)
  }

  test("plan gate: candidate generation is equi-joins, never a cross product") {
    val plan = Dedup.jaccardNearDups(corpus, "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
  }

  test("rejects a threshold outside (0, 1]") {
    intercept[IllegalArgumentException] {
      Dedup.jaccardNearDups(corpus, "doc_id", "text", 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.jaccardNearDups(corpus, "doc_id", "text", 1.5)
    }
  }
}
