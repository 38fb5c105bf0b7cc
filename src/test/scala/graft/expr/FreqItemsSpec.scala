package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters aggregate — the published guarantees checked
  * directly (presence of every key above N/(m+1), underestimation by at
  * most N/(m+1)), exactness when the key space fits, merge behavior under
  * adversarial partitionings, and the provably-exact two-scan
  * [[graft.ops.Curation.topNgramsSketch]] ≡ the brute-force
  * [[graft.ops.Curation.topNgrams]].
  */
class FreqItemsSpec extends SparkTestBase {
  import spark.implicits._

  /** key 0 → 1000 copies, keys 1..9 → 100 each, keys 10..499 → 5 each. */
  private lazy val skewed: Seq[Long] =
    Seq.fill(1000)(0L) ++
      (1 to 9).flatMap(k => Seq.fill(100)(k.toLong)) ++
      (10 to 499).flatMap(k => Seq.fill(5)(k.toLong))

  private def sketch(keys: Seq[Long], m: Int, parts: Int): Map[Long, Long] =
    keys.toDF("key").repartition(parts)
      .agg(FreqItems.freq_items(col("key"), m).as("sk"))
      .head().getSeq[Row](0).map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("every key with count > N/(m+1) is present; estimates never " +
    "overshoot and undershoot by at most N/(m+1)") {
    val truth = skewed.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val n = skewed.size.toLong
    for (m <- Seq(32, 64, 256); parts <- Seq(1, 7)) {
      val got = sketch(skewed, m, parts)
      val bound = n / (m + 1L)
      assert(got.size <= m, s"m=$m parts=$parts: ${got.size} entries")
      truth.foreach { case (k, c) =>
        if (c > bound)
          assert(got.contains(k), s"m=$m parts=$parts: frequent key $k " +
            s"(count $c > bound $bound) missing")
      }
      got.foreach { case (k, est) =>
        val c = truth(k)
        assert(est <= c && c - est <= bound,
          s"m=$m parts=$parts key=$k est=$est true=$c bound=$bound")
      }
    }
  }

  test("key space within capacity ⇒ estimates are EXACT counts") {
    val truth = skewed.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    for (parts <- Seq(1, 5)) {
      val got = sketch(skewed, 500, parts)
      assert(got == truth)
    }
  }

  test("topNgramsSketch ≡ topNgrams when the proof succeeds, any layout") {
    // 30 docs sharing one boilerplate sentence + unique tails
    val docs = (0 until 30).map { i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog " +
        s"unique tail $i with words w${i * 2} w${i * 2 + 1} w${i * 3}")
    }.toDF("doc_id", "text")
    val exact = graft.ops.Curation.topNgrams(docs, "text", 3, 10, 2)
      .as[(String, Long)].collect().toSeq
    for (parts <- Seq(1, 7)) {
      val got = graft.ops.Curation.topNgramsSketch(docs.repartition(parts),
        "text", 3, 10, capacity = 512, minCount = 2)
        .as[(String, Long)].collect().toSeq
      assert(got == exact, s"parts=$parts")
    }
  }

  test("topNgramsSketch REFUSES when capacity cannot prove exactness") {
    // 400 distinct docs, no heavy hitters: kth count can't beat the bound
    val docs = (0 until 400).map { i =>
      (i.toLong, s"a$i b$i c$i d$i e$i f$i g$i h$i")
    }.toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Curation.topNgramsSketch(docs, "text", 3, 10,
        capacity = 16, minCount = 1)
    }
    assert(e.getMessage.contains("raise capacity"))
  }

  test("guards: capacity ≥ k, positive args, BIGINT key type") {
    intercept[IllegalArgumentException] {
      graft.ops.Curation.topNgramsSketch(Seq((1L, "x")).toDF("id", "text"),
        "text", 3, 10, capacity = 5)
    }
    val err = intercept[Exception] {
      Seq("a").toDF("s").agg(FreqItems.freq_items(col("s"), 4)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint") ||
      err.getMessage.contains("BIGINT"))
  }
}
