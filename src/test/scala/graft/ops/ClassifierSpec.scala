package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  private def weightsArr: Array[Long] =
    Classifier.syntheticWeights(spark, dim).orderBy("feat")
      .collect().map(_.getLong(1))

  private val corpus = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "Alpha, BETA! gamma?"),          // normalizes like doc 0's prefix
    (2L, ""),                             // zero tokens → bias-only score
    (3L, "   \t  "),                      // whitespace-only → zero tokens
    (4L, "zeta zeta zeta zeta zeta zeta") // repeated token: multiset counts
  ).toDF("doc_id", "text")

  test("scoreNarrow ≡ scoreJoin, row-exact (same weight vector as a table)") {
    val table = Classifier.syntheticWeights(spark, dim)
    val j = Classifier.scoreJoin(corpus, "doc_id", "text", table, dim,
      biasMilli = -25L).orderBy("doc_id").collect()
    val n = Classifier.scoreNarrow(corpus, "doc_id", "text", weightsArr,
      biasMilli = -25L).orderBy("doc_id").collect()
    assert(j.toSeq === n.toSeq)
  }

  test("hand-computed sums, bias-only empties, and the integer label rule") {
    val w = weightsArr
    def wgtOf(tok: String): Long = {
      val feat = Seq(tok).toDF("t")
        .select(Classifier.featureIndex($"t", dim)).head().getLong(0)
      w(feat.toInt)
    }
    val out = Classifier.scoreNarrow(corpus, "doc_id", "text", w,
        biasMilli = -25L)
      .orderBy("doc_id").collect()
    val exp0 = Seq("alpha", "beta", "gamma", "delta").map(wgtOf).sum
    assert(out(0).getLong(1) === 4L)
    assert(out(0).getLong(2) === exp0)
    // doc 1 normalizes to (alpha, beta, gamma)
    assert(out(1).getLong(2) === Seq("alpha", "beta", "gamma").map(wgtOf).sum)
    // empty / whitespace-only: zero tokens, bias-only sigmoid
    Seq(out(2), out(3)).foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
      assert(r.getDouble(3) ===
        BigDecimal(1.0 / (1.0 + math.exp(0.025)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getBoolean(4) === (-25L >= 0L))
    }
    // repeated token counts as a multiset
    assert(out(4).getLong(1) === 6L)
    assert(out(4).getLong(2) === 6L * wgtOf("zeta"))
    // label is the integer numerator rule on every row
    out.foreach { r =>
      val n1 = math.max(r.getLong(1), 1L)
      assert(r.getBoolean(4) === (-25L * n1 + r.getLong(2) >= 0L))
    }
  }

  test("features absent from the weight table weigh zero") {
    val partial = Classifier.syntheticWeights(spark, dim)
      .where(col("feat") < lit(dim / 2))
    val full = Classifier.scoreJoin(corpus, "doc_id", "text",
      Classifier.syntheticWeights(spark, dim), dim).orderBy("doc_id").collect()
    val part = Classifier.scoreJoin(corpus, "doc_id", "text", partial, dim)
      .orderBy("doc_id").collect()
    // token counts unchanged; sums only ever shrink toward zero coverage
    full.zip(part).foreach { case (f, p) =>
      assert(f.getLong(1) === p.getLong(1))
    }
    // and a fully-empty table scores every doc at the bias
    val none = Classifier.scoreJoin(corpus, "doc_id", "text",
      Classifier.syntheticWeights(spark, dim).limit(0), dim)
      .collect()
    assert(none.forall(_.getLong(2) === 0L))
  }

  test("plan shapes: narrow path exchange-free; join path broadcasts " +
    "and partial-aggregates") {
    val n = Classifier.scoreNarrow(corpus, "doc_id", "text", weightsArr)
    val nPlan = n.queryExecution.executedPlan.toString
    assert(!nPlan.contains("Exchange"), nPlan.take(2000))
    val j = Classifier.scoreJoin(corpus, "doc_id", "text",
      Classifier.syntheticWeights(spark, dim), dim)
    val jPlan = j.queryExecution.executedPlan.toString
    assert(jPlan.contains("BroadcastHashJoin"), jPlan.take(3000))
    assert(jPlan.contains("partial_count") || jPlan.contains("partial"),
      jPlan.take(3000))
    assert(!jPlan.contains("SortMergeJoin"), jPlan.take(3000))
  }

  test("deterministic across partitionings") {
    val shuffled = corpus.repartition(7, col("text"))
    val a = Classifier.scoreJoin(corpus, "doc_id", "text",
      Classifier.syntheticWeights(spark, dim), dim).orderBy("doc_id").collect()
    val b = Classifier.scoreJoin(shuffled, "doc_id", "text",
      Classifier.syntheticWeights(spark, dim), dim).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }
}
