package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // two clearly-separated styles: target-like docs draw from vocabulary A,
  // background docs from vocabulary B (deterministic word cycling so every
  // doc is distinct but style-pure)
  private val vocabA = Vector("alpha", "beta", "gamma", "delta", "epsilon")
  private val vocabB = Vector("one", "two", "three", "four", "five")
  private def styleDoc(vocab: Vector[String], seed: Int, len: Int): String =
    (0 until len).map(j => vocab((seed * 7 + j * 3) % vocab.size))
      .mkString(" ")

  private def twoStyleCorpus = {
    val a = (0 until 30).map(i => (i.toLong, styleDoc(vocabA, i, 12)))
    val b = (30 until 60).map(i => (i.toLong, styleDoc(vocabB, i, 12)))
    (a ++ b).toDF("doc_id", "text")
  }
  private def targetSample =
    (100 until 105).map(i => (i.toLong, styleDoc(vocabA, i, 12)))
      .toDF("doc_id", "text")

  test("target-style docs outrank background; selectTopK returns exactly them") {
    val w = Dsir.importanceWeights(twoStyleCorpus, "doc_id", "text",
      targetSample, "text", n = 2, bucketBits = 10).cache()
    assert(w.count() === 60)
    val aMin = w.where($"doc_id" < 30).agg(min($"weight_micro")).head.getLong(0)
    val bMax = w.where($"doc_id" >= 30).agg(max($"weight_micro")).head.getLong(0)
    assert(aMin > bMax,
      s"style-A min weight $aMin must exceed style-B max $bMax")
    val top = Dsir.selectTopK(w, 30).select($"doc_id").as[Long].collect().toSet
    assert(top === (0L until 30L).toSet)
  }

  test("weight_micro ≡ driver-side replay over the op's own primitives") {
    // independent composition check: collect the (doc_id, bucket, cnt)
    // primitive and the dictionary, recompute every weight in plain Scala
    val corpus = twoStyleCorpus
    val perDoc = Dsir.docBucketRows(corpus, "doc_id", "text",
        n = 2, bucketBits = 10)
      .as[(Long, Long, Long)].collect()
    val rawCounts = perDoc.groupBy(_._2).map { case (b, rs) =>
      b -> rs.map(_._3).sum }
    val tgtPerDoc = Dsir.docBucketRows(targetSample, "doc_id", "text",
        n = 2, bucketBits = 10)
      .as[(Long, Long, Long)].collect()
    val tgtCounts = tgtPerDoc.groupBy(_._2).map { case (b, rs) =>
      b -> rs.map(_._3).sum }
    val bdub = (1L << 10).toDouble
    val t = tgtCounts.values.sum.toDouble
    val r = rawCounts.values.sum.toDouble
    def lr(bucket: Long): Long =
      math.floor((math.log((tgtCounts.getOrElse(bucket, 0L) + 1.0) / (t + bdub)) -
                  math.log((rawCounts.getOrElse(bucket, 0L) + 1.0) / (r + bdub)))
        * 1e6 + 0.5).toLong
    val expected = perDoc.groupBy(_._1).map { case (id, rs) =>
      id -> (rs.map(_._3).sum, rs.map(x => x._3 * lr(x._2)).sum) }
    val got = Dsir.importanceWeights(corpus, "doc_id", "text",
        targetSample, "text", n = 2, bucketBits = 10)
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, n, wm) =>
      val (en, ew) = expected(id)
      assert(n === en, s"doc $id n_ngrams")
      assert(wm === ew, s"doc $id weight_micro")
    }
  }

  test("weights are partitioning-invariant (exact long sums)") {
    val c = twoStyleCorpus
    def run(parts: Int) = Dsir.importanceWeights(c.repartition(parts),
        "doc_id", "text", targetSample, "text", n = 2, bucketBits = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(run(1) === run(7))
  }

  test("docs shorter than n words get the neutral (0, 0) weight") {
    val c = Seq((1L, "solo"), (2L, ""), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(c, "doc_id", "text",
        targetSample, "text", n = 2, bucketBits = 10)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(w(0) === ((1L, 0L, 0L)))
    assert(w(1) === ((2L, 0L, 0L)))
    assert(w(2)._2 === 2L) // "alpha beta", "beta gamma"
  }

  test("selectTopK: ties by smaller doc_id; k past the end keeps all rows") {
    val w = Seq((5L, 3L, 100L), (2L, 3L, 100L), (9L, 1L, 50L))
      .toDF("doc_id", "n_ngrams", "weight_micro")
    val top = Dsir.selectTopK(w, 2)
      .select($"doc_id", $"rank").as[(Long, Int)].collect().toSeq
    assert(top.sortBy(_._2) === Seq((2L, 1), (5L, 2)))
    assert(Dsir.selectTopK(w, 10).count() === 3)
  }

  test("plan: ONE shingling pass (AQE reuses the doc-bucket exchange); " +
    "dict joins broadcast; selection is TakeOrderedAndProject") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      docs.where($"doc_id" % 7 === 0), "text", n = 2, bucketBits = 12)
    w.collect() // materialize the adaptive plan
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().contains("isFinalPlan=true"), plan.take(500))
    assert(plan.contains("ReusedExchange"), plan.take(4000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    val sel = Dsir.selectTopK(w, 25)
    sel.collect()
    val sp = sel.queryExecution.executedPlan.toString
    assert(sp.contains("TakeOrderedAndProject"), sp.take(4000))
  }
}
