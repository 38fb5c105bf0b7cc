package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "low low low lower lower newest newest newest"),
    (1L, "newest newest newest widest widest lowest"),
    (2L, "new new news newer lowest widest"),
    (3L, "")
  ).toDF("doc_id", "text")

  // ---- independent plain-Scala Sennrich replay --------------------------
  private def tok(t: String): Seq[String] =
    t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split(" ")
      .filter(_.nonEmpty).toSeq

  private def passMerge(ss: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < ss.size) {
      if (i + 1 < ss.size && ss(i) == l && ss(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += ss(i); i += 1 }
    }
    out.toSeq
  }

  private def replayTrain(texts: Seq[String], n: Int, minCount: Long)
      : (Seq[(String, String)], Map[String, Seq[String]]) = {
    val words = texts.flatMap(tok)
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var syms: Map[String, Seq[String]] =
      freq.keys.map(w => w -> (w.map(_.toString): Seq[String])).toMap
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (rules.size < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, ss) <- syms; i <- 0 until ss.size - 1)
        counts((ss(i), ss(i + 1))) += freq(w)
      val cands = counts.filter(_._2 >= minCount)
      if (cands.isEmpty) done = true
      else {
        val best = cands.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        rules += best
        syms = syms.map { case (w, ss) => w -> passMerge(ss, best._1, best._2) }
      }
    }
    (rules.toSeq, syms)
  }

  test("train ≡ independent Sennrich replay (rules in rank order) and " +
    "rank 1 ≡ bpePairCounts' top row") {
    val merges = Bpe.train(corpus, "text", nMerges = 8)
    val (expected, _) = replayTrain(
      corpus.select("text").as[String].collect().toSeq, 8, 2L)
    assert(merges === expected)
    val top = TextAnalysis.bpePairCounts(corpus, "text", k = 1)
      .select("lhs", "rhs").as[(String, String)].head()
    assert(merges.head === top)
  }

  test("encodeVocab: lossless (concat tokens = word) and token counts " +
    "monotone non-increasing in merge count") {
    val merges = Bpe.train(corpus, "text", nMerges = 8)
    val enc = Bpe.encodeVocab(corpus, "text", merges)
    val broken = enc.where(array_join(col("tokens"), "") =!= col("w")).count()
    assert(broken === 0)
    val sizes = (0 to merges.size).map { k =>
      Bpe.encodeVocab(corpus, "text", merges.take(k))
        .agg(sum(size(col("tokens")))).head().getLong(0)
    }
    sizes.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"token total grew after a merge: $sizes")
    }
    // the replay's final symbol tables agree word-for-word
    val (_, replaySyms) = replayTrain(
      corpus.select("text").as[String].collect().toSeq, 8, 2L)
    enc.select("w", "tokens").as[(String, Seq[String])].collect()
      .foreach { case (w, t) => assert(t === replaySyms(w), s"word $w") }
  }

  test("tokenCounts: per-doc sums ≡ replay, empty doc → 0") {
    val merges = Bpe.train(corpus, "text", nMerges = 8)
    val (_, replaySyms) = replayTrain(
      corpus.select("text").as[String].collect().toSeq, 8, 2L)
    val expected = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, t) =>
        id -> tok(t).map(w => replaySyms(w).size.toLong).sum
      }.toMap
    val got = Bpe.tokenCounts(corpus, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    assert(got(3L) === 0L)
  }
}
