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

  test("BpeEncode expression ≡ fold-chain encode, word for word, at " +
    "every rule-list prefix") {
    val merges = Bpe.train(corpus, "text", nMerges = 8)
    (0 to merges.size).foreach { k =>
      val expr = Bpe.encodeVocab(corpus, "text", merges.take(k))
        .select("w", "tokens").as[(String, Seq[String])].collect().toMap
      val fold = Bpe.encodeVocabFold(corpus, "text", merges.take(k))
        .select("w", "tokens").as[(String, Seq[String])].collect().toMap
      assert(expr === fold, s"prefix $k")
    }
  }

  test("BpeEncode rejects a merge list out of training rank order; dead " +
    "sides are allowed") {
    import graft.expr.BpeEncode
    // "xy" is produced only by the LATER rule → min-rank and fold-chain
    // would diverge → constructor must refuse
    val e = intercept[IllegalArgumentException] {
      BpeEncode.bpe_encode(col("text"), Seq(("xy", "z"), ("x", "y")))
    }
    assert(e.getMessage.contains("later rule"))
    // a multi-char side NO rule produces is dead under both algorithms
    val ok = corpus.select(
      BpeEncode.bpe_encode(lit("xyz"), Seq(("qq", "z"), ("x", "y"))).as("t"))
      .limit(1).as[Seq[String]].head()
    assert(ok === Seq("xy", "z"))
    val dup = corpus.select(
      BpeEncode.bpe_encode(lit("xyxy"), Seq(("x", "y"), ("x", "y"))).as("t"))
      .limit(1).as[Seq[String]].head()
    assert(dup === Seq("xy", "xy"))
  }

  test("trainLocal ≡ train: identical rule lists incl. the minCount stop " +
    "and the (cnt desc, lhs, rhs) tie-break") {
    assert(Bpe.trainLocal(corpus, "text", nMerges = 8) ===
      Bpe.train(corpus, "text", nMerges = 8))
    assert(Bpe.trainLocal(corpus, "text", nMerges = 64) ===
      Bpe.train(corpus, "text", nMerges = 64)) // exhaustion parity
    assert(Bpe.trainLocal(corpus, "text", nMerges = 5, minCount = 4L) ===
      Bpe.train(corpus, "text", nMerges = 5, minCount = 4L))
  }

  test("production-size regime: trainLocal to hundreds of rules in one " +
    "process, BpeEncode applies them in one plan node, encode lossless") {
    // richer corpus: deterministic multi-word docs over a synthetic
    // alphabet so pair counts stay interesting for hundreds of merges
    val rich = spark.range(0, 400).selectExpr("id",
      """concat_ws(' ',
         concat('tok', cast(id % 37 as string), 'alpha'),
         concat('word', cast(id % 23 as string), 'beta'),
         concat('seg', cast(id % 11 as string), 'gamma'),
         concat('item', cast(id % 53 as string), 'delta'),
         concat('run', cast(id % 41 as string), 'epsilon'),
         concat('tok', cast((id + 5) % 37 as string), 'alpha')) as text""")
    val rules = Bpe.trainLocal(rich, "text", nMerges = 600, minCount = 2L)
    assert(rules.size > 200, s"expected hundreds of rules, got ${rules.size}")
    val enc = Bpe.encodeVocab(rich, "text", rules)
    assert(enc.where(array_join(col("tokens"), "") =!= col("w")).count() === 0)
    // the plan carries ONE bpe_encode node — not rules.size fold nodes
    // (the fold chain would print one lambda `aggregate(` per rule);
    // analyzed plan, because the physical summary elides expressions
    val plan = enc.queryExecution.analyzed.toString
    assert(plan.sliding("bpe_encode".length).count(_ == "bpe_encode") === 1)
    assert(!plan.contains("aggregate("), "fold-chain nodes leaked into the plan")
    // spot-check a fused multi-char token actually exists
    assert(enc.select(explode(col("tokens"))).as[String].collect()
      .exists(_.length > 2))
  }

  test("encodeIds: sequence length ≡ tokenCounts, decode round-trips to " +
    "the normalized text, empty doc → empty array") {
    val merges = Bpe.trainLocal(corpus, "text", nMerges = 8)
    val ids = Bpe.encodeIds(corpus, "doc_id", "text", merges)
      .as[(Long, Seq[Int])].collect().toMap
    val counts = Bpe.tokenCounts(corpus, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(ids.keySet === counts.keySet)
    ids.foreach { case (d, seq) => assert(seq.size.toLong === counts(d)) }
    assert(ids(3L) === Seq.empty)
    // decode: inverse vocab map; concatenated tokens = normalized words
    val inv = Bpe.vocabIds(merges).map(_.swap).toMap
    val norm = corpus.select(col("doc_id"),
        concat_ws("", Curation.normWords(col("text"))).as("t"))
      .as[(Long, String)].collect().toMap
    ids.foreach { case (d, seq) =>
      assert(seq.map(inv).mkString("") === norm(d), s"doc $d")
    }
  }

  test("encodeIds expression ≡ dictionary-join cross-check, doc for doc") {
    val merges = Bpe.trainLocal(corpus, "text", nMerges = 8)
    val expr = Bpe.encodeIds(corpus, "doc_id", "text", merges)
      .as[(Long, Seq[Int])].collect().toMap
    val dict = Bpe.encodeIdsDict(corpus, "doc_id", "text", merges)
      .as[(Long, Seq[Int])].collect().toMap
    assert(expr === dict)
    // and the expression plan is a pure map: no exchange anywhere
    val plan = Bpe.encodeIds(corpus, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encodeIds plan shuffles:\n$plan")
  }

  test("vocabIds: base alphabet 0-35, fused = 36 + rank - 1, duplicate " +
    "fusions keep the first producer") {
    val v = Bpe.vocabIds(Seq(("a", "b"), ("ab", "c"), ("a", "bc"))).toMap
    assert(v("0") === 0 && v("9") === 9 && v("a") === 10 && v("z") === 35)
    assert(v("ab") === 36)
    assert(v("abc") === 37) // ("a","bc") fuses the same string → hole at 38
    assert(v.size === 36 + 2)
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
