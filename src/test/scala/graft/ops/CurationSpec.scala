package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // 15 distinct words → 3 distinct 13-grams
  private val evalText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"
  private val evalWords = evalText.split(" ")

  test("ngrams: count, window content, short-doc empty") {
    val df = Seq(evalText, "too short").toDF("text")
      .select(Curation.ngrams($"text", 13).as("ng"))
    val rows = df.collect()
    val ng = rows(0).getSeq[String](0)
    assert(ng.length === 3)
    assert(ng.head === evalWords.take(13).mkString(" "))
    assert(ng.last === evalWords.drop(2).mkString(" "))
    assert(rows(1).getSeq[String](0).isEmpty)
  }

  test("ngrams normalize like the dedup path: case/punct-insensitive") {
    val a = Seq("Alpha, beta; GAMMA!").toDF("text")
      .select(Curation.ngrams($"text", 3).as("ng")).head().getSeq[String](0)
    assert(a === Seq("alpha beta gamma"))
  }

  test("decontaminate flags overlapping docs with distinct-hit counts") {
    val corpus = Seq(
      (0L, evalWords.take(13).mkString(" ")),         // 1 shared 13-gram
      (1L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"), // clean
      (2L, evalWords.take(14).mkString(" ")),         // 2 shared 13-grams
      (3L, "short doc")                               // < 13 words
    ).toDF("doc_id", "text")
    val eval = Seq(evalText).toDF("text")
    val hits = Curation.decontaminate(corpus, "doc_id", "text", eval, "text")
      .as[(Long, Long)].collect().toMap
    assert(hits === Map(0L -> 1L, 2L -> 2L))
  }

  test("decontaminate: hashed join keys ≡ string join keys") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val eval = docs.where($"doc_id" % 7 === 0)
    val h = Curation.decontaminate(docs, "doc_id", "text", eval, "text",
      hashed = true).as[(Long, Long)].collect().toMap
    val s = Curation.decontaminate(docs, "doc_id", "text", eval, "text",
      hashed = false).as[(Long, Long)].collect().toMap
    assert(h === s)
    assert(h.nonEmpty)
  }

  test("decontaminate plan: corpus side broadcast-joined, no sort-merge") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dec = Curation.decontaminate(docs, "doc_id", "text",
      docs.where($"doc_id" % 7 === 0), "text")
    dec.count()
    val plan = dec.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("repetition ratios") {
    val r = Seq(
      ("spam spam spam spam", 0),        // 1 distinct of 4; 1 distinct 2-gram of 3
      ("all words here differ", 1),
      ("", 2),
      ("solo", 3)
    ).toDF("text", "i")
      .select($"i", Curation.dupWordRatio($"text").as("w"),
        Curation.dupNgramRatio($"text", 2).as("g"))
      .as[(Int, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(0)._1 === 0.75 && r(0)._2 === 1.0 - 1.0 / 3.0)
    assert(r(1) === ((0.0, 0.0)))
    assert(r(2) === ((0.0, 0.0)))  // empty doc: no words, no 2-grams
    assert(r(3) === ((0.0, 0.0)))  // single word: ratio 0, no 2-grams
  }

  test("PII redaction and counts") {
    val rows = Seq(
      "reach bob@x.io or 10.1.2.3 ref 12345678",
      "clean text with no identifiers at all",
      "a1234567@b.com mail",  // digit run inside email: consumed by <EMAIL>
      "call 5551234567 now",
      "peer user@10.0.0.1 up" // no alpha TLD → not an email; IP redacted
    ).toDF("text")
      .select(Curation.redactPii($"text").as("red"),
        Curation.piiCounts($"text").as("c"))
      .select($"red", $"c.n_emails", $"c.n_ips", $"c.n_nums")
      .as[(String, Int, Int, Int)].collect()
    assert(rows(0) === (("reach <EMAIL> or <IP> ref <NUM>", 1, 1, 1)))
    assert(rows(1) === (("clean text with no identifiers at all", 0, 0, 0)))
    assert(rows(2) === (("<EMAIL> mail", 1, 0, 0)))
    assert(rows(3) === (("call <NUM> now", 0, 0, 1)))
    assert(rows(4) === (("peer user@<IP> up", 0, 1, 0)))
  }

  test("quotaSample: k per group, deterministic, ≡ window-rank baseline") {
    val docs = (0L until 100L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val sampled = Curation.quotaSample(docs, Seq("lang"), "doc_id", k = 5)
      .as[(String, Long)].collect().toSet
    assert(sampled.groupBy(_._1).forall(_._2.size == 5))
    // stable under a different physical partitioning
    val sampled2 = Curation.quotaSample(docs.repartition(7, $"doc_id"),
      Seq("lang"), "doc_id", k = 5).as[(String, Long)].collect().toSet
    assert(sampled === sampled2)
    // ≡ the window-rank definition of the same sample
    val w = Window.partitionBy($"lang")
      .orderBy(Curation.sampleRank($"doc_id"))
    val baseline = docs.withColumn("rk", row_number().over(w))
      .where($"rk" <= 5).select($"lang", $"doc_id")
      .as[(String, Long)].collect().toSet
    assert(sampled === baseline)
  }

  test("sampleRank: raises on ids outside [0, 2^31) instead of wrapping") {
    val ok = Seq(0L, 1L, (1L << 31) - 1).toDF("id")
      .select(Curation.sampleRank($"id")).as[Long].collect()
    assert(ok.distinct.length === 3)
    val ex = intercept[Exception] {
      Seq(1L << 31).toDF("id")
        .select(Curation.sampleRank($"id")).collect()
    }
    assert(ex.getMessage.contains("sampleRank id out of"))
  }

  test("shardAssign/splitAssign: deterministic, in-range, weight-proportional") {
    val docs = (0L until 2000L).toDF("id")
    val assigned = docs.select($"id",
      Curation.shardAssign($"id", 8).as("shard"),
      Curation.splitAssign($"id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).as("split"))
      .as[(Long, Long, String)].collect()
    assert(assigned.forall(r => r._2 >= 0 && r._2 < 8))
    assert(assigned.map(_._3).toSet === Set("train", "val", "test"))
    val bySplit = assigned.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit("train") > 1600 && bySplit("train") < 1950)
    assert(bySplit("val") > 30 && bySplit("test") > 30)
    // pure function of id: a repartitioned re-run assigns identically
    val again = docs.repartition(7).select($"id",
      Curation.shardAssign($"id", 8).as("shard"),
      Curation.splitAssign($"id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).as("split"))
      .as[(Long, Long, String)].collect()
    assert(assigned.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // manual arithmetic spot-check
    val r0 = Math.floorMod(7L * 2654435761L, 4294967296L)
    assert(assigned.find(_._1 == 7L).get._2 === Math.floorMod(r0, 8L))
    intercept[IllegalArgumentException] {
      Curation.splitAssign($"id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("mixtureSample: per-group fractions, default, determinism, ≡ baseline") {
    val docs = (0L until 3000L).map(i => (i, s"lang${i % 5}"))
      .toDF("doc_id", "lang")
    val fr = Seq("lang0" -> 0.5, "lang1" -> 0.25, "lang2" -> 0.0)
    val picked = Curation.mixtureSample(docs, "lang", "doc_id", fr,
      defaultFraction = 0.1).select($"doc_id", $"lang")
      .as[(Long, String)].collect().toSet
    // subset of the input; zero-fraction group absent
    assert(picked.forall { case (id, l) => l == s"lang${id % 5}" })
    assert(!picked.exists(_._2 == "lang2"))
    // per-group counts track the fraction (600 rows per group)
    val byLang = picked.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang("lang0") > 240 && byLang("lang0") < 360)
    assert(byLang("lang1") > 100 && byLang("lang1") < 200)
    assert(byLang.getOrElse("lang3", 0) > 25 && byLang("lang3") < 95)
    // ≡ the direct per-row cutoff definition
    val baseline = docs.where(Curation.sampleRank($"doc_id") <
        when($"lang" === "lang0", 2147483648L)
          .when($"lang" === "lang1", 1073741824L)
          .when($"lang" === "lang2", 0L)
          .otherwise(math.round(0.1 * 4294967296.0)))
      .as[(Long, String)].collect().toSet
    assert(picked === baseline)
    // pure function of the id: stable under a different partitioning
    val again = Curation.mixtureSample(docs.repartition(7, $"doc_id"),
      "lang", "doc_id", fr, defaultFraction = 0.1)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(picked === again)
    intercept[IllegalArgumentException] {
      Curation.mixtureSample(docs, "lang", "doc_id", Seq("lang0" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Curation.mixtureSample(docs, "lang", "doc_id",
        Seq("lang0" -> 0.5, "lang0" -> 0.2))
    }
  }

  test("mixtureSample plan: pure when-chain filter — no join, no shuffle") {
    val docs = (0L until 100L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val q = Curation.mixtureSample(docs, "lang", "doc_id", Seq("lang0" -> 0.5))
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    assert(!plan.contains("Exchange"), plan.take(2000))
    // schema passes through untouched (no column reorder)
    assert(q.columns.toSeq === docs.columns.toSeq)
  }

  test("quotaSample plan: bounded partial aggregate, no window sort funnel") {
    val docs = (0L until 100L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val q = Curation.quotaSample(docs, Seq("lang"), "doc_id", k = 5)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan.take(2000))
  }

  test("dupSpans: cross-doc windows count, self-repetition does not") {
    val w13 = evalWords.take(13).mkString(" ")
    val corpus = Seq(
      (0L, evalWords.take(14).mkString(" ")), // 2 windows, 1 shared (w13)
      (1L, w13),                              // 1 window, shared with 0 and 3
      (2L, "totally different words that appear nowhere else at all " +
        "padding padding padding padding"),   // windows, none shared
      (3L, w13 + " " + w13),                  // self-repeat AND cross-doc
      (4L, "short doc")                       // < 13 words → zeros
    ).toDF("doc_id", "text")
    val got = Curation.dupSpans(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 3 has 14 windows (26 words); windows containing only its own
    // doubled text still match doc 0/1's w13 only when the exact 13-gram
    // recurs across docs — the first window and the window starting at
    // word 14 equal w13; intermediate windows wrap around the seam and
    // exist nowhere else.
    assert(got(0) === ((0L, 2L, 1L, 0.5)))
    assert(got(1) === ((1L, 1L, 1L, 1.0)))
    assert(got(2)._3 === 0L && got(2)._4 === 0.0)
    val d3 = got(3)
    assert(d3._2 === 14L && d3._3 === 2L &&
      d3._4 === math.rint(2.0 / 14.0 * 10000) / 10000)
    assert(got(4) === ((4L, 0L, 0L, 0.0)))
  }

  test("dupSpans: hashed ≡ string keys on real docs; all rows covered") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val h = Curation.dupSpans(docs, "doc_id", "text", hashed = true)
      .orderBy("doc_id").collect().toSeq
    val s = Curation.dupSpans(docs, "doc_id", "text", hashed = false)
      .orderBy("doc_id").collect().toSeq
    assert(h === s)
    assert(h.size === docs.count())
  }

  test("dupSpans plan: ONE shingling pass (AQE reuses the n-gram exchange)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Curation.dupSpans(docs, "doc_id", "text")
    q.collect() // materialize the adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().contains("isFinalPlan=true"), plan.take(500))
    // the (ng, doc_id) collapse exchange must serve BOTH consumers
    assert(plan.contains("ReusedExchange"), plan.take(4000))
    // and no per-ng window funnel anywhere
    assert(!plan.contains("Window"), plan.take(4000))
  }

  test("normWords expression ≡ regex formula, element-exact (incl. edge cases)") {
    // every curation oracle replays the REGEX tokenization in SQL — the
    // byte-scan expression must produce identical token sequences
    val texts = Seq(
      "The quick, brown FOX!! jumps #42 over_the lazy dog.",
      "", "   ", "!!!", "a", "ab12cd",
      "tabs\tand\nnewlines\rare separators too",
      "ünïcödé Ça va ÅÄÖ mixed ascii123 tail",
      "KELVIN sign lowercases to ascii k",   // U+212A → 'k'
      "digits 007 and trailing punct...",
      "x" * 300
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val both = texts.select(
      Curation.normWords($"text").as("e"),
      Curation.normWordsHof($"text").as("h"))
    val diff = both.where(
      size($"e") =!= size($"h") ||
        exists(zip_with($"e", $"h", (a, b) => a =!= b), identity))
    assert(diff.count() === 0L, both.collect().mkString("\n"))
    // and on real corpus docs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val d2 = docs.select(Curation.normWords($"text").as("e"),
        Curation.normWordsHof($"text").as("h"))
      .where(size($"e") =!= size($"h") ||
        exists(zip_with($"e", $"h", (a, b) => a =!= b), identity))
    assert(d2.count() === 0L)
  }

  test("dupRuns: maximal duplicated runs merge adjacent/overlapping windows") {
    // n = 5. Doc 0 shares block A (8 words) with doc 1 and block B
    // (6 words) with doc 2, separated by 6 unique words: A's four
    // consecutive shared windows merge into one 8-word run, B's two into
    // a 6-word run — two runs, coverage 14.
    val A = (1 to 8).map(i => s"a$i").mkString(" ")
    val B = (1 to 6).map(i => s"b$i").mkString(" ")
    val E = (1 to 5).map(i => s"e$i").mkString(" ")
    val F = (1 to 5).map(i => s"f$i").mkString(" ")
    val corpus = Seq(
      (0L, A + " u1 u2 u3 u4 u5 u6 " + B),
      (1L, A),
      (2L, B),
      (3L, "ten totally unique filler words nobody else ever repeats anywhere"),
      (4L, "tiny doc"),                       // < 5 words → zeros
      // E at pos 1, F at pos 6 in doc 5 (gap exactly n ⇒ intervals touch ⇒
      // ONE merged 10-word run); in doc 6 F starts at pos 8 (gap > n ⇒ two
      // separate 5-word runs)
      (5L, E + " " + F),
      (6L, E + " w1 w2 " + F)
    ).toDF("doc_id", "text")
    val got = Curation.dupRuns(corpus, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got(0) === ((0L, 2L, 8L, 14L)))
    assert(got(1) === ((1L, 1L, 8L, 8L)))
    assert(got(2) === ((2L, 1L, 6L, 6L)))
    assert(got(3) === ((3L, 0L, 0L, 0L)))
    assert(got(4) === ((4L, 0L, 0L, 0L)))
    assert(got(5) === ((5L, 1L, 10L, 10L)))
    assert(got(6) === ((6L, 2L, 5L, 10L)))
  }

  test("dupRuns: hashed ≡ string keys on real docs; all rows covered; no ng-window") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val h = Curation.dupRuns(docs, "doc_id", "text", n = 5, hashed = true)
    val s = Curation.dupRuns(docs, "doc_id", "text", n = 5, hashed = false)
      .orderBy("doc_id").collect().toSeq
    assert(h.orderBy("doc_id").collect().toSeq === s)
    assert(s.size === docs.count())
    // the only Window is the per-DOC gaps-and-islands merge (bounded by
    // one document's length) — never a window over the n-gram key
    h.collect()
    val plan = h.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(_.contains("doc_id")), windowLines.mkString("\n"))
  }

  test("leakageSafeSplit: clusters land whole in one split") {
    val docs = (0L until 40L).toDF("doc_id")
    // chain 0-1-2, pair 10-11, the rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Curation.leakageSafeSplit(docs, "doc_id", pairs,
      Seq("train" -> 0.5, "test" -> 0.5))
      .as[(Long, Long, String)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 === 0L && byId(1L)._2 === 0L && byId(2L)._2 === 0L)
    assert(byId(0L)._3 === byId(1L)._3 && byId(1L)._3 === byId(2L)._3)
    assert(byId(10L)._3 === byId(11L)._3)
    // split of a clustered doc == split its representative would get alone
    val solo = Curation.splitAssign(col("doc_id"),
      Seq("train" -> 0.5, "test" -> 0.5))
    val rep = docs.where($"doc_id" === 0L).select(solo).head().getString(0)
    assert(byId(2L)._3 === rep)
    // singletons cover both splits on 40 ids (sanity: not all one bucket)
    assert(out.map(_._3).distinct.size === 2)
  }

  test("decontaminateBloom ≡ decontaminate on real docs (FPs verified away)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val eval = docs.where($"doc_id" % 7 === 0)
    val exact = Curation.decontaminate(docs, "doc_id", "text", eval, "text")
      .as[(Long, Long)].collect().toMap
    val bloom = Curation.decontaminateBloom(docs, "doc_id", "text",
        eval, "text")
      .as[(Long, Long)].collect().toMap
    assert(bloom === exact)
    assert(bloom.nonEmpty)
    // a deliberately tiny bloom (maximal FP pressure) must STILL be exact —
    // the verify join owns correctness, the bitset only owns the prune
    val tiny = Curation.decontaminateBloom(docs, "doc_id", "text",
        eval, "text", mBits = 64, kProbes = 1)
      .as[(Long, Long)].collect().toMap
    assert(tiny === exact)
  }

  test("bloom bitset: zero false negatives, measured false-positive prune") {
    val keys = (0L until 2000L).map(k => k * 2654435761L).toDF("k")
    val bits = Curation.bloomBitset(keys, "k", 1 << 17, 3)
    val members = keys.crossJoin(broadcast(bits))
      .where(Curation.bloomTest($"k", $"_bloom", 1 << 17, 3))
    assert(members.count() === 2000L) // bloom never drops a member
    // disjoint probe set: FP rate at 2000 keys / 2^17 bits / 3 probes is
    // ~(1 - e^-kn/m)^k ≈ 1e-4 — assert an order-of-magnitude ceiling
    val probes = (0L until 20000L).map(k => k * 7919L + 3L).toDF("k")
      .join(keys, Seq("k"), "left_anti")
    val fp = probes.crossJoin(broadcast(bits))
      .where(Curation.bloomTest($"k", $"_bloom", 1 << 17, 3)).count()
    assert(fp <= 20, s"false-positive count too high: $fp")
  }

  test("decontaminateBloom: empty eval set → all-zero bitset, no hits") {
    val docs = Seq((0L, evalText)).toDF("doc_id", "text")
    val eval = docs.where($"doc_id" < 0)
    assert(Curation.decontaminateBloom(docs, "doc_id", "text", eval, "text")
      .count() === 0L)
  }

  test("decontaminateBloom plan: single-row broadcast bitset prefilter") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dec = Curation.decontaminateBloom(docs, "doc_id", "text",
      docs.where($"doc_id" % 7 === 0), "text")
    dec.count()
    val plan = dec.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the bitset rides a BroadcastNestedLoopJoin (ONE build row); the
    // exact verify stays a broadcast hash join — no sort-merge anywhere
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("decontaminateFuzzy: near-dups of eval docs flagged, intra-corpus " +
    "dups and eval ids excluded, multi-eval matches counted") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "the quick brown fox jumps over the lazy dog near the river shore"),
      (2L, "completely different content about spark query engines and shuffles"),
      (3L, "completely different content about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "the quick brown fox jumps over the lazy dog near the river shore")
    ).toDF("doc_id", "text")
    val got = Curation.decontaminateFuzzy(corpus, "doc_id", "text",
        evalSet, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // docs 0 and 1 each match BOTH eval docs (exact vs one, near-dup vs
    // the other); docs 2/3 near-dup each other but no eval doc, so the
    // intra-corpus pair the banded join also finds must NOT surface
    assert(got.map(_._1).toSeq === Seq(0L, 1L))
    got.foreach { case (_, n, j) => assert(n === 2L); assert(j === 1.0) }
    // and eval ids themselves never appear as contaminated docs
    assert(!got.exists(_._1 >= 100L))
  }

  test("snapshotDiff: all four statuses, full-outer completeness, " +
    "precomputed-hash seam ≡ derived") {
    val prev = Seq((0L, "same"), (1L, "old text"), (3L, "dropped"))
      .toDF("doc_id", "text")
    val cur = Seq((0L, "same"), (1L, "new text"), (2L, "brand new"))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDiff(prev, cur, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "unchanged", 1L -> "changed",
      2L -> "added", 3L -> "removed"))
    // every id from either side appears exactly once
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    // precomputed digests on either side give the identical diff
    val ph = prev.withColumn("h", xxhash64(col("text")))
    val ch = cur.withColumn("h", xxhash64(col("text")))
    val viaPre = Curation.snapshotDiff(ph, ch, "doc_id", "text",
      precomputedHashPrev = Some("h"), precomputedHashCur = Some("h"))
      .as[(Long, String)].collect().toMap
    assert(viaPre == got)
  }

  test("dupRunSpans: exact char ranges — substring(start_char, end_char) " +
    "IS the duplicated run") {
    // n = 3. "bb cc dd" shared between docs 10/11 (single window);
    // "q1 q2 q3 q4" shared between 12/13 (two overlapping windows merge).
    // Vocabularies of the two pairs are disjoint so no window crosses.
    val corpus = Seq(
      (10L, "aa bb cc dd ee ff gg"),
      (11L, "xx bb cc dd yy zz hh"),
      (12L, "m1 m2 q1 q2 q3 q4 m3"),
      (13L, "n1 q1 q2 q3 q4 n2 n3")
    ).toDF("doc_id", "text")
    val spans = Curation.dupRunSpans(corpus, "doc_id", "text", n = 3)
      .as[(Long, Int, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 10: words 1..3 = chars [3, 11) = "bb cc dd"
    assert(spans(10L) === ((10L, 1, 3, 3, 11, 3L)))
    assert(spans(11L) === ((11L, 1, 3, 3, 11, 3L)))
    // docs 12/13: merged 4-word run "q1 q2 q3 q4"
    assert(spans(12L) === ((12L, 2, 5, 6, 17, 4L)))
    assert(spans(13L) === ((13L, 1, 4, 3, 14, 4L)))
    // the char range extracts the run text verbatim
    val texts = corpus.as[(Long, String)].collect().toMap
    for ((id, (_, _, _, sc, ec, _)) <- spans)
      assert(texts(id).substring(sc, ec).split(" ").length ===
        spans(id)._6, s"doc $id span text mismatch")
    assert(texts(10L).substring(3, 11) === "bb cc dd")
    assert(texts(12L).substring(6, 17) === "q1 q2 q3 q4")
  }

  test("removeDupSpans: known cut boundaries, remove-all vs keep-first, " +
    "untouched docs byte-identical") {
    val corpus = Seq(
      (10L, "aa bb cc dd ee ff gg"),
      (11L, "xx bb cc dd yy zz qq"),
      // doc with repeated spaces and NO shared run: must round-trip
      // byte-exactly through the isNull branch
      (12L, "uu  vv   ww unique only here"),
      (13L, "hh ii")
    ).toDF("doc_id", "text")
    val all = Curation.removeDupSpans(corpus, "doc_id", "text", n = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(all(10L) === ((10L, "aa ee ff gg", 1L, 3L)))
    assert(all(11L) === ((11L, "xx yy zz qq", 1L, 3L)))
    assert(all(12L) === ((12L, "uu  vv   ww unique only here", 0L, 0L)))
    assert(all(13L) === ((13L, "hh ii", 0L, 0L)))
    // keep-first: the corpus-wide first occurrence (min (doc_id, pos))
    // survives — doc 10 intact, doc 11 still cut
    val kf = Curation.removeDupSpans(corpus, "doc_id", "text", n = 3,
      keepFirst = true)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(kf(10L) === ((10L, "aa bb cc dd ee ff gg", 0L, 0L)))
    assert(kf(11L) === ((11L, "xx yy zz qq", 1L, 3L)))
  }

  test("removeDupSpans ≡ dupRunSpans accounting; whole-doc run → empty " +
    "clean_text; per-doc window only (no corpus-key window)") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val boiler = "b1 b2 b3 b4 b5"
    val corpus = Seq(
      (0L, boiler), (1L, boiler), (2L, boiler), // identical whole docs
      (3L, s"head $boiler tail extra words here")
    ).toDF("doc_id", "text")
    val removed = Curation.removeDupSpans(corpus, "doc_id", "text", n = 5)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    for (id <- 0L to 2L) assert(removed(id)._2 === "")
    assert(removed(3L)._2 === "head tail extra words here")
    // removed_words agrees with the span report
    val spanSum = Curation.dupRunSpans(corpus, "doc_id", "text", n = 5)
      .groupBy($"doc_id").agg(fsum($"run_words").as("rw"))
      .as[(Long, Long)].collect().toMap
    for ((id, (_, _, _, rw)) <- removed if rw > 0)
      assert(spanSum(id) === rw, s"doc $id accounting mismatch")
    // the only Window in the plan partitions by doc_id (gaps-and-islands),
    // never by the n-gram key
    val plan = Curation.removeDupSpans(corpus, "doc_id", "text", n = 5)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("partitionBy: [ng"), plan.take(2000))
  }
}
