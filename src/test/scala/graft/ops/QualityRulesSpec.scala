package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** C4 line filter, Gopher rules, and sliding-window chunking — each
  * cross-checked against an independent plain-Scala replay of the
  * published rule definitions on a deterministic adversarial corpus
  * (bullets, ellipses, empty/whitespace docs, blocklist words, punctuated
  * tokens), plus hand-computed cases, guard rejections, and zero-exchange
  * plan gates (these are the pre-dedup filters — they must stay narrow).
  */
class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._

  // space-only trim, mirroring Spark/DuckDB TRIM (Java's String.trim also
  // strips \n/\t — NOT the engine semantics)
  private def trimSp(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  private val pool = Vector("the", "quick", "brown", "fox", "#tag", "data",
    "42", "...", "and", "of", "table", "vector", "value", "be")

  private def mkText(i: Int): String = {
    val nLines = 1 + i % 5
    (0 until nLines).map { j =>
      val nW = 2 + (i + j) % 6
      val ws = (0 until nW).map(k => pool((i + 3 * j + 5 * k) % pool.size))
      val pre = if ((i + j) % 7 == 0) "- " else ""
      val suf = if ((i + j) % 11 == 0) "..."
        else if ((i + j) % 3 != 0) "." else ""
      pre + ws.mkString(" ") + suf
    }.mkString("\n")
  }

  private lazy val corpus = {
    val gen = (0 until 80).map(i => (i.toLong, mkText(i)))
    val edges = Seq(
      (1000L, ""), (1001L, "   "), (1002L, "one."),
      (1003L, "lorem ipsum dolor sit."), (1004L, "the fox { runs. }"),
      (1005L, "a b c\n\nd e f."), (1006L, "JAVASCRIPT required here."))
    (gen ++ edges).toDF("doc_id", "text")
  }

  // ---- independent plain-Scala replays --------------------------------

  private def c4Replay(text: String, minWords: Int, lineBlock: Set[String],
                       docBlock: Seq[String], minKept: Int)
      : (Long, Long, Long, Long, Long, String, Boolean) = {
    val lines = text.split("\n", -1)
    val vs = lines.map { l =>
      val t = trimSp(l)
      val words = t.split("\\s+").filter(_.nonEmpty)
      val np = !(t.nonEmpty && Set('.', '!', '?', '"').contains(t.last))
      val fw = !np && words.length < minWords
      val bl = !np && !fw && words.exists(w => lineBlock(w.toLowerCase))
      (l, np, fw, bl)
    }
    val kept = vs.filter(v => !v._2 && !v._3 && !v._4)
    val docBlocked =
      docBlock.exists(p => text.toLowerCase.contains(p.toLowerCase))
    (lines.length.toLong, kept.length.toLong,
      vs.count(_._2).toLong, vs.count(_._3).toLong, vs.count(_._4).toLong,
      kept.map(_._1).mkString("\n"),
      !docBlocked && kept.length >= minKept)
  }

  private def gopherReplay(text: String, minW: Long, maxW: Long)
      : (Seq[Long], Seq[Boolean]) = {
    val words = trimSp(text).split("\\s+").filter(_.nonEmpty)
    val lines = text.split("\n", -1)
    val nWords = words.length.toLong
    val nChars = words.map(_.length.toLong).sum
    val nSym = (text.length - text.replace("#", "").length).toLong +
      (text.length - text.replace("...", "").length).toLong / 3
    val nLines = lines.length.toLong
    val nBullet = lines.count(l => trimSp(l).headOption
      .exists(c => c == '-' || c == '*' || c == '•')).toLong
    val nEll = lines.count(l => {
      val t = trimSp(l); t.endsWith("...") || t.endsWith("…")
    }).toLong
    val nAlpha = words.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val stopSet = QualityRules.gopherStopwords.toSet
    val nStop = words.count(w => stopSet(w.toLowerCase)).toLong
    val flags = Seq(
      nWords >= minW && nWords <= maxW,
      nWords > 0 && nChars >= 3 * nWords && nChars <= 10 * nWords,
      10 * nSym <= nWords,
      10 * nBullet <= 9 * nLines,
      10 * nEll <= 3 * nLines,
      5 * nAlpha >= 4 * nWords,
      nStop >= 2)
    (Seq(nWords, nChars, nSym, nLines, nBullet, nEll, nAlpha, nStop),
      flags :+ flags.forall(identity))
  }

  private def chunksReplay(text: String, w: Int, s: Int)
      : Seq[(Long, Long, Long, String)] = {
    val words = trimSp(text).split("\\s+").filter(_.nonEmpty).toSeq
    val n = words.length
    if (n == 0) Seq.empty
    else {
      val nc = if (n <= w) 1 else ((n - w + s - 1) / s) + 1
      (0 until nc).map(i => (i.toLong, (i * s).toLong,
        math.min(w, n - i * s).toLong,
        words.slice(i * s, i * s + w).mkString(" ")))
    }
  }

  // ---- C4 --------------------------------------------------------------

  test("c4LineFilter ≡ plain-Scala replay of the C4 rules on the corpus") {
    val got = QualityRules.c4LineFilter(corpus, "doc_id", "text",
        minWordsPerLine = 3, lineBlocklist = Seq("vector", "javascript"),
        docBlocklist = Seq("lorem ipsum", "{"), minKeptLines = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6), r.getBoolean(7)))).toMap
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.size == texts.length)
    texts.foreach { case (id, tx) =>
      val exp = c4Replay(tx, 3, Set("vector", "javascript"),
        Seq("lorem ipsum", "{"), 2)
      assert(got(id) == exp, s"doc $id: got ${got(id)} want $exp\n[$tx]")
    }
    // the corpus genuinely exercises every rule and both verdicts
    val all = got.values
    assert(all.exists(_._3 > 0) && all.exists(_._4 > 0) &&
      all.exists(_._5 > 0), "every line rule must fire somewhere")
    assert(all.exists(_._7) && all.exists(!_._7), "both doc verdicts")
  }

  test("c4LineFilter first-match attribution and doc-level rules by hand") {
    val df = Seq(
      // line 1 kept; line 2 no punct (even though also blocked);
      // line 3 few words (punct ok); line 4 blocked (punct + words ok)
      (1L, "the quick brown fox.\nbad vector line\nshort one.\nthe vector runs fast."),
      // doc blocklist phrase kills the doc even with enough kept lines
      (2L, "lorem ipsum is here.\ngood solid line here.\nanother good line here."),
      // too few kept lines
      (3L, "only line kept here.")
    ).toDF("doc_id", "text")
    val r = QualityRules.c4LineFilter(df, "doc_id", "text",
        minWordsPerLine = 3, lineBlocklist = Seq("vector"),
        docBlocklist = Seq("lorem ipsum"), minKeptLines = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 4 && r(0).getLong(2) == 1)
    assert(r(0).getLong(3) == 1 && r(0).getLong(4) == 1 && r(0).getLong(5) == 1)
    assert(r(0).getString(6) == "the quick brown fox.")
    assert(!r(0).getBoolean(7)) // 1 kept < 2
    assert(r(1).getLong(2) == 3 && !r(1).getBoolean(7)) // phrase-blocked
    assert(r(2).getLong(2) == 1 && !r(2).getBoolean(7))
  }

  test("c4LineFilter rejects bad parameters") {
    val df = Seq((1L, "x.")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      QualityRules.c4LineFilter(df, "doc_id", "text", minWordsPerLine = 0)
    }
    intercept[IllegalArgumentException] {
      QualityRules.c4LineFilter(df, "doc_id", "text",
        lineBlocklist = Seq(""))
    }
  }

  // ---- Gopher ----------------------------------------------------------

  test("gopherRules ≡ plain-Scala replay of Rae et al. Table A1 rules") {
    val got = QualityRules.gopherRules(corpus, "doc_id", "text",
        minWords = 5L, maxWords = 40L)
      .collect().map { r =>
        r.getLong(0) -> ((Seq.range(1, 9).map(r.getLong),
          Seq.range(9, 17).map(r.getBoolean)))
      }.toMap
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, tx) =>
      val exp = gopherReplay(tx, 5L, 40L)
      assert(got(id) == exp, s"doc $id: got ${got(id)} want $exp\n[$tx]")
    }
    val flags = got.values.map(_._2).toSeq
    assert(flags.exists(_.last) && flags.exists(!_.last), "both verdicts")
    // bullet/ellipsis/symbol/alpha rules each fire negatively somewhere
    Seq(2, 3, 4, 5).foreach(i =>
      assert(flags.exists(f => !f(i)), s"flag $i never failed"))
  }

  test("gopherRules hand case: every count exact") {
    val df = Seq((7L,
      "- the be fox...\nof 42 #tag word.\n• and that runs…")).toDF(
      "doc_id", "text")
    val r = QualityRules.gopherRules(df, "doc_id", "text",
      minWords = 1L, maxWords = 100L).collect()(0)
    // words: -,the,be,fox...,of,42,#tag,word.,•,and,that,runs…  = 12
    assert(r.getLong(1) == 12, "n_words")
    assert(r.getLong(2) == Seq("-", "the", "be", "fox...", "of", "42",
      "#tag", "word.", "•", "and", "that", "runs…").map(_.length).sum,
      "n_word_chars")
    assert(r.getLong(3) == 2, "n_symbols: one # + one ...")
    assert(r.getLong(4) == 3, "n_lines")
    assert(r.getLong(5) == 2, "n_bullet: - and •")
    assert(r.getLong(6) == 2, "n_ellipsis: ... and …")
    assert(r.getLong(7) == 9, "n_alpha_words")
    assert(r.getLong(8) == 5, "n_stop_hits: the,be,of,and,that")
  }

  test("gopherRules: empty/whitespace docs and guards") {
    val r = QualityRules.gopherRules(
        Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    r.foreach { row =>
      assert(row.getLong(1) == 0 && !row.getBoolean(16), row.toString)
    }
    intercept[IllegalArgumentException] {
      QualityRules.gopherRules(corpus, "doc_id", "text", minWords = 0L)
    }
    intercept[IllegalArgumentException] {
      QualityRules.gopherRules(corpus, "doc_id", "text",
        stopwords = Seq.empty)
    }
  }

  test("gopherRules hand case: stop hits count occurrences, not distinct") {
    val r = QualityRules.gopherRules(
      Seq((1L, "the the the fox")).toDF("doc_id", "text"),
      "doc_id", "text", minWords = 1L).collect()(0)
    assert(r.getLong(8) == 3)
  }

  // ---- sliding chunks --------------------------------------------------

  test("slidingChunks ≡ plain-Scala replay on the corpus (w=6, s=4)") {
    val got = Packing.slidingChunks(corpus, "doc_id", "text", 6, 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(_._1).toSeq).toMap
    corpus.collect().foreach { row =>
      val (id, tx) = (row.getLong(0), row.getString(1))
      val exp = chunksReplay(tx, 6, 4)
      assert(got.getOrElse(id, Seq.empty) == exp, s"doc $id [$tx]")
    }
  }

  test("slidingChunks hand case and coverage invariants") {
    val df = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val r = Packing.slidingChunks(df, "doc_id", "text", 5, 4)
      .orderBy("chunk_idx").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
      x.getString(4))).toSeq == Seq(
      (0L, 0L, 5L, "a b c d e"),
      (1L, 4L, 5L, "e f g h i"),
      (2L, 8L, 2L, "i j")))
    // coverage: every token position falls in some [start, start+ct)
    val covered = r.flatMap(x =>
      x.getLong(2) until (x.getLong(2) + x.getLong(3))).toSet
    assert(covered == (0L until 10L).toSet)
  }

  test("slidingChunks: n ≤ window, empty docs, stride = window, guards") {
    val df = Seq((1L, "a b c"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val one = Packing.slidingChunks(df, "doc_id", "text", 5, 5).collect()
    assert(one.length == 1 && one(0).getLong(0) == 1 &&
      one(0).getString(4) == "a b c")
    // stride = window tiles exactly, no overlap
    val tiled = Packing.slidingChunks(
        Seq((1L, "a b c d e f")).toDF("doc_id", "text"),
        "doc_id", "text", 3, 3)
      .orderBy("chunk_idx").collect()
    assert(tiled.map(_.getString(4)).toSeq == Seq("a b c", "d e f"))
    intercept[IllegalArgumentException] {
      Packing.slidingChunks(df, "doc_id", "text", 5, 6) // stride > window
    }
    intercept[IllegalArgumentException] {
      Packing.slidingChunks(df, "doc_id", "text", 0, 1)
    }
  }

  // ---- scale shape ------------------------------------------------------

  test("corpusReport ≡ explicit gopherRules-join-aggregate composition; " +
    "never shuffles on the document key") {
    val docs = corpus
      .withColumn("source", concat(lit("s"), (col("doc_id") % 3)))
      .withColumn("lang", concat(lit("l"), (col("doc_id") % 2)))
    val report = Curation.corpusReport(docs, "doc_id", "text",
      Seq("source", "lang"))
    // independent composition: run the rules WITHOUT carryCols, join the
    // flags back on doc_id, aggregate the same statistics
    val words = Curation.normWords(col("text"))
    val expected = QualityRules.gopherRules(docs.select("doc_id", "text"),
        "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("long").as("nc"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("nt"),
        size(words).cast("long").as("nw"),
        size(array_distinct(words)).cast("long").as("ndw")), Seq("doc_id"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("n_chars"),
        sum("nt").as("n_tokens"),
        sum(when(col("nt") === 0, 1L).otherwise(0L)).as("n_empty"),
        sum("n_words").as("n_gopher_words"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_gopher_keep"),
        sum(when(col("f_alpha"), 1L).otherwise(0L)).as("n_alpha_ok"),
        sum(when(col("f_stop"), 1L).otherwise(0L)).as("n_stop_ok"),
        sum("nw").as("n_norm_words"), sum("ndw").as("n_distinct_words"))
    assert(report.exceptAll(expected).isEmpty &&
      expected.exceptAll(report).isEmpty)
    assert(report.count() === 6)
    // the report's one exchange is the tiny group aggregation — the
    // corpus is never shuffled on the document key
    report.collect()
    val plan = report.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(doc_id"), plan.take(3000))
    // carryCols guards: missing column and output-name collision both
    // fail fast (a carried `keep` would otherwise be silently
    // overwritten by the rule verdict)
    intercept[IllegalArgumentException] {
      QualityRules.gopherRules(corpus, "doc_id", "text",
        carryCols = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      QualityRules.gopherRules(corpus.withColumn("keep", lit(1)),
        "doc_id", "text", carryCols = Seq("keep"))
    }
  }

  test("plan gate: all three operators run with zero exchanges") {
    Seq(
      QualityRules.c4LineFilter(corpus, "doc_id", "text"),
      QualityRules.gopherRules(corpus, "doc_id", "text"),
      Packing.slidingChunks(corpus, "doc_id", "text", 6, 4)
    ).foreach { df =>
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.linesIterator.take(8).mkString("\n"))
    }
  }

  test("results invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) = Seq(
      QualityRules.c4LineFilter(df, "doc_id", "text")
        .collect().map(_.toSeq).toSet,
      QualityRules.gopherRules(df, "doc_id", "text")
        .collect().map(_.toSeq).toSet,
      Packing.slidingChunks(df, "doc_id", "text", 6, 4)
        .collect().map(_.toSeq).toSet)
    assert(run(corpus.repartition(1)) == run(corpus.repartition(13)))
  }
}
