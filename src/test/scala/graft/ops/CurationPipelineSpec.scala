package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // one doc engineered to fall at each stage, three survivors
  private val base50 = (0 until 50).map(i => s"w$i").mkString(" ")
  private val evalText = (0 until 15).map(i => s"e$i").mkString(" ")
  private def corpus = Seq(
    (0L, "en", base50),                                   // survives
    (1L, "en", base50),                                   // exact dup of 0
    (2L, "en", base50 + " extra"),                        // near-dup of 0
    (3L, "en", (0 until 13).map(i => s"e$i").mkString(" ") +
      " " + (0 until 7).map(i => s"f$i").mkString(" ")),  // contaminated
    (4L, "en", "spam spam spam spam spam spam"),          // repetition gate
    (5L, "en", "tiny doc"),                               // min-token gate
    (6L, "zz", (100 until 150).map(i => s"q$i").mkString(" ")), // mixture 0
    (7L, "en", (200 until 250).map(i => s"r$i").mkString(" ")), // survives
    (8L, "en", "please contact a@b.com for further details today") // PII
  ).toDF("doc_id", "lang", "text")

  private val cfg = CurationPipeline.CurationConfig(
    mixture = Seq("en" -> 1.0), defaultFraction = 0.0, nShards = 4)

  test("fuzzy stage drops a near-dup of an eval doc that shares NO exact " +
    "13-gram; pass-through when disabled") {
    // 27 e-words with substitutions at positions 8 and 20: every 13-word
    // window touches a substitution (exact decontamination blind), but
    // shingle Jaccard stays ~0.61 (fuzzy near-dup at threshold 0.55)
    val evLong = (0 until 27).map(i => s"e$i").mkString(" ")
    val paraphrased = (0 until 27).map {
      case 7 => "zz"; case 19 => "yy"; case i => s"e$i"
    }.mkString(" ")
    val c = Seq(
      (0L, "en", base50),
      (1L, "en", paraphrased),
      (2L, "en", (200 until 250).map(i => s"r$i").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val ev = Some(Seq(evLong).toDF("text"))
    val off = CurationPipeline.curate(c, "doc_id", "text", "lang",
      ev, "text", cfg)._2.toMap
    assert(off("fuzzy") === off("decontaminated")) // disabled → pass-through
    val fcfg = cfg.copy(fuzzyDecontaminate = true, fuzzyThreshold = 0.55)
    val (curated, report) = CurationPipeline.curate(c, "doc_id", "text",
      "lang", ev, "text", fcfg)
    val rep = report.toMap
    assert(rep("decontaminated") === 3L,
      s"exact pass must not see a shared 13-gram: $report")
    assert(rep("fuzzy") === 2L, s"paraphrase must fall at fuzzy: $report")
    assert(!curated.select("doc_id").as[Long].collect().contains(1L))
  }

  test("curate: per-stage attrition report and survivor set") {
    val (curated, report) = CurationPipeline.curate(corpus, "doc_id",
      "text", "lang", Some(Seq(evalText).toDF("text")), "text", cfg)
    assert(report === Seq("input" -> 9L, "url" -> 9L, "exact" -> 8L,
      "neardup" -> 7L, "decontaminated" -> 6L, "fuzzy" -> 6L,
      "quality" -> 4L, "mixture" -> 3L))
    val rows = curated.orderBy("doc_id")
      .select("doc_id", "text", "shard", "split")
      .as[(Long, String, Long, String)].collect()
    assert(rows.map(_._1).toSeq === Seq(0L, 7L, 8L))
    // PII redacted in the surviving text; shard/split assigned in range
    assert(rows.find(_._1 == 8L).get._2.contains("<EMAIL>"))
    assert(rows.forall(r => r._3 >= 0 && r._3 < 4))
    assert(rows.forall(r => Set("train", "val", "test").contains(r._4)))
    // input schema preserved (+ the two assignment columns)
    assert(curated.columns.toSeq ===
      Seq("doc_id", "lang", "text", "shard", "split"))
  }

  test("curate is deterministic across partitionings; write round-trips") {
    val ev = Some(Seq(evalText).toDF("text"))
    val (a, _) = CurationPipeline.curate(corpus, "doc_id", "text", "lang",
      ev, "text", cfg)
    val (b, _) = CurationPipeline.curate(corpus.repartition(7, $"doc_id"),
      "doc_id", "text", "lang", ev, "text", cfg)
    val sa = a.as[(Long, String, String, Long, String)].collect().toSet
    val sb = b.as[(Long, String, String, Long, String)].collect().toSet
    assert(sa === sb)
    val outDir = tmpDir("curated")
    CurationPipeline.writeCurated(a, outDir)
    val back = spark.read.parquet(outDir)
      .select("doc_id", "lang", "text", "shard", "split")
      .as[(Long, String, String, Long, String)].collect().toSet
    assert(back === sa)
  }

  test("url stage: blocklist + cap gate the pipeline, and a BLOCKED doc " +
    "can never win a dedup cluster away from its unblocked twin") {
    val c = Seq(
      // doc 0 (blocked.com, SMALLER id) is an exact dup of doc 1
      // (fine.org): the winner must be 1, not "0 then both die"
      (0L, "en", base50, "https://blocked.com/a"),
      (1L, "en", base50, "https://fine.org/a"),
      // hot.net holds 3 docs, cap 2 ⇒ exactly one falls
      (2L, "en", (200 until 250).map(i => s"r$i").mkString(" "),
        "https://hot.net/1"),
      (3L, "en", (300 until 350).map(i => s"s$i").mkString(" "),
        "https://hot.net/2"),
      (4L, "en", (400 until 450).map(i => s"t$i").mkString(" "),
        "https://hot.net/3"),
      (5L, "en", (500 until 550).map(i => s"u$i").mkString(" "),
        "https://other.de/x")
    ).toDF("doc_id", "lang", "text", "url")
    val (curated, report) = CurationPipeline.curate(c, "doc_id", "text",
      "lang", cfg = CurationPipeline.CurationConfig(nShards = 4,
        blockedDomains = Seq("blocked.com"), domainCap = 2),
      urlCol = Some("url"))
    val rep = report.toMap
    assert(rep("input") === 6L)
    assert(rep("url") === 4L, s"blocklist(1) + cap(1) must fall: $report")
    // doc 1 SURVIVES: the blocked twin was excluded from winner selection
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L), s"unblocked twin must survive: $ids")
    assert(!ids.contains(0L))
    assert(ids.intersect(Set(2L, 3L, 4L)).size === 2, s"cap=2: $ids")
    // url column preserved in the output schema
    assert(curated.columns.contains("url"))
    // without a urlCol the stage is a pass-through row in the report
    val rep2 = CurationPipeline.curate(c, "doc_id", "text", "lang")._2.toMap
    assert(rep2("url") === rep2("input"))
  }

  test("stages degrade gracefully: no eval set, no mixture config") {
    val (curated, report) = CurationPipeline.curate(corpus, "doc_id",
      "text", "lang", evalSet = None,
      cfg = CurationPipeline.CurationConfig(nShards = 4))
    // contamination and mixture stages become pass-throughs
    assert(report.toMap.apply("decontaminated") ===
      report.toMap.apply("neardup"))
    assert(report.toMap.apply("mixture") === report.toMap.apply("quality"))
    // doc 3 (contaminated) and doc 6 (zz) now survive
    assert(curated.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(0L, 3L, 6L, 7L, 8L))
  }
}
