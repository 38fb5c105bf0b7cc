package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("langId picks the dominant stopword language") {
    val df = Seq(
      ("the cat and the dog went to the park", "en"),
      ("el perro y la casa de que en un", "es"),
      ("der hund und die katze ist ein tier", "de"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "expected")
    val bad = df.where(TextAnalysis.langId($"text") =!= $"expected").count()
    assert(bad === 0)
  }

  test("token counts: whitespace and BPE-ish") {
    val r = Seq("Hello, world! 42 tokens?").toDF("text")
      .select(TextAnalysis.tokenCountWs($"text").as("ws"),
        TextAnalysis.tokenCountBpe($"text").as("bpe"))
      .head()
    assert(r.getInt(0) === 4)
    // Hello , world ! 4 2 tokens ? → 8
    assert(r.getInt(1) === 8)
    assert(Seq("").toDF("text")
      .select(TextAnalysis.tokenCountWs($"text")).head().getInt(0) === 0)
  }

  test("quality score orders garbage below prose") {
    val r = Seq(
      ("q1", "The quick brown fox jumps over the lazy dog and runs to the forest for a while."),
      ("q2", "@@@@ #### $$$$ %%%% ^^^^ &&&&")
    ).toDF("id", "text")
      .select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(r("q1") > r("q2"))
    assert(r("q1") >= 0.0 && r("q1") <= 1.0)
  }

  test("fingerprint is invariant to case/punct/extra whitespace") {
    val fps = Seq(
      "Hello,   World! This is   GREAT.",
      "hello world this is great",
      "hello world this is different"
    ).toDF("text").select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("profile runs over the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = TextAnalysis.profile(docs, "text")
    assert(p.count() === docs.count())
    assert(p.where($"n_tokens_ws" <= 0).count() === 0)
  }
}
