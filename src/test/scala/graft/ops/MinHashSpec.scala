package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The custom MinHashSig expression must be BIT-IDENTICAL to the HOF
  * Column formula it replaced: every committed signature dump, band hash,
  * and DuckDB oracle depends on the exact hash family values.
  */
class MinHashSpec extends SparkTestBase {
  import spark.implicits._

  test("MinHashSig ≡ HOF formula on real documents (bit-exact)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", Dedup.wordShingles($"text", 3).as("sh"))
    val both = docs.select($"doc_id",
      Dedup.minhashSignature($"sh", 64).as("fast"),
      Dedup.minhashSignatureHof($"sh", 64).as("hof"))
    assert(both.where($"fast" =!= $"hof").isEmpty)
    assert(both.count() > 0)
    // and a non-default width
    val w5 = docs.select(
      Dedup.minhashSignature($"sh", 5).as("fast"),
      Dedup.minhashSignatureHof($"sh", 5).as("hof"))
    assert(w5.where($"fast" =!= $"hof").isEmpty)
  }

  test("WordShingles ≡ HOF formula on real documents (order included)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (k <- Seq(1, 3, 5)) {
      val both = docs.select($"doc_id",
        Dedup.wordShingles($"text", k).as("fast"),
        Dedup.wordShinglesHof($"text", k).as("hof"))
      assert(both.where($"fast" =!= $"hof").isEmpty, s"k=$k")
    }
    // edge cases: leading/trailing whitespace (split keeps the leading
    // empty word), repeated shingles (distinct, first-occurrence order),
    // unicode case mapping, short/empty text
    val edge = Seq(
      "  leading space text here",
      "trailing space text here  ",
      "a b c a b c a b c",
      "ÉCOLE Straße ΣΙΓΜΑ mixed case",
      "two words",
      "",
      "one")
    val e = edge.toDF("text").select(
      Dedup.wordShingles($"text", 3).as("fast"),
      Dedup.wordShinglesHof($"text", 3).as("hof"))
    e.collect().foreach(r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString))
  }

  test("interpreted and codegen paths agree") {
    val data = Seq(
      "alpha beta gamma delta epsilon zeta",
      "one two three",
      "alpha beta gamma",
      "short",
      "")
    // wholeStage must ALSO be disabled for the interpreted leg:
    // factoryMode only governs projection factories, and WSCG calls
    // doGenCode regardless — without this the test compares codegen
    // against codegen and nullSafeEval never runs
    def run(mode: String, wholeStage: Boolean) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try data.toDF("text")
        .select(Dedup.minhashSignature(Dedup.wordShingles($"text", 3), 16))
        .collect().map(_.getSeq[Long](0)).toSeq
      finally {
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        spark.conf.set("spark.sql.codegen.wholeStage", true)
      }
    }
    assert(run("NO_CODEGEN", wholeStage = false) ===
      run("CODEGEN_ONLY", wholeStage = true))
  }

  test("edge cases: empty shingles, null array, null element ≡ HOF") {
    val df = Seq(
      (0L, Seq("a b c")),
      (1L, Seq.empty[String]),
      (2L, null.asInstanceOf[Seq[String]]),
      (3L, Seq("a b c", null))
    ).toDF("id", "sh")
    val got = df.select($"id",
      Dedup.minhashSignature($"sh", 8).as("fast"),
      Dedup.minhashSignatureHof($"sh", 8).as("hof"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null mismatch: $r")
      if (!r.isNullAt(1)) assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"$r")
    }
    // empty shingle set → identity signature (all MaxValue)
    assert(got(1).getSeq[Long](1) === Seq.fill(8)(Long.MaxValue))
    // null array → null signature
    assert(got(2).isNullAt(1))
  }
}
