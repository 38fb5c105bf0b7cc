package graft

import org.apache.spark.sql.functions._

/** Round-3 additions: catalog-location guard, tail-sampling policy set
  * parity, to_attributes rule lists, shared-scan streaming fanout.
  */
class Round3Spec extends SparkTestBase {

  test("opening a bucketed corpus under a name bound to another path fails fast") {
    val dir = tmpDir("bkt-loc")
    val turns = TranscriptGen.turnsDs(spark, 20).toDF()
    BucketedCorpus.write(turns, s"$dir/c1", "graft_corpus_loc", buckets = 4)
    BucketedCorpus.write(turns, s"$dir/c2", "graft_corpus_loc2", buckets = 4)
    try {
      // registers the name over c1 …
      BucketedCorpus.open(spark, s"$dir/c1", "graft_corpus_loc", 4).count()
      // … so re-opening the SAME name over c2 must refuse, not silently
      // scan c1
      val e = intercept[IllegalArgumentException] {
        BucketedCorpus.open(spark, s"$dir/c2", "graft_corpus_loc", 4)
      }
      assert(e.getMessage.contains("already registered"))
      // same name + same path still works (the fresh-JVM reopen path)
      assert(BucketedCorpus.open(spark, s"$dir/c1", "graft_corpus_loc", 4)
        .count() === turns.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_corpus_loc")
      spark.sql("DROP TABLE IF EXISTS graft_corpus_loc2")
    }
  }
}
