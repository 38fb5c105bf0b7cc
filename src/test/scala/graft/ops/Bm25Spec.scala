package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 sparse retrieval (round 4): the operator's exact-integer
  * micro-unit contract is cross-checked against a word-keyed plain-Scala
  * replay of the whole formula (tokenize → tf/len/avgdl/df → quantized
  * idf → saturation → exact sum → top-k with the deterministic tie
  * rule).
  */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  // ASCII word salad with deliberate term overlap across docs
  private val corpus: Seq[(Long, String)] = (0 until 30).map { i =>
    val words = (0 until 12 + i % 5).map(j => s"w${(i * 7 + j * 3) % 40}")
    (i.toLong, words.mkString(" ") + (if (i % 3 == 0) " shared token" else ""))
  }

  private def docsDf = corpus.toDF("doc_id", "text")

  // the engine's tokenization, word-keyed (NormWords ≡ this per CurationSpec)
  private def toks(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split(" ")
      .filter(_.nonEmpty).toSeq

  /** Plain-Scala BM25 with the identical arithmetic sequence and
    * quantization as [[Bm25.topK]].
    */
  private def replay(qIds: Seq[Long], k: Int): Set[(Long, Long, Long, Int)] = {
    val words = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val n = corpus.size.toLong
    val avgdl = words.values.map(_.size.toLong).sum.toDouble / n.toDouble
    val tf: Map[(Long, String), Long] = words.toSeq
      .flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    val dfm: Map[String, Long] = words.toSeq
      .flatMap { case (id, ws) => ws.distinct.map(w => (id, w)) }
      .groupBy(_._2).map { case (w, v) => w -> v.size.toLong }
    def idfMicro(df: Long): Long =
      math.floor(Bm25.Micro * math.log(1.0d +
        (n.toDouble - df + 0.5d) / (df + 0.5d)) + 0.5d).toLong
    qIds.flatMap { q =>
      val qws = words(q).distinct
      val scores = corpus.map(_._1).flatMap { id =>
        val len = words(id).size.toLong
        val tms = qws.flatMap { w =>
          tf.get((id, w)).map { t =>
            val sat = (t * Bm25.K1Plus1) /
              (t + Bm25.K1 * (Bm25.OneMinusB + Bm25.B * len / avgdl))
            math.floor(idfMicro(dfm(w)) * sat + 0.5d).toLong
          }
        }
        if (tms.isEmpty) None else Some(id -> tms.sum)
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (q, id, s, i + 1) }
    }.toSet
  }

  test("topK ≡ plain-Scala replay (exact integer scores, ranks, ties)") {
    val out = Bm25.topK(docsDf, "doc_id", "text",
        docsDf.where(col("doc_id") < 3), "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(out === replay(Seq(0L, 1L, 2L), 8))
    assert(out.nonEmpty)
  }

  test("a query retrieves its own document at rank 1 on this corpus") {
    val out = Bm25.topK(docsDf, "doc_id", "text",
        docsDf.where(col("doc_id") === 4), "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.find(_._4 == 1).map(_._2) === Some(4L))
  }

  test("plan shape: broadcast joins, no nested-loop/cartesian product") {
    val df = Bm25.topK(docsDf, "doc_id", "text",
      docsDf.where(col("doc_id") < 2), "doc_id", "text", k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("searchIndex over a written index ≡ inline topK, with h pushdown") {
    val dir = tmpDir("bm25-index")
    Bm25.writeIndex(docsDf, "doc_id", "text", dir, shards = 3)
    val q = docsDf.where(col("doc_id") < 3)
    val fromIndex = Bm25.searchIndex(spark, dir, q, "doc_id", "text", k = 8)
    val inline = Bm25.topK(docsDf, "doc_id", "text", q, "doc_id", "text",
      k = 8).as[(Long, Long, Long, Int)].collect().toSet
    assert(fromIndex.as[(Long, Long, Long, Int)].collect().toSet === inline)
    // the query-term isin must reach the parquet scan (the search
    // result's own plan starts at the localCheckpoint, so gate the scan
    // frame searchIndex actually builds)
    val scan = Bm25.indexPostings(spark, dir, Array(11L, 42L), 4096)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("In(h"))
    // above the pushdown limit the filter is skipped but results hold
    val noPush = Bm25.searchIndex(spark, dir, q, "doc_id", "text", k = 8,
      pushdownLimit = 1)
    assert(noPush.as[(Long, Long, Long, Int)].collect().toSet === inline)
    val unfiltered = Bm25.indexPostings(spark, dir, Array(11L, 42L), 1)
      .queryExecution.executedPlan.toString
    assert(!unfiltered.contains("In(h"))
  }

  test("index lifecycle: build → append → re-crawl append → compact, " +
    "each state ≡ inline topK over its effective corpus") {
    val dir = tmpDir("bm25-incr")
    val base = docsDf.where(col("doc_id") < 20)
    val batch1 = docsDf.where(col("doc_id") >= 20)
    val q = docsDf.where(col("doc_id") < 3)
    def fromIndex = Bm25.searchIndex(spark, dir, q, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Int)].collect().toSet
    def inline(corpus: org.apache.spark.sql.DataFrame) =
      Bm25.topK(corpus, "doc_id", "text", q, "doc_id", "text", k = 8)
        .as[(Long, Long, Long, Int)].collect().toSet

    Bm25.writeIndex(base, "doc_id", "text", dir, shards = 3)
    assert(fromIndex === inline(base))
    // append the rest: stats rows sum, search ≡ full-corpus inline
    assert(Bm25.appendToIndex(spark, dir, batch1, "doc_id", "text", 1L))
    assert(fromIndex === inline(docsDf))
    // replay guard: re-appending the same batch is a no-op
    assert(!Bm25.appendToIndex(spark, dir, batch1, "doc_id", "text", 1L))
    assert(fromIndex === inline(docsDf))
    // re-crawl doc 5 with new text, then compact: last-writer-wins
    val recrawl = Seq((5L, "completely new w1 w2 shared token content"))
      .toDF("doc_id", "text")
    assert(Bm25.appendToIndex(spark, dir, recrawl, "doc_id", "text", 2L))
    Bm25.compactIndex(spark, dir)
    val effective = docsDf.where(col("doc_id") =!= 5)
      .unionByName(recrawl)
    assert(fromIndex === inline(effective))
    // compaction folded every batch partition into one (the max id)
    val parts = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq
    assert(parts === Seq("batch_id=2"))
    // idempotent: compacting a single-batch index is a no-op
    Bm25.compactIndex(spark, dir)
    assert(fromIndex === inline(effective))
    // the compaction watermark keeps the replay guard alive AFTER the
    // folded batch dirs are gone: replaying either pre-compaction batch
    // is a no-op (without it the docs would re-ingest and double-count)
    assert(!Bm25.appendToIndex(spark, dir, batch1, "doc_id", "text", 1L))
    assert(!Bm25.appendToIndex(spark, dir, recrawl, "doc_id", "text", 2L))
    assert(fromIndex === inline(effective))
    // batchId 0 is reserved for the initial build
    intercept[IllegalArgumentException] {
      Bm25.appendToIndex(spark, dir, recrawl, "doc_id", "text", 0L)
    }
    // a REBUILD restarts the batch clock: the stale watermark must not
    // swallow the fresh index's early batches
    Bm25.writeIndex(base, "doc_id", "text", dir, shards = 3)
    assert(Bm25.appendToIndex(spark, dir, batch1, "doc_id", "text", 1L))
    assert(fromIndex === inline(docsDf))
  }

  test("rrfFuse ≡ plain replay on synthetic ranked lists (ties by id)") {
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3), (1L, 20L, 1))
      .toDF("query_id", "id", "rank")
    val b = Seq((0L, 11L, 1), (0L, 13L, 2), (1L, 21L, 1))
      .toDF("query_id", "id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), k = 3)
      .as[(Long, Long, Long, Int)].collect().toSet
    def c(r: Int): Long = math.floor(1e6 / (60.0 + r)).toLong
    val scores = Map(
      (0L, 10L) -> c(1), (0L, 11L) -> (c(2) + c(1)), (0L, 12L) -> c(3),
      (0L, 13L) -> c(2), (1L, 20L) -> c(1), (1L, 21L) -> c(1))
    val expected = scores.toSeq.groupBy(_._1._1).flatMap { case (q, rows) =>
      rows.map { case ((_, id), s) => (id, s) }
        .sortBy { case (id, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((id, s), i) => (q, id, s, i + 1) }
    }.toSet
    assert(out === expected)
    // the doc ranked in BOTH lists must fuse above any single-list doc
    assert(out.find(r => r._1 == 0L && r._4 == 1).map(_._2) === Some(11L))
  }

  test("k and corpus guards fail fast") {
    intercept[IllegalArgumentException] {
      Bm25.topK(docsDf, "doc_id", "text", docsDf, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(docsDf.where(lit(false)), "doc_id", "text",
        docsDf, "doc_id", "text", k = 1)
    }
  }
}
