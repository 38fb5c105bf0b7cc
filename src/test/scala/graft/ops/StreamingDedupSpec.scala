package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("streaming exact dedup: one survivor per content key across batches") {
    val inputDir = tmpDir("sdedup-in")
    val outDir = tmpDir("sdedup-out")
    val ckptDir = tmpDir("sdedup-ckpt")

    // 2 files × 50 docs over 20 distinct contents → duplicates both within
    // a micro-batch and across micro-batches, all within the watermark
    def mk(ids: Range) = ids.map(i =>
      (i.toLong, s"content-${i % 20}", ts(i % 8))).toDF("doc_id", "content", "ts")
    mk(0 until 50).repartition(1).write.mode("append").parquet(inputDir)
    mk(50 until 100).repartition(1).write.mode("append").parquet(inputDir)

    val q = StreamingDedup.startExactDedup(spark, inputDir, outDir, ckptDir,
      mk(0 until 1).schema, keyCols = Seq("content"), tsCol = "ts",
      maxFilesPerTrigger = 1)
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(s"$outDir/deduped")
    assert(out.count() === 20)
    assert(out.select("content").as[String].collect().toSet ===
      (0 until 20).map(i => s"content-$i").toSet)
    // survivors are input rows (first arrival per key, whole row intact)
    val in = mk(0 until 100)
    assert(out.join(in, Seq("doc_id", "content", "ts"), "left_anti").isEmpty)
  }

  // near-dup corpus: (0,1) near-identical within batch A; 10 ≡ 0 across
  // batches; everything else distinct
  private val baseWords = (0 until 50).map(i => s"w$i")
  private def corpusA = Seq(
    (0L, baseWords.mkString(" ")),
    (1L, (baseWords.init :+ "changed").mkString(" ")),
    (2L, (50 until 100).map(i => s"x$i").mkString(" "))
  ).toDF("doc_id", "text")
  private def corpusB = Seq(
    (10L, baseWords.mkString(" ")),
    (11L, (200 until 250).map(i => s"y$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("streaming minhash ingest ≡ batch near-dup over the full corpus") {
    val inputDir = tmpDir("sminhash-in")
    val outDir = tmpDir("sminhash-out")
    val ckptDir = tmpDir("sminhash-ckpt")
    corpusA.repartition(1).write.mode("append").parquet(inputDir)
    corpusB.repartition(1).write.mode("append").parquet(inputDir)

    val q = StreamingDedup.startMinhashIngest(spark, inputDir, outDir,
      ckptDir, corpusA.schema, "doc_id", "text", maxFilesPerTrigger = 1)
    q.processAllAvailable()
    q.stop()

    val streamed = StreamingDedup.readPairs(spark, outDir)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val batch = Dedup.minhashNearDups(corpusA.unionByName(corpusB),
        "doc_id", "text")
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.map(p => (p._1, p._2)).contains((0L, 10L))) // cross-batch
    assert(streamed.map(p => (p._1, p._2)).contains((0L, 1L)))  // intra-batch
    // index holds every ingested doc exactly once
    val idx = spark.read.option("basePath", s"$outDir/index")
      .parquet(s"$outDir/index/batch_id=*")
    assert(idx.select("id").as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 2L, 10L, 11L))
  }

  test("ingestBatch replay: identical pairs, no self-pairs from own index") {
    val outDir = tmpDir("sminhash-replay")
    StreamingDedup.ingestBatch(corpusA, 0L, outDir, "doc_id", "text")
    StreamingDedup.ingestBatch(corpusB, 1L, outDir, "doc_id", "text")
    val first = StreamingDedup.readPairs(spark, outDir)
      .as[(Long, Long, Double, Double)].collect().sorted.toSeq
    // crash stand-in: batch 1 replays after its outputs were already
    // committed — the replay must read only the PRE-batch-1 index (its own
    // batch_id=1 signatures exist on disk and must be excluded)
    StreamingDedup.ingestBatch(corpusB, 1L, outDir, "doc_id", "text")
    val replayed = StreamingDedup.readPairs(spark, outDir)
      .as[(Long, Long, Double, Double)].collect().sorted.toSeq
    assert(replayed === first)
    assert(first.forall(p => p._1 < p._2)) // never a doc paired with itself
  }

  test("re-crawled id: later batch's text wins, no duplicate index pairs") {
    val outDir = tmpDir("sminhash-recrawl")
    val textA = baseWords.mkString(" ")
    val textB = (300 until 350).map(i => s"z$i").mkString(" ")
    // doc 7 crawled as textA, re-crawled as textB in a later batch; then a
    // third batch ingests doc 20 identical to the CURRENT (textB) version
    StreamingDedup.ingestBatch(Seq((7L, textA)).toDF("doc_id", "text"),
      0L, outDir, "doc_id", "text")
    StreamingDedup.ingestBatch(Seq((7L, textB)).toDF("doc_id", "text"),
      1L, outDir, "doc_id", "text")
    StreamingDedup.ingestBatch(Seq((20L, textB)).toDF("doc_id", "text"),
      2L, outDir, "doc_id", "text")
    val batch2 = spark.read.parquet(s"$outDir/pairs/batch_id=2")
      .as[(Long, Long, Double, Double)].collect().toSeq
    // exactly ONE (7, 20) pair, scored against the re-crawled text
    // (jaccard 1.0) — a stale-sig duplicate would add a second row with a
    // conflicting jaccard
    assert(batch2 === Seq((7L, 20L, 1.0, 1.0)))
  }

  test("compactIndex: one deduped partition, ingest continues identically") {
    val outA = tmpDir("sminhash-compact")
    val outB = tmpDir("sminhash-nocompact")
    val textB = (300 until 350).map(i => s"z$i").mkString(" ")
    val b0 = Seq((7L, baseWords.mkString(" "))).toDF("doc_id", "text")
    val b1 = Seq((7L, textB), (8L, "some other words entirely here"))
      .toDF("doc_id", "text")
    val b2 = Seq((20L, textB)).toDF("doc_id", "text")
    for (out <- Seq(outA, outB)) {
      StreamingDedup.ingestBatch(b0, 0L, out, "doc_id", "text")
      StreamingDedup.ingestBatch(b1, 1L, out, "doc_id", "text")
    }
    StreamingDedup.compactIndex(spark, outA)
    // one partition, keyed by the max batch id, re-crawl resolved lww
    val dirs = new java.io.File(s"$outA/index").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSeq
    assert(dirs === Seq("batch_id=1"))
    assert(spark.read.parquet(s"$outA/index/batch_id=1")
      .select("id").as[Long].collect().sorted.toSeq === Seq(7L, 8L))
    // a later batch sees exactly the same index either way
    StreamingDedup.ingestBatch(b2, 2L, outA, "doc_id", "text")
    StreamingDedup.ingestBatch(b2, 2L, outB, "doc_id", "text")
    val pa = spark.read.parquet(s"$outA/pairs/batch_id=2")
      .as[(Long, Long, Double, Double)].collect().sorted.toSeq
    val pb = spark.read.parquet(s"$outB/pairs/batch_id=2")
      .as[(Long, Long, Double, Double)].collect().sorted.toSeq
    assert(pa === pb)
    assert(pa === Seq((7L, 20L, 1.0, 1.0)))
    // repeated maintenance folds into the new max id; nothing lost
    StreamingDedup.compactIndex(spark, outA)
    assert(spark.read.parquet(s"$outA/index/batch_id=2")
      .select("id").as[Long].collect().sorted.toSeq === Seq(7L, 8L, 20L))
  }

  test("incremental labels per batch ≡ full CC over all pairs; replay idempotent") {
    val outDir = tmpDir("sminhash-labels")
    // three batches: B grows A's cluster (cross pairs), C merges two
    // previously-separate clusters via a bridging doc
    val textX = (100 until 150).map(i => s"x$i").mkString(" ")
    val bA = Seq((0L, baseWords.mkString(" ")),
      (5L, textX)).toDF("doc_id", "text")
    val bB = Seq((10L, baseWords.mkString(" "))).toDF("doc_id", "text")
    val bC = Seq((20L, baseWords.mkString(" ")),
      (21L, textX)).toDF("doc_id", "text")
    Seq(bA, bB, bC).zipWithIndex.foreach { case (b, i) =>
      StreamingDedup.ingestBatch(b, i.toLong, outDir, "doc_id", "text")
      StreamingDedup.updateLabels(spark, outDir, i.toLong,
        spark.read.parquet(s"$outDir/pairs/batch_id=$i"))
      // after every batch the maintained labels equal a full recompute
      // over every pair found so far
      val full = Dedup.connectedComponentsStar(
        StreamingDedup.readPairs(spark, outDir))
        .as[(Long, Long)].collect().toMap
      val inc = StreamingDedup.readLabels(spark, outDir)
        .as[(Long, Long)].collect().toMap
      assert(inc === full, s"labels diverged after batch $i")
    }
    // the per-batch label deltas only carry touched components: batch 1
    // touched the baseWords cluster, so doc 5 (textX cluster) must not be
    // rewritten by it
    val delta1 = spark.read.parquet(s"$outDir/labels/batch_id=1")
      .as[(Long, Long)].collect().toMap
    assert(!delta1.contains(5L), s"untouched component rewritten: $delta1")
    // replay of the last label update reads only pre-batch state and
    // rewrites identical bytes
    val before = StreamingDedup.readLabels(spark, outDir)
      .as[(Long, Long)].collect().toMap
    StreamingDedup.updateLabels(spark, outDir, 2L,
      spark.read.parquet(s"$outDir/pairs/batch_id=2"))
    val after = StreamingDedup.readLabels(spark, outDir)
      .as[(Long, Long)].collect().toMap
    assert(after === before)
  }
}
