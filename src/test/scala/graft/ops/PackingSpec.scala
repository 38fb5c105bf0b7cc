package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  // one shard so the stream is a single deterministic sequence
  private lazy val docs = Seq(
    (0L, 100L), (1L, 500L), (2L, 0L), (3L, 512L), (4L, 1L)
  ).toDF("doc_id", "n_tokens")

  test("packChunks: offsets are the running sum, chunk ids bracket the span") {
    val out = Packing.packChunks(docs, "doc_id", "n_tokens",
      budget = 512, nShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "start_off", "first_pack", "last_pack")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 0L, 0L),     // [0,100) in pack 0
      (1L, 100L, 0L, 1L),   // [100,600) straddles packs 0-1
      (2L, 600L, 1L, 1L),   // empty doc sits at its offset
      (3L, 600L, 1L, 2L),   // [600,1112) straddles 1-2
      (4L, 1112L, 2L, 2L))) // [1112,1113)
  }

  test("packChunks is deterministic across partitionings") {
    val big = spark.range(0, 1000)
      .select($"id".as("doc_id"), ($"id" % 97 + 1).as("n_tokens"))
    val a = Packing.packChunks(big, "doc_id", "n_tokens", 256, 8)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.packChunks(big.repartition(13), "doc_id", "n_tokens",
      256, 8).orderBy("doc_id").collect().toSeq
    assert(a === b)
    // shard-local streams are contiguous: per shard, offsets are the
    // running sum in doc_id order with no gaps
    val byShard = a.groupBy(_.getLong(1))
    byShard.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      var off = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) === off, s"offset gap at doc ${r.getLong(0)}")
        off += r.getLong(2) // n_tokens
      }
    }
  }

  test("packManifest: spans partition each pack, boundaries at the budget") {
    val m = Packing.packManifest(
      Packing.packChunks(docs, "doc_id", "n_tokens", 512, 1), "doc_id")
      .orderBy("doc_id", "pack")
      .select("doc_id", "pack", "begin", "end")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(m === Seq(
      (0L, 0L, 0L, 100L),
      (1L, 0L, 100L, 512L), (1L, 1L, 0L, 88L),
      (3L, 1L, 88L, 512L), (3L, 2L, 0L, 88L),
      (4L, 2L, 88L, 89L)))
    // every pack's spans tile [0, fill) without overlap
    m.groupBy(_._2).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq((_, _, _, e), (_, _, b, _)) => assert(e === b)
        case _ =>
      }
    }
    // zero-token docs emit no manifest rows
    assert(!m.exists(_._1 == 2L))
  }

  test("packGreedy: first-fit, oversized doc isolated, zero-token joins") {
    val seq = Seq(
      (0L, 300L), // pack 0, off 0
      (1L, 200L), // fits: pack 0, off 300 (fill 500)
      (2L, 100L), // 500+100 > 512 → pack 1, off 0
      (3L, 0L),   // zero-token: stays in pack 1, off 100
      (4L, 700L), // oversized: 100+700 > 512 → pack 2 alone, off 0
      (5L, 10L),  // 700+10 > 512 → pack 3, off 0
      (6L, 502L)  // 10+502 = 512 fits exactly: pack 3, off 10
    ).toDF("doc_id", "n_tokens")
    val got = Packing.packGreedy(seq, "doc_id", "n_tokens", 512, 1)
      .orderBy("doc_id")
      .select("doc_id", "pack", "pack_off")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 0L, 0L), (1L, 0L, 300L), (2L, 1L, 0L),
      (3L, 1L, 100L), (4L, 2L, 0L), (5L, 3L, 0L), (6L, 3L, 10L)))
  }

  test("packGreedy: deterministic, packs within budget, ids contiguous") {
    val big = spark.range(0, 2000)
      .select($"id".as("doc_id"), ($"id" % 213).as("n_tokens"))
    val a = Packing.packGreedy(big, "doc_id", "n_tokens", 256, 8)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.packGreedy(big.repartition(17), "doc_id", "n_tokens",
      256, 8).orderBy("doc_id").collect().toSeq
    assert(a === b)
    // no doc here exceeds the budget → every pack's fill ≤ budget,
    // and each pack's docs form a contiguous id run within the shard
    a.groupBy(r => (r.getLong(1), r.getLong(3))).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sum <= 256)
    }
    a.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val packsInIdOrder = rows.sortBy(_.getLong(0)).map(_.getLong(3))
      assert(packsInIdOrder === packsInIdOrder.sorted)
    }
  }

  test("total manifest tokens == total corpus tokens") {
    val big = spark.range(0, 500)
      .select($"id".as("doc_id"), ($"id" % 37).as("n_tokens"))
    val packed = Packing.packChunks(big, "doc_id", "n_tokens", 128, 4)
    val manifestTokens = Packing.packManifest(packed, "doc_id")
      .agg(sum($"end" - $"begin")).head().getLong(0)
    val corpusTokens = big.agg(sum($"n_tokens")).head().getLong(0)
    assert(manifestTokens === corpusTokens)
  }

  test("packedRows: lossless stream per shard, full packs except the " +
    "last, spans match the manifest") {
    // deterministic id arrays incl. empty and an oversize doc (> 2 packs)
    val ids = Seq(
      0L -> (1 to 10), 1L -> (11 to 13), 2L -> (0 until 0),
      3L -> (14 to 60), 4L -> (61 to 61), 5L -> (62 to 99),
      6L -> (100 to 101), 7L -> (102 to 140)
    ).map { case (d, r) => (d, r.toList) }.toDF("doc_id", "ids")
    val budget = 16
    val rows = Packing.packedRows(ids, "doc_id", "ids", budget, nShards = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getSeq[Int](2), r.getLong(3)))).toMap
    // per shard: concat(packs in order) == concat(docs in id order)
    val shardOf = ids.select(col("doc_id"),
        Curation.shardAssign(col("doc_id"), 3).as("s"))
      .as[(Long, Long)].collect().toMap
    val expected = ids.as[(Long, Seq[Int])].collect().sortBy(_._1)
      .groupBy { case (d, _) => shardOf(d) }
      .map { case (s, ds) => s -> ds.sortBy(_._1).flatMap(_._2).toSeq }
    expected.foreach { case (s, stream) =>
      val packs = rows.keys.filter(_._1 == s).map(_._2).toSeq.sorted
      assert(packs === (0L until packs.size).toSeq, s"shard $s pack ids")
      val got = packs.flatMap(p => rows((s, p))._1)
      assert(got === stream, s"shard $s stream")
      packs.dropRight(1).foreach { p =>
        assert(rows((s, p))._2 === budget.toLong, s"shard $s pack $p not full")
      }
      assert(rows((s, packs.last))._2 <= budget.toLong)
    }
    // (shard, pack) span totals == manifest span totals
    val manifest = Packing.packManifest(
      Packing.packChunks(ids.select(col("doc_id"),
        size(col("ids")).as("n")), "doc_id", "n", budget, 3), "doc_id")
      .groupBy("shard", "pack")
      .agg(sum(col("end") - col("begin")).as("n"))
      .as[(Long, Long, Long)].collect()
      .map { case (s, p, n) => (s, p) -> n }.toMap
    assert(rows.view.mapValues(_._2).toMap === manifest)
  }

  test("packedRows orderSeed: per-shard stream is the seeded permutation " +
    "of the same ids — invariants hold, order genuinely moves") {
    val ids = (0L until 40L).map(d =>
      (d, (d * 100 until d * 100 + (d % 5) + 1).map(_.toInt).toList))
      .toDF("doc_id", "ids")
    def streams(seed: Option[Long]) =
      Packing.packedRows(ids, "doc_id", "ids", budget = 16, nShards = 3,
          orderSeed = seed)
        .orderBy("shard", "pack").as[(Long, Long, Seq[Int], Long)]
        .collect().groupBy(_._1)
        .map { case (s, rs) => s -> rs.sortBy(_._2).flatMap(_._3).toSeq }
    val base = streams(None)
    val epoch = streams(Some(7L))
    assert(base.keySet === epoch.keySet)
    base.foreach { case (s, st) =>
      assert(epoch(s).sorted === st.sorted, s"shard $s multiset moved")
    }
    assert(base.exists { case (s, st) => epoch(s) !== st },
      "seed 7 produced the identity order on every shard")
    // expected permutation: seeded Knuth rank order within shard
    val rk = (d: Long) => ((d + 7) % 2147483648L) * 2654435761L % 4294967296L
    val byShard = ids.select(col("doc_id"),
        Curation.shardAssign(col("doc_id"), 3).as("s"))
      .as[(Long, Long)].collect().groupBy(_._2)
    val idsMap = ids.as[(Long, Seq[Int])].collect().toMap
    byShard.foreach { case (s, ds) =>
      val want = ds.map(_._1).sortBy(d => (rk(d), d)).flatMap(idsMap).toSeq
      assert(epoch(s) === want, s"shard $s seeded order")
    }
    // determinism
    assert(streams(Some(7L)) === epoch)
  }

  test("packedRows composes with encodeIds: the packed stream decodes " +
    "back to the corpus") {
    val corpus = Seq((0L, "low low lower"), (1L, "newest widest low"),
      (2L, ""), (3L, "lowest newest newest")).toDF("doc_id", "text")
    val merges = Bpe.trainLocal(corpus, "text", nMerges = 6)
    val ids = Bpe.encodeIds(corpus, "doc_id", "text", merges)
    val packed = Packing.packedRows(ids, "doc_id", "ids", budget = 7,
      nShards = 1)
      .orderBy("pack").as[(Long, Long, Seq[Int], Long)].collect()
    val inv = Bpe.vocabIds(merges).map(_.swap).toMap
    val decoded = packed.flatMap(_._3).map(inv).mkString("")
    val norm = corpus.orderBy("doc_id")
      .select(concat_ws("", Curation.normWords(col("text"))))
      .as[String].collect().mkString("")
    assert(decoded === norm)
  }

  test("epochShuffle: bijection, dense per-shard positions, shard-major ≡ " +
    "global rank order, epochs genuinely differ, partitioning-invariant, " +
    "id-domain guard") {
    import spark.implicits._
    val ids = (0L until 1000L)
    val df = ids.toDF("doc_id")
    val out = Packing.epochShuffle(df, "doc_id", nShards = 8, epoch = 3)
      .as[(Long, Int, Long)].collect()
    // bijection: every id exactly once
    assert(out.map(_._1).sorted.toSeq == ids.toSeq)
    // dense positions per shard starting at 1
    out.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // shard-major order ≡ the global (rank, id) order, replayed
    def rank(id: Long, epoch: Int): Long =
      java.lang.Math.floorMod(
        id * ((2654435761L * (2L * epoch + 1L)) % 4294967296L), 4294967296L)
    val shardMajor = out.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    val expected = ids.sortBy(id => (rank(id, 3), id)).toSeq
    assert(shardMajor == expected)
    // epoch 0 and epoch 1 produce different global orders (and each is
    // itself correct vs its replay)
    val e0 = Packing.epochShuffle(df, "doc_id", 8, 0)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._2, r._3)).map(_._1)
    assert(e0.toSeq == ids.sortBy(id => (rank(id, 0), id)).toSeq)
    assert(e0.toSeq != shardMajor)
    // partitioning invariance
    val out7 = Packing.epochShuffle(df.repartition(7), "doc_id", 8, 3)
      .as[(Long, Int, Long)].collect().toSet
    assert(out7 == out.toSet)
    // out-of-domain id raises (the sampleRank convention)
    val bad = Packing.epochShuffle(Seq(-1L).toDF("doc_id"), "doc_id", 8, 0)
    assertThrows[Exception](bad.collect())
  }

  test("packGreedy fails fast on null / non-integral ids") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // a non-numeric string id raises at the ANSI cast itself
    val bad = Seq(("doc-1", 5L), ("doc-2", 3L)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      Packing.packGreedy(bad, "doc_id", "n_tokens", 10, 2).collect()
    }
    assert(msgs(e).exists(_.contains("CAST_INVALID_INPUT")), e.toString)
    // a NULL id raises the library's own guard, not a degenerate
    // null-message failure deep inside sampleRank
    val withNull = Seq((Some(1L), 5L), (None, 3L)).toDF("doc_id", "n_tokens")
    val e2 = intercept[Exception] {
      Packing.packGreedy(withNull, "doc_id", "n_tokens", 10, 2).collect()
    }
    assert(msgs(e2).exists(_.contains("packGreedy id column")), e2.toString)
  }
}
