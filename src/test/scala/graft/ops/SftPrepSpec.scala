package graft.ops

import graft.{SparkTestBase, TranscriptGen}
import org.apache.spark.sql.functions._

/** SFT prep: chat-template rendering + spans, loss masks, whole-turn
  * truncation, preference pairs, transcript validation.
  */
class SftPrepSpec extends SparkTestBase {
  import spark.implicits._

  private def handConv = Seq(
    ("c1", 0, "user", "hi there"),
    ("c1", 1, "assistant", "hello"),
    ("c1", 2, "user", "bye"),
    ("c2", 0, "system", "be nice"),
    ("c2", 1, "assistant", "ok")
  ).toDF("conv_id", "turn_idx", "role", "text")

  test("chatTemplate renders the documented template with exact spans") {
    val out = SftPrep.chatTemplate(handConv).orderBy("conv_id")
      .collect().map(r => r.getString(0) -> r).toMap
    val c1 = out("c1")
    assert(c1.getAs[String]("rendered") ===
      "<|user|>\nhi there<|end|>\n<|assistant|>\nhello<|end|>\n" +
        "<|user|>\nbye<|end|>\n")
    assert(c1.getAs[Int]("n_turns") === 3)
    assert(c1.getAs[Long]("rendered_len") ===
      c1.getAs[String]("rendered").length.toLong)
    val spans = c1.getSeq[org.apache.spark.sql.Row](4)
    // turn 0: header "<|user|>\n" = 9 chars → text starts at 10 (1-based)
    assert(spans.map(s => (s.getInt(0), s.getString(1), s.getLong(2),
      s.getLong(3))) === Seq(
      (0, "user", 10L, 8L),
      (1, "assistant", 40L, 5L),
      (2, "user", 62L, 3L)))
  }

  test("chatTemplate spans satisfy substr(rendered,start,len)==text on the synthetic corpus") {
    val turns = TranscriptGen.turnsDs(spark, 50).toDF()
    val rendered = SftPrep.chatTemplate(turns)
    val pieces = rendered
      .select(col("conv_id"), col("rendered"), col("rendered_len"),
        explode(col("spans")).as("s"))
      .select(col("conv_id"), col("s.turn_idx").as("turn_idx"),
        col("rendered").substr(col("s.start").cast("int"),
          col("s.len").cast("int")).as("piece"),
        col("rendered_len"), length(col("rendered")).as("actual_len"))
    val joined = pieces.join(turns, Seq("conv_id", "turn_idx"))
    assert(joined.where(col("piece") =!= col("text")).count() === 0)
    assert(joined.where(col("rendered_len") =!=
      col("actual_len").cast("long")).count() === 0)
    // one row per input turn — nothing dropped or duplicated
    assert(pieces.count() === turns.count())
  }

  test("chatTemplate raises on duplicate turn_idx within a conversation") {
    val dup = Seq(("c1", 0, "user", "a"), ("c1", 0, "user", "b"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val e = intercept[Exception] {
      SftPrep.chatTemplate(dup).collect()
    }
    assert(e.getMessage.contains("duplicate turn_idx"))
    // the guard must survive column pruning: reading ONLY `rendered`
    // (spans never materialized) still raises instead of silently
    // rendering the duplicate twice
    val e2 = intercept[Exception] {
      SftPrep.chatTemplate(dup).select("rendered").collect()
    }
    assert(e2.getMessage.contains("duplicate turn_idx"))
  }

  test("chatTemplate accepts negative turn_idx (distinct indices, any base)") {
    val df = Seq(("c1", -1, "system", "be nice"), ("c1", 0, "user", "hi"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val r = SftPrep.chatTemplate(df).collect()(0)
    assert(r.getAs[String]("rendered") ===
      "<|system|>\nbe nice<|end|>\n<|user|>\nhi<|end|>\n")
    val spans = r.getSeq[org.apache.spark.sql.Row](4)
    assert(spans.map(_.getInt(0)) === Seq(-1, 0))
  }

  test("lossMaskSpans covers assistant text plus the end marker, ordinals dense") {
    val turns = TranscriptGen.turnsDs(spark, 50).toDF()
    val rendered = SftPrep.chatTemplate(turns)
    val masks = SftPrep.lossMaskSpans(rendered)
    val checked = masks
      .join(rendered.select(col("conv_id"), col("rendered")), Seq("conv_id"))
      .join(turns, Seq("conv_id", "turn_idx"))
      .select(col("role"),
        col("rendered").substr(col("start").cast("int"),
          col("len").cast("int")).as("piece"),
        concat(col("text"), lit("<|end|>\n")).as("expected"))
    assert(checked.where(col("role") =!= "assistant").count() === 0)
    assert(checked.where(col("piece") =!= col("expected")).count() === 0)
    // every assistant turn is masked exactly once, ordinals 1..k per conv
    val nAssistant = turns.where(col("role") === "assistant").count()
    assert(masks.count() === nAssistant)
    val ordsOk = masks.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n"), min("span_ord").as("lo"),
        max("span_ord").as("hi"), countDistinct("span_ord").as("nd"))
      .where(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("nd") =!= col("n"))
    assert(ordsOk.count() === 0)
  }

  test("tokenSpans tile the conversation token stream exactly") {
    val turns = TranscriptGen.turnsDs(spark, 40).toDF()
    val spans = SftPrep.tokenSpans(turns)
    // tiling: next turn starts where this one ends
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val broken = spans
      .withColumn("_next", lead(col("tok_start"), 1).over(w))
      .where(col("_next").isNotNull &&
        col("_next") =!= col("tok_start") + col("n_toks"))
    assert(broken.count() === 0)
    // first turn starts at 1; Σ n_toks = conversation token count
    assert(spans.where(col("turn_idx") === 0 && col("tok_start") =!= 1)
      .count() === 0)
    val totals = spans.groupBy("conv_id").agg(sum("n_toks").as("got"))
      .join(turns.groupBy("conv_id").agg(
        sum(TextAnalysis.tokenCountWs(col("text")).cast("long")).as("want")),
        Seq("conv_id"))
      .where(col("got") =!= col("want"))
    assert(totals.count() === 0)
    // loss flag marks exactly the assistant turns
    assert(spans.where(col("is_loss") =!= (col("role") === "assistant"))
      .count() === 0)
    // hand case incl. an empty text (0 tokens → zero-width span)
    val hand = Seq(("c", 0, "user", "a b"), ("c", 1, "assistant", "  "),
      ("c", 2, "tool", "x y z"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val got = SftPrep.tokenSpans(hand)
      .select("turn_idx", "n_toks", "tok_start", "is_loss")
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got === Array((0, 2L, 1L, false), (1, 0L, 3L, true),
      (2, 3L, 3L, false)))
    // duplicate turn_idx would make the coordinates order-dependent →
    // raises (like chatTemplate), even when only tok_start is read
    val dup = Seq(("c", 5, "user", "a"), ("c", 5, "tool", "b c"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val e = intercept[Exception] {
      SftPrep.tokenSpans(dup).select("tok_start").collect()
    }
    assert(e.getMessage.contains("duplicate turn_idx"))
  }

  test("truncateToBudget keeps a whole-turn suffix within budget") {
    val df = Seq(
      ("c1", 0, "a b c d"),     // 4 tokens
      ("c1", 1, "e f g"),       // 3
      ("c1", 2, "h i"),         // 2
      ("c2", 0, "one two three four five six seven") // 7 > budget
    ).toDF("conv_id", "turn_idx", "text")
    val kept = SftPrep.truncateToBudget(df, budget = 5)
      .select("conv_id", "turn_idx", "n_tokens", "cum_tokens")
      .as[(String, Int, Long, Long)].collect().sorted
    // c1: from the end, turn2 (2) + turn1 (3) = 5 fits; turn0 would make 9
    // c2: single 7-token turn exceeds the budget → conversation drops
    assert(kept === Array(("c1", 1, 3L, 5L), ("c1", 2, 2L, 2L)))
  }

  test("truncateToBudget kept set is a suffix and is partitioning-invariant") {
    val turns = TranscriptGen.turnsDs(spark, 40).toDF()
    val kept = SftPrep.truncateToBudget(turns, budget = 64)
    // suffix property: (max input idx) - (rows kept) + 1 == min kept idx
    val perConv = kept.groupBy("conv_id")
      .agg(min("turn_idx").as("lo"), count(lit(1)).as("n"))
      .join(turns.groupBy("conv_id").agg(max("turn_idx").as("hi")), Seq("conv_id"))
      .where(col("lo") =!= col("hi") - col("n") + 1)
    assert(perConv.count() === 0)
    assert(kept.where(col("cum_tokens") > 64).count() === 0)
    val again = SftPrep.truncateToBudget(turns.repartition(13), budget = 64)
    assert(kept.select("conv_id", "turn_idx").exceptAll(
      again.select("conv_id", "turn_idx")).count() === 0)
    assert(kept.count() === again.count())
  }

  test("preferencePairs: deterministic tie-breaks, strict margins, payloads") {
    val df = Seq(
      // plain group: 9 beats 1
      ("p1", 0, 1L, "t0"), ("p1", 1, 9L, "t1"), ("p1", 2, 4L, "t2"),
      // tied maxima → chosen is the SMALLEST cand id among them;
      // tied minima → rejected is the LARGEST
      ("p2", 0, 5L, "a"), ("p2", 1, 5L, "b"), ("p2", 2, 1L, "c"),
      ("p3", 0, 7L, "x"), ("p3", 1, 2L, "y"), ("p3", 2, 2L, "z"),
      // all tied → no pair; singleton → no pair
      ("p4", 0, 3L, "q"), ("p4", 1, 3L, "r"),
      ("p5", 0, 8L, "s"),
      // duplicated (score, cand): ordering falls through to the payload,
      // so chosen resolves deterministically to the larger payload
      ("p6", 0, 9L, "dup-a"), ("p6", 0, 9L, "dup-b"), ("p6", 1, 1L, "lo")
    ).toDF("prompt", "cand", "score", "payload")
    val got = SftPrep.preferencePairs(df, "prompt", "cand", "score", "payload")
      .select("prompt", "chosen_id", "rejected_id", "chosen_score",
        "rejected_score", "margin", "chosen_payload", "rejected_payload")
      .as[(String, Int, Int, Long, Long, Long, String, String)]
      .collect().sortBy(_._1)
    assert(got === Array(
      ("p1", 1, 0, 9L, 1L, 8L, "t1", "t0"),
      ("p2", 0, 2, 5L, 1L, 4L, "a", "c"),
      ("p3", 0, 2, 7L, 2L, 5L, "x", "z"),
      ("p6", 0, 1, 9L, 1L, 8L, "dup-b", "lo")))
  }

  test("validateTranscripts flags gaps, empties, repeats, missing assistant") {
    val df = Seq(
      // valid: contiguous from 0, has assistant, no empties; one repeat
      ("v", 0, "user", "a"), ("v", 1, "assistant", "b"),
      ("v", 2, "assistant", "c"),
      // gap (no idx 1)
      ("g", 0, "user", "a"), ("g", 2, "assistant", "b"),
      // starts at 1
      ("s", 1, "user", "a"), ("s", 2, "assistant", "b"),
      // empty text + no assistant
      ("e", 0, "user", "  "), ("e", 1, "tool", "x"),
      // duplicate idx masking a gap: min=0, max=2, count=3 — only the
      // distinct-count term catches it
      ("d", 0, "user", "a"), ("d", 2, "assistant", "b"),
      ("d", 2, "assistant", "c")
    ).toDF("conv_id", "turn_idx", "role", "text")
    val got = SftPrep.validateTranscripts(df)
      .select("conv_id", "n_turns", "n_role_repeats", "n_empty",
        "has_assistant", "contiguous", "valid")
      .as[(String, Long, Long, Long, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1).toList
    assert(got === List(
      ("d", 3L, 1L, 0L, true, false, false),
      ("e", 2L, 0L, 1L, false, true, false),
      ("g", 2L, 0L, 0L, true, false, false),
      ("s", 2L, 0L, 0L, true, false, false),
      ("v", 3L, 1L, 0L, true, true, true)))
  }

  test("rendered conversations pack greedily into training sequences (composition)") {
    val turns = TranscriptGen.turnsDs(spark, 40).toDF()
    val rendered = SftPrep.chatTemplate(turns)
      .withColumn("id",
        regexp_extract(col("conv_id"), "([0-9]+)$", 1).cast("long"))
      .withColumn("n_toks",
        TextAnalysis.tokenCountWs(col("rendered")).cast("long"))
    val budget = 512
    val packed = Packing.packGreedy(rendered.select("id", "n_toks"),
      "id", "n_toks", budget = budget, nShards = 4)
    // every rendered conversation lands in exactly one pack
    assert(packed.count() === rendered.count())
    assert(packed.select("id").distinct().count() === rendered.count())
    // no pack exceeds the budget unless it holds a single oversized example
    val over = packed.groupBy("shard", "pack")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .where(col("tot") > budget && col("n") > 1)
    assert(over.count() === 0)
    // token accounting is lossless through the composition
    val lhs = packed.agg(sum("n_tokens")).head().getLong(0)
    val rhs = rendered.agg(sum("n_toks")).head().getLong(0)
    assert(lhs === rhs)
  }

  test("plan gate: chatTemplate on the conv-bucketed corpus has no data exchange") {
    val dir = tmpDir("sft-bkt")
    val turns = TranscriptGen.turnsDs(spark, 120).toDF()
    graft.BucketedCorpus.write(turns, s"$dir/corpus",
      "graft_corpus_sft_plan", buckets = 4)
    try {
      val opened = graft.BucketedCorpus.open(spark, s"$dir/corpus",
        "graft_corpus_sft_plan", 4)
      val rendered = SftPrep.chatTemplate(opened)
      rendered.count()
      val plan = rendered.queryExecution.executedPlan.toString
      // HashPartitioning(conv_id) from the bucketed scan satisfies both
      // the span window and the render aggregation — zero data exchange,
      // the shape the SFT scaling row measured at 20.77M turns
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(4000))
      assert(!plan.contains("Exchange SinglePartition"), plan.take(4000))
      // and it renders the same strings as the scattered layout
      val scattered = SftPrep.chatTemplate(turns.repartition(7))
        .select("conv_id", "rendered")
      assert(rendered.select("conv_id", "rendered")
        .exceptAll(scattered).isEmpty && scattered.exceptAll(
          rendered.select("conv_id", "rendered")).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS graft_corpus_sft_plan")
  }

  test("streaming render ≡ batch chatTemplate once sessions close") {
    val inputDir = tmpDir("sft-stream-in")
    val outDir = tmpDir("sft-stream-out")
    val ckptDir = tmpDir("sft-stream-ckpt")
    val turns = TranscriptGen.turnsDs(spark, 60).toDF()
    turns.repartition(3).write.mode("append").parquet(inputDir)
    // gap larger than any intra-conversation step (≤ 60 s in the
    // generator) → exactly one session per conversation
    // before any batch lands, readRendered is an empty frame, not a crash
    assert(SftPrep.readRendered(spark, outDir).count() === 0)
    val q = SftPrep.startStreamingRender(spark, inputDir, outDir, ckptDir,
      gap = "1 hour", watermark = "0 seconds")
    try {
      q.processAllAvailable()
      // sentinel far in the future pushes the watermark past every real
      // session end so all sessions close and emit
      Seq(("wm-sentinel", 0, "user", "x", "none", "2031-01-01 00:00:00"))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "s")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
          col("tool"), to_timestamp(col("s")).as("ts"))
        .write.mode("append").parquet(inputDir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = SftPrep.readRendered(spark, outDir)
      .where(!col("example_id").startsWith("wm-sentinel"))
      .select(regexp_extract(col("example_id"), "^(.*)#", 1).as("conv_id"),
        col("n_turns"), col("rendered_len"), col("rendered"))
    val batch = SftPrep.chatTemplate(turns)
      .select(col("conv_id"), col("n_turns"), col("rendered_len"),
        col("rendered"))
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${batch.count()}")
    assert(batch.count() === 60)
  }

  test("internal-name and fail-fast guards") {
    val bad = handConv.withColumn("spans", lit(1))
    intercept[IllegalArgumentException] { SftPrep.chatTemplate(bad) }
    intercept[IllegalArgumentException] {
      SftPrep.truncateToBudget(handConv, budget = 0)
    }
    intercept[IllegalArgumentException] {
      SftPrep.preferencePairs(handConv.withColumn("_ch", lit(1)),
        "conv_id", "turn_idx", "turn_idx", "text")
    }
  }
}
