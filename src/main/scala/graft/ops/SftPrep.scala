package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SFT / preference-tuning preparation over conversation transcripts —
  * the last mile between the curated turn table (SURVEY.md §1.4 item
  * model: conv_id, turn_idx, role, text) and a trainer's input: render a
  * conversation into one training string under a chat template, compute
  * the character spans the loss applies to (assistant turns only),
  * truncate to a token budget on whole-turn boundaries, build
  * chosen/rejected preference pairs from scored candidate responses, and
  * validate transcript structure before any of it.
  *
  * Scale shape, shared by the family: every operator is ONE exchange on
  * the conversation key (a groupBy or a window partitioned by conv_id),
  * and the per-group work is linear in conversation length. Group size is
  * bounded by the longest conversation — the same bound a trainer's
  * example assembly needs anyway, and orders of magnitude below the
  * hot-content-key degeneracy the dedup family guards against (a crawl
  * has millions of byte-identical docs; a transcript store has
  * conversations of at most a few thousand turns). All offset arithmetic
  * is exact integer character counts, so every span is bit-replayable in
  * SQL and invariant to partitioning — the spans are verified by the
  * self-checking `piece == substr(rendered, start, len)` invariant.
  *
  * Template (fixed, documented contract): each turn renders as
  * `<|ROLE|>\n` + text + `<|end|>\n`, concatenated in turn_idx order.
  * Header length = length(role) + 5, footer length = 8; spans are 1-based
  * (SQL substring convention) and cover the TEXT portion; loss spans
  * extend through the footer so the end-of-turn marker is supervised
  * (the EOS convention in published SFT recipes).
  */
object SftPrep {

  /** Footer `<|end|>\n` length. */
  private val FooterLen = 8L

  private def checkCols(df: DataFrame, cols: Seq[String],
                        internal: Seq[String]): Unit = {
    cols.foreach(c => require(df.columns.contains(c),
      s"missing input column: $c"))
    internal.foreach(c => require(!df.columns.contains(c),
      s"input must not contain internal column name: $c"))
  }

  /** Render each conversation into one training string plus the per-turn
    * character spans.
    *
    * Output: (convCol, n_turns, rendered_len, rendered,
    * spans: array<struct<turn_idx, role, start, len>>) — `start` is the
    * 1-based offset of the turn's TEXT inside `rendered`, `len` its
    * character length, so `substr(rendered, start, len)` is exactly the
    * turn text (the invariant SftPrepSpec and the q_sft_render oracle
    * both assert).
    *
    * Plan: a per-turn window prefix sum over exact character counts (the
    * same formula the SQL oracle replays), then one hash aggregation on
    * the conversation key (`collect_list` + `array_sort` puts turns in
    * turn_idx order — struct ordering is lexicographic and turn_idx
    * leads); the string and the span array are built by per-element
    * `transform`s over the sorted list. Both the window and the
    * aggregation distribute on the conversation key — ONE exchange on a
    * scattered layout, ZERO on a conv-bucketed table — and every
    * per-group step is linear in conversation length (no fold that
    * re-copies the accumulated array per element). Duplicate turn_idx
    * within a conversation would silently render twice, so every output
    * column derived from the turn list raises on it (the library's
    * fail-fast-on-data-bugs convention, see AsOfJoin's duplicate-instant
    * guard); the guard rides the turn list itself, so column pruning
    * cannot drop it while any rendered output is read.
    */
  def chatTemplate(df: DataFrame, convCol: String = "conv_id",
                   idxCol: String = "turn_idx", roleCol: String = "role",
                   textCol: String = "text"): DataFrame = {
    checkCols(df, Seq(convCol, idxCol, roleCol, textCol),
      Seq("_ts", "_hlen", "_tlen", "_start",
        "n_turns", "rendered_len", "rendered", "spans"))
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hlen = (length(col(roleCol)) + lit(5)).cast("long")
    val tlen = length(col(textCol)).cast("long")
    val withSpans = df
      .withColumn("_hlen", hlen)
      .withColumn("_tlen", tlen)
      .withColumn("_start",
        coalesce(sum(col("_hlen") + col("_tlen") + lit(FooterLen)).over(w),
          lit(0L)) + col("_hlen") + lit(1L))
    val sorted = array_sort(collect_list(struct(
      col(idxCol).as("i"), col(roleCol).as("r"), col(textCol).as("t"),
      col("_start").as("s"), col("_tlen").as("l"))))
    val guarded = when(
      size(col("_ts")) =!=
        size(array_distinct(transform(col("_ts"), t => t.getField("i")))),
      raise_error(concat(lit("chatTemplate: duplicate turn_idx in "),
        col(convCol).cast("string")))).otherwise(col("_ts"))
    withSpans.groupBy(col(convCol))
      .agg(sorted.as("_ts"),
        sum(col("_hlen") + col("_tlen") + lit(FooterLen))
          .as("rendered_len"))
      .withColumn("_ts", guarded)
      .select(col(convCol),
        size(col("_ts")).as("n_turns"),
        col("rendered_len"),
        array_join(transform(col("_ts"), t => concat(
          lit("<|"), t.getField("r"), lit("|>\n"),
          t.getField("t"), lit("<|end|>\n"))), "").as("rendered"),
        transform(col("_ts"), t => struct(
          t.getField("i").as("turn_idx"), t.getField("r").as("role"),
          t.getField("s").as("start"), t.getField("l").as("len")))
          .as("spans"))
  }

  /** Assistant-only loss spans from a [[chatTemplate]] frame: one row per
    * assistant turn with its 1-based ordinal among the conversation's
    * assistant turns and the span the loss applies to — the turn text
    * PLUS the `<|end|>\n` footer (len = text len + 8), so the end-of-turn
    * marker is supervised. Pure per-row array math over the already-built
    * spans (filter + transform-with-index + explode) — zero additional
    * exchanges beyond chatTemplate's one.
    */
  def lossMaskSpans(rendered: DataFrame, convCol: String = "conv_id",
                    lossRole: String = "assistant"): DataFrame = {
    checkCols(rendered, Seq(convCol, "rendered_len", "spans"), Seq("_ls"))
    require(lossRole.nonEmpty, "lossRole must be non-empty")
    val ls = transform(
      filter(col("spans"), s => s.getField("role") === lit(lossRole)),
      (s, i) => struct((i + 1).as("span_ord"),
        s.getField("turn_idx").as("turn_idx"),
        s.getField("start").as("start"),
        (s.getField("len") + lit(FooterLen)).as("len")))
    rendered
      .select(col(convCol), col("rendered_len"), explode(ls).as("_ls"))
      .select(col(convCol), col("_ls.span_ord"), col("_ls.turn_idx"),
        col("_ls.start"), col("_ls.len"), col("rendered_len"))
  }

  /** Token-level span alignment: per turn, the half-open token range the
    * turn's TEXT occupies in its conversation's concatenated token
    * stream, plus the loss flag — the coordinates a trainer's loss mask
    * actually consumes (the char spans of [[chatTemplate]] serve
    * retrieval/debugging; token spans serve masking and packing).
    * Tokens are whitespace tokens over the turn texts ONLY — template
    * markers carry no token budget, the same accounting convention the
    * packing and quota operators use; swap in BPE counts by
    * pre-computing a count column and passing its name as `tokenCol`.
    *
    * Output: one row per turn — (convCol, idxCol, roleCol, n_toks,
    * tok_start, is_loss) with tok_start the 1-based first token index
    * and `is_loss` true on `lossRole` turns. Invariants (spec-gated):
    * ranges tile the stream exactly (turn i+1 starts where i ends) and
    * Σ n_toks = the conversation's token count. One window exchange on
    * the conversation key — zero on a conv-bucketed table, the
    * [[chatTemplate]] plan shape.
    */
  def tokenSpans(df: DataFrame, convCol: String = "conv_id",
                 idxCol: String = "turn_idx", roleCol: String = "role",
                 textCol: String = "text", lossRole: String = "assistant",
                 tokenCol: Option[String] = None): DataFrame = {
    require(lossRole.nonEmpty, "lossRole must be non-empty")
    checkCols(df,
      Seq(convCol, idxCol, roleCol) ++
        tokenCol.map(Seq(_)).getOrElse(Seq(textCol)),
      Seq("n_toks", "tok_start", "is_loss"))
    val nTok = tokenCol.map(col).getOrElse(
      TextAnalysis.tokenCountWs(col(textCol))).cast("long")
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // duplicate turn_idx would make the prefix sum order-dependent
    // (silently nondeterministic mask coordinates) — raise, like
    // chatTemplate. The peer count reuses the same window spec (RANGE
    // frame = rows tied on the ORDER BY value), so the guard costs no
    // extra exchange or sort; it rides tok_start so pruning keeps it
    // whenever the alignment output is read.
    val peers = count(lit(1)).over(
      Window.partitionBy(col(convCol)).orderBy(col(idxCol))
        .rangeBetween(Window.currentRow, Window.currentRow))
    df.withColumn("n_toks", nTok)
      .withColumn("tok_start",
        when(peers > 1, raise_error(concat(
          lit("tokenSpans: duplicate turn_idx in "),
          col(convCol).cast("string"))).cast("long"))
          .otherwise(coalesce(sum(col("n_toks")).over(w), lit(0L)) +
            lit(1L)))
      .withColumn("is_loss", col(roleCol) === lit(lossRole))
      .select(col(convCol), col(idxCol), col(roleCol), col("n_toks"),
        col("tok_start"), col("is_loss"))
  }

  /** Keep the SUFFIX of each conversation that fits a whole-turn token
    * budget — the standard SFT truncation (most recent context survives;
    * a turn either fits entirely or is dropped). Tokens are whitespace
    * tokens ([[TextAnalysis.tokenCountWs]] — swap in BPE counts upstream
    * by pre-computing a column and passing its name as `tokenCol`).
    *
    * Output: the kept rows of `df` plus (n_tokens, cum_tokens) where
    * cum_tokens sums from the LAST turn backwards; a row is kept iff its
    * cum_tokens <= budget. One window exchange on the conversation key
    * (group size = conversation length, see the object note).
    */
  def truncateToBudget(df: DataFrame, budget: Long,
                       convCol: String = "conv_id",
                       idxCol: String = "turn_idx",
                       textCol: String = "text",
                       tokenCol: Option[String] = None): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    checkCols(df,
      Seq(convCol, idxCol) ++ tokenCol.map(Seq(_)).getOrElse(Seq(textCol)),
      Seq("n_tokens", "cum_tokens"))
    val nTok = tokenCol.map(col).getOrElse(
      TextAnalysis.tokenCountWs(col(textCol)))
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budget)
  }

  /** Chosen/rejected preference pairs from scored candidates: one row per
    * group with a strict preference — chosen = highest `scoreCol`
    * (ties broken toward the SMALLEST `candCol`), rejected = lowest
    * (ties toward the LARGEST), emitted only when chosen's score is
    * strictly greater than rejected's (all-tied groups and singleton
    * groups produce no pair). `candCol` must be numeric and SHOULD be
    * unique within a group; the ordering struct ends with the payload,
    * so even a duplicated (score, cand) pair resolves deterministically
    * (by payload ordering) under any partitioning.
    *
    * Plan: ONE hash aggregation — `max_by`/`min_by` over the total
    * ordering struct (score, -cand). Partial aggregation collapses
    * candidates map-side, so a prompt with millions of sampled responses
    * never concentrates on one task (contrast with a per-group
    * row_number window — the exactKeep lesson, Dedup.scala).
    *
    * Output: (groupCol, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin, chosen_payload, rejected_payload).
    */
  def preferencePairs(df: DataFrame, groupCol: String, candCol: String,
                      scoreCol: String, payloadCol: String): DataFrame = {
    checkCols(df, Seq(groupCol, candCol, scoreCol, payloadCol),
      Seq("_cand", "_ord", "_ch", "_rj"))
    val cand = struct(col(candCol).as("id"), col(scoreCol).as("score"),
      col(payloadCol).as("payload"))
    val ord = struct(col(scoreCol).as("s"), negate(col(candCol)).as("ni"),
      col(payloadCol).as("p"))
    df.groupBy(col(groupCol))
      .agg(max_by(cand, ord).as("_ch"), min_by(cand, ord).as("_rj"))
      .where(col("_ch.score") > col("_rj.score"))
      .select(col(groupCol),
        col("_ch.id").as("chosen_id"), col("_rj.id").as("rejected_id"),
        col("_ch.score").as("chosen_score"),
        col("_rj.score").as("rejected_score"),
        (col("_ch.score") - col("_rj.score")).as("margin"),
        col("_ch.payload").as("chosen_payload"),
        col("_rj.payload").as("rejected_payload"))
  }

  /** Ingest-time SFT assembly: render conversations AS THEY COMPLETE on
    * the stream instead of re-scanning the corpus in batch. A
    * conversation completes when the event-time watermark passes its
    * session window (`gap` of silence closes it — the same
    * session_window boundary the tail sampler uses); the closed
    * session's turns then flow through the SAME batch [[chatTemplate]]
    * inside foreachBatch, so the streamed output cannot drift from the
    * batch operator (parity by construction, spec-verified). A
    * conversation that resumes after the gap renders as a NEW example
    * keyed `conv_id#<session-start-micros>`; the batch render over the
    * full corpus remains the compaction-time re-render for consumers
    * that need whole-history examples.
    *
    * Output: parquet under `outDir/rendered/batch_id=<id>` —
    * deterministic per-batch directories with overwrite, the
    * [[graft.StreamingPipeline]] idempotence pattern (a replayed batch
    * rewrites identical bytes). State is bounded by the watermark
    * window: closed sessions leave the store; this never caches
    * corpus-lifetime keys.
    */
  def startStreamingRender(spark: org.apache.spark.sql.SparkSession,
                           inputDir: String, outDir: String,
                           checkpointDir: String,
                           gap: String = "30 minutes",
                           watermark: String = "10 minutes",
                           triggerMs: Long = 200L,
                           maxFilesPerTrigger: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(maxFilesPerTrigger > 0,
      s"maxFilesPerTrigger must be positive: $maxFilesPerTrigger")
    import org.apache.spark.sql.streaming.Trigger
    val stream = spark.readStream.schema(graft.Schemas.turn)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .withWatermark("ts", watermark)
    val sessions = stream
      .groupBy(col("conv_id"), session_window(col("ts"), gap))
      .agg(collect_list(struct(col("turn_idx"), col("role"), col("text")))
        .as("_turns"))
      .select(
        concat(col("conv_id"), lit("#"),
          unix_micros(col("session_window.start")).cast("string"))
          .as("example_id"),
        col("_turns"))
    sessions.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val turns = batch
          .select(col("example_id"), explode(col("_turns")).as("t"))
          .select(col("example_id"), col("t.turn_idx").as("turn_idx"),
            col("t.role").as("role"), col("t.text").as("text"))
        chatTemplate(turns, convCol = "example_id")
          .write.mode("overwrite")
          .parquet(s"$outDir/rendered/batch_id=$batchId")
        ()
      }
      .start()
  }

  /** Everything the streaming render produced (all batch directories);
    * an empty frame with the render schema before the first batch lands
    * (a consumer polling "produced so far" must not crash on the
    * empty-start case). The empty schema derives from [[chatTemplate]]
    * itself, so it cannot drift from the operator.
    */
  def readRendered(spark: org.apache.spark.sql.SparkSession,
                   outDir: String): DataFrame = {
    val base = new java.io.File(s"$outDir/rendered")
    val batches = Option(base.listFiles())
      .map(_.filter(_.getName.startsWith("batch_id="))).getOrElse(Array())
    if (batches.isEmpty) {
      val emptyTurns = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          graft.Schemas.turn)
        .withColumnRenamed("conv_id", "example_id")
      chatTemplate(emptyTurns, convCol = "example_id")
    } else
      spark.read.option("basePath", s"$outDir/rendered")
        .parquet(s"$outDir/rendered/batch_id=*")
  }

  /** Structural validation before SFT prep: per conversation, the counts
    * a data card needs and a `valid` verdict — turn_idx must be
    * contiguous from 0, texts non-empty, and at least one assistant turn
    * present. `n_role_repeats` counts consecutive same-role turns
    * (alternation violations) without failing on them — repeated tool
    * turns are legal in agent transcripts; the count lets a curation
    * config threshold them. One window + one aggregation on the
    * conversation key.
    */
  def validateTranscripts(df: DataFrame, convCol: String = "conv_id",
                          idxCol: String = "turn_idx",
                          roleCol: String = "role",
                          textCol: String = "text"): DataFrame = {
    checkCols(df, Seq(convCol, idxCol, roleCol, textCol),
      Seq("_prev_role", "n_turns", "n_role_repeats", "n_empty",
        "has_assistant", "contiguous", "valid"))
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
    df.withColumn("_prev_role", lag(col(roleCol), 1).over(w))
      .groupBy(col(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col(roleCol) === col("_prev_role"), 1L).otherwise(0L))
          .as("n_role_repeats"),
        sum(when(length(trim(col(textCol))) === 0, 1L).otherwise(0L))
          .as("n_empty"),
        max(when(col(roleCol) === "assistant", true).otherwise(false))
          .as("has_assistant"),
        (min(col(idxCol)) === 0 &&
          max(col(idxCol)) === count(lit(1)) - 1 &&
          countDistinct(col(idxCol)) === count(lit(1))).as("contiguous"))
      .withColumn("valid",
        col("contiguous") && col("has_assistant") && col("n_empty") === 0)
  }
}
