package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Tail-sampling analog (SURVEY.md §2.13 streaming semantics; ref fork-era
  * `processor/samplingprocessor/tailsamplingprocessor/
  * tail_sampling_processor.go` ≈L60–300): buffer all turns of a
  * conversation, wait `decision_wait` past the conversation's last event
  * time, then apply a sampling policy to the WHOLE conversation at once.
  *
  * Spark realization: `groupByKey(conv_id)` +
  * `flatMapGroupsWithState(EventTimeTimeout)`. State per conversation is the
  * running rollup (counts/min/max/set — O(1) per turn, NOT the buffered
  * turns: the policy here only needs aggregates, so state stays bounded even
  * for 500-turn conversations). When the watermark passes
  * `last_ts + decision_wait` the state times out → emit the decision row and
  * drop the state. Late turns past the watermark are dropped by the
  * watermark itself and counted upstream (§2.12 dropped counter).
  *
  * Policies mirror the reference's policy set: `always-error` (keep any
  * conversation with an error turn — the collector's `status_code` policy)
  * plus deterministic hash-percentage for the rest (`probabilistic` policy,
  * same bucket math as [[Sampler]]).
  */
object TailSample {

  final case class TurnLite(
      conv_id: String,
      err_code: String,
      tool_invoked: String,
      latency_ms: Long,
      ts: Timestamp)

  final case class ConvState(
      nTurns: Long,
      nErrors: Long,
      tools: Set[String],
      firstTsUs: Long,
      lastTsUs: Long,
      sumLatencyMs: Long)

  final case class ConvDecision(
      conv_id: String,
      n_turns: Long,
      n_errors: Long,
      n_tools_distinct: Int,
      first_ts: Timestamp,
      last_ts: Timestamp,
      sum_latency_ms: Long,
      sampled: Boolean)

  val DefaultPct = 10.0

  private def tsUs(t: Timestamp): Long = t.getTime * 1000L

  /** The policy set, mirroring the reference's tail-sampling policies:
    * `status_code` (keep any conversation with an error turn), `latency`
    * (keep conversations whose event-time span ≥ threshold — the
    * slow-trace policy), and `probabilistic` for the rest. Probabilistic
    * replicates Sampler.keepPredicate's bucket math EXACTLY — Spark's
    * `xxhash64(conv_id, seed)` chains XXH64 over the arguments starting
    * from seed 42, so batch sampling and tail-sampling agree on every
    * conv_id (asserted in TailSampleSpec).
    */
  def decide(convId: String, st: ConvState, pct: Double, seed: Long,
             latencyKeepUs: Long = Long.MaxValue): Boolean =
    st.nErrors > 0 ||
    (st.lastTsUs - st.firstTsUs >= latencyKeepUs) || {
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val bytes = convId.getBytes("UTF-8")
      val h1 = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      val h2 = XXH64.hashLong(seed, h1)
      math.floorMod(h2, Sampler.NumBuckets) <
        math.round(pct * (Sampler.NumBuckets / 100.0))
    }

  /** Streaming conversation assembler. `parsed` must be a streaming frame
    * that already carries the parse-stage columns and a watermark on `ts`.
    */
  def conversationDecisions(parsed: DataFrame,
                            decisionWait: String = "10 minutes",
                            pct: Double = DefaultPct,
                            seed: Long = 22L,
                            latencyKeepUs: Long = Long.MaxValue): Dataset[ConvDecision] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    val waitUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(decisionWait))
    val waitMs = waitUs.microseconds / 1000L + waitUs.days * 86400000L

    parsed
      .select(col("conv_id"), col("err_code"), col("tool_invoked"),
        col("latency_ms"), col("ts"))
      .as[TurnLite]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (convId: String, turns: Iterator[TurnLite], state: GroupState[ConvState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(ConvDecision(convId, st.nTurns, st.nErrors,
              st.tools.size,
              new Timestamp(st.firstTsUs / 1000L), new Timestamp(st.lastTsUs / 1000L),
              st.sumLatencyMs, decide(convId, st, pct, seed, latencyKeepUs)))
          } else {
            var st = state.getOption.getOrElse(
              ConvState(0L, 0L, Set.empty, Long.MaxValue, Long.MinValue, 0L))
            turns.foreach { t =>
              st = ConvState(
                st.nTurns + 1,
                st.nErrors + (if (t.err_code != null) 1L else 0L),
                if (t.tool_invoked != null && t.tool_invoked.nonEmpty &&
                    t.tool_invoked != "none") st.tools + t.tool_invoked else st.tools,
                math.min(st.firstTsUs, tsUs(t.ts)),
                math.max(st.lastTsUs, tsUs(t.ts)),
                st.sumLatencyMs + t.latency_ms)
            }
            state.update(st)
            // decision fires when the watermark passes last_ts + decision_wait
            state.setTimeoutTimestamp(st.lastTsUs / 1000L + waitMs)
            Iterator.empty
          }
        })(Encoders.product[ConvState], Encoders.product[ConvDecision])
  }

  /** Start the full streaming tail-sampling job: parse → assemble →
    * decisions appended to parquet. The decision table is the "sampled
    * traces" export of the reference.
    */
  def start(spark: org.apache.spark.sql.SparkSession, inputDir: String,
            outDir: String, checkpointDir: String,
            watermark: String = "10 minutes",
            decisionWait: String = "10 minutes",
            pct: Double = DefaultPct,
            latencyKeepUs: Long = Long.MaxValue) = {
    val stream = spark.readStream
      .schema(Schemas.turn)
      .parquet(inputDir)
      .withWatermark("ts", watermark)
    val decisions = conversationDecisions(
      Parse.parseGrok(stream), decisionWait, pct,
      latencyKeepUs = latencyKeepUs)
    decisions.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", s"$outDir/decisions")
      .start()
  }
}
