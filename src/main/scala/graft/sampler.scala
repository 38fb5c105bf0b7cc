package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampler — probabilisticsamplerprocessor
  * (SURVEY.md §2.9, ref `processor/probabilisticsamplerprocessor/
  * probabilisticsampler.go`): hash the conversation key into 16384 buckets,
  * keep buckets below pct × 163.84. Deterministic per conv_id so every turn
  * of a conversation samples together (conversation-atomic), and stable
  * under task retries — NEVER `df.sample()` (SURVEY.md §7.4).
  */
object Sampler {

  val NumBuckets = 16384L // 14-bit bucket space, as the reference

  def keepPredicate(key: Column, pct: Double, seed: Long = 22L): Column = {
    require(pct >= 0 && pct <= 100, s"pct out of range: $pct")
    val threshold = math.round(pct * (NumBuckets / 100.0))
    pmod(xxhash64(key, lit(seed)), lit(NumBuckets)) < lit(threshold)
  }

  /** Keep ~pct% of conversations (all their turns, atomically). */
  def sampleConversations(df: DataFrame, pct: Double, seed: Long = 22L): DataFrame =
    df.where(keepPredicate(col("conv_id"), pct, seed))
}
