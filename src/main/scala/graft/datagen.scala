package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully-distributed transcript synthesizer.
  *
  * Everything derives from `xxhash64(seed, keys…)` — no `rand()`, no
  * wall-clock — so the same (seed, nConvs) always produces identical bytes on
  * any cluster size (required for checkpoint/parity tests, SURVEY.md §7.4,
  * and for the routed-row-equality invariant under task retries).
  *
  * Scale design: generation is `spark.range(nConvs)` → per-conv size →
  * `explode(sequence(...))`, i.e. a narrow, shuffle-free plan that
  * parallelizes to any number of executors. Conversation sizes follow an
  * inverse-power (Zipf-ish, s≈1.2) law over 1..500 turns so a few
  * conversations own a large share of turns — the hot-key skew the aggregate
  * stage must defuse (FIXTURES.md §1).
  */
object TranscriptGen {

  val toolNames: Seq[String] = Seq(
    "search", "browse", "bash", "edit", "read", "write",
    "grep", "glob", "fetch", "sql", "plot", "notebook")

  val roles: Seq[String] = Seq("user", "assistant", "tool", "system")

  private val fillerWords: Seq[String] = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  /** Uniform in [0,1) derived from a hash column. */
  private def u01(h: org.apache.spark.sql.Column) =
    pmod(h, lit(1000000L)).cast("double") / 1000000.0

  /** Generate `nConvs` conversations of Zipf-ish sizes as a DataFrame with
    * Turn columns plus a `_truth` struct (generator ground truth for the
    * parse stage to be tested against; drop it for pipeline input).
    */
  def turns(spark: SparkSession, nConvs: Long, seed: Long = 42L,
            maxTurns: Int = 500, parallelism: Int = 0): DataFrame = {
    val slices = if (parallelism > 0) parallelism
                 else spark.sparkContext.defaultParallelism
    val convs = spark.range(0L, nConvs, 1L, slices)
      .withColumn("conv_id", format_string("conv-%06d", col("id")))
      // Zipf-ish size: floor(u^(-1/s)) clipped to [1, maxTurns]
      .withColumn("_u", u01(xxhash64(lit(seed), lit("sz"), col("id"))))
      .withColumn("n_turns",
        least(lit(maxTurns),
          greatest(lit(1),
            floor(pow(col("_u") + lit(1e-9), lit(-1.0 / 1.2))).cast("int"))))
      // per-conversation event-time base + step (monotone within conv)
      .withColumn("conv_off_s",
        pmod(xxhash64(lit(seed), lit("off"), col("id")), lit(86400L * 30)))
      .withColumn("step_s",
        lit(5L) + pmod(xxhash64(lit(seed), lit("step"), col("id")), lit(55L)))

    val t = convs
      .select(col("conv_id"), col("conv_off_s"), col("step_s"),
        explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"))
      .withColumn("h", xxhash64(lit(seed), col("conv_id"), col("turn_idx")))

    val toolArr = array(toolNames.map(lit): _*)
    val fillerArr = array(fillerWords.map(lit): _*)

    val base = t
      // role: user/assistant alternation; ~20% of odd turns are "tool";
      // turn 0 of ~10% of conversations is "system"
      .withColumn("role",
        when(col("turn_idx") === 0 &&
             pmod(xxhash64(lit(seed), lit("sys"), col("conv_id")), lit(10L)) === 0,
          lit("system"))
        .when(pmod(col("turn_idx"), lit(2)) === 0, lit("user"))
        .when(pmod(col("h"), lit(5L)) === 0, lit("tool"))
        .otherwise(lit("assistant")))
      // tool: set for "tool" rows and ~25% of assistant rows, else ""
      .withColumn("tool",
        when(col("role") === "tool" ||
             (col("role") === "assistant" && pmod(col("h"), lit(4L)) === 1),
          element_at(toolArr,
            (pmod(xxhash64(lit(seed), lit("tl"), col("h")), lit(toolNames.size.toLong)) + 1).cast("int")))
        .otherwise(lit("")))
      // ~10% of turns carry an error status E[4-6]xx, rest OK
      .withColumn("status",
        when(pmod(xxhash64(lit(seed), lit("er"), col("h")), lit(10L)) === 0,
          format_string("E%d",
            lit(400L) + pmod(xxhash64(lit(seed), lit("ec"), col("h")), lit(300L))))
        .otherwise(lit("OK")))
      .withColumn("latency_ms",
        pmod(xxhash64(lit(seed), lit("lat"), col("h")), lit(5000L)))
      .withColumn("filler",
        concat_ws(" ",
          element_at(fillerArr, (pmod(col("h"), lit(20L)) + 1).cast("int")),
          element_at(fillerArr, (pmod(col("h") + 7, lit(20L)) + 1).cast("int")),
          element_at(fillerArr, (pmod(col("h") + 13, lit(20L)) + 1).cast("int"))))
      .withColumn("text",
        format_string("[seq=%d] call tool=%s status=%s latency=%dms detail: %s",
          col("turn_idx"),
          when(col("tool") === "", lit("none")).otherwise(col("tool")),
          col("status"), col("latency_ms"), col("filler")))
      .withColumn("ts",
        (lit(1704067200L) + col("conv_off_s") + col("turn_idx") * col("step_s") +
          pmod(col("h"), col("step_s"))).cast("timestamp"))

    base.select(
      col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
      col("role"), col("text"), col("tool"), col("ts"),
      struct(
        when(col("tool") === "", lit("none")).otherwise(col("tool")).as("tool_invoked"),
        col("status"),
        when(col("status") =!= "OK", col("status")).as("err_code"),
        col("latency_ms")
      ).as("_truth"))
  }

  /** Pipeline input: Turn columns only (ground truth dropped). */
  def turnsDs(spark: SparkSession, nConvs: Long, seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    turns(spark, nConvs, seed).drop("_truth").as[Turn]
  }

  /** role_dim: 4 rows — broadcast enrich side. */
  def roleDim(spark: SparkSession): Dataset[RoleDim] = {
    import spark.implicits._
    Seq(
      RoleDim("user", "human", is_human = true),
      RoleDim("assistant", "model", is_human = false),
      RoleDim("tool", "machine", is_human = false),
      RoleDim("system", "config", is_human = false)
    ).toDS()
  }

  /** tool_dim: 12 rows — broadcast enrich side. */
  def toolDim(spark: SparkSession): Dataset[ToolDim] = {
    import spark.implicits._
    val fam = Map(
      "search" -> "retrieval", "browse" -> "retrieval", "fetch" -> "retrieval",
      "bash" -> "exec", "sql" -> "exec", "notebook" -> "exec",
      "edit" -> "fs", "read" -> "fs", "write" -> "fs",
      "grep" -> "fs", "glob" -> "fs", "plot" -> "viz")
    toolNames.map(t => ToolDim(t, fam(t), s"team-${fam(t)}")).toDS()
  }
}
