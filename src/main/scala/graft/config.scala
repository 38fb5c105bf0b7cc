package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven pipeline topology — the Spark analog of the reference's
  * YAML service config (SURVEY.md §3.1, ref `config/config.go: Load` with
  * its validation pass; `service/builder`): the parse pattern, sampling,
  * and per-sink routing predicates are DATA, not code. Predicates are Spark
  * SQL boolean expressions compiled with `expr(...)` — they stay visible to
  * Catalyst, so pushdown/pruning still apply (the optimization the
  * reference's hand-ordered YAML never gets).
  *
  * JSON instead of YAML (jackson ships with Spark; no new dependency):
  * {
  *   "grok_pattern": "tool=(?<tool_invoked>...)...",
  *   "sample_pct": 100.0,
  *   "salt": 16,
  *   "sinks": [ {"name": "errors", "predicate": "err_code RLIKE '^E5'"} ]
  * }
  */
final case class SinkConfig(name: String, predicate: String)

final case class PipelineConfig(
    grokPattern: String,
    sinks: Seq[SinkConfig],
    samplePct: Double = 100.0,
    salt: Int = Aggregate.DefaultSalt) {

  /** Mirrors the reference's config validation (every pipeline ≥1
    * receiver & ≥1 exporter; unique component ids).
    */
  def validated: PipelineConfig = {
    require(sinks.nonEmpty, "config: need at least one sink")
    require(sinks.map(_.name).distinct.size == sinks.size,
      s"config: duplicate sink names in ${sinks.map(_.name)}")
    require(!sinks.map(_.name).contains(Route.RestSink),
      s"config: '${Route.RestSink}' is the reserved catch-all sink name")
    require(samplePct >= 0 && samplePct <= 100,
      s"config: sample_pct out of range: $samplePct")
    require(salt >= 1, s"config: salt must be >= 1: $salt")
    val (_, names, _) = graft.expr.GrokExtract.compilePattern(grokPattern)
    require(names.nonEmpty, s"config: grok_pattern has no named groups")
    this
  }

  def sinkSpecs: Seq[SinkSpec] = sinks.map(s => SinkSpec(s.name, expr(s.predicate)))
}

object PipelineConfig {

  /** The coded defaults, as config (also serves as the reference example). */
  val defaultJson: String =
    """{
      |  "grok_pattern": "tool=(?<tool_invoked>[A-Za-z0-9_]+) status=(?<status>[A-Za-z0-9]+) latency=(?<latency_ms>[0-9]+)ms",
      |  "sample_pct": 100.0,
      |  "salt": 16,
      |  "sinks": [
      |    {"name": "tool_search", "predicate": "tool_invoked IN ('search','browse','fetch')"},
      |    {"name": "errors", "predicate": "err_code RLIKE '^E5'"}
      |  ]
      |}""".stripMargin

  def fromJson(json: String): PipelineConfig = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.ObjectMapper
    val root: JsonNode = new ObjectMapper().readTree(json)
    def req(field: String): JsonNode = {
      val n = root.get(field)
      require(n != null, s"config: missing field '$field'")
      n
    }
    val sinks = {
      val arr = req("sinks")
      require(arr.isArray, "config: 'sinks' must be an array")
      (0 until arr.size()).map { i =>
        val s = arr.get(i)
        require(s.hasNonNull("name") && s.hasNonNull("predicate"),
          s"config: sink $i needs 'name' and 'predicate'")
        SinkConfig(s.get("name").asText(), s.get("predicate").asText())
      }
    }
    PipelineConfig(
      grokPattern = req("grok_pattern").asText(),
      sinks = sinks,
      samplePct = Option(root.get("sample_pct")).map(_.asDouble()).getOrElse(100.0),
      salt = Option(root.get("salt")).map(_.asInt()).getOrElse(Aggregate.DefaultSalt)
    ).validated
  }

  /** Build the routed frame from config: (sample) → parse → enrich → route.
    * The grok pattern must produce `tool_invoked`, `status`, `latency_ms`
    * groups (the ParsedTurn contract).
    */
  def transform(spark: SparkSession, turns: DataFrame,
                cfg: PipelineConfig): DataFrame = {
    val sampled =
      if (cfg.samplePct >= 100.0) turns
      else Sampler.sampleConversations(turns, cfg.samplePct)
    val g = graft.expr.GrokExtract.grok_extract(col("text"), cfg.grokPattern)
    val parsed = sampled
      .withColumn("_g", g)
      .withColumn("tool_invoked", coalesce(col("_g.tool_invoked"), lit("")))
      .withColumn("status", coalesce(col("_g.status"), lit("")))
      .withColumn("err_code",
        when(col("_g.status").rlike("^E[0-9]{3}$"), col("_g.status")))
      .withColumn("latency_ms",
        coalesce(col("_g.latency_ms").cast("long"), lit(-1L)))
      .drop("_g")
    val enriched = Enrich.enrich(parsed,
      TranscriptGen.roleDim(spark).toDF(), TranscriptGen.toolDim(spark).toDF())
    Route.assign(enriched, cfg.sinkSpecs)
  }
}
