package graft

import org.apache.spark.sql.functions._

/** Config-driven topology (SURVEY.md §3.1 analog): JSON config must build
  * the same pipeline as the coded defaults, and invalid configs must be
  * rejected at load time (the reference's config validation pass).
  */
class ConfigSpec extends SparkTestBase {

  test("default JSON config reproduces the coded pipeline exactly") {
    val cfg = PipelineConfig.fromJson(PipelineConfig.defaultJson)
    val turns = TranscriptGen.turns(spark, 300, seed = 42).drop("_truth")
    val fromCfg = PipelineConfig.transform(spark, turns, cfg)
      .select("conv_id", "turn_idx", "text", Route.SinkCol)
    val coded = Pipeline.transform(turns,
        TranscriptGen.roleDim(spark).toDF(), TranscriptGen.toolDim(spark).toDF())
      .select("conv_id", "turn_idx", "text", Route.SinkCol)
    assert(fromCfg.exceptAll(coded).isEmpty && coded.exceptAll(fromCfg).isEmpty)
  }

  test("config sampling applies conversation-atomic sampling") {
    val cfg = PipelineConfig.fromJson(PipelineConfig.defaultJson)
      .copy(samplePct = 20.0)
    val turns = TranscriptGen.turns(spark, 300, seed = 42).drop("_truth")
    val routed = PipelineConfig.transform(spark, turns, cfg)
    assert(routed.count() ===
      Sampler.sampleConversations(turns, 20.0).count())
  }

  test("invalid configs rejected at load") {
    def bad(json: String): Unit =
      intercept[Exception](PipelineConfig.fromJson(json))
    bad("""{"sinks": []}""")                                    // missing pattern
    bad("""{"grok_pattern": "x(?<g>y)", "sinks": []}""")        // no sinks
    bad("""{"grok_pattern": "no groups here",
           "sinks": [{"name":"a","predicate":"true"}]}""")      // no named groups
    bad("""{"grok_pattern": "x(?<g>y)",
           "sinks": [{"name":"a","predicate":"true"},
                     {"name":"a","predicate":"false"}]}""")     // dup names
    bad("""{"grok_pattern": "x(?<g>y)",
           "sinks": [{"name":"rest","predicate":"true"}]}""")   // reserved name
    bad("""{"grok_pattern": "x(?<g>y)", "sample_pct": 150,
           "sinks": [{"name":"a","predicate":"true"}]}""")      // pct range
  }
}
