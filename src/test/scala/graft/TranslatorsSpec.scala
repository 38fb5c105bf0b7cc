package graft

import org.apache.spark.sql.functions._

/** Translators (SURVEY.md §2.11): structural mappings must round-trip
  * losslessly and parse external JSON shapes correctly.
  */
class TranslatorsSpec extends SparkTestBase {

  test("Turn → OTLP logs → Turn round-trips the envelope exactly") {
    val turns = TranscriptGen.turnsDs(spark, 200).toDF()
    val parsed = Parse.parseGrok(turns)
    val back = Translators.fromOtlpLogs(Translators.toOtlpLogs(parsed))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val orig = turns.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("severity mapping follows err_code") {
    val turns = TranscriptGen.turnsDs(spark, 300).toDF()
    val parsed = Parse.parseGrok(turns).cache()
    val logs = Translators.toOtlpLogs(parsed)
    val nErr = logs.where(col("log.severity_text") === "ERROR").count()
    assert(nErr === parsed.where(col("err_code").isNotNull).count())
    assert(nErr > 0)
    parsed.unpersist()
  }

  test("zipkin v2 JSON spans parse to flat rows") {
    import spark.implicits._
    val json = Seq(
      """{"traceId":"abc123","id":"s1","name":"GET /api","timestamp":1704067200000000,
        |"duration":250000,"localEndpoint":{"serviceName":"frontend"},
        |"tags":{"http.status_code":"200","env":"prod"}}""".stripMargin.replace("\n", ""),
      """{"traceId":"abc123","id":"s2","name":"SELECT db","timestamp":1704067200100000,
        |"duration":50000}""".stripMargin.replace("\n", ""),
      """not valid json"""
    ).toDF("body")
    val spans = Translators.fromZipkinJson(json, "body")
    val rows = spans.orderBy("span_id").collect()
    assert(rows.length === 3)
    val s1 = rows.find(r => r.getAs[String]("span_id") == "s1").get
    assert(s1.getAs[String]("trace_id") === "abc123")
    assert(s1.getAs[Long]("latency_ms") === 250L)
    assert(s1.getAs[String]("service") === "frontend")
    assert(s1.getAs[Map[String, String]]("tags")("env") === "prod")
    val s2 = rows.find(r => r.getAs[String]("span_id") == "s2").get
    assert(s2.getAs[String]("service") === "")
    assert(s2.getAs[Map[String, String]]("tags").isEmpty)
    // malformed JSON → null row fields, not a crash (permissive mode)
    assert(rows.count(_.isNullAt(0)) === 1)
  }
}
