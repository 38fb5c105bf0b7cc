package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Format translators (SURVEY.md §2.11; ref `translator/trace/zipkin/...`,
  * `translator/internaldata/...`): pure structural select/cast mappings,
  * one function per external schema — no custom operators, fully
  * Catalyst-visible (pushdown/pruning see through them).
  *
  * Two wire shapes:
  *  - Zipkin-v2-style JSON span ingestion (the zipkinreceiver's
  *    `ServeHTTP` JSON path → internal rows).
  *  - OTLP-style LogRecord struct export/import (otlpexporter/-receiver):
  *    `Turn` rows ↔ nested `{time_unix_nano, severity_text, body,
  *    attributes[]}` structs, the flattened analog of
  *    `consumer/pdata/log.go`.
  */
object Translators {

  /** Zipkin v2 JSON span schema (subset used by the collector's zipkin
    * receiver: traceId/id/name/timestamp(µs)/duration(µs)/localEndpoint/
    * tags).
    */
  val zipkinSpanSchema: StructType = StructType(Seq(
    StructField("traceId", StringType),
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("timestamp", LongType),      // epoch micros
    StructField("duration", LongType),       // micros
    StructField("localEndpoint",
      StructType(Seq(StructField("serviceName", StringType)))),
    StructField("tags", MapType(StringType, StringType))
  ))

  /** Parse a column of Zipkin-v2 JSON span strings into flat span rows. */
  def fromZipkinJson(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("_z", from_json(col(jsonCol), zipkinSpanSchema))
      .select(
        col("_z.traceId").as("trace_id"),
        col("_z.id").as("span_id"),
        col("_z.name").as("name"),
        timestamp_micros(col("_z.timestamp")).as("ts"),
        (col("_z.duration") / 1000L).cast("long").as("latency_ms"),
        coalesce(col("_z.localEndpoint.serviceName"), lit("")).as("service"),
        coalesce(col("_z.tags"), map()).as("tags"))

  /** Parsed turns → Zipkin-v2 JSON span strings (zipkinexporter
    * direction); inverse of [[fromZipkinJson]] up to tag contents.
    */
  def toZipkinJson(parsed: DataFrame,
                   serviceName: String = "graft-collector"): DataFrame =
    parsed.select(to_json(struct(
      col("conv_id").as("traceId"),
      concat_ws(":", col("conv_id"), col("turn_idx")).as("id"),
      concat_ws("/", col("role"), col("tool_invoked")).as("name"),
      unix_micros(col("ts").cast("timestamp")).as("timestamp"),
      (col("latency_ms") * 1000L).as("duration"),
      struct(lit(serviceName).as("serviceName")).as("localEndpoint"),
      map(lit("role"), col("role"),
        lit("error"), when(col("err_code").isNotNull, col("err_code"))).as("tags")
    )).as("json"))

  /** Turn rows → OTLP-ish LogRecord structs (the export direction):
    * time in unix nanos, severity derived from the parsed err_code,
    * body = text, envelope keys as attributes.
    */
  def toOtlpLogs(parsed: DataFrame): DataFrame =
    parsed.select(struct(
      (unix_micros(col("ts").cast("timestamp")) * 1000L).as("time_unix_nano"),
      when(col("err_code").isNotNull, lit("ERROR")).otherwise(lit("INFO"))
        .as("severity_text"),
      col("text").as("body"),
      col("conv_id").as("trace_id"),
      concat(col("conv_id"), lit(":"), col("turn_idx")).as("span_id"),
      map(
        lit("role"), col("role"),
        lit("tool"), col("tool"),
        lit("turn_idx"), col("turn_idx").cast("string")
      ).as("attributes")
    ).as("log"))

  /** OTLP-ish LogRecord structs → Turn rows (the import direction);
    * inverse of [[toOtlpLogs]] up to the parse-derived columns.
    */
  def fromOtlpLogs(logs: DataFrame): DataFrame =
    logs.select(
      col("log.trace_id").as("conv_id"),
      element_at(col("log.attributes"), "turn_idx").cast("int").as("turn_idx"),
      element_at(col("log.attributes"), "role").as("role"),
      col("log.body").as("text"),
      element_at(col("log.attributes"), "tool").as("tool"),
      timestamp_micros((col("log.time_unix_nano") / 1000L).cast("long")).as("ts"))

  /** Parsed turns → Jaeger-model spans (the jaegerexporter direction:
    * `translator/trace/jaeger/traces_to_jaegerproto.go`-style field
    * mapping, flattened): trace/span ids, operation name, start µs,
    * duration µs, service, error tag.
    */
  def toJaegerSpans(parsed: DataFrame,
                    serviceName: String = "graft-collector"): DataFrame =
    parsed.select(
      col("conv_id").as("trace_id"),
      concat_ws(":", col("conv_id"), col("turn_idx")).as("span_id"),
      concat_ws("/", col("role"), col("tool_invoked")).as("operation_name"),
      unix_micros(col("ts").cast("timestamp")).as("start_time_us"),
      (col("latency_ms") * 1000L).as("duration_us"),
      lit(serviceName).as("service_name"),
      col("err_code").isNotNull.as("error_tag"))

  /** Jaeger-model spans → turn-shaped rows (jaegerreceiver direction);
    * inverse of [[toJaegerSpans]] up to the text column.
    */
  def fromJaegerSpans(spans: DataFrame): DataFrame =
    spans.select(
      col("trace_id").as("conv_id"),
      element_at(split(col("span_id"), ":"), -1).cast("int").as("turn_idx"),
      element_at(split(col("operation_name"), "/"), 1).as("role"),
      element_at(split(col("operation_name"), "/"), -1).as("tool_invoked"),
      timestamp_micros(col("start_time_us")).as("ts"),
      (col("duration_us") / 1000L).cast("long").as("latency_ms"))

  /** Parsed turns → OpenCensus-model spans (opencensusexporter direction:
    * `translator/internaldata/oc_to_traces.go` inverse, flattened struct):
    * OC keeps name in a TruncatableString, times as start/end pair, and a
    * status {code, message}.
    */
  def toOpenCensusSpans(parsed: DataFrame): DataFrame =
    parsed.select(struct(
      col("conv_id").as("trace_id"),
      concat_ws(":", col("conv_id"), col("turn_idx")).as("span_id"),
      struct(concat_ws("/", col("role"), col("tool_invoked")).as("value"))
        .as("name"),
      col("ts").as("start_time"),
      (col("ts").cast("timestamp") +
        make_dt_interval(lit(0), lit(0), lit(0),
          col("latency_ms").cast("double") / 1000.0)).as("end_time"),
      struct(
        when(col("err_code").isNotNull, lit(2)).otherwise(lit(0)).as("code"),
        coalesce(col("err_code"), lit("")).as("message")).as("status"),
      map(lit("role"), col("role"), lit("tool"), col("tool_invoked"))
        .as("attributes")
    ).as("span"))

  /** OC-model spans → turn-shaped rows; inverse of [[toOpenCensusSpans]]. */
  def fromOpenCensusSpans(spans: DataFrame): DataFrame =
    spans.select(
      col("span.trace_id").as("conv_id"),
      element_at(split(col("span.span_id"), ":"), -1).cast("int").as("turn_idx"),
      element_at(col("span.attributes"), "role").as("role"),
      element_at(col("span.attributes"), "tool").as("tool_invoked"),
      col("span.start_time").as("ts"),
      ((unix_micros(col("span.end_time").cast("timestamp")) -
        unix_micros(col("span.start_time").cast("timestamp"))) / 1000L)
        .cast("long").as("latency_ms"),
      when(col("span.status.code") =!= 0, col("span.status.message"))
        .as("err_code"))
}
