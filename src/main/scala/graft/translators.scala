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
}
