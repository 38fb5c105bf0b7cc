package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** WET reader — render→read round-trip (bit-exact fields incl. the
  * octet Content-Length), preamble/warcinfo handling, the documented
  * marker-in-payload truncation flag, type filtering, and the
  * zero-exchange plan gate.
  */
class WetSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def warcinfo: String =
    "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "WARC-Date: 2024-03-01T00:00:00Z\r\n" +
      "Content-Length: 9\r\n" +
      "\r\n" +
      "robots: x\r\n\r\n"

  private def wetFile(body: String): String = {
    val dir = Files.createTempDirectory("wet-spec").toString
    Files.write(Paths.get(dir, "part-0.wet"),
      body.getBytes(StandardCharsets.UTF_8))
    dir
  }

  test("round-trip: render -> file -> readWet, bit-exact fields") {
    val rows = Seq(
      ("https://a.com/x", "2024-03-01 10:00:00", "hello world"),
      ("https://b.org/y", "2024-03-02 11:30:00", "héllo\nmulti\nline"))
      .toDF("url", "ts", "text")
    val rendered = rows
      .select(WetSource.renderRecord(col("url"),
        col("ts").cast("timestamp"), col("text")).as("rec"), col("url"))
      .orderBy("url").as[(String, String)].collect().map(_._1)
    val dir = wetFile(warcinfo + rendered.mkString)
    val got = WetSource.readWet(spark, dir)
      .select(col("record_idx"), col("url"), col("warc_date").cast("string"),
        col("content_length"), col("length_ok"), col("text"))
      .as[(Long, String, String, Long, Boolean, String)]
      .collect().sortBy(_._1)
    assert(got === Array(
      (1L, "https://a.com/x", "2024-03-01 10:00:00", 11L, true,
        "hello world"),
      (2L, "https://b.org/y", "2024-03-02 11:30:00", 17L, true,
        "héllo\nmulti\nline")))
  }

  test("marker inside a payload: truncation is FLAGGED, never silent") {
    // the payload contains the record marker, so the split fires early:
    // the record keeps its declared Content-Length but loses payload
    // octets -> length_ok false; the orphan fragment has no headers ->
    // its warc_type extracts empty and the type filter drops it
    val poisonedText = "before WARC/1.0\r\nafter"
    val rec = spark.range(1)
      .select(WetSource.renderRecord(lit("https://a.com/p"),
        lit("2024-03-01 00:00:00").cast("timestamp"),
        lit(poisonedText)).as("rec"))
      .head().getString(0)
    val dir = wetFile(warcinfo + rec)
    val got = WetSource.readWet(spark, dir)
      .select(col("url"), col("length_ok"), col("text"))
      .as[(String, Boolean, String)].collect()
    assert(got === Array(("https://a.com/p", false, "before ")))
  }

  test("keepTypes: warcinfo on request; empty set refused") {
    val dir = wetFile(warcinfo)
    val types = WetSource.readWet(spark, dir,
        keepTypes = Set("conversion", "warcinfo"))
      .select(col("record_idx"), col("warc_type"), col("url"),
        col("length_ok"))
      .as[(Long, String, String, Boolean)].collect()
    assert(types === Array((0L, "warcinfo", "", true)))
    assert(WetSource.readWet(spark, dir).count() === 0L)
    intercept[IllegalArgumentException] {
      WetSource.readWet(spark, dir, keepTypes = Set.empty)
    }
  }

  test("readWarcHtml: HTTP envelope split; envelope-less payload flagged") {
    val good = spark.range(1)
      .select(WetSource.renderResponse(lit("https://a.com/page"),
        lit("2024-03-01 00:00:00").cast("timestamp"),
        lit("<html><p>hi &amp; bye</p></html>")).as("rec"))
      .head().getString(0)
    // a malformed capture: response record whose payload has no HTTP
    // envelope at all — must survive with http_status NULL, html = payload
    val bad = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://b.com/raw\r\n" +
      "WARC-Date: 2024-03-01T00:00:01Z\r\n" +
      "Content-Length: 7\r\n" +
      "\r\n" +
      "no http\r\n\r\n"
    val dir = wetFile(warcinfo + good + bad)
    val got = WetSource.readWarcHtml(spark, dir)
      .select(col("url"), col("http_status"), col("length_ok"), col("html"))
      .as[(String, Option[Int], Boolean, String)].collect().sortBy(_._1)
    assert(got === Array(
      ("https://a.com/page", Some(200), true,
        "<html><p>hi &amp; bye</p></html>"),
      ("https://b.com/raw", None, true, "no http")))
    // the envelope is part of the WARC Content-Length (the standard):
    // declared length == octet_length(envelope + body)
    val cl = WetSource.readWarcHtml(spark, dir)
      .where(col("http_status").isNotNull)
      .select(col("content_length")).head().getLong(0)
    assert(cl === ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><p>hi &amp; bye</p></html>").getBytes("UTF-8").length.toLong)
  }

  test("streamWet: streamed records ≡ batch records (file picked up once)") {
    val rows = Seq(
      ("https://a.com/1", "2024-03-01 10:00:00", "first doc"),
      ("https://b.com/2", "2024-03-01 10:01:00", "second doc"))
      .toDF("url", "ts", "text")
    val rendered = rows
      .select(WetSource.renderRecord(col("url"),
        col("ts").cast("timestamp"), col("text")).as("rec"), col("url"))
      .orderBy("url").as[(String, String)].collect().map(_._1)
    val dir = wetFile(warcinfo + rendered.mkString)
    val q = WetSource.streamWet(spark, dir)
      .writeStream.format("memory").queryName("wet_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wet_stream")
        .select(col("record_idx"), col("url"), col("content_length"),
          col("length_ok"), col("text"))
        .as[(Long, String, Long, Boolean, String)].collect().sortBy(_._1)
      val batch = WetSource.readWet(spark, dir)
        .select(col("record_idx"), col("url"), col("content_length"),
          col("length_ok"), col("text"))
        .as[(Long, String, Long, Boolean, String)].collect().sortBy(_._1)
      assert(streamed === batch)
      assert(streamed.length === 2)
    } finally q.stop()
  }

  test("plan gate: the record parse is scan -> generate -> project, no exchange") {
    val dir = wetFile(warcinfo)
    val plan = WetSource.readWet(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(4000))
  }
}
