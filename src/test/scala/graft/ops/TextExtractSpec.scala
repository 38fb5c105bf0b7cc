package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** HTML → text extraction: hand-built documents with known extractions
  * (rule order, case-insensitivity, entity decode order, whitespace
  * canon, density arithmetic) plus the documented-limit edges.
  */
class TextExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def extract(html: String): (String, Long, Long, Long) = {
    val r = TextExtract.htmlExtract(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .select("text", "n_chars_html", "n_chars_text", "density_micro")
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("full document: scripts/styles/comments gone, blocks → newlines") {
    val html =
      """<html><head><title>T</title>
        |<SCRIPT type="text/javascript">var x = 1 < 2; // <p>not content</p>
        |</SCRIPT><style media="all">.a { color: red }</style></head>
        |<body><!-- a comment with <div>tags</div> inside -->
        |<h1>Heading One</h1>
        |<p>First paragraph.</p>
        |<ul><li>item one</li><li>item two</li></ul>
        |<div>block<br>break</div></body></html>""".stripMargin
    val (text, _, _, _) = extract(html)
    // title text is content (only script/style bodies are machinery);
    // </h1>/<br>/</li>/</p>/</div> became newlines, 3+ collapse to 2
    assert(text ==
      "T\n\nHeading One\n\nFirst paragraph.\n\nitem one\nitem two\n\nblock\nbreak")
  }

  test("entity decode: &amp; last, so &amp;lt; → literal &lt;") {
    val (text, _, _, _) =
      extract("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e &amp; f &amp;lt;</p>")
    assert(text == "a <b> \"c\" 'd' e & f &lt;")
  }

  test("whitespace canon: horizontal runs, spaces around newlines, 3+ newlines → 2") {
    val (text, _, _, _) =
      extract("<p>a   b\t\tc</p>  \n\n  \n <p>next</p>")
    assert(text == "a b c\n\nnext")
  }

  test("documented limits: unterminated '<' stays; CDATA markers strip, content stays") {
    val (t1, _, _, _) = extract("price: 3 < 5 and x <unclosed")
    assert(t1 == "price: 3 < 5 and x <unclosed")
    val (t2, _, _, _) = extract("<p><![CDATA[kept content]]></p>")
    // '<![CDATA[kept content]]' has no '>' until the trailing ']]>' —
    // the tag-strip eats from '<!' to that first '>', an accepted limit
    assert(t2 == "")
    val (t3, _, _, _) = extract("<p><![CDATA[a > b]]></p>")
    assert(t3 == "b]]>")
  }

  test("density: exact integer micro-units; empty html → 0") {
    // text "abcde" len 5 → 5_000_000 div len(html), exact integer
    val html = "<p>abcde</p><script>x</script>"
    val (text, nh, nt, d) = extract(html)
    assert(text == "abcde")
    assert(nh == html.length.toLong && nt == 5L)
    assert(d == 5L * 1000000L / html.length)
    val (t0, h0, n0, d0) = extract("")
    assert(t0 == "" && h0 == 0L && n0 == 0L && d0 == 0L)
  }

  test("plain text passes through; guards fire") {
    val (text, _, _, d) = extract("no markup at all")
    assert(text == "no markup at all")
    assert(d == 1000000L)
    intercept[IllegalArgumentException] {
      TextExtract.htmlExtract(Seq((1L, "x")).toDF("doc_id", "html"),
        "doc_id", "nope")
    }
  }

  test("zero-exchange plan: extraction is one narrow projection") {
    val df = TextExtract.htmlExtract(
      (0L until 50L).map(i => (i, s"<p>doc $i</p>")).toDF("doc_id", "html"),
      "doc_id", "html")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("htmlMetaRobots: both attribute orders, quotes, case; NULL absent") {
    val cases = Seq(
      ("""<head><META NAME="robots" CONTENT="noindex, NOAI"></head>""",
        Some("noindex, noai")),
      ("""<head><meta content='index, follow' name='robots'></head>""",
        Some("index, follow")),
      ("""<head><meta class="x" name="robots" id="y" content="none"></head>""",
        Some("none")),
      ("""<head><meta name="viewport" content="width=1"></head>""", None),
      ("""<p>no head at all</p>""", None),
      // two tags: the robots one wins, the other never bridges into it
      ("""<meta name="viewport" content="w"><meta name="robots" content="noai">""",
        Some("noai")))
    val got = cases.map(_._1).toDF("html")
      .select(TextExtract.htmlMetaRobots(col("html")).as("r"))
      .as[Option[String]].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("keep passthrough: provenance columns carried, collisions guarded") {
    val in = Seq((1L, "https://a.com/x", "<p>hi</p>"))
      .toDF("doc_id", "url", "html")
    val out = TextExtract.htmlExtract(in, "doc_id", "html",
      keep = Seq("url"))
    assert(out.columns === Array("doc_id", "url", "text", "n_chars_html",
      "n_chars_text", "density_micro"))
    val r = out.head()
    assert(r.getString(1) === "https://a.com/x" && r.getString(2) === "hi")
    intercept[IllegalArgumentException] { // keep column absent
      TextExtract.htmlExtract(in, "doc_id", "html", keep = Seq("nope"))
    }
    intercept[IllegalArgumentException] { // keep collides with an output
      TextExtract.htmlExtract(in.withColumnRenamed("url", "text"),
        "doc_id", "html", keep = Seq("text"))
    }
  }
}
