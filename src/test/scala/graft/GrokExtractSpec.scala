package graft

import org.apache.spark.sql.functions._
import graft.expr.GrokExtract

class GrokExtractSpec extends SparkTestBase {

  private val pat =
    "tool=(?<tool_name>[A-Za-z0-9_]+) status=(?<status>[A-Za-z0-9]+) latency=(?<latency_ms>[0-9]+)ms"

  test("compilePattern rewrites named groups, keeps indices right") {
    val (p, names, idxs) = GrokExtract.compilePattern(
      "a=(?<alpha>\\d+) (x )?b=(?<beta_x>\\w+)")
    assert(names.toSeq === Seq("alpha", "beta_x"))
    assert(idxs.toSeq === Seq(1, 3)) // (x ) is capturing group 2
    val m = p.matcher("a=42 b=hi")
    assert(m.find() && m.group(1) == "42" && m.group(3) == "hi")
    // char classes and lookbehind don't confuse the scanner
    val (_, n2, i2) = GrokExtract.compilePattern(
      "[(](?<k>\\w+)[)] (?<=x)(?:nc)(?<v>\\d+)")
    assert(n2.toSeq === Seq("k", "v") && i2.toSeq === Seq(1, 2))
  }

  test("eval: match, miss, partial groups") {
    import spark.implicits._
    val df = Seq(
      "call tool=bash status=OK latency=12ms x",
      "no structured content here",
      null.asInstanceOf[String]
    ).toDF("text").withColumn("g", GrokExtract.grok_extract(col("text"), pat))
    val rows = df.select("g.tool_name", "g.status", "g.latency_ms").collect()
    assert(rows(0).getString(0) == "bash" && rows(0).getString(1) == "OK" &&
      rows(0).getString(2) == "12")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).isNullAt(0))
  }

  test("interpreted and codegen paths agree") {
    import spark.implicits._
    val data = (0 until 200).map { i =>
      if (i % 3 == 0) s"tool=t$i status=E${400 + i % 100} latency=${i}ms"
      else if (i % 3 == 1) s"garbage $i"
      else s"tool=x_$i status=OK latency=${i * 7}ms trailing"
    }
    // wholeStage must ALSO be off for the interpreted leg — factoryMode
    // only governs projection factories; WSCG calls doGenCode regardless,
    // so without it this would compare codegen against codegen
    def run(mode: String, wholeStage: Boolean) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try data.toDF("text")
        .withColumn("g", GrokExtract.grok_extract(col("text"), pat))
        .select("text", "g.tool_name", "g.status", "g.latency_ms")
        .collect().map(_.toSeq).toSeq
      finally {
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        spark.conf.set("spark.sql.codegen.wholeStage", true)
      }
    }
    assert(run("NO_CODEGEN", wholeStage = false) ===
      run("CODEGEN_ONLY", wholeStage = true))
  }

  test("SQL registration works") {
    GrokExtract.register(spark)
    val r = spark.sql(
      s"SELECT grok_extract('tool=sql status=OK latency=5ms', 'tool=(?<t>\\\\w+)').t AS t")
      .head().getString(0)
    assert(r == "sql")
  }
}
