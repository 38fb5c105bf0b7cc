package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("registerAll: SQL grok_extract ≡ Column API") {
    GraftFunctions.registerAll(spark)
    Seq("tool=search status=E500 latency=31ms", "no match here")
      .toDF("text").createOrReplaceTempView("ext_turns")
    val viaSql = spark.sql(
      """SELECT grok_extract(text,
        |  'tool=(?<tname>[a-z]+) status=(?<stat>E[0-9]{3})').tname AS tname
        |FROM ext_turns""".stripMargin)
      .as[String].collect().toSeq
    val viaCol = spark.table("ext_turns")
      .select(graft.expr.GrokExtract.grok_extract($"text",
        "tool=(?<tname>[a-z]+) status=(?<stat>E[0-9]{3})")
        .getField("tname").as("tname"))
      .as[String].collect().toSeq
    assert(viaSql === viaCol)
    assert(viaSql === Seq("search", null))
  }

  test("registerAll: SQL topk_by_score aggregate ≡ Column API") {
    GraftFunctions.registerAll(spark)
    (0L until 100L).map(i => (i % 3, i, (i % 17).toDouble))
      .toDF("g", "id", "score").createOrReplaceTempView("ext_scores")
    val viaSql = spark.sql(
      "SELECT g, topk_by_score(score, id, 4) AS picks FROM ext_scores GROUP BY g")
      .orderBy("g").collect().toSeq
    val viaCol = spark.table("ext_scores")
      .groupBy($"g")
      .agg(graft.expr.TopKByScore.topk_by_score($"score", $"id", 4).as("picks"))
      .orderBy("g").collect().toSeq
    assert(viaSql === viaCol)
    // non-literal k is rejected with the contract message
    val e = intercept[Exception] {
      spark.sql("SELECT topk_by_score(score, id, id + 1) FROM ext_scores").collect()
    }
    assert(e.getMessage.contains("k must be a literal"))
    // an out-of-Int-range BIGINT k is rejected, never silently truncated
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT topk_by_score(score, id, CAST(4294967297 AS BIGINT)) FROM ext_scores")
        .collect()
    }
    assert(e2.getMessage.contains("k out of range"))
    // a plain Int literal of 0 hits the SAME shared range check as the
    // Long path (the round-3 gap: Int literals bypassed the >= 1 bound
    // and surfaced as each expression's downstream require)
    val e3 = intercept[Exception] {
      spark.sql("SELECT topk_by_score(score, id, 0) FROM ext_scores").collect()
    }
    assert(e3.getMessage.contains("k out of range"), e3.getMessage)
    GraftFunctions.registerAll(spark)
    val e4 = intercept[Exception] {
      spark.sql("SELECT minhash_sig(word_shingles('a b c', 2), 0)").collect()
    }
    assert(e4.getMessage.contains("numHashes out of range"), e4.getMessage)
  }

  test("registerAll: SQL word_shingles + minhash_sig ≡ Column API") {
    GraftFunctions.registerAll(spark)
    Seq("alpha beta gamma delta", "short").toDF("text")
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT minhash_sig(word_shingles(text, 3), 8) AS sig FROM ext_docs")
      .collect().map(_.getSeq[Long](0)).toSeq
    val viaCol = spark.table("ext_docs")
      .select(graft.ops.Dedup.minhashSignature(
        graft.ops.Dedup.wordShingles($"text", 3), 8).as("sig"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(viaSql === viaCol)
  }

  test("registerAll: SQL simhash/sample_rank/shard_assign/redact_pii/dup_word_ratio ≡ Column API") {
    GraftFunctions.registerAll(spark)
    Seq((0L, "The quick brown fox the fox", "mail me at a@b.co or 192.168.0.1"),
        (1L, "all distinct words here", "phone 12345678 and text"),
        (2L, "x", ""))
      .toDF("id", "text", "pii").createOrReplaceTempView("ext_cur")
    val viaSql = spark.sql(
      """SELECT simhash(text) AS sh, norm_words(text) AS nw, sample_rank(id) AS r,
        |  shard_assign(id, 8) AS shard, redact_pii(pii) AS red,
        |  ROUND(dup_word_ratio(text), 4) AS dwr, pseudonymize(pii) AS ps
        |FROM ext_cur ORDER BY id""".stripMargin).collect().toSeq
    val viaCol = spark.table("ext_cur")
      .select(graft.ops.Dedup.simhash($"text").as("sh"),
        graft.ops.Curation.normWords($"text").as("nw"),
        graft.ops.Curation.sampleRank($"id").as("r"),
        graft.ops.Curation.shardAssign($"id", 8).as("shard"),
        graft.ops.Curation.redactPii($"pii").as("red"),
        round(graft.ops.Curation.dupWordRatio($"text"), 4).as("dwr"),
        graft.expr.Pseudonymize.pseudonymize($"pii").as("ps"))
      .orderBy(spark.table("ext_cur")("id")).collect().toSeq
    assert(viaSql === viaCol)
    // sanity on actual values, not just parity
    assert(viaSql.head.getString(4) === "mail me at <EMAIL> or <IP>")
    assert(viaSql(1).getString(4) === "phone <NUM> and text")
    // shard_assign requires a literal shard count like the other builders
    val e = intercept[Exception] {
      spark.sql("SELECT shard_assign(id, id + 1) FROM ext_cur").collect()
    }
    assert(e.getMessage.contains("must be a literal"), e.getMessage)
  }

  test("registerAll: SQL url_normalize/url_host/url_domain ≡ Column API") {
    GraftFunctions.registerAll(spark)
    Seq("HTTPS://WWW.Example.CO.UK:8443/A/B/?q=1#Frag",
        "localhost:8080/health", "ftp://www2.files.example.org//")
      .toDF("url").createOrReplaceTempView("ext_urls")
    val viaSql = spark.sql(
      """SELECT url_normalize(url) AS n, url_host(url) AS h,
        |  url_domain(url) AS d, url_path(url) AS p
        |FROM ext_urls ORDER BY url""".stripMargin).collect().toSeq
    val viaCol = spark.table("ext_urls")
      .select(graft.ops.UrlCuration.urlNormalize($"url").as("n"),
        graft.ops.UrlCuration.urlHost($"url").as("h"),
        graft.ops.UrlCuration.urlDomain($"url").as("d"),
        graft.ops.RobotsTxt.urlPath($"url").as("p"))
      .orderBy($"url").collect().toSeq
    assert(viaSql === viaCol)
    assert(viaSql.head.getString(2) === "example.co.uk") // the ccSLD rule
    // url_path keeps case + query, strips the fragment, and "" → "/"
    assert(viaSql.head.getString(3) === "/A/B/?q=1")
  }

  test("registerAll: SQL psl_domain ≡ Column API (bundled rule table)") {
    GraftFunctions.registerAll(spark)
    Seq("alice.github.io", "www.example.co.uk", "bar.foo.ck",
        "site.unknowntld", "co.uk")
      .toDF("host").createOrReplaceTempView("ext_hosts")
    val viaSql = spark.sql(
      "SELECT psl_domain(host) AS d FROM ext_hosts ORDER BY host")
      .collect().toSeq
    val viaCol = spark.table("ext_hosts")
      .select(graft.ops.UrlCuration.domainOfHostPsl($"host").as("d"))
      .orderBy($"host").collect().toSeq
    assert(viaSql === viaCol)
    assert(viaSql.map(_.getString(0)).toSet ===
      Set("alice.github.io", "example.co.uk", "bar.foo.ck",
        "site.unknowntld", "co.uk"))
  }

  test("registerAll: SQL rp_project_micro ≡ Column API; literal guards") {
    GraftFunctions.registerAll(spark)
    Seq((1L, Seq(0.5f, -1.25f, 2f)), (2L, Seq(0f, 0f, 0f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      "SELECT vec_id, rp_project_micro(embedding, 4, 11) AS p FROM ext_vecs")
      .orderBy("vec_id").collect().toSeq
    val viaCol = spark.table("ext_vecs")
      .select($"vec_id",
        graft.ops.Rp.projectMicro($"embedding", 4, 11L).as("p"))
      .orderBy("vec_id").collect().toSeq
    assert(viaSql === viaCol)
    val e = intercept[Exception] {
      spark.sql("SELECT rp_project_micro(embedding, 0, 11) FROM ext_vecs")
        .collect()
    }
    assert(e.getMessage.contains("outDim out of range"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT rp_project_micro(embedding, 4, vec_id) FROM ext_vecs")
        .collect()
    }
    assert(e2.getMessage.contains("seed must be a literal"), e2.getMessage)
  }

  test("GraftExtensions injects all four functions into a fresh session") {
    // build a sibling session over the same SparkContext with the
    // extension applied the way spark-submit's spark.sql.extensions does
    val prior = spark // keep the shared session object alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val withExt = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try {
        import withExt.implicits._
        val got = withExt.sql(
          "SELECT grok_extract('a=7', 'a=(?<v>[0-9]+)').v AS v").as[String].head()
        assert(got === "7")
        Seq((1L, 2.0), (2L, 1.0), (3L, 3.0)).toDF("id", "score")
          .createOrReplaceTempView("ext2")
        val top = withExt.sql(
          "SELECT topk_by_score(score, id, 1) AS p FROM ext2")
          .select(element_at($"p", 1).getField("id")).head().getLong(0)
        assert(top === 3L)
        val sig = withExt.sql(
          "SELECT minhash_sig(word_shingles('a b c d', 2), 4) AS s")
          .head().getSeq[Long](0)
        assert(sig.length === 4 && sig.forall(_ != Long.MaxValue))
        // the round-4 additions ride the same injection path
        val extras = withExt.sql(
          """SELECT simhash('a b a'), sample_rank(3), shard_assign(3, 4),
            |  redact_pii('x@y.io'), ROUND(dup_word_ratio('a b a'), 4)"""
            .stripMargin).head()
        assert(extras.getString(3) === "<EMAIL>")
        assert(extras.getDouble(4) === 0.3333)
      } finally {
        // the sibling shares the SparkContext — do not stop() it
      }
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
