package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** URL curation — normalization/domain branches on hand URLs with known
  * answers, blocklist anti-join semantics, and the per-domain cap proven
  * ≡ an independent window-rank reference while keeping the skew-safe
  * plan (no Window over the domain key anywhere in the physical plan).
  */
class UrlCurationSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("url").select(UrlCuration.urlNormalize(col("url")))
      .head().getString(0)

  private def dom(u: String): String =
    Seq(u).toDF("url").select(UrlCuration.urlDomain(col("url")))
      .head().getString(0)

  test("urlNormalize strips scheme/fragment/query/www/port-keeps/slashes") {
    assert(norm("HTTPS://WWW.Example.COM/A/B/?q=1&x=2#Frag") ==
      "example.com/a/b")
    assert(norm("http://example.com") == "example.com")
    assert(norm("example.com/page/") == "example.com/page")
    assert(norm("ftp://www2.files.example.org//") == "files.example.org")
    assert(norm("  https://example.com/x#a#b  ") == "example.com/x")
    // query stripped before trailing slashes, so '/?q' collapses fully
    assert(norm("https://example.com/x/?q=/weird/") == "example.com/x")
    // www only strips as a LEADING label — a host merely starting with
    // 'www' keeps its name
    assert(norm("https://wwwish.example.com/") == "wwwish.example.com")
    // authority userinfo strips (the blocklist-evasion vector)…
    assert(norm("https://User:Pw@www.Blocked.com/x") == "blocked.com/x")
    assert(norm("alice@example.com/inbox") == "example.com/inbox")
    assert(dom("https://u@spam.blocked.co.uk/") == "blocked.co.uk")
    // …greedily to the LAST pre-path '@' (the WHATWG rule), so doubled
    // userinfo cannot evade either
    assert(norm("https://a@b@blocked.com/spam") == "blocked.com/spam")
    // …but an '@' in the path or (stripped) query is never authority
    assert(norm("https://example.com/user/@handle") ==
      "example.com/user/@handle")
    assert(norm("https://example.com/x?mail=a@b.com") == "example.com/x")
  }

  test("urlHost takes the authority and drops the port") {
    val h = Seq("https://www.example.co.uk:8443/a?q=1").toDF("url")
      .select(UrlCuration.urlHost(col("url"))).head().getString(0)
    assert(h == "example.co.uk")
    assert(dom("https://example.com:80/") == "example.com")
  }

  test("registrable-domain heuristic: 2 labels, ccSLD exception, bare host") {
    assert(dom("https://a.b.news.example.com/x") == "example.com")
    assert(dom("https://www.bbc.co.uk/news") == "bbc.co.uk")
    assert(dom("http://sub.dept.todai.ac.jp") == "todai.ac.jp")
    assert(dom("https://example.de/") == "example.de")
    assert(dom("localhost:8080/health") == "localhost")
    // 'co' under a NON-2-letter TLD is not the ccSLD exception
    assert(dom("https://x.y.co.com/") == "co.com")
  }

  private lazy val corpus = {
    // 40 docs on hot.example.com, a handful elsewhere
    val hot = (0 until 40).map(i =>
      (i.toLong, s"https://hot.example.com/p/$i"))
    val cold = Seq(
      (100L, "https://www.bbc.co.uk/news/1"),
      (101L, "https://www.bbc.co.uk/news/2"),
      (102L, "https://spam.farm.net/x"),
      (103L, "https://other.org/y"))
    (hot ++ cold).toDF("doc_id", "url")
  }

  test("blockDomains drops exactly the blocklisted registrable domains") {
    val blocked = Seq("farm.net").toDF("domain")
    val kept = UrlCuration.blockDomains(corpus, "url", blocked)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(102L) && kept.size == corpus.count() - 1)
  }

  test("domainCap ≡ window-rank reference, keeps full rows, deterministic") {
    val capped = UrlCuration.domainCap(corpus, "url", "doc_id", cap = 5)
    assert(capped.columns.toSeq == Seq("doc_id", "url"))
    val got = capped.select("doc_id").as[Long].collect().sorted.toSeq
    // independent reference: row_number over sampleRank per domain
    val ref = corpus
      .withColumn("d", UrlCuration.urlDomain(col("url")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("d"))
          .orderBy(Curation.sampleRank(col("doc_id")))))
      .where(col("rk") <= 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == ref)
    assert(got.size == 5 + 2 + 1 + 1) // hot capped at 5, others intact
    // rerun under a different partitioning → identical pick
    val again = UrlCuration.domainCap(corpus.repartition(7), "url",
      "doc_id", cap = 5).select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == got)
  }

  test("precomputed-domain passthrough ≡ the derive-per-stage path") {
    val withDom = corpus.withColumn("d",
      UrlCuration.urlDomain(col("url")))
    val viaPre = UrlCuration.domainCap(
      UrlCuration.blockDomains(withDom, "url", Seq("farm.net").toDF("domain"),
        precomputed = Some("d")),
      "url", "doc_id", cap = 5, precomputed = Some("d"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaDerive = UrlCuration.domainCap(
      UrlCuration.blockDomains(corpus, "url", Seq("farm.net").toDF("domain")),
      "url", "doc_id", cap = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaPre == viaDerive)
    intercept[IllegalArgumentException] {
      UrlCuration.domainCap(corpus, "url", "doc_id", 5,
        precomputed = Some("nope"))
    }
  }

  test("domainCap plan has no Window over the domain key (skew-safe)") {
    val plan = UrlCuration.domainCap(corpus, "url", "doc_id", cap = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"skew funnel in plan:\n$plan")
  }

  test("internal-column collisions and bad caps are rejected") {
    intercept[IllegalArgumentException] {
      UrlCuration.domainCap(corpus, "url", "doc_id", cap = 0)
    }
    intercept[IllegalArgumentException] {
      UrlCuration.domainCap(corpus.withColumn("_url_dom", lit(1)),
        "url", "doc_id", cap = 1)
    }
    intercept[IllegalArgumentException] {
      UrlCuration.blockDomains(corpus, "url",
        Seq("x").toDF("not_domain"))
    }
  }

  test("PSL domains: hosting suffixes, multi-label ccSLDs, wildcard + " +
    "exception rules, suffix-only hosts pass through") {
    val cases = Seq(
      // private-section hosting suffixes: each user is its own domain
      // (the heuristic collapses ALL of github.io into one)
      "alice.github.io" -> "alice.github.io",
      "www.alice.github.io" -> "alice.github.io",
      "mysite.blogspot.com" -> "mysite.blogspot.com",
      "bucket.s3.amazonaws.com" -> "bucket.s3.amazonaws.com",
      // classic ccSLDs
      "www.example.co.uk" -> "example.co.uk",
      "a.b.example.com.au" -> "example.com.au",
      "shop.example.co.jp" -> "example.co.jp",
      "www.example.de" -> "example.de",
      // wildcard *.ck: any 2-label .ck host is itself a public suffix
      "foo.ck" -> "foo.ck",
      "bar.foo.ck" -> "bar.foo.ck",
      "x.bar.foo.ck" -> "bar.foo.ck",
      // exception !www.ck: www.ck IS registrable
      "www.ck" -> "www.ck",
      "sub.www.ck" -> "www.ck",
      // unknown TLD → implicit * rule (last label is the suffix)
      "site.unknowntld" -> "site.unknowntld",
      "a.b.site.unknowntld" -> "site.unknowntld",
      // host == suffix (or shorter) passes through unchanged
      "github.io" -> "github.io",
      "co.uk" -> "co.uk",
      "com" -> "com",
      "localhost" -> "localhost")
    val got = cases.map(_._1).toDF("host")
      .select($"host", UrlCuration.domainOfHostPsl($"host").as("dom"))
      .as[(String, String)].collect().toMap
    for ((h, expect) <- cases)
      assert(got(h) === expect, s"host $h")
    // codegen'd kernel ≡ interpreted compute on every case
    val table = graft.expr.PslDomain.loadDefault
    for ((h, expect) <- cases)
      assert(graft.expr.PslDomain.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(h), table)
        .toString === expect, s"interpreted $h")
  }

  test("PSL parse: grammar (comments, sections, whitespace), custom " +
    "table via the swap-in seam; urlDomainPsl end to end") {
    val table = graft.expr.PslDomain.parse(Iterator(
      "// comment", "", "  zz  trailing-junk", "*.wild", "!ok.wild",
      "two.zz"))
    def d(h: String) = graft.expr.PslDomain.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(h), table).toString
    assert(d("a.zz") === "a.zz")          // normal rule "zz"
    assert(d("a.two.zz") === "a.two.zz")  // longer rule wins
    assert(d("b.a.wild") === "b.a.wild")  // wildcard
    assert(d("x.ok.wild") === "ok.wild")  // exception beats wildcard
    // full-url path: normalize → host → PSL
    val got = Seq((1L, "HTTPS://WWW.Alice.GitHub.IO/p/1?q=2#f"))
      .toDF("id", "url")
      .select(UrlCuration.urlDomainPsl($"url").as("d"))
      .as[String].head()
    assert(got === "alice.github.io")
  }
}
