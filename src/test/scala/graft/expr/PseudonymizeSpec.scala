package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Consistent pseudonymization — tag replay against Spark's own md5
  * (an independent derivation of the contract), cross-occurrence and
  * cross-case consistency, the handle arm and its boundaries, the
  * email/redactPii agreement, nulls, and codegen ≡ interpreted.
  */
class PseudonymizeSpec extends SparkTestBase {
  import spark.implicits._

  private def run(s: String): String =
    Seq(s).toDF("t")
      .select(Pseudonymize.pseudonymize(col("t")).as("p"))
      .head().getString(0)

  test("tag is md5-replayable; same principal, same tag, any casing") {
    val expected = spark.range(1).select(expr(
      "concat('write user_', substring(md5('bob@x.com'), 1, 8)," +
        " '@example.com and user_', substring(md5('bob@x.com'), 1, 8)," +
        " '@example.com back')")).head().getString(0)
    assert(run("write Bob@X.com and bob@x.com back") === expected)
  }

  test("distinct principals get distinct tags; structure preserved") {
    val out = run("a@x.com wrote to b@y.org about a@x.com")
    val tags = "user_([0-9a-f]{8})@example\\.com".r
      .findAllMatchIn(out).map(_.group(1)).toSeq
    assert(tags.length === 3 && tags(0) === tags(2) && tags(0) != tags(1))
    assert(out.startsWith("user_") && out.contains(" wrote to ") &&
      out.contains(" about "))
  }

  test("handle arm: @name tagged; boundaries refuse mid-word and emails") {
    val out = run("ping @alice and @alice again, not price@2x or e@a")
    val handleTags = "@user_([0-9a-f]{8})".r
      .findAllMatchIn(out).map(_.group(1)).toSeq
    assert(handleTags.length === 2 && handleTags.distinct.length === 1)
    // price@2x: no TLD (not an email), preceded by a word char (not a
    // handle); e@a: likewise untouched
    assert(out.contains("price@2x") && out.contains("e@a"))
    // an address is consumed whole by the email arm, never re-tagged as
    // a handle on its domain
    val mail = run("mail bob@x.com now")
    assert(mail === "mail user_" +
      spark.range(1).select(expr("substring(md5('bob@x.com'), 1, 8)"))
        .head().getString(0) + "@example.com now")
  }

  test("agrees with redactPii on what an email is") {
    // every span redactPii masks as <EMAIL>, pseudonymize also rewrites
    val texts = Seq("x a.b-c+d@e-f.co y", "no pii here", "a@b@c.com t")
    val both = texts.toDF("t").select(
      graft.ops.Curation.redactPii(col("t")).as("r"),
      Pseudonymize.pseudonymize(col("t")).as("p"))
      .as[(String, String)].collect()
    both.foreach { case (r, p) =>
      assert(r.contains("<EMAIL>") === p.contains("@example.com"), (r, p))
    }
  }

  test("no-PII passthrough, null in, codegen ≡ interpreted") {
    assert(run("nothing to see 1.2.3.4 here") === "nothing to see 1.2.3.4 here")
    val n = Seq[Option[String]](None).toDF("t")
      .select(Pseudonymize.pseudonymize(col("t"))).head()
    assert(n.isNullAt(0))
    val s = "Bob@X.com pings @carol twice: Bob@X.com @carol"
    val viaCodegen = run(s)
    val interpreted = Pseudonymize.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(viaCodegen === interpreted)
  }
}
