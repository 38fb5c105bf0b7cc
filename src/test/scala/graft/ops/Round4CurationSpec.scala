package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-4 curation additions: upsampling mixture (fractional epochs)
  * and the corpus-wide top-ngram boilerplate detector, each against a
  * plain-Scala replay.
  */
class Round4CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def rank(id: Long): Long = (id * 2654435761L) % 4294967296L

  test("upsampleMixture ≡ driver replay (floor copies + rank fraction)") {
    val rows = (0L until 200L).map(i =>
      (i, Seq("a", "b", "c")(i.toInt % 3)))
    val df = rows.toDF("id", "grp")
    val out = Curation.upsampleMixture(df, "grp", "id",
        Seq("a" -> 2.5, "b" -> 0.25), defaultWeight = 1.0)
      .select("id", "grp", "n_copies", "epoch")
      .as[(Long, String, Int, Int)].collect().toSet
    def copies(id: Long, g: String): Int = {
      val w = g match { case "a" => 2.5; case "b" => 0.25; case _ => 1.0 }
      val cutoff = math.round((w - math.floor(w)) * 4294967296.0)
      math.floor(w).toInt + (if (rank(id) < cutoff) 1 else 0)
    }
    val expected = rows.flatMap { case (id, g) =>
      val n = copies(id, g)
      (0 until n).map(e => (id, g, n, e))
    }.toSet
    assert(out === expected)
    // expected multiplicity sanity: group a averages ~2.5 copies
    val aCopies = out.toSeq.filter(_._2 == "a").size.toDouble /
      rows.count(_._2 == "a")
    assert(aCopies > 2.2 && aCopies < 2.8)
  }

  test("upsampleMixture guards: duplicate groups and bad weights raise") {
    val df = Seq((1L, "a")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Curation.upsampleMixture(df, "grp", "id", Seq("a" -> 1.0, "a" -> 2.0))
    }
    intercept[IllegalArgumentException] {
      Curation.upsampleMixture(df, "grp", "id", Seq("a" -> -0.5))
    }
  }

  test("topNgrams ≡ driver replay (counts, threshold, tie order)") {
    val docs = Seq(
      "alpha beta gamma alpha beta gamma",
      "alpha beta gamma delta",
      "beta gamma delta epsilon",
      "zeta eta theta",
      "zeta eta theta",
      "one two").toSeq.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = Curation.topNgrams(docs.toDF("doc_id", "text"), "text",
        n = 3, k = 5, minCount = 2)
      .as[(String, Long)].collect().toSeq
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split(" ")
        .filter(_.nonEmpty).toSeq
    val counts = docs.flatMap { case (_, t) =>
      toks(t).sliding(3).filter(_.size == 3).map(_.mkString(" "))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = counts.toSeq.filter(_._2 >= 2L)
      .sortBy { case (g, c) => (-c, g) }.take(5)
    assert(out === expected)
  }

  test("topNgrams plans as TakeOrderedAndProject (bounded top-k, no full sort)") {
    val df = Curation.topNgrams(
      Seq((1L, "a b c a b c")).toDF("doc_id", "text"), "text", 2, 3)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }
}
