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

  test("tokenQuotaSample ≡ naive prefix-sum replay; invariant across bucketBits") {
    val ids = (0L until 120L).toSeq
    def grp(i: Long): String = if (i % 4 == 0) "big" else s"g${i % 3}"
    def tok(i: Long): Long = if (i % 11 == 0) 0L else 7L
    val df = ids.map(i => (i, grp(i), tok(i))).toDF("id", "grp", "tok")
    val budget = 70L
    val expected = ids.groupBy(grp).flatMap { case (_, gids) =>
      val ordered = gids.sortBy(i => (rank(i), i))
      val priors = ordered.scanLeft(0L)((acc, i) => acc + tok(i)).init
      ordered.zip(priors).filter(_._2 < budget).map(_._1)
    }.toSet
    // the bucketed decomposition must be invariant in its granularity —
    // at 16 buckets the boundary-refinement branch is heavily exercised
    for (bits <- Seq(4, 12)) {
      val out = Curation.tokenQuotaSample(df, "grp", "id", "tok",
        budget, bits).select("id").as[Long].collect().toSet
      assert(out === expected, s"bucketBits=$bits")
    }
    assert(expected.size < ids.size) // the budget actually bites
  }

  test("tokenQuotaSample: zero-token doc landing exactly AT the budget drops") {
    val a = 1L; val b = 2L
    val (first, second) =
      if (Ordering[(Long, Long)].lt((rank(a), a), (rank(b), b))) (a, b)
      else (b, a)
    val df = Seq((first, "x", 50L), (second, "x", 0L))
      .toDF("id", "grp", "tok")
    val out = Curation.tokenQuotaSample(df, "grp", "id", "tok", 50L)
      .select("id").as[Long].collect().toSet
    assert(out === Set(first))
  }

  test("tokenQuotaSample: NULL group is one partition, not dropped") {
    val df = Seq((1L, Option("x"), 10L), (2L, Option.empty[String], 10L),
      (3L, Option.empty[String], 10L)).toDF("id", "grp", "tok")
    val out = Curation.tokenQuotaSample(df, "grp", "id", "tok", 10L)
      .select("id").as[Long].collect().toSet
    val nullFirst =
      if (Ordering[(Long, Long)].lt((rank(2L), 2L), (rank(3L), 3L))) 2L
      else 3L
    // "x" keeps its only doc (prior 0); the NULL group keeps exactly its
    // rank-first doc (the second has prior 10, not < budget)
    assert(out === Set(1L, nullFirst))
  }

  test("tokenQuotaSample guards: non-positive budget and negative tokens") {
    val df = Seq((1L, "x", -3L)).toDF("id", "grp", "tok")
    intercept[IllegalArgumentException] {
      Curation.tokenQuotaSample(df, "grp", "id", "tok", 0L)
    }
    intercept[Exception] {
      Curation.tokenQuotaSample(df, "grp", "id", "tok", 10L).count()
    }
  }

  test("topNgrams plans as TakeOrderedAndProject (bounded top-k, no full sort)") {
    val df = Curation.topNgrams(
      Seq((1L, "a b c a b c")).toDF("doc_id", "text"), "text", 2, 3)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }
}
