package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-3 operators: generated adversarial inputs,
  * invariants checked against independent JVM (plain-Scala) oracles —
  * fixed seeds, no wall-clock randomness.
  */
class Round3PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("as-of join: union ≡ broadcast ≡ Scala oracle on generated corpora") {
    val keyGen = Gen.oneOf("k1", "k2", "k3", "k4")
    val tGen = Gen.choose(0L, 50L)
    val leftRows = samples(for { k <- keyGen; t <- tGen } yield (k, t), 200)
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    // unique (key, rt) per the documented contract
    val rightRows = samples(for { k <- keyGen; t <- tGen; v <- Gen.choose(0, 999) }
      yield (k, t, v), 120)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq.sortBy(r => (r._1, r._2))

    val left = leftRows.toDF("event_id", "key", "t")
    val right = rightRows.toDF("key", "rt", "v")

    // Scala oracle: latest rt <= t per key
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3)
    }.toMap

    val u = AsOfJoin.asofUnion(left, right, Seq("key"), "t", "rt", Seq("v"))
      .select($"event_id", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    val b = AsOfJoin.asofBroadcast(left, right, Seq("key"), "t", "rt", Seq("v"))
      .select($"event_id", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(u === expected)
    assert(b === expected)
  }

  test("range join ≡ naive filter oracle across random granules") {
    val pGen = Gen.choose(-100.0, 100.0)
    val pts = samples(pGen, 150).zipWithIndex
      .map { case (p, i) => (i.toLong, math.rint(p * 4) / 4) }
    val ivGen = for { lo <- pGen; w <- Gen.choose(0.0, 30.0) } yield (lo, lo + w)
    val ivs = samples(ivGen, 80).zipWithIndex
      .map { case ((lo, hi), i) =>
        (i.toLong, math.rint(lo * 4) / 4, math.rint(hi * 4) / 4) }

    val expected = (for {
      (pid, p) <- pts
      (iid, lo, hi) <- ivs
      if p >= lo && p <= hi
    } yield (pid, iid)).toSet

    val points = pts.toDF("p_id", "p")
    val intervals = ivs.toDF("i_id", "lo", "hi")
    for (granule <- Seq(0.25, 3.7, 50.0)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        granule).select($"p_id", $"i_id").as[(Long, Long)].collect().toSet
      assert(got === expected, s"granule=$granule")
    }
  }

  test("packGreedy ≡ Scala first-fit fold on generated token streams") {
    val rows = samples(Gen.choose(0L, 300L), 400).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }
    val budget = 256
    // Scala oracle per shard: the same fill recurrence
    val shardOf = rows.map { case (id, _) =>
      id -> java.lang.Math.floorMod(id * 2654435761L, 4294967296L) % 4 }.toMap
    val expected = rows.groupBy { case (id, _) => shardOf(id) }
      .flatMap { case (_, docs) =>
        var pack = 0L; var fill = 0L
        docs.sortBy(_._1).map { case (id, n) =>
          if (fill > 0 && n > 0 && fill + n > budget) { pack += 1; fill = 0 }
          val off = fill; fill += n
          id -> ((pack, off))
        }
      }
    val got = graft.ops.Packing.packGreedy(rows.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", budget, nShards = 4)
      .select($"doc_id", $"pack", $"pack_off")
      .as[(Long, Long, Long)].collect()
      .map { case (id, p, o) => id -> ((p, o)) }.toMap
    assert(got === expected)
  }

  test("dupSpans ≡ Scala n-gram oracle on a generated corpus") {
    // small vocabulary + long docs → real cross-doc 5-gram collisions
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val docs = samples(docGen, 60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val n = 5
    def grams(t: String): Seq[String] =
      t.split(" ").sliding(n).map(_.mkString(" ")).toSeq
    val byGram = docs.flatMap { case (id, t) => grams(t).map(_ -> id) }
      .groupBy(_._1).map { case (ngram, xs) => ngram -> xs.map(_._2).distinct.size }
    val expected = docs.map { case (id, t) =>
      val g = grams(t)
      val shared = g.count(byGram(_) >= 2)
      id -> ((g.size.toLong, shared.toLong))
    }.toMap
    val got = graft.ops.Curation.dupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = n)
      .select($"doc_id", $"n_windows", $"n_shared")
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, s) => id -> ((w, s)) }.toMap
    assert(got === expected)
  }
}
