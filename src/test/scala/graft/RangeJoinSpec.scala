package graft

import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5.0), (2L, 10.0), (3L, 15.0), (4L, 25.0), (5L, -3.0),
    (6L, Double.NaN)
  ).toDF("p_id", "p")

  private lazy val intervals = Seq(
    (10L, 0.0, 10.0),   // matches 5.0, 10.0 (inclusive end), -3.0? no
    (11L, 10.0, 20.0),  // matches 10.0 (inclusive start), 15.0
    (12L, -5.0, -1.0),  // matches -3.0
    (13L, 30.0, 40.0)   // matches nothing
  ).toDF("i_id", "lo", "hi")

  private def naive = points.crossJoin(intervals)
    .where($"p" >= $"lo" && $"p" <= $"hi")
    .select($"p_id", $"i_id").orderBy("p_id", "i_id")

  test("inclusive containment, boundary points, negatives") {
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
      granule = 4.0)
      .select($"p_id", $"i_id").orderBy("p_id", "i_id")
    assert(got.collect().toSeq === naive.collect().toSeq)
    val pairs = got.as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (5L, 12L)))
  }

  test("result is granule-independent") {
    val a = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 0.7)
      .select($"p_id", $"i_id").orderBy("p_id", "i_id").collect().toSeq
    val b = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 100.0)
      .select($"p_id", $"i_id").orderBy("p_id", "i_id").collect().toSeq
    assert(a === b)
  }

  test("keyed variant joins only within the key") {
    val p = Seq(("u1", 5.0, 1L), ("u2", 5.0, 2L)).toDF("user", "p", "p_id")
    val iv = Seq(("u1", 0.0, 10.0, 10L)).toDF("user", "lo", "hi", "i_id")
    val got = RangeJoin.pointInInterval(p, "p", iv, "lo", "hi", 5.0,
      keyCols = Seq("user"))
      .select($"p_id", $"i_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("inverted interval fails fast; column collision rejected") {
    val bad = Seq((1L, 10.0, 5.0)).toDF("i_id", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", bad, "lo", "hi", 1.0).collect()
    }
    assert(e.getMessage.contains("end < start"))
    val clash = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p",
        intervals.withColumnRenamed("i_id", "p"), "lo", "hi", 1.0)
    }
    assert(clash.getMessage.contains("collision"))
    // symmetric: a points-side column named like an interval bound
    val clash2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("lo", lit(0.0)), "p",
        intervals, "lo", "hi", 1.0)
    }
    assert(clash2.getMessage.contains("collision"))
    val reserved = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("_g", lit(1L)), "p",
        intervals, "lo", "hi", 1.0)
    }
    assert(reserved.getMessage.contains("reserved"))
  }

  test("non-finite interval bounds fail fast instead of losing matches") {
    for (badHi <- Seq(Double.NaN, Double.PositiveInfinity)) {
      val iv = Seq((1L, 0.0, badHi)).toDF("i_id", "lo", "hi")
      val e = intercept[Exception] {
        RangeJoin.pointInInterval(points, "p", iv, "lo", "hi", 1.0).collect()
      }
      assert(e.getMessage.contains("not finite"), s"hi=$badHi: ${e.getMessage}")
    }
    // non-finite POINTS are fine and match nothing, like the naive join
    val weird = Seq((7L, Double.PositiveInfinity), (8L, Double.NaN))
      .toDF("p_id", "p")
    val got = RangeJoin.pointInInterval(weird, "p", intervals, "lo", "hi", 1.0)
    assert(got.isEmpty)
  }

  test("intervalOverlap ≡ naive filter; each pair exactly once") {
    val a = Seq(
      (1L, 0.0, 10.0), (2L, 5.0, 6.0), (3L, 20.0, 30.0), (4L, -8.0, -7.0)
    ).toDF("a_id", "as", "ae")
    val b = Seq(
      (10L, 9.0, 25.0),  // overlaps 1 (at 9-10), 3 (20-25)
      (11L, 5.5, 5.9),   // inside 1 and 2
      (12L, 30.0, 31.0), // touches 3 at the closed endpoint 30
      (13L, -100.0, -50.0)
    ).toDF("b_id", "bs", "be")
    val naive = a.crossJoin(b)
      .where($"as" <= $"be" && $"bs" <= $"ae")
      .select($"a_id", $"b_id").orderBy("a_id", "b_id").collect().toSeq
    for (granule <- Seq(0.5, 7.0, 1000.0)) {
      val got = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", granule)
        .select($"a_id", $"b_id").orderBy("a_id", "b_id").collect().toSeq
      assert(got === naive, s"granule=$granule")
      // exactly once: no duplicates even when pairs share many granules
      assert(got.distinct === got, s"granule=$granule")
    }
    assert(naive.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, 10L), (3L, 12L)))
  }

  test("intervalOverlap: keyed variant and fail-fast guards") {
    val a = Seq(("u1", 0.0, 10.0, 1L), ("u2", 0.0, 10.0, 2L))
      .toDF("user", "as", "ae", "a_id")
    val b = Seq(("u1", 5.0, 6.0, 10L)).toDF("user", "bs", "be", "b_id")
    val keyed = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", 5.0,
        keyCols = Seq("user"))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(keyed === Set((1L, 10L)))
    // inverted and non-finite bounds raise on either side
    val inverted = Seq((1L, 10.0, 5.0)).toDF("b_id", "bs", "be")
    val e1 = intercept[Exception] {
      RangeJoin.intervalOverlap(
        Seq((1L, 0.0, 10.0)).toDF("a_id", "as", "ae"),
        "as", "ae", inverted, "bs", "be", 1.0).collect()
    }
    assert(e1.getMessage.contains("end < start"))
    val nan = Seq((1L, 0.0, Double.NaN)).toDF("a_id", "as", "ae")
    val e2 = intercept[Exception] {
      RangeJoin.intervalOverlap(nan, "as", "ae",
        Seq((1L, 0.0, 10.0)).toDF("b_id", "bs", "be"),
        "bs", "be", 1.0).collect()
    }
    assert(e2.getMessage.contains("not finite"))
    // null bounds never match; collisions rejected
    val withNull = Seq((1L, Some(0.0), None: Option[Double]))
      .toDF("a_id", "as", "ae")
    assert(RangeJoin.intervalOverlap(withNull, "as", "ae",
      Seq((1L, 0.0, 10.0)).toDF("b_id", "bs", "be"),
      "bs", "be", 1.0).isEmpty)
    val clash = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(
        Seq((1L, 0.0, 1.0)).toDF("x", "as", "ae"), "as", "ae",
        Seq((2L, 0.0, 1.0)).toDF("x", "bs", "be"), "bs", "be", 1.0)
    }
    assert(clash.getMessage.contains("collision"))
  }

  test("plan: equi-join on the granule, no nested loop / cartesian") {
    val p = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .where($"o_orderkey" % 100 === 0)
      .select($"o_orderkey".as("p_key"), $"o_totalprice".as("price"))
    val iv = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .where($"o_orderkey" % 37 === 0)
      .select($"o_orderkey".as("i_key"), $"o_totalprice".as("lo"),
        ($"o_totalprice" + 5000.0).as("hi"))
    val q = RangeJoin.pointInInterval(p, "price", iv, "lo", "hi", 1000.0)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // and the naive cross-filter agrees
    val naiveBig = p.crossJoin(iv)
      .where($"price" >= $"lo" && $"price" <= $"hi")
      .select($"p_key", $"i_key").orderBy("p_key", "i_key").collect().toSeq
    val got = q.select($"p_key", $"i_key").orderBy("p_key", "i_key")
      .collect().toSeq
    assert(got === naiveBig)
    assert(got.nonEmpty)
  }
}
