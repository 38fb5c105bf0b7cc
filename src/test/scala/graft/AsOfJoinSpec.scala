package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // left: events per key; right: snapshots per key
  private lazy val left = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")), // before any snapshot
    (2L, "a", ts("2024-01-01 11:00:00")), // == snapshot v1 (inclusive)
    (3L, "a", ts("2024-01-01 11:30:00")), // between v1 and v2
    (4L, "a", ts("2024-01-01 12:00:00")), // == v2
    (5L, "a", ts("2024-01-01 23:00:00")), // after everything
    (6L, "b", ts("2024-01-01 11:00:00")), // key with one earlier snapshot
    (7L, "c", ts("2024-01-01 11:00:00"))  // key with no snapshots at all
  ).toDF("event_id", "key", "t")

  private lazy val right = Seq(
    ("a", ts("2024-01-01 11:00:00"), "v1", 1.0),
    ("a", ts("2024-01-01 12:00:00"), "v2", 2.0),
    ("b", ts("2024-01-01 10:00:00"), "w1", 7.0)
  ).toDF("key", "rt", "ver", "x")

  private val expected = Map(
    1L -> null, 2L -> "v1", 3L -> "v1", 4L -> "v2", 5L -> "v2",
    6L -> "w1", 7L -> null)

  test("asofUnion: inclusive backward match, no-snapshot nulls") {
    val out = AsOfJoin.asofUnion(left, right, Seq("key"), "t", "rt",
      Seq("ver", "x"))
    assert(out.columns.toSeq === Seq("event_id", "key", "t", "ver", "x"))
    val got = out.select($"event_id", $"ver").as[(Long, String)]
      .collect().toMap
    assert(got === expected)
  }

  test("asofBroadcast ≡ asofUnion on the hand-built corpus") {
    val u = AsOfJoin.asofUnion(left, right, Seq("key"), "t", "rt",
      Seq("ver", "x")).orderBy("event_id").collect().toSeq
    val b = AsOfJoin.asofBroadcast(left, right, Seq("key"), "t", "rt",
      Seq("ver", "x")).orderBy("event_id").collect().toSeq
    assert(u === b)
  }

  test("asofBroadcast ≡ asofUnion on sf0.001 events (clicks as snapshots)") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val clicks = events.where($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("click_id"))
    val l = events.select($"event_id", $"user_id", $"ts")
    val u = AsOfJoin.asofUnion(l, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_id")).orderBy("event_id").collect().toSeq
    val b = AsOfJoin.asofBroadcast(l, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_id")).orderBy("event_id").collect().toSeq
    assert(u === b)
    assert(u.nonEmpty)
    // and matched rows exist alongside unmatched ones
    assert(u.exists(r => !r.isNullAt(3)))
  }

  test("a null payload FIELD is still a match (struct carries the row)") {
    val r = Seq(("a", ts("2024-01-01 11:00:00"), null.asInstanceOf[String]))
      .toDF("key", "rt", "ver")
    val out = AsOfJoin.asofUnion(
      Seq((1L, "a", ts("2024-01-01 12:00:00"))).toDF("event_id", "key", "t"),
      r, Seq("key"), "t", "rt", Seq("ver"))
    // the snapshot exists (matched), its payload field is null
    val row = out.head()
    assert(row.getLong(0) === 1L && row.isNullAt(3))
    val outB = AsOfJoin.asofBroadcast(
      Seq((1L, "a", ts("2024-01-01 12:00:00"))).toDF("event_id", "key", "t"),
      r, Seq("key"), "t", "rt", Seq("ver"))
    assert(outB.head().isNullAt(3))
  }

  test("duplicate snapshot instants raise on both strategies") {
    val dup = Seq(
      ("a", ts("2024-01-01 11:00:00"), "v1", 1.0),
      ("a", ts("2024-01-01 11:00:00"), "v1b", 1.5)
    ).toDF("key", "rt", "ver", "x")
    val eU = intercept[Exception] {
      AsOfJoin.asofUnion(left, dup, Seq("key"), "t", "rt", Seq("ver", "x"))
        .collect()
    }
    assert(eU.getMessage.contains("duplicate snapshot"))
    val eB = intercept[Exception] {
      AsOfJoin.asofBroadcast(left, dup, Seq("key"), "t", "rt", Seq("ver", "x"))
        .collect()
    }
    assert(eB.getMessage.contains("duplicate snapshot"))
  }

  test("staleness bound: rightTime as payload + post-filter (TOLERANCE)") {
    // events 2h after the last snapshot should reject the stale match
    val u = AsOfJoin.asofUnion(left, right, Seq("key"), "t", "rt",
        Seq("rt", "ver"))
      .withColumn("fresh_ver",
        when(unix_micros($"t") - unix_micros($"rt") <= 3600L * 1000000L,
          $"ver"))
      .select($"event_id", $"fresh_ver").as[(Long, String)].collect().toMap
    // event 5 (23:00) matched v2 (12:00) but it is 11h stale → null;
    // events 2/3/4/6 are within an hour of their snapshot
    assert(u(5L) === null)
    assert(u(2L) === "v1" && u(3L) === "v1" && u(4L) === "v2")
    val b = AsOfJoin.asofBroadcast(left, right, Seq("key"), "t", "rt",
        Seq("rt", "ver"))
      .withColumn("fresh_ver",
        when(unix_micros($"t") - unix_micros($"rt") <= 3600L * 1000000L,
          $"ver"))
      .select($"event_id", $"fresh_ver").as[(Long, String)].collect().toMap
    assert(b === u)
  }

  test("a NULL snapshot instant raises on both strategies") {
    val nullRt = Seq(
      ("a", null.asInstanceOf[Timestamp], "v0", 0.0),
      ("a", ts("2024-01-01 11:00:00"), "v1", 1.0)
    ).toDF("key", "rt", "ver", "x")
    val eU = intercept[Exception] {
      AsOfJoin.asofUnion(left, nullRt, Seq("key"), "t", "rt", Seq("ver", "x"))
        .collect()
    }
    assert(eU.getMessage.contains("NULL snapshot instant"))
    val eB = intercept[Exception] {
      AsOfJoin.asofBroadcast(left, nullRt, Seq("key"), "t", "rt",
        Seq("ver", "x")).collect()
    }
    assert(eB.getMessage.contains("NULL snapshot instant"))
  }

  test("asofBroadcast enriches a STREAM: micro-batched ≡ batch") {
    // the broadcast strategy is stateless per row, so it drops straight
    // into a streaming pipeline (the slowly-changing-dim enrich at ingest)
    val inputDir = tmpDir("asof-in")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val left = events.select($"event_id", $"user_id", $"ts")
    left.repartition(4).write.mode("overwrite").parquet(inputDir)
    val clicks = events.where($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
    val stream = spark.readStream.schema(left.schema)
      .option("maxFilesPerTrigger", 1).parquet(inputDir)
    val q = AsOfJoin.asofBroadcast(stream, clicks, Seq("user_id"),
        "ts", "ts", Seq("click_id"))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("asof_stream").orderBy("event_id")
      .collect().toSeq
    val batch = AsOfJoin.asofBroadcast(left, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_id")).orderBy("event_id").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("asofBroadcast plan: BroadcastHashJoin, no fact-side exchange") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val clicks = events.where($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
    val out = AsOfJoin.asofBroadcast(
      events.select($"event_id", $"user_id", $"ts"), clicks,
      Seq("user_id"), "ts", "ts", Seq("click_id"))
    out.count() // materialize the AQE final plan
    val finalPlan = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val bhj = finalPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, finalPlan.toString.take(4000))
    // the probe (fact) subtree reaches the join without any shuffle — the
    // only exchange in the plan is the small build side's aggregation
    val probe = bhj.head.left.toString
    assert(!probe.contains("Exchange hashpartitioning") &&
      !probe.contains("ShuffleQueryStage"), s"fact side shuffled:\n$probe")
  }

  test("argument guards: internal-name collisions and duplicate payload names raise") {
    import spark.implicits._
    val l = Seq((1L, "k", 10L)).toDF("event_id", "key", "t")
    val r = Seq(("k", 5L, "v1")).toDF("key", "rt", "ver")
    // a left column named like the internal plumbing → clear require, not
    // an AMBIGUOUS_REFERENCE analysis failure mid-plan
    val lBad = l.withColumn("_asof", lit(1))
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asofUnion(lBad, r, Seq("key"), "t", "rt", Seq("ver"))
    }
    assert(e1.getMessage.contains("internal column names"))
    val e1b = intercept[IllegalArgumentException] {
      AsOfJoin.asofBroadcast(lBad, r, Seq("key"), "t", "rt", Seq("ver"))
    }
    assert(e1b.getMessage.contains("internal column names"))
    // a payload column that duplicates a left column would emit a
    // silently-duplicated output name
    val rT = Seq(("k", 5L, "v1")).toDF("key", "rt", "t")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofUnion(l, rT, Seq("key"), "t", "rt", Seq("t"))
    }
    assert(e2.getMessage.contains("duplicate left columns"))
    val e2b = intercept[IllegalArgumentException] {
      AsOfJoin.asofBroadcast(l, rT, Seq("key"), "t", "rt", Seq("t"))
    }
    assert(e2b.getMessage.contains("duplicate left columns"))
  }
}
