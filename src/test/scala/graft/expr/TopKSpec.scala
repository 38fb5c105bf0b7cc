package graft.expr

import graft.SparkTestBase
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** TopKByScore: the bounded per-group top-k aggregate that replaces the
  * per-query-reducer window in the ANN paths (round-2 scale fix).
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic scores with ties: score = (i*7) % 5, id = i
  private def scored(n: Int) =
    (0 until n).map(i => ((i % 3).toLong, ((i * 7) % 5).toDouble, i.toLong))
      .toDF("query_id", "cosine", "id")
      .repartition(8) // force multi-partition partial buffers + merge path

  test("topk_by_score ≡ window row_number baseline (ties broken by id)") {
    import org.apache.spark.sql.expressions.Window
    val df = scored(500)
    val viaAgg = df.groupBy($"query_id")
      .agg(TopKByScore.topk_by_score($"cosine", $"id", 7).as("topk"))
      .select($"query_id", posexplode($"topk").as(Seq("pos", "e")))
      .select($"query_id", $"e.id".as("id"), $"e.score".as("cosine"),
        ($"pos" + 1).cast("int").as("rank"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"id")
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= 7).select("query_id", "id", "cosine", "rank")
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("fewer rows than k returns all, sorted best-first") {
    val out = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.5, 9L))
      .toDF("query_id", "cosine", "id")
      .groupBy($"query_id")
      .agg(TopKByScore.topk_by_score($"cosine", $"id", 10).as("topk"))
      .select(explode($"topk").as("e"))
      .select($"e.id", $"e.score").as[(Long, Double)].collect().toSeq
    assert(out === Seq((11L, 0.9), (9L, 0.5), (10L, 0.5)))
  }

  test("null scores/ids are skipped") {
    val df = Seq((1L, Some(0.5), Some(10L)), (1L, None, Some(11L)),
      (1L, Some(0.9), None)).toDF("query_id", "cosine", "id")
    val out = df.groupBy($"query_id")
      .agg(TopKByScore.topk_by_score($"cosine", $"id", 5).as("topk"))
      .select(size($"topk")).as[Int].head()
    assert(out === 1)
  }

  test("property: agg ≡ window for generated scores with ties and signed zeros") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val scoreGen = Gen.oneOf(
      Gen.chooseNum(-5.0, 5.0),
      Gen.oneOf(0.0, -0.0, 1.0, -1.0)) // force ties and signed zeros
    val caseGen = Gen.zip(
      Gen.listOfN(120, Gen.zip(Gen.chooseNum(0L, 3L), scoreGen)),
      Gen.chooseNum(1, 9))
    (0 until 12).foreach { i =>
      val (rows, k) = caseGen(Gen.Parameters.default, Seed(42L + i)).get
      val df = rows.zipWithIndex
        .map { case ((q, s), j) => (q, s, j.toLong) }
        .toDF("query_id", "cosine", "id").repartition(5)
      val viaAgg = df.groupBy($"query_id")
        .agg(TopKByScore.topk_by_score($"cosine", $"id", k).as("topk"))
        .select($"query_id", explode($"topk").as("e"))
        .select($"query_id", $"e.id".as("id"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"id")
      val viaWindow = df.withColumn("rank", row_number().over(w))
        .where($"rank" <= k).select("query_id", "id")
      assert(viaAgg.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(viaAgg).isEmpty, s"case $i (k=$k)")
    }
  }

  test("NaN scores: totally ordered like Spark SQL (NaN greatest), id ties deterministic") {
    import org.apache.spark.sql.expressions.Window
    // multiple NaN-scored rows straddling the k boundary: retention must
    // fall through to the id tie-break (round-2 worse() returned false in
    // both directions on NaN → encounter-order-dependent retained set)
    val rows = Seq((1L, Double.NaN, 5L), (1L, Double.NaN, 3L),
      (1L, 0.8, 1L), (1L, 0.9, 2L), (1L, Double.NaN, 7L))
    // run under several partitionings = several encounter/merge orders
    Seq(1, 3, 6).foreach { parts =>
      val df = rows.toDF("query_id", "cosine", "id").repartition(parts)
      val viaAgg = df.groupBy($"query_id")
        .agg(TopKByScore.topk_by_score($"cosine", $"id", 4).as("topk"))
        .select($"query_id", posexplode($"topk").as(Seq("pos", "e")))
        .select($"query_id", $"e.id".as("id"), ($"pos" + 1).as("rank"))
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
      // Spark SQL double ordering: NaN > everything → the three NaN rows
      // first (id tie-break 3 < 5 < 7), then 0.9; 0.8 falls off at k=4
      assert(viaAgg === Seq((1L, 3L, 1L), (1L, 5L, 2L), (1L, 7L, 3L),
        (1L, 2L, 4L)), s"parts=$parts")
      val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"id")
      val viaWindow = df.withColumn("rank", row_number().over(w))
        .where($"rank" <= 4).select($"query_id", $"id", $"rank".cast("long"))
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
      assert(viaAgg === viaWindow, s"window parity, parts=$parts")
    }
  }

  test("ANN plans: no Window, no single-partition exchange on candidates") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val topk = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      emb.where($"vec_id" < 3), "vec_id", "embedding", k = 5)
    topk.count()
    val plan = topk.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("SinglePartition"), plan.take(3000))
    // the only exchange hashes on query_id (tiny partial buffers)
    assert(plan.contains("hashpartitioning(query_id"), plan.take(3000))
  }
}
