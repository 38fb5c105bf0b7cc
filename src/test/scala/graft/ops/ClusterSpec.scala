package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Near-dup cluster resolution (round 2): pairs → connected components →
  * canonical keep-set, plus the hot-bucket guard on LSH candidate joins.
  */
class ClusterSpec extends SparkTestBase {
  import spark.implicits._

  test("connected components: chained pairs resolve transitively") {
    // A~B~C with A≁C (chain), plus an unrelated pair and a larger chain
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (10L, 11L), (11L, 12L),
      (12L, 13L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp(0L) === 0L && comp(1L) === 0L && comp(2L) === 0L)
    assert(comp(5L) === 5L && comp(6L) === 5L)
    assert(Seq(10L, 11L, 12L, 13L).map(comp) === Seq(10L, 10L, 10L, 10L))
  }

  test("large-star/small-star ≡ min-propagation on a random graph") {
    // deterministic pseudo-random sparse graph over 400 nodes
    val edges = (0 until 600).map { i =>
      val a = math.abs(i * 2654435761L) % 400
      val b = math.abs((i * 40503L + 7) * 2654435761L) % 400
      (a, b)
    }.filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(star === prop)
  }

  test("long chain: star algorithm converges in O(log n) rounds") {
    // a 300-node path — diameter 300; min-propagation would need ~300
    // full-data rounds (its maxIter guard trips), the star algorithm a
    // handful
    val chain = (0 until 299).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect().toMap
    assert(comp.size === 300)
    assert(comp.values.toSet === Set(0L))
  }

  test("clusters: singletons keep themselves; component keeps min id only") {
    val docs = Seq(0L, 1L, 2L, 3L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(docs, "doc_id", pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out === Set((0L, 0L, true), (1L, 1L, true), (2L, 1L, false),
      (3L, 1L, false), (7L, 7L, true)))
  }

  test("nearDupClusters: exact+case+near dups collapse to one keep") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river shore"),
      (3L, "completely different content about spark query engines and shuffles"),
      (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK")
    ).toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(docs, "doc_id", "text", threshold = 0.6)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, c, k) => id -> ((c, k)) }.toMap
    assert(out(0L) === ((0L, true)))
    assert(out(1L) === ((0L, false)) && out(2L) === ((0L, false)) &&
      out(5L) === ((0L, false)))
    assert(out(3L) === ((3L, true)))
  }

  test("incremental dedup: new batch vs stored index finds cross+intra pairs") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "completely different content about spark query engines and shuffles"),
      (9L, "a third unrelated document mentioning salted aggregation plans today")
    ).toDF("doc_id", "text")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text")
    val fresh = Seq(
      // near-dup of indexed doc 0, with SMALLER id (ordering regression guard)
      (1L, "the quick brown fox jumps over the lazy dog near the river shore"),
      // exact dup of indexed doc 9, larger id
      (12L, "a third unrelated document mentioning salted aggregation plans today"),
      // intra-batch exact pair
      (20L, "brand new boilerplate text repeated inside the incoming batch only"),
      (21L, "brand new boilerplate text repeated inside the incoming batch only")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupsAgainst(index, fresh, "doc_id", "text",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"cross pair with smaller new id: $pairs")
    assert(pairs.contains((9L, 12L)), s"cross exact pair: $pairs")
    assert(pairs.contains((20L, 21L)), s"intra-batch pair: $pairs")
    // no index-index pairs: doc 3 never pairs with 0/9
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }, s"$pairs")
  }

  test("incremental dedup: re-submitted id yields no duplicate pairs; new text wins") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "completely different content about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text")
    val fresh = Seq(
      // id 0 re-crawled with CHANGED text (now matches nothing)
      (0L, "entirely rewritten page with none of the original fox wording left"),
      // near-dup of the ORIGINAL indexed doc-0 text
      (7L, "the quick brown fox jumps over the lazy dog near the river shore")
    ).toDF("doc_id", "text")
    val rows = Dedup.minhashNearDupsAgainst(index, fresh, "doc_id", "text",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    // each surviving pair appears exactly once (the pre-fix union carried
    // id 0 twice and duplicated every pair touching it)
    assert(rows.size === rows.toSet.size, s"duplicate pairs: $rows")
    // the NEW doc-0 text is authoritative: it no longer matches doc 7
    assert(!rows.contains((0L, 7L)), s"stale index text resurfaced: $rows")
  }

  test("hot-bucket cap overflow surfaces in the obs dropped counter") {
    val metrics = new graft.ObsMetrics(spark)
    val listener = new graft.ObsQueryListener(metrics)
    spark.listenerManager.register(listener)
    try {
      val boiler = (0 until 100)
        .map(i => (i.toLong, "identical boilerplate text every single time here"))
        .toDF("doc_id", "text")
      Dedup.minhashCandidates(boiler, "doc_id", "text",
        bucketCap = 10, obsTag = Some("graft_lsh_cap")).count()
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark.sparkContext)
      // 100 ids per band bucket, cap 10 → 90 dropped per band × 16 bands
      assert(metrics.dropped("lsh_cap").value === 90L * 16)
      assert(metrics.accepted("lsh_cap").value === 100L * 16)
    } finally spark.listenerManager.unregister(listener)
  }

  test("simhash hot-bucket cap bounds a mass-identical corpus") {
    val boiler = (0 until 200)
      .map(i => (i.toLong, "identical boilerplate text every single time here"))
      .toDF("doc_id", "text")
    val nd = Dedup.simhashNearDups(boiler, "doc_id", "text",
      maxDist = 3, bucketCap = 30)
    assert(nd.count() === 435L) // C(30,2), not C(200,2) = 19,900
  }

  test("hot-bucket cap bounds candidate pairs on a degenerate corpus") {
    // 400 near-identical docs (mass-duplicated boilerplate): every band
    // bucket holds all 400 ids → uncapped would emit C(400,2) = 79,800
    // pairs; cap 50 bounds it to C(50,2) = 1,225.
    val boiler = (0 until 400)
      .map(i => (i.toLong, "legal disclaimer all rights reserved contact us at example dot com"))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashCandidates(boiler, "doc_id", "text",
      bucketCap = 50)
    val n = capped.count()
    assert(n === 1225L, s"expected C(50,2) candidates, got $n")
    // pairs among the retained ids are still found and verify at J=1.0
    val nd = Dedup.minhashNearDups(boiler, "doc_id", "text",
      threshold = 0.9, bucketCap = 50)
    assert(nd.count() === 1225L)
    assert(nd.where($"jaccard" < 1.0).count() === 0L)
  }

  test("exactKeep survives a massively-duplicated key with no window funnel") {
    // 20k rows, half of them byte-identical boilerplate — exactly the
    // population an exact-dedup pass exists for. The round-3 row_number
    // window would land all 10k copies on ONE task; the aggregate +
    // semi-join shape collapses the hot key map-side. Plan gate: no Window
    // operator anywhere in the executed plan.
    val docs = spark.range(0, 20000).select($"id".as("doc_id"),
      when($"id" % 2 === 0, lit("mass duplicated boilerplate"))
        .otherwise(concat(lit("unique "), $"id")).as("text"))
    val kept = Dedup.exactKeep(docs, "doc_id", Seq("text"))
    kept.count() // materialize the AQE final plan
    assert(kept.count() === 10001L) // 10k unique + 1 boilerplate survivor
    assert(kept.where($"text" === "mass duplicated boilerplate")
      .select("doc_id").as[Long].head() === 0L) // min id wins
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(3000))
    // semantics check vs the definition on a small frame: one survivor
    // per distinct key, the minimum id
    val small = Seq((5L, "a"), (3L, "a"), (9L, "b"), (1L, "a"))
      .toDF("doc_id", "text")
    val got = Dedup.exactKeep(small, "doc_id", Seq("text"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (9L, "b")))
  }

  test("clustersKeepBy: highest score wins, ties break to min id, " +
    "singletons keep; no per-component Window; ≡ clusters on min-id " +
    "score") {
    // cluster {0,1,2}: scores 5,9,9 → winner 1 (max score, tie → min id);
    // cluster {5,6}: winner 6 (higher score beats lower id);
    // singleton 8 keeps itself
    val docs = Seq((0L, 5L), (1L, 9L), (2L, 9L), (5L, 1L), (6L, 7L),
      (8L, 0L)).toDF("doc_id", "score")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val m = Dedup.clustersKeepBy(docs, "doc_id", "score", pairs)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(m.collect { case (id, (_, true)) => id }.toSet == Set(1L, 6L, 8L))
    assert(m(0L)._1 == m(1L)._1 && m(1L)._1 == m(2L)._1)
    // degenerate hot cluster: 20k members, one component — no Window op
    val big = spark.range(0, 20000).select($"id".as("doc_id"),
      ($"id" % 100).as("score"))
    val chain = spark.range(0, 19999).select($"id".as("id_a"),
      ($"id" + 1).as("id_b"))
    val kb = Dedup.clustersKeepBy(big, "doc_id", "score", chain)
    kb.count()
    val plan = kb.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(3000))
    // winner = max score 99, tie → min id = 99
    assert(kb.where($"keep").select("doc_id").as[Long].collect().toSeq
      == Seq(99L))
    // with the id itself negated as score, keepBy(min-id) ≡ clusters
    val viaKeepBy = Dedup.clustersKeepBy(
      docs.withColumn("negid", -$"doc_id"), "doc_id", "negid", pairs)
      .select("doc_id", "comp", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    val viaClusters = Dedup.clusters(docs, "doc_id", pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(viaKeepBy == viaClusters)
  }

  test("ccUpdate ≡ full recompute on randomly grown pair streams") {
    // grow a graph in 4 batches; after each, the incrementally-maintained
    // assignment must equal connectedComponentsStar over ALL pairs so far.
    // The stream includes merges of previously-separate components, edges
    // inside an existing component (no-ops), and brand-new ids.
    def batch(seed: Int, n: Int): Seq[(Long, Long)] =
      (0 until n).map { i =>
        val a = math.abs((seed * 7919L + i) * 2654435761L) % 120
        val b = math.abs((seed * 104729L + i * 31 + 3) * 2654435761L) % 120
        (a, b)
      }.filter { case (a, b) => a != b }
    var seen = Seq.empty[(Long, Long)]
    var labels = Dedup.connectedComponentsStar(
      batch(1, 40).toDF("id_a", "id_b"))
    seen = batch(1, 40)
    (2 to 5).foreach { s =>
      val nb = batch(s, 30)
      labels = Dedup.ccUpdate(labels, nb.toDF("id_a", "id_b"))
      seen = seen ++ nb
      val full = Dedup.connectedComponentsStar(seen.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      val inc = labels.as[(Long, Long)].collect().toMap
      assert(inc === full, s"divergence after batch $s")
    }
    // empty new batch: assignment passes through unchanged
    val same = Dedup.ccUpdate(labels,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(same === labels.as[(Long, Long)].collect().toMap)
  }
}
