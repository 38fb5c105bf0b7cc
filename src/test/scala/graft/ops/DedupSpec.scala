package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river shore"), // near dup of 0
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "spark query engines shuffle data between executors for aggregation"),
    (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK") // case dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps first id per key") {
    val kept = Dedup.exactKeep(docs, "doc_id", Seq("text"))
    assert(kept.count() === 5) // only 0/1 identical byte-for-byte
    assert(!kept.select("doc_id").as[Long].collect().contains(1L))
    val groups = Dedup.exact(docs, "doc_id", Seq("text"))
    assert(groups.where(col("n_dupes") === 2).count() === 1)
  }

  test("word shingles") {
    val sh = docs.where($"doc_id" === 0)
      .select(Dedup.wordShingles($"text", 3).as("sh"))
      .head().getSeq[String](0)
    assert(sh.contains("the quick brown"))
    assert(sh.forall(_.split(" ").length == 3))
  }

  test("minhash LSH finds exact+case+near dups, not unrelated docs") {
    val dups = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((0L, 1L)), s"exact dup must collide: $dups")
    assert(dups.contains((0L, 5L)), s"case-only dup must collide: $dups")
    assert(dups.contains((0L, 2L)), s"one-word-change near dup: $dups")
    assert(!dups.exists { case (a, b) => Set(a, b).intersect(Set(3L, 4L)).nonEmpty &&
      Set(a, b).intersect(Set(0L, 1L, 2L, 5L)).nonEmpty },
      s"unrelated docs must not pair with fox docs: $dups")
  }

  test("minhash jaccard estimate tracks exact jaccard") {
    val cands = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.0)
    val bad = cands.where(abs(col("jaccard_est") - col("jaccard")) > 0.35).count()
    assert(bad === 0)
  }

  test("simhash: identical→0 distance, near→small, far→large") {
    val sigs = docs.select($"doc_id", Dedup.simhash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs(0L) === sigs(5L)) // lowercased
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(2L)) < ham(sigs(0L), sigs(3L)))
    val nd = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((0L, 1L)) && nd.contains((0L, 5L)))
  }

  test("ngram jaccard all-pairs matches LSH-verified jaccard on hits") {
    val ap = Dedup.ngramJaccardAllPairs(docs, "doc_id", "text", 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH may miss pairs (probabilistic) but must never invent pairs
    assert(lsh.subsetOf(ap))
    assert(ap.contains((0L, 2L)))
  }

  test("embedding cosine near-dups via hyperplane LSH") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f, 0.0f)),  // ~same direction as 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),     // orthogonal
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))     // opposite
    ).toDF("vec_id", "embedding")
    val nd = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      threshold = 0.99, planes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd === Set((0L, 1L)))
  }

  test("simhash expression ≡ HOF formula, bit-identical (incl. edge cases)") {
    // the q_simhash_* oracles recompute signatures in SQL from the dumped
    // word-hash dictionary — the codegen'd expression must not move the
    // hash family by a single bit vs the HOF cross-check it replaced
    val docs = Seq(
      "The quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",   // case-folded twin
      "completely different content here",
      "",                                               // empty → [""] word
      "   ",                                            // ws-only → empty segments
      " leading and trailing ",                         // leading/trailing empties
      "tabs\tand\nnewlines\rmixedwhitespace",     // ws-byte zoo: tab, LF, CR, VT
      "ÜNICODE Mixed Ça va ÅÄÖ",                        // multi-byte lowercase
      "repeat repeat repeat repeat repeat word"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = docs.select(
      Dedup.simhash($"text").as("expr"),
      Dedup.simhashHof($"text").as("hof"))
    assert(both.where($"expr" =!= $"hof").count() === 0L)
    // case-folded twin hashes identically; different content differs
    val sigs = docs.select($"doc_id", Dedup.simhash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs(0L) !== sigs(2L))
  }

  test("paragraphDedup: keep-first across docs, original order, empty " +
    "segments filtered, all-dup and empty docs covered") {
    val corpus = Seq(
      (0L, "alpha beta\n\nshared boilerplate\n\ngamma delta"),
      (1L, "shared boilerplate\n\nunique to one\n\n\n\n  \n\nshared boilerplate"),
      (2L, "shared boilerplate"), // every paragraph is owned elsewhere
      (3L, "")                    // no paragraphs at all
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(corpus, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // doc 0 owns everything it contains (smallest id)
    assert(got(0) === ((0L, 3L, 3L,
      "alpha beta\n\nshared boilerplate\n\ngamma delta")))
    // doc 1: "shared boilerplate" owned by doc 0 — BOTH its copies drop
    // (the whitespace-only segment never counts as a paragraph)
    assert(got(1) === ((1L, 3L, 1L, "unique to one")))
    assert(got(2) === ((2L, 1L, 0L, "")))
    assert(got(3) === ((3L, 0L, 0L, "")))
  }

  test("paragraphDedup ≡ string-keyed driver replay on generated chunks; " +
    "partitioning-invariant") {
    // 3-word chunks over the real docs table → genuine cross-doc paragraph
    // collisions (the q_paragraph_dedup construction)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunked = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().map { case (id, t) =>
        (id, t.split(" ").filter(_.nonEmpty).grouped(3)
          .map(_.mkString(" ")).mkString("\n\n"))
      }
    // independent plain-Scala replay keyed on the paragraph STRING
    val all = chunked.flatMap { case (id, t) =>
      t.split("\n{2,}").map(_.trim).filter(_.nonEmpty)
        .zipWithIndex.map { case (p, i) => (id, i, p) }
    }
    val owner = all.groupBy(_._3).map { case (p, rs) => p -> rs.map(_._1).min }
    val expected = chunked.map { case (id, _) =>
      val mine = all.filter(_._1 == id).sortBy(_._2)
      val kept = mine.filter(r => owner(r._3) == id)
      id -> ((id, mine.length.toLong, kept.length.toLong,
        kept.map(_._3).mkString("\n\n")))
    }.toMap
    val input = chunked.toSeq.toDF("doc_id", "text")
    def run(parts: Int) = Dedup.paragraphDedup(input.repartition(parts),
        "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().toSet
    val got = run(4)
    assert(got === run(1)) // partitioning invariance
    got.foreach { case r @ (id, _, _, _) =>
      assert(r === expected(id), s"doc $id")
    }
    // the construction must actually exercise dedup (collisions exist)
    assert(got.exists { case (_, np, nk, _) => nk < np },
      "chunk construction produced no cross-doc duplicates")
  }

  test("renderConv: turn order restored, partitioning-invariant") {
    val turns = Seq(
      ("c1", 2, "third part here"), ("c1", 0, "first part"),
      ("c1", 1, "second part"), ("c2", 0, "lonely turn")
    ).toDF("conv_id", "turn_idx", "text")
    def run(parts: Int) =
      Dedup.renderConv(turns.repartition(parts), "conv_id", "turn_idx",
        "text").as[(String, String)].collect().toMap
    val got = run(1)
    assert(got == Map("c1" -> "first part second part third part here",
      "c2" -> "lonely turn"))
    assert(run(5) == got)
  }

  test("corpusOverlap: exact Jaccard vs driver replay; corpus-min identity; " +
    "dup-invariance") {
    val a = docs.toDF("doc_id", "text")
    val b = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (11L, "entirely novel words that the first corpus never mentions at all"))
      .toDF("doc_id", "text")
    val row = Dedup.corpusOverlap(a, b, "text").head()
    // driver replay of the exact side over the same shingle definition
    def shingles(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
      df.select(Dedup.wordShingles(col("text"), 3).as("sh"))
        .as[Seq[String]].collect().flatten.map(s => Seq(s)).toSet
    val sa = shingles(a); val sb = shingles(b)
    val inter = (sa intersect sb).size.toLong
    val union = (sa union sb).size.toLong
    assert(row.getAs[Long]("n_a") == sa.size.toLong)
    assert(row.getAs[Long]("n_b") == sb.size.toLong)
    assert(row.getAs[Long]("n_inter") == inter)
    assert(row.getAs[Long]("n_union") == union)
    assert(row.getAs[Long]("jaccard_ppm") == 1000000L * inter / union)
    // corpus-min identity: corpusSigRows ≡ elementwise min over per-doc sigs
    val perDoc = a.select(Dedup.minhashSignature(
        Dedup.wordShingles(col("text"), 3), 64).as("sig"))
      .as[Seq[Long]].collect()
    val expected = (0 until 64).map(i => perDoc.map(_(i)).min)
    val got = Dedup.corpusSigRows(a, "text").orderBy("pos")
      .select("minv").as[Long].collect().toSeq
    assert(got == expected)
    // estimate sanity: identical corpora agree on every lane; disjoint ones
    // (near-)never do; and duplicating docs changes nothing (set semantics)
    val same = Dedup.corpusOverlap(a, a, "text").head()
    assert(same.getAs[Long]("est_agree") == 64L &&
      same.getAs[Long]("jaccard_ppm") == 1000000L)
    val dupped = Dedup.corpusOverlap(a.union(a), b, "text").head()
    assert(dupped.toSeq == row.toSeq)
  }

  test("convNearDups finds conversations that differ by one turn") {
    val base = (0 until 8).map(i => ("c-orig", i, s"turn number $i of the long conversation about topic"))
    val near = (0 until 8).map(i => ("c-near", i, s"turn number $i of the long conversation about topic")) :+
      (("c-near", 8, "one extra closing turn"))
    val other = (0 until 8).map(i => ("c-other", i, s"completely unrelated chatter item $i with different words entirely"))
    val turns = (base ++ near ++ other).toDF("conv_id", "turn_idx", "text")
    val pairs = Dedup.convNearDups(turns, "conv_id", "turn_idx", "text",
        threshold = 0.5)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(pairs.contains(("c-near", "c-orig")) ||
      pairs.contains(("c-orig", "c-near")))
    assert(!pairs.exists { case (a, b) => a == "c-other" || b == "c-other" })
  }
}
