package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (`array<float>`).
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set,
  *    score every row, per-query top-k via window. One pass over the corpus,
  *    no corpus shuffle; correct at any scale where queries are broadcastable.
  *  - [[lshTopK]]: scale path — deterministic random-hyperplane buckets
  *    (sign-bit LSH) computed narrowly per row; candidates are only rows in
  *    the query's bucket (+ optional multiprobe 1-bit neighbors), so the
  *    scored fraction is ~2^-planes (× (1+planes) with multiprobe).
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions —
  * codegen'd, no UDF.
  */
object Similarity {

  /** Full-double dot product. The element cast matters for correctness
    * evidence, not just precision: on `array<float>` inputs Spark would
    * compute each product in FLOAT (float*float→float) while the
    * accumulator is double, so scores would carry ~1e-8-relative product
    * rounding that a double-accumulating oracle (DuckDB
    * `list_cosine_similarity` on `DOUBLE[]`) cannot reproduce — round-6
    * values then straddle rounding boundaries and the driver's value-hash
    * compare fails (the round-2 q_ann_* red rows). With both operands cast
    * to `array<double>` both engines do double multiply + sequential double
    * accumulation; residual divergence is the ~1-ulp sqrt-form difference,
    * invisible at round-6.
    */
  def dot(a: Column, b: Column): Column =
    graft.expr.DotF64.dotF64(a.cast("array<double>"), b.cast("array<double>"))

  /** The original HOF formula, kept as the [[dot]] bit-parity cross-check
    * (SimilaritySpec) — see [[graft.expr.DotF64]] for why the hot paths
    * use the fused expression instead.
    */
  private[ops] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0d)).otherwise(dot(a, b) / d)
  }

  /** [[cosine]] with the norms hoisted: on a scored pair frame the naive
    * form recomputes `norm(v)` per (query, vector) PAIR — with q queries
    * that is q× redundant per corpus row (and q is 64 in the ANN bench).
    * Callers compute `_nv`/`_nq` ONCE per side before the join; the
    * arithmetic is the identical IEEE sequence (sqrt once, multiply,
    * divide), so scores stay bit-identical to [[cosine]].
    */
  private[ops] def cosinePre(v: Column, qv: Column,
                             nv: Column, nq: Column): Column = {
    val d = nv * nq
    when(d === 0, lit(0.0d)).otherwise(dot(v, qv) / d)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-1, 1) from xxhash64 — same on every executor/retry.
    */
  private def planeComponent(plane: Column, dim: Column, seed: Long): Column =
    (pmod(xxhash64(plane, dim, lit(seed)), lit(2000000L)).cast("double") / 1000000.0) - 1.0

  /** Sign-bit LSH bucket id from `planes` hyperplanes — the codegen'd
    * [[graft.expr.HyperplaneBucketExpr]] kernel (plane components cached
    * once per kernel instead of two xxhash64 evaluations per element ×
    * plane × ROW on the interpreted HOF path);
    * [[hyperplaneBucketHof]] is the bit-parity cross-check.
    */
  def hyperplaneBucket(v: Column, planes: Int, seed: Long = 7L): Column =
    graft.expr.HyperplaneBucketExpr.hyperplane_bucket(v, planes, seed)

  /** The round-3 HOF formula — [[hyperplaneBucket]]'s AnnKernelSpec
    * cross-check.
    */
  private[ops] def hyperplaneBucketHof(v: Column, planes: Int,
                                       seed: Long = 7L): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, i) => x * planeComponent(p, i, seed)),
          lit(0.0d), (acc, x) => acc + x)
        when(proj >= 0, call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(lit(0L))
      }),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** Per-query top-k over a scored candidate frame
    * (query_id, id, cosine, …) → (query_id, id, cosine, rank).
    *
    * Uses the bounded [[graft.expr.TopKByScore]] aggregate, NOT
    * `row_number() over (partition by query_id)`: the window plan ships
    * every scored candidate to ONE reducer per query (5 queries over a
    * 100 TB corpus = 5 tasks doing all the work); the aggregate's partial
    * buffers cap at k entries per (query, map task), so the only exchange
    * carries O(queries × tasks × k) rows.
    */
  /** Bounded per-query top-k finish shared by the dense ([[topKPerQuery]]),
    * sparse ([[Bm25]]), and fused ([[rrfFuse]]) retrieval paths: groupBy
    * query → TopKByScore partial buffers → posexplode → 1-based rank
    * (ties by smaller id — the one tie convention every SQL oracle's
    * ROW_NUMBER replays). One definition so the tie rule can never
    * silently diverge between paths. `longScore` casts the score back to
    * long on output (the integer micro-unit paths).
    */
  private[ops] def topKFinish(scored: DataFrame, scoreCol: String, k: Int,
                              outScoreName: String,
                              longScore: Boolean): DataFrame = {
    val exploded = scored.groupBy(col("query_id"))
      .agg(graft.expr.TopKByScore.topk_by_score(
        col(scoreCol).cast("double"), col("id").cast("long"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "e")))
    val score =
      if (longScore) col("e.score").cast("long") else col("e.score")
    exploded.select(col("query_id"), col("e.id").as("id"),
      score.as(outScoreName), (col("pos") + 1).cast("int").as("rank"))
  }

  private[ops] def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    topKFinish(scored, "cosine", k, "cosine", longScore = false)

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * ranked retrieval lists — the standard hybrid of dense ANN and
    * sparse BM25 top-k, fused WITHOUT score calibration: each list
    * contributes `floor(1e6 / (k0 + rank))` integer micro-units per
    * (query, id) (k0 = 60, the published default), summed as exact longs
    * (order-independent under any partial aggregation — the [[Bm25]]
    * convention) and finished with the bounded `TopKByScore` aggregate.
    * The division is a single exactly-rounded double op, so the
    * quantization replays bit-for-bit in a SQL oracle. Inputs need
    * columns (query_id, id, rank); output (query_id, id, score_micro,
    * rank), ties by smaller id.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k >= 1, s"k must be >= 1: $k")
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    val u = lists.map(_.select(col("query_id"),
        col("id").cast("long").as("id"),
        col("rank").cast("double").as("_r")))
      .reduce(_ unionByName _)
    val scored = u.withColumn("_c",
        floor(lit(1e6) / (lit(k0.toDouble) + col("_r"))).cast("long"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("_c")).as("score_micro"))
    topKFinish(scored, "score_micro", k, "score_micro", longScore = true)
  }

  /** Exact top-k cosine neighbors for each query row. `queries` must be
    * small (it is broadcast). Output: (query_id, id, cosine, rank).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int = 10): DataFrame = {
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("_nv"))
      .crossJoin(broadcast(
        queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
          norm(col(qVecCol)).as("_nq"))))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine",
        cosinePre(col("v"), col("qv"), col("_nv"), col("_nq")))
    topKPerQuery(scored, k)
  }

  /** Exact k-nearest-neighbor GRAPH: every corpus row is its own query —
    * (query_id, id, cosine, rank) with the row's k nearest OTHER rows.
    * This is [[bruteForceTopK]] with queries = corpus, so the whole
    * corpus rides a broadcast: the contract is a corpus that fits one
    * executor (the recall/oracle baseline, and fine up to ~10^6 rows).
    * The scale path is [[knnGraphLsh]].
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int = 10): DataFrame =
    bruteForceTopK(corpus, idCol, vecCol, corpus, idCol, vecCol, k)

  /** Approximate KNN graph at corpus scale — the all-rows-are-queries
    * self-join that SemDeDup-style semantic curation and graph-based
    * data selection need, without ever broadcasting the corpus or going
    * all-pairs:
    *
    *  - candidates are rows sharing an LSH bucket (multiprobe: the
    *    query side also probes every 1-bit-flipped bucket, so a vector
    *    straddling a hyperplane still meets its neighbors);
    *  - the INDEX side is capped per bucket ([[Dedup]]'s hot-bucket
    *    guard shape: deterministic smallest-id order, optional observe
    *    accounting), bounding any bucket's candidate list — a degenerate
    *    corpus (10^7 near-identical vectors in one bucket) costs
    *    O(bucket_rows × cap), never O(bucket_rows²);
    *  - the capped index side is SALTED: each index row replicates into
    *    `salt` sub-buckets (bounded: ≤ salt × cap rows per bucket) and
    *    each probe row hashes to ONE salt, so a hot bucket's probe rows
    *    spread over `salt` reducers instead of funnelling into one task.
    *    The pair set — hence the result — is salt-invariant
    *    (SimilaritySpec proves salt=1 ≡ salt=8).
    *
    * Output: (query_id, id, cosine, rank ≤ k), ties by smaller id. A
    * query row whose buckets hold no other vector yields no rows (the
    * recall trade; raise planes/multiprobe/cap to trade cost for recall
    * — recall is measured, not argued, in SimilaritySpec).
    */
  def knnGraphLsh(corpus: DataFrame, idCol: String, vecCol: String,
                  k: Int = 10, planes: Int = 6, seed: Long = 7L,
                  multiprobe: Boolean = true, bucketCap: Int = 2048,
                  salt: Int = 8, obsTag: Option[String] = None): DataFrame = {
    checkPlanes(planes)
    require(bucketCap >= 1, s"bucketCap must be >= 1: $bucketCap")
    require(salt >= 1, s"salt must be >= 1: $salt")
    // buckets + norms computed ONCE for both sides of the self-join
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("_nv"),
        hyperplaneBucket(col(vecCol), planes, seed).as("bucket"))
      .localCheckpoint(true)
    val idx = Dedup.capBucketsBy(base, Seq("bucket"), "id", bucketCap, obsTag)
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    val qb = base.select(col("id").as("query_id"), col("v").as("qv"),
      col("_nv").as("_nq"), col("bucket").as("qbucket"))
    val probes =
      (if (!multiprobe) qb.withColumn("bucket", col("qbucket"))
       else qb.withColumn("bucket",
         explode(probeBuckets(col("qbucket"), planes))))
        .withColumn("_salt",
          pmod(xxhash64(col("query_id"), lit(seed)), lit(salt.toLong))
            .cast("int"))
    val scored = idx.join(probes, Seq("bucket", "_salt"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine",
        cosinePre(col("v"), col("qv"), col("_nv"), col("_nq")))
    topKPerQuery(scored, k)
  }

  /** Multiprobe expansion — the query's own bucket plus every
    * 1-bit-flipped bucket. ONE definition shared by [[lshTopK]] and
    * [[knnGraphLsh]]: both paths' SQL oracles hardcode the matching XOR
    * list, so the expansion must never diverge between them.
    */
  private def probeBuckets(qbucket: Column, planes: Int): Column =
    array_union(
      array(qbucket),
      transform(sequence(lit(0), lit(planes - 1)),
        p => qbucket.bitwiseXOR(
          call_function("shiftleft", lit(1L), p.cast("int")))))

  /** planes = 0 would put every row in bucket 0 (the O(n²) self-join the
    * cap/salt machinery exists to prevent) and make the multiprobe
    * sequence emit a garbage shiftleft(1, -1) probe — fail fast instead.
    */
  private def checkPlanes(planes: Int): Unit =
    require(planes >= 1 && planes <= 62,
      s"planes must be in [1, 62]: $planes")

  /** LSH-bucketed ANN top-k: score only candidates sharing the query's
    * bucket (multiprobe: also buckets at Hamming distance 1).
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              k: Int = 10, planes: Int = 8, seed: Long = 7L,
              multiprobe: Boolean = true): DataFrame = {
    checkPlanes(planes)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("_nv"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes, seed))
    val qb = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
        norm(col(qVecCol)).as("_nq"))
      .withColumn("qbucket", hyperplaneBucket(col("qv"), planes, seed))
    val probes =
      if (!multiprobe) qb.withColumn("bucket", col("qbucket"))
      else qb.withColumn("bucket", explode(probeBuckets(col("qbucket"), planes)))
    val scored = c.join(broadcast(probes), "bucket")
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine",
        cosinePre(col("v"), col("qv"), col("_nv"), col("_nq")))
    topKPerQuery(scored, k)
  }
}
