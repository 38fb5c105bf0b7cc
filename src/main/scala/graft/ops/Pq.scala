package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression ANN path IVF alone
  * lacks: each vector is split into `m` subvectors, every subspace is
  * k-means-quantized to `ksub` codewords, and a vector is stored as `m`
  * small codes (m bytes at ksub ≤ 256) instead of dim floats — a
  * 768-dim float corpus compresses ~384× into codes that fit executor
  * memory at 100 TB-corpus scale. Queries score candidates by ADC
  * (asymmetric distance computation): a per-query lookup table of
  * `m × ksub` precomputed sub-dot-products turns each candidate's score
  * into m array lookups + adds — candidate cost is O(m), independent of
  * dim. (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011.)
  *
  * Scale shapes:
  *  - [[train]] collects only codebooks (m × ksub × dsub doubles) to the
  *    driver; the corpus is touched by narrow assign/mean passes (the
  *    position-exploded mean of [[Ivf.kmeansCentroids]], codegen-safe at
  *    any dim).
  *  - [[encode]] is a ZERO-shuffle projection — codes are derived columns,
  *    written alongside the id as the durable compressed index.
  *  - [[pqTopK]] broadcasts per-query LUTs and scans codes once; per-query
  *    top-k is the bounded [[graft.expr.TopKByScore]] aggregate (no
  *    per-query-reducer window).
  *  - [[ivfPqTopK]] composes with the IVF coarse quantizer: probe
  *    `nProbe / nCells` of the corpus, ADC-score only those candidates —
  *    the standard IVF-PQ layout. (Codewords here quantize the RAW
  *    vectors, not IVF residuals — simpler, same plan shape; residual
  *    encoding is a quality refinement that changes no operator.)
  *
  * Scoring metric: INNER PRODUCT of the query with the candidate's
  * reconstruction. On unit-normalized corpora (the usual ANN setup, and
  * what [[pqTopK]] callers should feed it) inner product ranks identically
  * to cosine up to the per-query norm constant.
  */
object Pq {

  /** Trained codebooks: `books(j)(code)` = the dsub-dim codeword. */
  case class Codebooks(m: Int, dsub: Int, books: Array[Array[Array[Double]]]) {
    require(books.length == m, s"expected $m subspace books, got ${books.length}")
    def ksub: Int = books.head.length
  }

  /** Per-subspace k-means (Lloyd, L2) over the corpus subvectors.
    * Deterministic: hash-ordered seeding per subspace, no randomness in
    * iterations. The corpus must have ≥ ksub rows and a constant dim
    * divisible by m (checked).
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, ksub: Int, iters: Int = 2, seed: Long = 11L): Codebooks = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val v = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val books = (0 until m).map { j =>
      val sub = v.select(col("id"), slice(col("v"), j * dsub + 1, dsub).as("sv"))
      kmeansL2(sub, ksub, iters, seed + j)
    }.toArray
    Codebooks(m, dsub, books)
  }

  /** Lloyd iterations on one subspace frame (id, sv: array<double>).
    * Seeding and the per-cell mean mirror [[Ivf]] (hash-ordered sample;
    * position-exploded mean so the aggregation stays narrow at any dim);
    * assignment is L2 (argmax of dot − ½|c|², the k-means geometry —
    * cosine would ignore subvector magnitude, which PQ must reconstruct).
    */
  private def kmeansL2(sub: DataFrame, ksub: Int, iters: Int,
                       seed: Long): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = sub
      .orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(ksub)
      .collect().map(_.getSeq[Double](1).toArray)
    require(cents.length == ksub,
      s"corpus smaller than ksub=$ksub (got ${cents.length} seed rows)")
    (0 until iters).foreach { _ =>
      val means = sub
        .withColumn("code", nearestCode(col("sv"), cents))
        .select(col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("code"), col("pos")).agg(avg(col("x")).as("mv"))
        .groupBy(col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("ms"))
        .select(col("code"), transform(col("ms"), e => e.getField("mv")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      cents = cents.zipWithIndex.map { case (old, c) => means.getOrElse(c, old) }
    }
    cents
  }

  /** Nearest codeword (L2) of a subvector as a narrow column — the HOF
    * shape: ONE literal array of (code, codeword, ½|codeword|²) structs
    * iterated by a `transform`. argmin L2 ≡ argmax (dot − ½|c|²); ties
    * break to the larger code (max struct), deterministically. Used by
    * [[kmeansL2]] (training runs on a small sample, where the
    * interpreted-HOF cost is irrelevant) and as [[encodeColHof]]'s
    * building block; the corpus-scale encode path is the codegen'd
    * [[graft.expr.PqCodes]] kernel (see [[encodeCol]]).
    */
  private def nearestCode(sv: Column, book: Array[Array[Double]]): Column = {
    val lit3 = typedLit(book.toSeq.zipWithIndex.map { case (vec, c) =>
      (c, vec.toSeq, 0.5 * vec.map(x => x * x).sum)
    })
    val scored = transform(lit3, e =>
      struct((Similarity.dot(sv, e.getField("_2")) - e.getField("_3")).as("s"),
        e.getField("_1").as("code")))
    element_at(reverse(array_sort(scored)), 1).getField("code")
  }

  /** PQ codes of a vector column: `array<int>` of length m — a pure
    * projection (zero shuffle); write `(id, codes)` as the compressed
    * index. One codegen'd [[graft.expr.PqCodes]] pass (the vector is cast
    * to double ONCE per row; the HOF shape re-cast the slice per
    * codeword, interpreted — the AnnScalingBench pq_encode hot loop);
    * [[encodeColHof]] is the bit-parity cross-check.
    */
  def encodeCol(v: Column, cb: Codebooks): Column =
    graft.expr.PqCodes.pq_codes(v.cast("array<double>"), cb.books)

  /** The round-3 HOF encode — [[encodeCol]]'s AnnKernelSpec cross-check. */
  private[ops] def encodeColHof(v: Column, cb: Codebooks): Column = {
    val vd = v.cast("array<double>")
    array((0 until cb.m).map { j =>
      nearestCode(slice(vd, j * cb.dsub + 1, cb.dsub), cb.books(j))
    }: _*)
  }

  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Codebooks): DataFrame =
    corpus.select(col(idCol).as("id"), encodeCol(col(vecCol), cb).as("codes"))

  /** Per-query ADC lookup table: lut(j)(code) = dot(query_sub_j,
    * codeword) — driver-side sequential folds, m × ksub doubles per query.
    */
  def lutFor(q: Array[Double], cb: Codebooks): Seq[Seq[Double]] =
    (0 until cb.m).map { j =>
      cb.books(j).toSeq.map { cw =>
        var s = 0.0d
        var i = 0
        while (i < cb.dsub) { s += q(j * cb.dsub + i) * cw(i); i += 1 }
        s
      }
    }

  /** The query frame with its LUT attached: (query_id, lut) — tiny
    * (queries must be broadcastable, same contract as every ANN op here).
    * Public so the Verify harness can dump the exact LUT doubles the
    * engine scores with; the DuckDB oracle replays ADC over that dump.
    */
  def lutFrame(queries: DataFrame, qIdCol: String, qVecCol: String,
               cb: Codebooks): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries
      .select(col(qIdCol).cast("long"), col(qVecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), lutFor(r.getSeq[Double](1).toArray, cb)))
      .toSeq.toDF("query_id", "lut")
  }

  /** ADC score of a code array against a LUT column: m lookups + adds,
    * sequential fold (engine-replayable sum order) — the codegen'd
    * [[graft.expr.AdcScore]] kernel (the HOF shape ran interpreted once
    * per CANDIDATE row — queries × corpus evaluations);
    * [[adcScoreHof]] is the bit-parity cross-check.
    */
  def adcScore(codes: Column, lut: Column): Column =
    graft.expr.AdcScore.adc_score(codes, lut)

  /** The round-3 HOF fold — [[adcScore]]'s AnnKernelSpec cross-check. */
  private[ops] def adcScoreHof(codes: Column, lut: Column): Column =
    aggregate(zip_with(codes, lut, (c, row) => element_at(row, c + 1)),
      lit(0.0d), (acc, x) => acc + x)

  /** Exhaustive ADC top-k: every corpus code scored against every query's
    * LUT — the PQ baseline (compute O(m) per candidate; the corpus side
    * never shuffles; the only exchange is the bounded top-k partials).
    * Output: (query_id, id, score, rank).
    */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qIdCol: String, qVecCol: String,
             cb: Codebooks, k: Int = 10): DataFrame =
    pqTopKEncoded(encode(corpus, idCol, vecCol, cb),
      queries, qIdCol, qVecCol, cb, k)

  /** ADC top-k over an already-encoded `(id, codes)` frame — the
    * production shape: the compressed index is durable (encode once,
    * write, score many query sets against it); [[pqTopK]] is the
    * encode-inline convenience.
    */
  def pqTopKEncoded(encoded: DataFrame,
                    queries: DataFrame, qIdCol: String, qVecCol: String,
                    cb: Codebooks, k: Int = 10): DataFrame =
    topK(encoded.select(col("id"), col("codes"))
      .crossJoin(broadcast(lutFrame(queries, qIdCol, qVecCol, cb))), k)

  /** ADC shortlist + exact rerank — the production PQ retrieval pattern
    * (IVFADC §V of the PQ paper): quantized scores cannot resolve
    * near-tied candidates (on clustered corpora MOST top-k contenders are
    * near-ties), so ADC retrieves a `shortlist` of s ≫ k candidates
    * cheaply, then ONLY those s·|queries| rows are re-scored with exact
    * cosine against the raw vectors. Scale shape: the shortlist is tiny
    * (queries × s), broadcast back against the corpus — one
    * BroadcastHashJoin probe pass, no corpus shuffle; exact scoring cost
    * drops from O(corpus · dim) to O(s · queries · dim).
    */
  def pqTopKReranked(encoded: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     cb: Codebooks, k: Int = 10,
                     shortlist: Int = 0): DataFrame = {
    val s = if (shortlist > 0) shortlist else 10 * k
    require(s >= k, s"shortlist $s < k $k")
    val cands = pqTopKEncoded(encoded, queries, qIdCol, qVecCol, cb, s)
      .select(col("query_id"), col("id"))
    val qv = broadcast(queries.select(col(qIdCol).cast("long").as("query_id"),
      col(qVecCol).as("qv"),
      Similarity.norm(col(qVecCol)).as("_nq")))
    val raw = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))
    val exact = raw.join(broadcast(cands), "id").join(qv, "query_id")
      .withColumn("cosine", Similarity.cosinePre(col("v"), col("qv"),
        Similarity.norm(col("v")), col("_nq")))
    Similarity.topKPerQuery(exact, k)
      .select(col("query_id"), col("id"), col("cosine").as("score"),
        col("rank"))
  }

  /** IVF-PQ: coarse-probe `nProbe` of `nCells` IVF cells, ADC-score only
    * candidates in probed cells — compute O(m · nProbe/nCells · corpus)
    * per query set, memory O(m) per corpus row. Centroids are
    * Lloyd-refined like [[Ivf.ivfTopK]]; pass the same seed to align.
    */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qIdCol: String, qVecCol: String,
                cb: Codebooks, k: Int = 10, nCells: Int = 16, nProbe: Int = 4,
                seed: Long = 11L, kmeansIters: Int = 1): DataFrame = {
    val centroids =
      if (kmeansIters > 0)
        Ivf.kmeansCentroids(corpus, idCol, vecCol, nCells, kmeansIters, seed)
      else Ivf.pickCentroids(corpus, idCol, vecCol, nCells, seed)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val encoded = Ivf.assignCells(c, "id", "v", centroids)
      .select(col("id"), col("cell"), encodeCol(col("v"), cb).as("codes"))
    val probes = Ivf.probeCells(queries, qIdCol, qVecCol, centroids, nProbe)
      .select(col("query_id"), col("probe"))
      .join(lutFrame(queries, qIdCol, qVecCol, cb), Seq("query_id"))
    topK(encoded.join(broadcast(probes),
      encoded("cell") === probes("probe")), k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame =
    Similarity.topKPerQuery(
      scored.where(col("id") =!= col("query_id"))
        .withColumn("cosine", adcScore(col("codes"), col("lut"))), k)
      .select(col("query_id"), col("id"), col("cosine").as("score"),
        col("rank"))
}
