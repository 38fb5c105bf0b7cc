package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Random-projection (Johnson–Lindenstrauss) dimensionality reduction for
  * the embedding pipeline — the prep step that makes the downstream dense
  * ops (brute-force / LSH / IVF / KNN graph) cheaper per row when the
  * source dims are large: project to `outDim` against a deterministic
  * ±1 sign matrix (Achlioptas 2003 — database-friendly projections: the
  * sparse/sign family preserves pairwise distances with the same JL
  * guarantee as Gaussian matrices, needs no stored model, and is exact
  * integer arithmetic here).
  *
  * Exactness contract (the Classifier/Bm25 micro-unit pattern): inputs
  * quantize ONCE to `floor(x·1e6 + 0.5)` longs, the projection is a SUM
  * OF LONGS (sign·component), so every output component is exact,
  * order-independent under any partitioning/retry, and bit-replayable by
  * the SQL oracle — a float matmul would re-associate differently per
  * partitioning and could never be hash-compared. The float-space vector
  * (÷ 1e6·√outDim, the JL scaling) is a derived view ([[scaled]]).
  *
  * Scale shape: pure per-row column math — zero shuffle at any corpus
  * size. The projection runs as ONE fused codegen'd kernel per row
  * ([[graft.expr.RpProjectMicro]]: signs cached per kernel, quantize
  * once, primitive long sums — the same port that fixed the ANN cell
  * assignment); the original interpreted HOF fold is kept as
  * [[projectMicroHof]], the RpSpec bit-parity cross-check. Measured at
  * dim 64 → outDim 16 over 500k vectors (local[8], best-of-N, all
  * columns forced): HOF 11.64 s → expression 0.266 s (44×) — at
  * production dims the gap only widens (the HOF walks outDim × dim
  * interpreted nodes per row).
  */
object Rp {

  val Micro = 1000000L

  /** The deterministic ±1 entry at (input index i, output index j). */
  def sign(i: Column, j: Column, seed: Long): Column =
    when(pmod(xxhash64(lit(seed), i.cast("long"), j.cast("long")),
      lit(2L)) === 0, lit(1L)).otherwise(lit(-1L))

  /** The full sign matrix as a frame (i, j, s) — tiny (dim × outDim) —
    * the Verify dump primitive that lets DuckDB replay the projection
    * without xxhash64.
    */
  def signMatrix(spark: SparkSession, dim: Int, outDim: Int,
                 seed: Long): DataFrame = {
    require(dim > 0 && outDim > 0, s"dims must be positive: $dim, $outDim")
    spark.range(dim).select(col("id").as("i"))
      .crossJoin(spark.range(outDim).select(col("id").as("j")))
      .select(col("i"), col("j"), sign(col("i"), col("j"), seed).as("s"))
  }

  /** Exact projected components: `array<long>` of length `outDim`,
    * component j = Σ_i floor(v[i]·1e6 + 0.5) · s(i, j). One fused
    * codegen'd kernel ([[graft.expr.RpProjectMicro]]); bit-identical to
    * [[projectMicroHof]] (RpSpec).
    */
  def projectMicro(vec: Column, outDim: Int, seed: Long): Column = {
    require(outDim > 0, s"outDim must be positive: $outDim")
    graft.expr.RpProjectMicro.rp_project_micro(vec, outDim, seed)
  }

  /** The original interpreted HOF formula — the RpSpec cross-check for
    * the kernel (outDim × dim interpreted tree walks per row; never use
    * on a real corpus). The quantized input array is bound as a LAMBDA
    * VARIABLE (the wordShinglesHof lesson), so the quantization runs
    * once per row, not once per (i, j).
    */
  def projectMicroHof(vec: Column, outDim: Int, seed: Long): Column = {
    require(outDim > 0, s"outDim must be positive: $outDim")
    element_at(transform(
      array(transform(vec,
        x => floor(x.cast("double") * Micro + lit(0.5d)))),
      q => transform(sequence(lit(0), lit(outDim - 1)), j =>
        aggregate(sequence(lit(0), size(q) - 1), lit(0L),
          (acc, i) => acc + element_at(q, i + 1) * sign(i, j, seed)))),
      1)
  }

  /** The float-space JL view of [[projectMicro]]'s exact components:
    * ÷ (1e6 · √outDim), so squared distances estimate the originals.
    */
  def scaled(projMicro: Column, outDim: Int): Column =
    transform(projMicro,
      m => m.cast("double") / (Micro.toDouble * math.sqrt(outDim.toDouble)))

  /** Project every row: (idCol, the exact long components, the scaled
    * float vector).
    */
  def project(df: DataFrame, idCol: String, vecCol: String, outDim: Int,
              seed: Long = 11L): DataFrame = {
    require(df.columns.contains(idCol), s"missing input column: $idCol")
    require(df.columns.contains(vecCol), s"missing input column: $vecCol")
    df.select(col(idCol),
        projectMicro(col(vecCol), outDim, seed).as("proj_micro"))
      .withColumn("proj", scaled(col("proj_micro"), outDim))
  }
}
