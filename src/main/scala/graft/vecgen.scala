package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic multi-million-vector embedding corpus synthesizer for the
  * ANN scaling benches — the `embeddings`-shaped companion to [[DocGen]]
  * (same contract: everything derives from xxhash64, no rand(), so any
  * cluster size / retry / engine generates identical bytes; the plan is
  * `spark.range` → narrow column math, shuffle-free, so generation
  * parallelizes to any executor count).
  *
  * Built-in CLUSTER structure (the population IVF/PQ exist for): each
  * vector is a hash-picked cluster centroid plus per-vector noise, then
  * unit-normalized —
  *
  *   v = normalize(centroid(id mod nClusters) + noise · u(id))
  *
  * with every centroid/noise component uniform in [-1, 1) from xxhash64.
  * Same-cluster vectors are mutual near-neighbors, so probing a coarse
  * quantizer recovers real recall (on a structureless uniform corpus every
  * ANN method degenerates to chance and the recall column of the bench
  * would be noise).
  *
  * Schema matches the sf testdata `embeddings` table where the ANN
  * operators need it: (vec_id: long, embedding: array<float>), plus the
  * generating `cluster` for tests.
  */
object VecGen {

  def vecs(spark: SparkSession, nVecs: Long, dim: Int = 64,
           nClusters: Int = 1024, noise: Double = 0.4, seed: Long = 13L,
           parallelism: Int = 0): DataFrame = {
    require(dim >= 1 && nClusters >= 1 && noise >= 0.0)
    val slices = if (parallelism > 0) parallelism
                 else spark.sparkContext.defaultParallelism
    // uniform [-1, 1) from a 64-bit hash
    def u(h: org.apache.spark.sql.Column) =
      (pmod(h, lit(2000000L)).cast("double") / 1000000.0) - 1.0
    val raw = transform(sequence(lit(0), lit(dim - 1)), i =>
      u(xxhash64(lit(seed), lit("ct"), col("cluster"), i)) +
        lit(noise) * u(xxhash64(lit(seed), lit("nz"), col("id"), i)))
    spark.range(0L, nVecs, 1L, slices)
      .withColumn("cluster",
        pmod(xxhash64(lit(seed), lit("c"), col("id")), lit(nClusters.toLong)))
      .withColumn("_raw", raw)
      .withColumn("_norm",
        sqrt(aggregate(col("_raw"), lit(0.0d), (acc, x) => acc + x * x)))
      .select(col("id").as("vec_id"), col("cluster"),
        transform(col("_raw"),
          x => (x / greatest(col("_norm"), lit(1e-12))).cast("float"))
          .as("embedding"))
  }
}
