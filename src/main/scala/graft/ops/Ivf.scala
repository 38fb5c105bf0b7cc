package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * companion to the sign-bit LSH in [[Similarity]].
  *
  * Index build: pick `nCells` deterministic "centroid" vectors from the
  * corpus itself (hash-ordered sample — a stand-in for k-means that keeps
  * the whole build seedable; swap in trained centroids without changing the
  * plan shape), broadcast them as a literal expression, and assign every
  * corpus row to its nearest centroid with a narrow argmax projection — no
  * shuffle, the cell id is just a derived column (partition/bucket key at
  * scale: `write.partitionBy("cell")` makes probes partition-pruned scans).
  *
  * Query: score each query against all centroids (tiny), probe the best
  * `nProbe` cells, and score only corpus rows in those cells —
  * the scanned fraction is ≈ nProbe/nCells, the classic IVF trade.
  */
object Ivf {

  /** argmax-by-cosine over a broadcast literal centroid table:
    * returns struct(cell, cosine).
    */
  private def bestCells(v: Column, centroids: Array[(Int, Array[Float])],
                        n: Int): Column = {
    val scored = array(centroids.map { case (cell, cv) =>
      val cvCol = typedLit(cv.toSeq)
      struct(Similarity.cosine(v, cvCol).as("cos"), lit(cell).as("cell"))
    }: _*)
    slice(reverse(array_sort(scored)), 1, n)
  }

  /** Deterministic centroid pick: the `nCells` corpus rows with the
    * smallest xxhash64(id) — a seeded uniform sample. Centroids are tiny
    * (nCells × dim floats) and are collected to the driver to become a
    * literal broadcast expression.
    */
  def pickCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    nCells: Int, seed: Long = 11L): Array[(Int, Array[Float])] =
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Float](1).toArray)
      }

  /** Assign each corpus row to its nearest centroid cell (narrow). */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: Array[(Int, Array[Float])]): DataFrame =
    corpus.withColumn("cell",
      bestCells(col(vecCol), centroids, 1).getItem(0).getField("cell"))

  /** Top-k ANN via IVF probe. Scans ≈ nProbe/nCells of the corpus per
    * query set. Queries must be small (broadcast).
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              k: Int = 10, nCells: Int = 16, nProbe: Int = 4,
              seed: Long = 11L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = pickCentroids(corpus, idCol, vecCol, nCells, seed)
    val cells = assignCells(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "id", "v", centroids)
    val probes = queries
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("probe", explode(transform(
        bestCells(col("qv"), centroids, nProbe), p => p.getField("cell"))))
    val scored = cells
      .join(broadcast(probes), cells("cell") === probes("probe"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", Similarity.cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }
}
