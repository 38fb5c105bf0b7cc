package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText-shaped model
  * filter a large-scale training-data pipeline runs after the heuristic
  * gates ([[TextAnalysis.qualityScore]]): tokens hash into a fixed feature
  * space, the document's logit is the mean of its tokens' learned weights
  * plus a bias, and the keep decision is a sigmoid threshold. The model is
  * TRAINED elsewhere (driver-side / offline — logistic regression over
  * labeled docs); this operator is the SCORING pass, which is the part
  * that must touch all 100 TB.
  *
  * Weights are integer MILLI-units (wgt = round(w × 1000)): per-document
  * weight sums are then exact integer arithmetic — order-independent, so
  * identical across partitionings, retries, and engines (a double sum
  * re-associates under groupBy and would not be) — and the keep LABEL is a
  * pure integer comparison, exactly replayable in the DuckDB oracle. The
  * quantization costs ≤ 5e-4 per token weight, noise for a filter whose
  * training labels are themselves heuristic.
  *
  * Two scoring paths, proven equivalent in ClassifierSpec:
  *
  *  - [[scoreJoin]] (arbitrary dim): explode tokens → broadcast-join the
  *    weight table → per-doc integer sum. The explode stream collapses
  *    map-side (partial agg on the unique doc id) to ~one row per doc
  *    before the only shuffle, so shuffle volume ≈ corpus row count, not
  *    token count; the weight table broadcasts (a 2^20-feature model is
  *    ~16 MB).
  *  - [[scoreNarrow]] (dim fits a literal, ≲10⁵): the weight vector rides
  *    the plan as ONE literal array; a per-row sequential fold scores each
  *    doc with ZERO shuffle — the preferred shape whenever the model fits,
  *    and the cross-check that keeps the join path honest.
  */
object Classifier {

  /** Feature index of a token: xxhash64 into [0, dim). */
  def featureIndex(word: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive: $dim")
    pmod(xxhash64(word), lit(dim.toLong))
  }

  /** Deterministic synthetic weight table (feat ∈ [0, dim), wgt ∈
    * [-1000, 1000] milli-units) — the test/bench stand-in for a trained
    * model; pure hash columns, so any engine regenerates identical rows.
    */
  def syntheticWeights(spark: org.apache.spark.sql.SparkSession, dim: Int,
                       seed: Long = 17L): DataFrame =
    spark.range(dim).select(col("id").as("feat"),
      (pmod(xxhash64(lit(seed), col("id")), lit(2001L)) - lit(1000L)).as("wgt"))

  /** Score every document against a weight TABLE (feat: long, wgt: long
    * milli-units). Features absent from the table weigh 0; documents with
    * no tokens keep the bias-only score. Output: (idCol, n_tokens,
    * feat_sum, score, label) — feat_sum is the exact integer milli-sum,
    * score = sigmoid(bias + mean token weight) rounded to 4 dp, label the
    * integer-exact `logit ≥ 0` decision.
    */
  def scoreJoin(df: DataFrame, idCol: String, textCol: String,
                weights: DataFrame, dim: Int,
                biasMilli: Long = 0L): DataFrame = {
    val feats = df
      .select(col(idCol).as("id"), Curation.normWords(col(textCol)).as("_w"))
      .select(col("id"), explode(col("_w")).as("_t"))
      .select(col("id"), featureIndex(col("_t"), dim).as("feat"))
    val sums = feats
      .join(broadcast(weights.select(col("feat"), col("wgt"))),
        Seq("feat"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("wgt"), lit(0L))).as("feat_sum"))
    val out = df.select(col(idCol).as("id")).join(sums, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("feat_sum"), lit(0L)).as("feat_sum"))
    withScore(out, biasMilli).withColumnRenamed("id", idCol)
  }

  /** Score with the weight VECTOR as a literal (index = feature, value =
    * milli-weight; length = dim): a per-row sequential fold, no join, no
    * shuffle. Bit-identical output to [[scoreJoin]] over a table holding
    * the same vector.
    */
  def scoreNarrow(df: DataFrame, idCol: String, textCol: String,
                  weights: Array[Long], biasMilli: Long = 0L): DataFrame = {
    val dim = weights.length
    val lut = typedLit(weights.toSeq)
    val words = df.select(col(idCol).as("id"),
      Curation.normWords(col(textCol)).as("_w"))
    val out = words.select(col("id"),
      size(col("_w")).cast("long").as("n_tokens"),
      aggregate(
        transform(col("_w"),
          t => element_at(lut, featureIndex(t, dim).cast("int") + 1)),
        lit(0L), (acc, w) => acc + w).as("feat_sum"))
    withScore(out, biasMilli).withColumnRenamed("id", idCol)
  }

  /** score/label from the exact integer (n_tokens, feat_sum):
    * logit = bias + feat_sum / (1000 · max(n_tokens, 1)); label is decided
    * on the integer NUMERATOR (biasMilli·max(n,1) + feat_sum ≥ 0) so the
    * threshold never depends on floating-point rounding.
    */
  private def withScore(df: DataFrame, biasMilli: Long): DataFrame = {
    val n1 = greatest(col("n_tokens"), lit(1L))
    val numer = lit(biasMilli) * n1 + col("feat_sum")
    val logit = numer.cast("double") / (lit(1000.0) * n1.cast("double"))
    df.select(col("id"), col("n_tokens"), col("feat_sum"),
      round(lit(1.0) / (lit(1.0) + exp(-logit)), 4).as("score"),
      (numer >= 0).as("label"))
  }
}
