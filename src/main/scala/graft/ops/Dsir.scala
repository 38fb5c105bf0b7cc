package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR — Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS 2023),
  * re-expressed in exact, engine-replayable arithmetic: score every raw
  * document by how much its hashed-n-gram distribution resembles a small
  * TARGET corpus versus the raw-corpus background, then keep the top
  * documents by importance weight.
  *
  *   log w(doc) = Σ over the doc's n-gram OCCURRENCES of
  *                  [ ln p_tgt(bucket) − ln p_raw(bucket) ]
  *
  * with add-one-smoothed unigram-over-buckets probabilities on
  * 2^bucketBits hashed n-gram buckets (the paper's hashed generative
  * model; bucketing bounds the feature dictionary regardless of corpus
  * size). The per-BUCKET log ratio is quantized ONCE into integer
  * micro-units over the bounded dictionary (≤ 2^bucketBits rows — the
  * [[Bm25]] idf_micro convention: the `ln` runs once per dictionary row,
  * never per document), so every per-document weight is an exact LONG sum
  * — order-independent under any partitioning/retry, bit-replayable in a
  * SQL oracle, and safe to rank on (re-associating double sums would make
  * the selection boundary partitioning-dependent).
  *
  * Scale shape (100 TB raw corpus):
  *  - ONE shingling pass: the corpus n-gram stream collapses to
  *    (doc_id, bucket, cnt) behind one exchange; BOTH consumers — the
  *    background bucket-count aggregation (small: ≤ 2^bucketBits groups)
  *    and the per-doc weight sum — read that same exchange, which AQE
  *    deduplicates at runtime (the [[Curation.dupSpans]] ReusedExchange
  *    pattern; DsirSpec gates it).
  *  - the dictionary (bucket, c_tgt, c_raw, logratio_micro) is ≤
  *    2^bucketBits rows and broadcasts; the corpus never shuffles again —
  *    the weight aggregation is partial-agg'd groupBy(doc_id), map-side
  *    combined, no hot keys (doc_id is unique).
  *  - selection is [[selectTopK]]'s orderBy+limit — planned as
  *    TakeOrderedAndProject (bounded per-partition k, driver merge),
  *    never a global sort.
  *
  * The background distribution is the scored corpus itself (the paper's
  * raw-pool setup), so every document bucket is present in the dictionary
  * by construction and the weight join is exact inner.
  */
object Dsir {

  /** (doc_id?, bucket, cnt) rows: hashed word-n-gram occurrences folded
    * to 2^bucketBits buckets. `ids = Nil` gives corpus-level counts.
    */
  private def bucketRows(df: DataFrame, ids: Seq[String], textCol: String,
                         n: Int, bucketBits: Int): DataFrame = {
    val idc = ids.map(col)
    val nb = 1L << bucketBits
    df.select(idc :+ Curation.normWords(col(textCol)).as("_w"): _*)
      .select(idc :+
        explode(when(size(col("_w")) >= n,
          sequence(lit(1), size(col("_w")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("_i") :+ col("_w"): _*)
      .select(idc :+ pmod(
        xxhash64(array_join(slice(col("_w"), col("_i"), lit(n)), " ")),
        lit(nb)).as("bucket"): _*)
      .groupBy(idc :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-doc (doc_id, bucket, cnt) for the scored corpus — also the dump
    * primitive the SQL oracle replays everything above the hash from.
    */
  def docBucketRows(corpus: DataFrame, idCol: String, textCol: String,
                    n: Int = 2, bucketBits: Int = 16): DataFrame = {
    checkParams(n, bucketBits)
    bucketRows(corpus.select(col(idCol).as("doc_id"), col(textCol)),
      Seq("doc_id"), textCol, n, bucketBits)
  }

  /** The bounded dictionary: every bucket observed in target or raw,
    * its exact counts, and the quantized smoothed log ratio
    *   logratio_micro = round_half_up(1e6 · (ln (c_tgt+1)/(T+B)
    *                                        − ln (c_raw+1)/(R+B)))
    * where T/R are total target/raw occurrences and B = 2^bucketBits.
    * The exact counts ride along so an oracle can join ON (bucket, c_tgt,
    * c_raw) — importing only the `ln` while cross-checking the counting.
    */
  private[ops] def logRatioDict(tgtCounts: DataFrame, rawCounts: DataFrame,
                                bucketBits: Int): DataFrame = {
    val b = (1L << bucketBits).toDouble
    val tTot = tgtCounts.agg(coalesce(sum(col("cnt")), lit(0L)).as("_t"))
    val rTot = rawCounts.agg(coalesce(sum(col("cnt")), lit(0L)).as("_r"))
    rawCounts.select(col("bucket"), col("cnt").as("c_raw"))
      .join(tgtCounts.select(col("bucket"), col("cnt").as("c_tgt")),
        Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("c_tgt", "c_raw"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"), col("c_tgt"), col("c_raw"),
        floor((log((col("c_tgt") + 1.0d) / (col("_t") + b)) -
               log((col("c_raw") + 1.0d) / (col("_r") + b))) * 1e6 + 0.5d)
          .cast("long").as("logratio_micro"))
  }

  /** Per-document importance weights against a target sample:
    * (doc_id, n_ngrams, weight_micro) for EVERY corpus row — documents
    * with fewer than n words get (0, 0), the neutral weight.
    */
  def importanceWeights(corpus: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, targetTextCol: String,
                        n: Int = 2, bucketBits: Int = 16): DataFrame =
    weightsWithDict(corpus, idCol, textCol, target, targetTextCol,
      n, bucketBits)._1

  /** [[importanceWeights]] plus the dictionary it scored with — the dump
    * surface: Verify persists the dict so a SQL oracle can import the
    * quantized `ln` while recomputing and cross-checking every count.
    */
  def weightsWithDict(corpus: DataFrame, idCol: String, textCol: String,
                      target: DataFrame, targetTextCol: String,
                      n: Int = 2, bucketBits: Int = 16)
      : (DataFrame, DataFrame) = {
    checkParams(n, bucketBits)
    val perDoc = docBucketRows(corpus, idCol, textCol, n, bucketBits)
    // both consumers below read perDoc's single exchange (ReuseExchange)
    val rawCounts = perDoc.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val tgtCounts = bucketRows(target.select(col(targetTextCol)), Nil,
      targetTextCol, n, bucketBits)
    val dict = logRatioDict(tgtCounts, rawCounts, bucketBits)
    val sums = perDoc.join(broadcast(dict), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_ngrams"),
        sum(col("cnt") * col("logratio_micro")).as("weight_micro"))
    val w = corpus.select(col(idCol).as("doc_id"))
      .join(sums, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("weight_micro"), lit(0L)).as("weight_micro"))
    (w, dict)
  }

  /** Deterministic top-k selection by importance weight (the paper's
    * top-k variant of the resampling step), ties by smaller doc_id.
    * orderBy+limit plans as TakeOrderedAndProject; the rank window runs
    * AFTER the limit, on k rows only — bounded by config, never by data.
    */
  def selectTopK(weights: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    weights.orderBy(col("weight_micro").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("weight_micro").desc, col("doc_id"))).cast("int"))
  }

  private def checkParams(n: Int, bucketBits: Int): Unit = {
    require(n >= 1, s"n must be >= 1: $n")
    require(bucketBits >= 4 && bucketBits <= 24,
      s"bucketBits must be in [4, 24]: $bucketBits")
  }
}
