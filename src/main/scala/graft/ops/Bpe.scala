package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and ENCODING (Sennrich, Haddow &
  * Birch, ACL 2016) — the step past [[TextAnalysis.bpePairCounts]]'s
  * single merge-candidate table: learn an ordered merge list by
  * iteratively fusing the most frequent adjacent symbol pair, then encode
  * text under it (the per-doc token counts that token-budget quotas,
  * sequence packing, and mixture math actually need).
  *
  * Scale shape — the vocab-collapse invariant: after ONE corpus pass
  * (normWords explode → (word, freq) aggregation, map-side partials
  * absorbing hot words), every training iteration and the whole encode
  * run on the DISTINCT-WORD frame, which is bounded by the language
  * (~10^7-10^8 rows for a 100 TB crawl), not the corpus. Per iteration:
  * one pair-count aggregation over the vocab (≤ alphabet²·avg-len
  * groups) + one driver-side argmax collect of a single row + one narrow
  * column rewrite of the symbol arrays. Per-document counts come back
  * via a broadcast (word → n_tokens) dictionary join — the corpus is
  * touched exactly twice end-to-end (vocab build, count join).
  *
  * Merge application is one codegen'd `aggregate` fold per rule
  * (left-to-right, non-overlapping — within one rule's pass a merged
  * token can never re-trigger the same rule, and a properly-ranked merge
  * list never re-enables an earlier rule, so one in-order pass per rule
  * is the exact encode). The encode plan chains `merges.size` folds, so
  * plan depth is linear in the merge count: right for the harness-scale
  * rule lists trained here; a production 32k-rule tokenizer wants the
  * whole loop inside ONE custom expression (the MinHashSig porting
  * pattern) — a documented seam, same as the Multimodal codec.
  *
  * Determinism: the argmax tie-break is the total order (count desc,
  * lhs, rhs), so training is reproducible across engines — the SQL
  * oracle re-derives rank 1 from the initial pair table and replays the
  * full encode under the dumped rule list.
  */
object Bpe {

  /** Collapsed vocabulary with initial character symbols:
    * (w, freq, syms).
    */
  private[ops] def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Curation.normWords(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))))

  /** Adjacent-pair frequencies over the CURRENT symbol arrays, weighted
    * by word frequency (the trainer's per-iteration statistic; at
    * iteration 0 this equals [[TextAnalysis.bpePairCounts]]'s table).
    */
  private[ops] def pairCounts(v: DataFrame): DataFrame =
    v.select(col("freq"), explode(
        when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("lhs"),
              element_at(col("syms"), i + 1).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>")))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))

  /** One left-to-right, non-overlapping application pass of merge
    * (lhs, rhs): a single codegen'd fold — state (out, cur) where `cur`
    * is the one-symbol lookahead; a match emits the fused token and
    * clears the lookahead so the fused token never re-matches rhs-side
    * within the pass.
    */
  private[ops] def applyMerge(syms: Column, lhs: String,
                              rhs: String): Column = {
    val empty = array().cast("array<string>")
    aggregate(
      syms,
      struct(empty.as("out"), lit(null).cast("string").as("cur")),
      (acc, s) => {
        val out = acc.getField("out")
        val cur = acc.getField("cur")
        when(cur.isNull, struct(out.as("out"), s.as("cur")))
          .when(cur === lit(lhs) && s === lit(rhs),
            struct(concat(out, array(lit(lhs + rhs))).as("out"),
              lit(null).cast("string").as("cur")))
          .otherwise(struct(concat(out, array(cur)).as("out"), s.as("cur")))
      },
      acc => when(acc.getField("cur").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("cur")))))
  }

  /** Learn up to `nMerges` merge rules. Stops early when no adjacent pair
    * reaches `minCount`. Returns rules in rank order.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1: $nMerges")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    var v = vocab(df, textCol).localCheckpoint(true)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (rules.size < nMerges && !exhausted) {
      val top = pairCounts(v)
        .where(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        rules += ((l, r))
        // localCheckpoint per iteration: the vocab frame is bounded by
        // the language, and an uncheckpointed chain would re-run every
        // prior fold inside each iteration's pair count
        v = v.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    rules.toSeq
  }

  /** The learned rules as a (rank, lhs, rhs) frame — the dump/primitive
    * surface for SQL replay.
    */
  def mergesFrame(df: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    import df.sparkSession.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "lhs", "rhs")
  }

  /** Encode the corpus vocabulary under a merge list:
    * (w, freq, tokens) — one chained fold per rule over distinct words.
    */
  def encodeVocab(df: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val v = merges.foldLeft(vocab(df, textCol)) { case (acc, (l, r)) =>
      acc.withColumn("syms", applyMerge(col("syms"), l, r))
    }
    v.select(col("w"), col("freq"), col("syms").as("tokens"))
  }

  /** Per-document BPE token counts under a learned merge list:
    * (doc_id, bpe_tokens) for EVERY corpus row (0 for empty docs). The
    * corpus side only explodes words and joins the broadcast
    * word→n_tokens dictionary — no per-doc symbol work.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val dict = encodeVocab(df, textCol, merges)
      .select(col("w"), size(col("tokens")).cast("long").as("_nt"))
    df.select(col(idCol).as("doc_id"),
        explode_outer(Curation.normWords(col(textCol))).as("w"))
      .join(broadcast(dict), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(col("_nt")), lit(0L)).as("bpe_tokens"))
  }
}
