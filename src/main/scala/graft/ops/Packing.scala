package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training shards: concat-and-chunk — documents are
  * concatenated in a deterministic order and the token stream is cut into
  * fixed-budget chunks (the standard pretraining layout: no padding waste,
  * documents may straddle a chunk boundary).
  *
  * Scale shape: a GLOBAL running token offset would be one total order —
  * the classic scale-killer — so the offset is per SHARD: documents are
  * first spread across `nShards` by the deterministic [[Curation.shardAssign]]
  * hash, and the cumulative sum is a window per shard, ordered by id.
  * Shards are independent (embarrassingly parallel) and each shard's sort
  * is bounded by corpus/nShards — at 100 TB you pick nShards so a shard is
  * a few GB, exactly like choosing output file counts. Chunk ids are
  * shard-local by construction; (shard, pack) is the global pack key.
  */
object Packing {

  /** Assign every document its token interval in the packed stream:
    * (shard, start_off, first_pack, last_pack) where packs are
    * `budget`-token chunks of the shard's concatenated stream. A zero-token
    * document gets first_pack = last_pack at its offset. Deterministic in
    * (id, token count) only — identical across runs, partitionings, and
    * engines.
    *
    * `tokenCol` is any non-negative integer column (e.g.
    * [[TextAnalysis.tokenCountWs]] projected beforehand).
    */
  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Int, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(nShards > 0, s"nShards must be positive: $nShards")
    val shard = Curation.shardAssign(col(idCol), nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val toks = col(tokenCol).cast("long")
    df.select(col(idCol), toks.as("_n"))
      .withColumn("shard", shard)
      .withColumn("start_off", coalesce(sum(col("_n")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("_n").as("n_tokens"),
        col("start_off"),
        floor(col("start_off") / budget).as("first_pack"),
        when(col("_n") === 0, floor(col("start_off") / budget))
          .otherwise(floor((col("start_off") + col("_n") - 1) / budget))
          .as("last_pack"))
  }

  /** Per-pack manifest: explode [[packChunks]] into one row per
    * (shard, pack, document) span — `begin`/`end` are the document's token
    * range WITHIN the pack (end exclusive; the pack reader's seek list).
    * Row count is Σ chunks-per-doc ≈ corpus_tokens/budget + n_docs, so the
    * explode never amplifies beyond one row per boundary crossed.
    */
  def packManifest(packed: DataFrame, idCol: String,
                   budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    packed
      .where(col("n_tokens") > 0)
      .select(col(idCol), col("shard"), col("start_off"), col("n_tokens"),
        explode(sequence(col("first_pack"), col("last_pack"))).as("pack"))
      .select(col(idCol), col("shard"), col("pack"),
        greatest(col("start_off") - col("pack") * budget, lit(0L)).as("begin"),
        least(col("start_off") + col("n_tokens") - col("pack") * budget,
          lit(budget.toLong)).as("end"))
  }
}
