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
    * engines. The budget is stamped into the output (`budget` column) so
    * downstream consumers ([[packManifest]]) read the value the chunk ids
    * were actually built with instead of trusting a re-passed parameter.
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
          .as("last_pack"),
        lit(budget).as("budget"))
  }

  /** Greedy whole-document packing (first-fit in id order): documents are
    * never split — a doc that would overflow the current pack starts a new
    * one (the SFT-example layout, where an example must stay contiguous).
    * An oversized doc (> budget) gets a pack to itself. Zero-token docs
    * join the current pack without ever forcing a new one. Output:
    * (idCol, shard, n_tokens, pack, pack_off) with pack ids shard-local
    * and pack_off = the doc's token offset within its pack.
    *
    * The fill state is a SEQUENTIAL recurrence (each doc's pack depends on
    * every predecessor's fit decision), not a prefix sum — so no window
    * expresses it, and this is the one place in the library that earns
    * `mapPartitions`: repartition by shard, sort within partitions by
    * (shard, id), and stream each partition once with O(1) state, resetting
    * at shard boundaries. Same scale shape as [[packChunks]]: shards bound
    * both the sort and the sequential scan, and are independent.
    */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Int, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(nShards > 0, s"nShards must be positive: $nShards")
    val spark = df.sparkSession
    import spark.implicits._
    // fail fast on a NULL id: silently packing under one would sort it
    // first and emit a null id column — against the library's
    // raise-on-data-bugs convention (asof/rangejoin guards). A
    // non-numeric string id already raises ANSI CAST_INVALID_INPUT at the
    // cast itself (Spark 4 default), so NULL input is the only silent
    // path left. The guard rides the id value so pruning can't drop it.
    val guardedId = when(col(idCol).isNull, raise_error(lit(
        s"packGreedy id column '$idCol' is NULL — ids must be non-null integral"))
        .cast("long"))
      .otherwise(col(idCol).cast("long"))
    df
      .select(guardedId.as("_1"),
        Curation.shardAssign(col(idCol), nShards).as("_2"),
        col(tokenCol).cast("long").as("_3"))
      .as[(Long, Long, Long)]
      .repartition(col("_2"))
      .sortWithinPartitions("_2", "_1")
      .mapPartitions { rows =>
        var shard = -1L
        var pack = 0L
        var fill = 0L
        rows.map { case (id, sh, n) =>
          if (sh != shard) { shard = sh; pack = 0L; fill = 0L }
          if (fill > 0 && n > 0 && fill + n > budget) { pack += 1; fill = 0L }
          val off = fill
          fill += n
          (id, sh, n, pack, off)
        }
      }
      .toDF(idCol, "shard", "n_tokens", "pack", "pack_off")
  }

  /** Per-pack manifest: explode [[packChunks]] into one row per
    * (shard, pack, document) span — `begin`/`end` are the document's token
    * range WITHIN the pack (end exclusive; the pack reader's seek list).
    * Row count is Σ chunks-per-doc ≈ corpus_tokens/budget + n_docs, so the
    * explode never amplifies beyond one row per boundary crossed. The
    * budget comes from the [[packChunks]] output's stamped column — a
    * re-passed parameter could silently disagree with the chunk ids and
    * corrupt every span.
    */
  def packManifest(packed: DataFrame, idCol: String): DataFrame =
    packed
      .where(col("n_tokens") > 0)
      .select(col(idCol), col("shard"), col("start_off"), col("n_tokens"),
        col("budget").cast("long").as("_b"),
        explode(sequence(col("first_pack"), col("last_pack"))).as("pack"))
      .select(col(idCol), col("shard"), col("pack"),
        greatest(col("start_off") - col("pack") * col("_b"), lit(0L))
          .as("begin"),
        least(col("start_off") + col("n_tokens") - col("pack") * col("_b"),
          col("_b")).as("end"))

  /** Materialize the actual fixed-budget TRAINING ROWS from per-document
    * token-id sequences (e.g. [[Bpe.encodeIds]] output): the
    * concat-and-chunk layout of [[packChunks]], but carrying the ids —
    * every output row is one `(shard, pack)` example holding exactly
    * `budget` ids except each shard's final partial pack. Documents
    * straddle pack boundaries (no padding waste); within a pack,
    * documents appear in id order, so
    * concat(packs in pack order) = concat(docs in id order) per shard —
    * the lossless-stream invariant PackingSpec asserts.
    *
    * Same interval arithmetic as [[packChunks]]/[[packManifest]]
    * (PackingSpec cross-checks the (shard, pack, span-length) triples
    * against the manifest), inlined here because the ids must ride the
    * window rather than re-join the corpus afterwards.
    *
    * Scale shape: one shard-windowed prefix sum (shards bound the sort,
    * as above), one explode whose row count is Σ boundary crossings
    * ≈ corpus_tokens/budget + n_docs with each row carrying ONLY its
    * pack's id slice (never the whole document), and one (shard, pack)
    * aggregation — the slices crossing the exchange are exactly the
    * output's intrinsic bytes. Zero-token documents are dropped (they
    * contribute nothing to any pack; attrition accounting belongs
    * upstream).
    */
  def packedRows(df: DataFrame, idCol: String, idsCol: String,
                 budget: Int, nShards: Int,
                 orderSeed: Option[Long] = None): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(nShards > 0, s"nShards must be positive: $nShards")
    // seed < 2^62 keeps id + seed clear of Long overflow for every id in
    // sampleRank's [0, 2^31) domain (which shardAssign already enforces)
    require(orderSeed.forall(s => s >= 0L && s < (1L << 62)),
      s"orderSeed must be in [0, 2^62): $orderSeed")
    // epoch-order shuffling WITHOUT a global sort: a seed reorders each
    // shard's stream by the seeded Knuth rank ((id + seed) mod 2^31 is a
    // bijection of the sampleRank domain, then the odd-multiplier hash —
    // tie-free for distinct ids, plain BIGINT SQL in the oracle). Docs
    // keep their shard (the window sort stays bounded by corpus/nShards);
    // a new seed per epoch yields a new deterministic batch order with
    // zero extra plan cost.
    val ord = orderSeed match {
      case None => Seq(col(idCol))
      case Some(s) => Seq(pmod(
        pmod(col(idCol).cast("long") + s, lit(2147483648L)) * 2654435761L,
        lit(4294967296L)), col(idCol))
    }
    val w = Window.partitionBy(col("shard")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(idsCol).as("_ids"))
      .withColumn("shard", Curation.shardAssign(col(idCol), nShards))
      .withColumn("_n", size(col("_ids")).cast("long"))
      .withColumn("start_off", coalesce(sum(col("_n")).over(w), lit(0L)))
      .where(col("_n") > 0)
      .select(col("shard"), col("_ids"), col("_n"), col("start_off"),
        explode(sequence(floor(col("start_off") / budget),
          floor((col("start_off") + col("_n") - 1) / budget))).as("pack"))
      .select(col("shard"), col("pack"),
        greatest(col("start_off") - col("pack") * budget, lit(0L))
          .as("_begin"),
        slice(col("_ids"),
          (greatest(col("pack") * budget - col("start_off"), lit(0L)) + 1)
            .cast("int"),
          (least(col("_n"), (col("pack") + 1) * budget - col("start_off"))
            - greatest(col("pack") * budget - col("start_off"), lit(0L)))
            .cast("int")).as("_seg"))
      .groupBy(col("shard"), col("pack"))
      // _begin values are distinct within a pack (spans are disjoint and
      // non-empty), so the struct sort restores id order deterministically
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("_begin"), col("_seg")))),
        s => s.getField("_seg"))).as("ids"))
      .withColumn("n_ids", size(col("ids")).cast("long"))
  }

  /** Per-document sliding-window chunking with overlap — the RAG /
    * long-context ingest layout (each document is cut into `window`-token
    * chunks every `stride` tokens, so consecutive chunks overlap by
    * window − stride tokens and no token is skipped). Unlike
    * [[packChunks]] (cross-document concat-and-chunk), chunks never cross
    * a document boundary.
    *
    * Tokens are the document's whitespace tokens; chunk i covers token
    * positions [i·stride, i·stride + window). Chunk count is
    * 1 + ⌈(n − window)/stride⌉ for n > window, 1 for 0 < n ≤ window, and
    * 0 for an empty document (no row emitted — chunking has nothing to
    * carry; attrition accounting belongs to the upstream filters).
    * `stride ≤ window` is required: it guarantees full coverage (no
    * gaps) and every chunk non-empty (last chunk holds n − start ≥ 1
    * tokens). Deterministic in the text alone.
    *
    * Output: (idCol, chunk_idx, tok_start, chunk_tokens, chunk_text).
    *
    * Scale shape: one narrow transform + explode per row — zero
    * exchanges; row amplification is Σ n_chunks ≈ corpus_tokens/stride,
    * the output's intrinsic size.
    */
  /** Deterministic per-EPOCH global shuffle — the reproducible training
    * order every trainer run needs (same epoch ⇒ same order on any
    * engine/partitioning/retry; different epoch ⇒ a genuinely different
    * permutation, not a rotation): every row gets `(shard, pos)` such
    * that reading shards in order, each sorted by pos, visits the corpus
    * in the epoch's global pseudorandom order.
    *
    * rank_e(id) = (id · c_e) mod 2^32 with the per-epoch multiplier
    * c_e = (2654435761 · (2·epoch+1)) mod 2^32 — odd·odd stays odd, so
    * each epoch is a bijection on [0, 2^32) (the
    * [[Curation.sampleRank]] family; id ∈ [0, 2^31) enforced the same
    * way, and c_e < 2^32 keeps the product overflow-free in either
    * engine). The multiplier must differ MULTIPLICATIVELY per epoch: an
    * additive tweak (c + 2·epoch) perturbs ranks by only 2·epoch·id,
    * which cannot reorder a small-id corpus — caught by the spec's
    * epochs-differ case. shard = ⌊rank_e · nShards / 2^32⌋ is MONOTONE
    * in rank_e, so (shard asc, pos asc) ≡ global (rank_e, id) order — a
    * total order with NO global sort: one hash exchange on shard + a
    * per-shard window bounded by corpus/nShards (the [[packChunks]]
    * shard discipline).
    */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int,
                   epoch: Int): DataFrame = {
    require(df.columns.contains(idCol), s"missing column: $idCol")
    require(nShards >= 1 && nShards <= (1 << 20),
      s"nShards out of [1, 2^20]: $nShards")
    require(epoch >= 0 && epoch < (1 << 30), s"epoch out of range: $epoch")
    import org.apache.spark.sql.expressions.Window
    val idL = col(idCol).cast("long")
    val mult = (2654435761L * (2L * epoch + 1L)) % 4294967296L
    val rank = when(idL.between(0L, (1L << 31) - 1),
      pmod(idL * lit(mult), lit(4294967296L)))
      .otherwise(raise_error(concat(
        lit("epochShuffle id out of [0, 2^31): "), idL.cast("string"))))
    val w = Window.partitionBy("shard").orderBy(col("_es_rank"), col(idCol))
    df.withColumn("_es_rank", rank)
      .withColumn("shard",
        expr(s"(_es_rank * $nShards) div 4294967296").cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_es_rank")
  }

  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window=$window]: $stride")
    val words = filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")
    val n = size(col("_w"))
    // ⌈(n−W)/S⌉ + 1 via exact integer arithmetic (values are ints, the
    // double division is exact far past any real document length)
    val nChunks = when(n <= window, lit(1))
      .otherwise(floor((n - window + stride - 1) / lit(stride))
        .cast("int") + 1)
    val chunks = when(n === 0,
        array().cast("array<struct<i:int>>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => struct(i.as("i"))))
    df.select(col(idCol), words.as("_w"))
      .select(col(idCol), col("_w"), explode(chunks).as("_c"))
      .select(col(idCol),
        col("_c.i").cast("long").as("chunk_idx"),
        (col("_c.i") * stride).cast("long").as("tok_start"),
        least(lit(window), size(col("_w")) - col("_c.i") * stride)
          .cast("long").as("chunk_tokens"),
        array_join(slice(col("_w"), col("_c.i") * stride + 1, lit(window)),
          " ").as("chunk_text"))
  }
}
