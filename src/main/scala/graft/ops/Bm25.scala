package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 sparse lexical retrieval (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework") — the similarity-search family's
  * SPARSE member, complementing the dense paths ([[Similarity]]/[[Ivf]]/
  * [[Pq]]): exact-term retrieval is what decontamination and
  * eval-neighborhood audits reach for when embedding recall is not
  * trusted, and it needs no trained artifact at all.
  *
  * Exactness contract — integer micro-unit scores (the [[Classifier]]
  * pattern): every (query, term, doc) contribution is quantized to
  * `floor(idf_micro · sat + 0.5)` (a long), so the per-(query, doc) score
  * is a SUM OF LONGS — exact, order-independent under any partial
  * aggregation / task retry, and replayable bit-for-bit by a SQL oracle.
  * A float-summed BM25 would re-associate differently per partitioning
  * and could never be hash-compared. `idf_micro = floor(1e6·idf + 0.5)`
  * is itself a long; `ln` is the lone transcendental (libm-variant
  * across engines), so the per-term idf is dumped as a Verify PRIMITIVE
  * (same convention as the xxhash64 dumps) while df, tf, doc length,
  * saturation, and the final sum/top-k replay independently.
  *
  * Scale shape at 100 TB: tokenization is the shared codegen'd
  * [[Curation.normWords]] kernel; postings shuffle ONCE keyed by 8-byte
  * xxhash64(term) (never the term string); document frequency is
  * computed only for the (small, broadcast) query-term set, so no
  * corpus-wide df table is ever materialized for a search; the per-doc
  * score aggregation is map-side-combinable long addition; final top-k
  * is the bounded [[graft.expr.TopKByScore]] partial-buffer aggregate,
  * never a per-query window over all scored docs. Hash keying means two
  * colliding terms would merge postings — the same negligible-collision
  * note as minhash (~n²/2⁶⁴).
  */
object Bm25 {

  /** k1 = 1.2, b = 0.75 (the standard Robertson defaults), written as
    * exact double literals on BOTH engines — never computed (1.2 + 1
    * rounds differently than the literal 2.2).
    */
  val K1 = 1.2d
  val K1Plus1 = 2.2d
  val B = 0.75d
  val OneMinusB = 0.25d
  val Micro = 1e6d

  /** Postings frame `(id, h, tf, len)` — one row per (doc, distinct
    * term): term-frequency plus the doc's total token count carried on
    * every posting (computed before the explode, so attaching it costs
    * no join). ONE shuffle, map-side partials collapse repeated terms.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("id"),
        Curation.normWords(col(textCol)).as("ws"))
      .select(col("id"), size(col("ws")).cast("long").as("len"),
        explode(col("ws")).as("w"))
      .select(col("id"), col("len"), xxhash64(col("w")).as("h"))
    toks.groupBy(col("id"), col("h"))
      .agg(count(lit(1)).as("tf"), first(col("len")).as("len"))
  }

  /** `idf_micro = floor(1e6 · ln(1 + (N − df + 0.5)/(df + 0.5)) + 0.5)`
    * over a `(.., df)` frame — the quantized Robertson idf.
    */
  private def idfMicro(dfCol: Column, nDocs: Long): Column =
    floor(lit(Micro) * log(lit(1.0d) +
      (lit(nDocs.toDouble) - dfCol + lit(0.5d)) / (dfCol + lit(0.5d))) +
      lit(0.5d))

  /** Corpus-wide `(word, df, idf_micro)` table — the Verify dump
    * primitive (the oracle joins it ON BOTH word and df, so df is
    * cross-checked relationally and only the `ln` value is imported).
    * Production search never builds this: [[topK]] computes df for the
    * broadcast query-term set only.
    */
  def idfTableWords(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    docs.select(col(idCol).cast("long").as("id"),
        explode(Curation.normWords(col(textCol))).as("w"))
      .distinct()
      .groupBy(col("w").as("word"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf_micro", idfMicro(col("df"), n).cast("long"))
  }

  /** BM25 top-k: for each (small, broadcast) query row, the k
    * highest-scoring corpus docs. Output:
    * `(query_id, id, score_micro, rank)` — rank 1-based, score desc,
    * ties by smaller doc id (TopKByScore's deterministic order). Query
    * terms are a SET (standard BM25); docs sharing no query term never
    * appear (their score would be 0).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qIdCol: String, qTextCol: String,
           k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val (nDocs, totalLen) = corpusStats(docs, textCol)
    require(nDocs > 0, "BM25 corpus is empty")
    // exact-rational inputs; the one double divide is exactly rounded,
    // so the SQL replay (SUM::DOUBLE / COUNT) reproduces it bit-for-bit
    val avgdl = totalLen.toDouble / nDocs.toDouble
    val qTerms = queries.select(col(qIdCol).cast("long").as("query_id"),
        explode(Curation.normWords(col(qTextCol))).as("w"))
      .select(col("query_id"), xxhash64(col("w")).as("h"))
      .distinct()
    search(postings(docs, idCol, textCol), qTerms, nDocs, avgdl, k)
  }

  /** (nDocs, total token count) in ONE corpus scan — count() plus a
    * separate sum job would scan (and re-tokenize) the corpus twice for
    * the same bit-identical stats.
    */
  private def corpusStats(docs: DataFrame, textCol: String): (Long, Long) = {
    val row = docs.agg(count(lit(1)),
      sum(size(Curation.normWords(col(textCol))).cast("long"))).head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** The shared scoring tail: postings × broadcast query terms →
    * query-set df/idf → quantized term scores → exact long sums →
    * bounded top-k.
    */
  private def search(post: DataFrame, qTerms: DataFrame,
                     nDocs: Long, avgdl: Double, k: Int): DataFrame = {
    // df over the query-term set only: the broadcast semi-join keeps the
    // corpus-wide term dimension out of the plan entirely; checkpointed
    // because BOTH the df aggregate and the scoring join consume it
    // (blocks released on GC of the result, same note as minhash)
    val hit = post.join(broadcast(qTerms.select(col("h")).distinct()), "h")
      .localCheckpoint(true)
    val idf = hit.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .withColumn("idf_micro", idfMicro(col("df"), nDocs).cast("long"))
    val sat = (col("tf") * lit(K1Plus1)) /
      (col("tf") + lit(K1) * (lit(OneMinusB) +
        lit(B) * col("len") / lit(avgdl)))
    val scored = hit
      .join(broadcast(idf.select(col("h"), col("idf_micro"))), "h")
      .join(broadcast(qTerms), "h")
      .withColumn("tm",
        floor(col("idf_micro") * sat + lit(0.5d)).cast("long"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("tm")).as("score_micro"))
    Similarity.topKFinish(scored, "score_micro", k, "score_micro",
      longScore = true)
  }

  /** Persist the postings as a durable index: files HASH-RANGE-CLUSTERED
    * (repartitionByRange + sortWithinPartitions on the term hash) so
    * every parquet row group covers a narrow `h` interval, plus a
    * one-row `_stats` sidecar (n_docs, total_len — the exact-integer
    * inputs `searchIndex` rederives avgdl from). Range-clustering is
    * what makes the search-side `isin` pushdown effective: row-group
    * min/max on `h` skips everything not containing a query term, the
    * postings analog of [[Ivf.writeIndex]]'s cell-partition pruning.
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 dir: String, shards: Int = 0): Unit = {
    val (nDocs, total) = corpusStats(docs, textCol)
    require(nDocs > 0, "BM25 corpus is empty")
    val post = postings(docs, idCol, textCol)
    val ranged = if (shards > 0) post.repartitionByRange(shards, col("h"))
                 else post.repartitionByRange(col("h"))
    // a rebuild starts the batch clock over: clear any compaction
    // watermark a previous life of this index left behind — BEFORE the
    // overwrite, so a crash between the two errs toward re-admitting a
    // replayed batch (a duplicate the next compaction resolves) instead
    // of a fresh index silently swallowing its early appends
    IndexGuard.writeWatermark(docs.sparkSession, dir, 0L)
    // batch_id=0 is the initial build (the Ivf.writeIndex convention);
    // the overwrite wipes any previous index INCLUDING its appends — the
    // per-write static partitionOverwriteMode pins that even when the
    // session runs dynamic mode (under which a partitioned overwrite
    // would replace ONLY batch_id=0 and leave stale appends mixed in)
    ranged.sortWithinPartitions(col("h"))
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "static")
      .parquet(s"$dir/postings")
    writeStats(docs.sparkSession, dir, nDocs, total, 0L, overwrite = true)
  }

  private def writeStats(spark: org.apache.spark.sql.SparkSession,
                         dir: String, nDocs: Long, total: Long,
                         batchId: Long, overwrite: Boolean): Unit = {
    import spark.implicits._
    Seq((nDocs, total, batchId)).toDF("n_docs", "total_len", "batch_id")
      .coalesce(1)
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "static")
      .parquet(s"$dir/_stats")
  }

  /** Incremental ingest into a [[writeIndex]] directory: the new batch's
    * postings land under their own `batch_id=` partition (range-clustered
    * within the batch, so the search-side pushdown keeps pruning), and a
    * per-batch stats row joins the `_stats` sidecar — [[searchIndex]]
    * SUMS the rows, so N and avgdl track the growing corpus with no
    * base rewrite. The [[Ivf.appendToIndex]] conventions apply verbatim:
    * replay-guarded on the batch partition dir (idempotent under
    * checkpoint-replay; a crash mid-write can leave a partial batch the
    * guard then skips — atomic multi-artifact commits are table-format
    * territory), `batchId > 0` (0 is the initial build), returns true iff
    * written. A RE-CRAWLED id is visible under both its versions (df and
    * stats double-count it) until [[compactIndex]] resolves
    * last-writer-wins — the same between-compactions contract as the
    * IVF and streaming-dedup indexes.
    */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                    docs: DataFrame, idCol: String, textCol: String,
                    batchId: Long): Boolean = {
    require(batchId > 0, s"batchId must be > 0 (0 is the initial build): $batchId")
    if (IndexGuard.replayed(spark, dir, "postings", batchId)) return false
    val (nDocs, total) = corpusStats(docs, textCol)
    postings(docs, idCol, textCol)
      .repartitionByRange(col("h")).sortWithinPartitions(col("h"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").partitionBy("batch_id")
      .parquet(s"$dir/postings")
    // stats written AFTER postings: a crash between the two leaves the
    // batch searchable with slightly-stale N/avgdl rather than stats for
    // absent postings; compactIndex rebuilds stats exactly either way
    writeStats(spark, dir, nDocs, total, batchId, overwrite = false)
    true
  }

  /** Offline index maintenance, mirroring [[Ivf.compactIndex]]: fold
    * every `batch_id=` partition into one under the max batch id,
    * resolving re-crawled ids LAST-WRITER-WINS (max batch_id per doc id),
    * re-range-clustering the merged postings (~one file per range again),
    * and rebuilding the `_stats` sidecar exactly from the surviving
    * postings. Note the one stats nuance: a document whose text tokenizes
    * to ZERO words holds no postings, so it leaves N at compaction — it
    * can never match a query term, and N then counts retrievable docs.
    * The local-FS swap is not crash-atomic (same table-format note as the
    * other durable indexes). No-op on a single-batch index.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Unit = {
    val postDir = s"$dir/postings"
    val path = new org.apache.hadoop.fs.Path(postDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    val parts = fs.listStatus(path).map(_.getPath).flatMap { p =>
      scala.util.Try(p.getName.stripPrefix("batch_id=").toLong).toOption
        .filter(_ => p.getName.startsWith("batch_id="))
        .map(id => id -> p)
    }
    if (parts.length <= 1) return
    val maxId = parts.map(_._1).max
    val post = spark.read.option("basePath", postDir)
      .parquet(parts.map(_._2.toString).toIndexedSeq: _*)
    val winners = post
      .join(post.groupBy(col("id")).agg(max(col("batch_id")).as("batch_id")),
        Seq("id", "batch_id"))
      .drop("batch_id")
      .localCheckpoint(true) // consumed by the write AND the stats rebuild
    val tmp = new org.apache.hadoop.fs.Path(s"$postDir.compact-tmp")
    winners.repartitionByRange(col("h")).sortWithinPartitions(col("h"))
      .write.mode("overwrite").parquet(tmp.toString)
    val stats = winners.groupBy(col("id")).agg(first(col("len")).as("len"))
      .agg(count(lit(1)), sum(col("len"))).head()
    parts.foreach { case (_, p) => fs.delete(p, true) }
    require(fs.rename(tmp,
      new org.apache.hadoop.fs.Path(path, s"batch_id=$maxId")),
      s"compaction swap failed: $tmp -> $postDir/batch_id=$maxId")
    writeStats(spark, dir, stats.getLong(0),
      if (stats.isNullAt(1)) 0L else stats.getLong(1), maxId,
      overwrite = true)
    // folding deleted the batch dirs the append guard keys on — record
    // the high-water mark so a replayed pre-compaction append stays a
    // no-op instead of re-ingesting its docs
    IndexGuard.writeWatermark(spark, dir, maxId)
  }

  /** Search a [[writeIndex]] directory. The (small, by contract) query
    * term-hash set is collected and pushed into the postings scan as an
    * `isin` predicate — visible as `PushedFilters: In(h, ...)` — so the
    * range-clustered files are read only where a query term can live;
    * above `pushdownLimit` distinct terms the filter is skipped (an IN
    * list that large stops helping min/max pruning) and the broadcast
    * join alone does the work. Scoring is bit-identical to [[topK]].
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                  queries: DataFrame, qIdCol: String, qTextCol: String,
                  k: Int = 10, pushdownLimit: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // one row per batch (appends add rows; compaction folds them back to
    // one) — N and total length are their exact sums
    val stats = spark.read.parquet(s"$dir/_stats")
      .agg(sum(col("n_docs")), sum(col("total_len"))).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs.toDouble
    val qTerms = queries.select(col(qIdCol).cast("long").as("query_id"),
        explode(Curation.normWords(col(qTextCol))).as("w"))
      .select(col("query_id"), xxhash64(col("w")).as("h"))
      .distinct()
      .localCheckpoint(true) // collected for pushdown AND joined below
    val hashes = qTerms.select(col("h")).distinct()
      .limit(pushdownLimit + 1).collect().map(_.getLong(0))
    search(indexPostings(spark, dir, hashes, pushdownLimit),
      qTerms, nDocs, avgdl, k)
  }

  /** The pruned postings scan [[searchIndex]] reads — exposed so the
    * spec can gate the plan (the search result's own plan starts at the
    * localCheckpoint, hiding the scan's `PushedFilters: In(h, ...)`).
    */
  private[ops] def indexPostings(spark: org.apache.spark.sql.SparkSession,
                                 dir: String, hashes: Array[Long],
                                 pushdownLimit: Int): DataFrame = {
    val post0 = spark.read.parquet(s"$dir/postings")
    if (hashes.nonEmpty && hashes.length <= pushdownLimit)
      post0.where(col("h").isin(hashes.toSeq: _*)) else post0
  }
}
