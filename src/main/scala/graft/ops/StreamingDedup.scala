package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Dedup at ingest time, as Structured Streaming — the continuous twin of
  * the batch [[Dedup]] operators for a corpus that arrives as a stream of
  * files rather than one frozen snapshot.
  *
  * Two surfaces:
  *
  *  1. '''Exact content dedup''' (`startExactDedup`):
  *     `dropDuplicatesWithinWatermark` on a content key. The
  *     within-watermark variant is the 100 TB-scale choice — plain
  *     streaming `dropDuplicates` keeps EVERY key ever seen in the state
  *     store (state grows with the corpus, unbounded), while the
  *     watermarked form evicts keys once the watermark passes, bounding
  *     state to the duplicate-arrival window (re-crawls and retry storms
  *     cluster in time; a re-crawl months later is the batch dedup job's
  *     problem, not the ingest path's).
  *
  *  2. '''Incremental near-dup vs a durable minhash index'''
  *     (`startMinhashIngest`): each micro-batch runs
  *     [[Dedup.minhashNearDupsAgainst]] against the signature index built
  *     by all PRIOR batches, then appends its own signatures as a new
  *     `batch_id=` partition. Both writes are per-batch-directory
  *     overwrites, and the index read excludes partitions ≥ the current
  *     batch id, so a post-crash replay of a half-committed batch reads
  *     exactly the pre-crash index, rewrites identical bytes, and never
  *     pairs a document against its own replayed signatures — the same
  *     idempotence discipline as the routing pipeline's sinks.
  *
  * Scale: per micro-batch the index side is band-shuffled only (never
  * self-joined) and the new side is small; index growth is one narrow
  * `(id, sig, sh)` partition per batch, compactable offline like any
  * partitioned table.
  */
object StreamingDedup {

  /** Exact dedup on `keyCols` with state bounded by the watermark on
    * `tsCol`. Emits first-arrival survivors (append mode) to
    * `outDir/deduped`.
    */
  def startExactDedup(spark: SparkSession, inputDir: String, outDir: String,
                      checkpointDir: String, schema: StructType,
                      keyCols: Seq[String], tsCol: String,
                      watermark: String = "10 minutes",
                      triggerMs: Long = 200L,
                      maxFilesPerTrigger: Int = 4): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .format("parquet")
      .option("path", s"$outDir/deduped")
      .start()

  /** Continuous near-dup detection: per micro-batch, near-dup pairs
    * against everything ingested before it land in
    * `outDir/pairs/batch_id=<id>`, and the batch's signatures join the
    * index at `outDir/index/batch_id=<id>`. The union of all pair
    * partitions equals the batch-mode [[Dedup.minhashNearDups]] over the
    * whole corpus (below caps), because every unordered pair is emitted by
    * exactly one batch — the one whose side arrived later.
    */
  def startMinhashIngest(spark: SparkSession, inputDir: String,
                         outDir: String, checkpointDir: String,
                         schema: StructType, idCol: String, textCol: String,
                         threshold: Double = 0.8, numHashes: Int = 64,
                         bands: Int = 16, shingleK: Int = 3,
                         bucketCap: Int = Dedup.DefaultBucketCap,
                         obsTag: Option[String] = None,
                         triggerMs: Long = 200L,
                         maxFilesPerTrigger: Int = 4): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, outDir, idCol, textCol, threshold,
          numHashes, bands, shingleK, bucketCap, obsTag)
        ()
      }
      .start()

  /** One idempotent ingest step — public so the replay/parity specs can
    * drive it directly. Reads the index strictly BELOW `batchId` (replay
    * guard), writes pairs and the batch's index partition as deterministic
    * per-batch overwrites. The batch is shingled and signed exactly ONCE —
    * the localCheckpointed signature frame feeds both the pair search and
    * the index write.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, outDir: String,
                  idCol: String, textCol: String, threshold: Double = 0.8,
                  numHashes: Int = 64, bands: Int = 16,
                  shingleK: Int = 3, bucketCap: Int = Dedup.DefaultBucketCap,
                  obsTag: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val newSigs = Dedup.minhashIndex(batch, idCol, textCol, numHashes,
      shingleK).localCheckpoint(true)
    val index = priorIndex(spark, newSigs, s"$outDir/index", batchId)
    Dedup.minhashNearDupsAgainstSigs(index, newSigs, threshold,
        numHashes, bands, bucketCap, obsTag)
      .write.mode("overwrite").parquet(s"$outDir/pairs/batch_id=$batchId")
    newSigs.write.mode("overwrite").parquet(s"$outDir/index/batch_id=$batchId")
  }

  /** Offline index maintenance: fold every `batch_id=` partition into ONE
    * partition keyed by the highest batch id seen, resolving re-crawled
    * ids last-writer-wins (same rule as the per-batch read). Run while the
    * ingest stream is STOPPED: long streams otherwise accumulate one small
    * partition per micro-batch (the classic small-files problem), and the
    * per-batch last-writer-wins aggregate grows with partition count.
    * Keying the compacted partition by the MAX id keeps the replay guard
    * sound — any future batch id is strictly greater, so the compacted
    * partition is always visible to it and never to a replay of itself.
    *
    * The local-FS swap (write temp → delete old → rename) is not
    * crash-atomic; a real deployment holds the index in a table format
    * whose compaction/MERGE commits atomically (the temp dir retains all
    * data if the swap is interrupted).
    */
  def compactIndex(spark: SparkSession, outDir: String): Unit = {
    val indexDir = s"$outDir/index"
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    val parts = fs.listStatus(path).map(_.getPath).flatMap { p =>
      scala.util.Try(p.getName.stripPrefix("batch_id=").toLong).toOption
        .filter(_ => p.getName.startsWith("batch_id="))
        .map(id => id -> p)
    }
    if (parts.length <= 1) return
    val maxId = parts.map(_._1).max
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir.compact-tmp")
    spark.read.option("basePath", indexDir)
      .parquet(parts.map(_._2.toString).toIndexedSeq: _*)
      .groupBy(col("id"))
      .agg(max_by(struct(col("sig"), col("sh")), col("batch_id")).as("_s"))
      .select(col("id"), col("_s.sig").as("sig"), col("_s.sh").as("sh"))
      .write.mode("overwrite").parquet(tmp.toString)
    parts.foreach { case (_, p) => fs.delete(p, true) }
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(path, s"batch_id=$maxId")),
      s"compaction swap failed: $tmp -> $indexDir/batch_id=$maxId")
  }

  /** Incremental cluster maintenance over the durable pair index: fold ONE
    * batch's pairs into the continuously-maintained `(id, comp)` labels
    * table via [[Dedup.ccUpdateDelta]] — only components touched by the
    * batch's pairs are rerun through the star rounds (proven ≡ a full
    * recompute), and only their members' labels are WRITTEN, as the
    * delta partition `labels/batch_id=<id>`. Same idempotence discipline
    * as [[ingestBatch]]: the existing assignment is read strictly below
    * `batchId` (a replay reads exactly the pre-crash labels and rewrites
    * identical bytes), and [[readLabels]] resolves ids last-writer-wins
    * across delta partitions. Run it after [[ingestBatch]] for the batch —
    * or on any cadence, passing the pairs of every batch since the last
    * label update.
    */
  def updateLabels(spark: SparkSession, outDir: String, batchId: Long,
                   pairs: DataFrame): Unit = {
    val existing = labelsBelow(spark, outDir, batchId)
    Dedup.ccUpdateDelta(existing, pairs)
      .write.mode("overwrite").parquet(s"$outDir/labels/batch_id=$batchId")
  }

  /** The current component assignment: last-writer-wins per id over the
    * label delta partitions. Ids never touched by any pair are absent —
    * singletons, exactly like [[Dedup.clusters]]' left-join convention.
    */
  def readLabels(spark: SparkSession, outDir: String): DataFrame =
    labelsBelow(spark, outDir, Long.MaxValue)

  private def labelsBelow(spark: SparkSession, outDir: String,
                          batchId: Long): DataFrame = {
    import spark.implicits._
    val labelsDir = s"$outDir/labels"
    val path = new org.apache.hadoop.fs.Path(labelsDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior = if (!fs.exists(path)) Array.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(path).map(_.getPath)
        .filter { p =>
          p.getName.startsWith("batch_id=") &&
            scala.util.Try(p.getName.stripPrefix("batch_id=").toLong)
              .toOption.exists(_ < batchId)
        }
    if (prior.isEmpty) Seq.empty[(Long, Long)].toDF("id", "comp")
    else spark.read.option("basePath", labelsDir)
      .parquet(prior.map(_.toString).toIndexedSeq: _*)
      .groupBy(col("id"))
      .agg(max_by(col("comp"), col("batch_id")).as("comp"))
  }

  /** All near-dup pairs found so far (union of every batch's partition). */
  def readPairs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", s"$outDir/pairs")
      .parquet(s"$outDir/pairs/batch_id=*")
      .drop("batch_id")

  /** The signature index partitions strictly older than `batchId` — a
    * replayed batch must never see its own (possibly half-written)
    * partition, or every replayed document would pair against itself.
    *
    * Re-crawled ids (the same id ingested by two different prior batches)
    * are resolved last-writer-wins by batch id, because
    * [[Dedup.minhashNearDupsAgainstSigs]] requires one sig per id — a
    * duplicated id would band-join each of its candidate pairs twice. On
    * a real table format this is a MERGE at write time; the parquet
    * stand-in pays one hash-aggregate of the index per batch instead,
    * which is no worse asymptotically than the band shuffle the index
    * takes in the pair search anyway.
    */
  private def priorIndex(spark: SparkSession, emptyLike: DataFrame,
                         indexDir: String, batchId: Long): DataFrame = {
    val empty = emptyLike.limit(0)
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return empty
    val prior = fs.listStatus(path).map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch_id=") &&
          scala.util.Try(p.getName.stripPrefix("batch_id=").toLong)
            .toOption.exists(_ < batchId)
      }
    if (prior.isEmpty) empty
    else spark.read.option("basePath", indexDir)
      .parquet(prior.map(_.toString).toIndexedSeq: _*)
      .groupBy(col("id"))
      .agg(max_by(struct(col("sig"), col("sh")), col("batch_id")).as("_s"))
      .select(col("id"), col("_s.sig").as("sig"), col("_s.sh").as("sh"))
  }
}
