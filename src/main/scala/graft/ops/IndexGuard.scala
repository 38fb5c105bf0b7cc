package graft.ops

import org.apache.spark.sql.SparkSession

/** Shared replay-guard plumbing for the durable incremental indexes
  * ([[Bm25]], [[Ivf]]): batch-partition existence checks that resolve the
  * index directory's ACTUAL filesystem (a driver-local `java.io.File`
  * check is silently always-false on hdfs://-or-s3a://-style paths — the
  * guard would never fire and every checkpoint replay would duplicate its
  * batch), and a compaction WATERMARK so the guard survives compaction:
  * folding `batch_id=` partitions into one deletes the very directories
  * the existence check keys on, so a replayed append of a pre-compaction
  * batch would re-ingest it — the watermark (the max batch id folded so
  * far, stored in a one-line sidecar) rejects any batchId at or below it.
  */
private[ops] object IndexGuard {

  private def fs(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    fs(spark, p).exists(p)
  }

  private def wmPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_compaction_watermark")

  /** Max batch id folded by a past compaction; 0 when never compacted.
    * A missing OR empty/torn sidecar reads as 0: losing the watermark
    * can only re-admit a replayed batch (a duplicate the next compaction
    * resolves), while failing here would brick every future append —
    * the guard errs toward duplicates, never toward refusing ingest.
    */
  def watermark(spark: SparkSession, dir: String): Long = {
    val p = wmPath(dir)
    val f = fs(spark, p)
    if (!f.exists(p)) return 0L
    val in = f.open(p)
    try {
      val s = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
        .readLine()
      if (s == null || s.trim.isEmpty) 0L else s.trim.toLong
    } finally in.close()
  }

  /** Temp-then-rename (the compaction swap's own pattern) so a crash
    * mid-write never leaves a truncated sidecar in place — the worst
    * crash outcome is a MISSING watermark, which [[watermark]] reads as
    * 0 (the duplicate-admitting direction, resolved at compaction).
    */
  def writeWatermark(spark: SparkSession, dir: String, maxId: Long): Unit = {
    val p = wmPath(dir)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/_compaction_watermark.tmp")
    val f = fs(spark, p)
    val out = f.create(tmp, true)
    try out.write(s"$maxId\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    require(f.rename(tmp, p), s"watermark swap failed: $tmp -> $p")
  }

  /** The shared two-step replay guard: true iff `batchId` was already
    * ingested — either folded away by a past compaction (the watermark;
    * its partition dir no longer exists) or present as a live
    * `batch_id=` partition under `subDir`.
    */
  def replayed(spark: SparkSession, dir: String, subDir: String,
               batchId: Long): Boolean =
    batchId <= watermark(spark, dir) ||
      exists(spark, s"$dir/$subDir/batch_id=$batchId")
}
