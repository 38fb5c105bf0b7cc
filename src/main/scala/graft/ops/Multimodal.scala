package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark side is REAL — schema, partitioning, batch iteration shape,
  * deterministic synthetic payloads — but the actual media codecs are
  * STUBBED (this container has no image/audio libraries): `decodeStub`
  * derives "decoded" properties deterministically from the payload bytes.
  * Swap [[MediaCodec]] for a real implementation (e.g. javacv / a Python
  * `mapInPandas` stage on PySpark clusters) without touching the plumbing.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,            // image | audio | video
      mime: String,
      payload: Array[Byte],    // opaque encoded bytes
      width: Int,              // metadata as produced upstream (may be 0 = unknown)
      height: Int,
      duration_ms: Long)

  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])  // fixed-dim feature vector

  /** The codec seam — STUB. A real deployment implements these with actual
    * decoders; everything downstream (schema, batching, partitioning) is
    * unchanged. The stub is deterministic in the payload bytes so tests are
    * stable.
    */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], kind: String): (Int, Int, Int) // (w, h, frames)
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake codec: dimensions and features are hashes of the
    * bytes. ??? -- replace with real decoders outside this sandbox.
    */
  object StubCodec extends MediaCodec {
    private def h(bytes: Array[Byte], salt: Long): Long = {
      var acc = 1125899906842597L ^ salt
      var i = 0
      while (i < bytes.length) { acc = 31 * acc + bytes(i); i += 1 }
      acc
    }
    /** The decode hash primitive, exposed so Verify can dump it per row:
      * the DuckDB oracle then replays the width/height/frame arithmetic of
      * [[decode]] independently in SQL (the same dump-the-hash-primitive
      * pattern as the minhash band and sampler bucket oracles).
      */
    def baseHash(payload: Array[Byte]): Long = math.abs(h(payload, 1L))
    def decode(payload: Array[Byte], kind: String): (Int, Int, Int) = {
      val base = baseHash(payload)
      val w = 64 + (base % 1920).toInt
      val hh = 64 + ((base >>> 16) % 1080).toInt
      val frames = kind match {
        case "image" => 1
        case "audio" => 1 + ((base >>> 24) % 4096).toInt
        case _       => 1 + ((base >>> 24) % 240).toInt
      }
      (w, hh, frames)
    }
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        out(i) = ((math.abs(h(payload, i.toLong + 2)) % 2000000) / 1000000.0f) - 1.0f
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic media corpus (payload = seeded bytes). */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism)
      .map { id =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val mime = kind match {
          case "image" => "image/png"; case "audio" => "audio/wav"
          case _ => "video/mp4"
        }
        val len = 128 + ((id * 2654435761L + seed) % 896).toInt.abs
        val payload = Array.tabulate[Byte](len)(i =>
          (((id + seed) * 6364136223846793005L + i * 1442695040888963407L) >>> 17).toByte)
        MediaRow(id, kind, mime, payload, 0, 0, 0L)
      }
  }

  /** Decode + feature-extract stage. Partition-batched (`mapPartitions`
    * over the typed Dataset): the codec is initialized once per task, rows
    * stream through it — the exact shape a real decoder stage needs
    * (per-batch codec reuse, no per-row init).
    */
  def decodeAndFeaturize(media: Dataset[MediaRow], codec: MediaCodec = StubCodec,
                         featureDim: Int = 16): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, frames) = codec.decode(r.payload, r.kind)
        DecodedMedia(r.media_id, r.kind, w, h, frames,
          codec.features(r.payload, featureDim))
      }
    }
  }

  /** Frame-sample stage: pick every `stride`-th frame index, capped —
    * declarative (the frame indices are data; actual pixel extraction is
    * the codec's job downstream).
    */
  def frameSamplePlan(decoded: Dataset[DecodedMedia], stride: Int = 10,
                      maxFrames: Int = 8): DataFrame =
    decoded.toDF()
      .where(col("kind") === "video")
      .withColumn("sampled_frames",
        slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames))
      .select(col("media_id"), col("n_frames"), col("sampled_frames"))

  /** "Resize" planning stage: compute target dims preserving aspect ratio —
    * pure column math; the byte-level resample is the codec's job.
    */
  def resizePlan(decoded: Dataset[DecodedMedia], maxSide: Int = 256): DataFrame = {
    val d = decoded.toDF()
    val scale = least(lit(1.0), lit(maxSide.toDouble) /
      greatest(col("width"), col("height")).cast("double"))
    d.withColumn("target_w", greatest(lit(1), round(col("width") * scale).cast("int")))
      .withColumn("target_h", greatest(lit(1), round(col("height") * scale).cast("int")))
      .select("media_id", "kind", "width", "height", "target_w", "target_h")
  }
}
