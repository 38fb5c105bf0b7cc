package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("synthetic media is deterministic; decode stub is payload-stable") {
    val a = Multimodal.syntheticMedia(spark, 60)
    val b = Multimodal.syntheticMedia(spark, 60)
    val da = Multimodal.decodeAndFeaturize(a).collect().sortBy(_.media_id)
    val db = Multimodal.decodeAndFeaturize(b).collect().sortBy(_.media_id)
    assert(da.map(_.width).toSeq === db.map(_.width).toSeq)
    assert(da.map(_.features.toSeq).toSeq === db.map(_.features.toSeq).toSeq)
    assert(da.forall(_.features.length === 16))
    assert(da.forall(d => d.width >= 64 && d.height >= 64))
    assert(da.filter(_.kind == "image").forall(_.n_frames === 1))
  }

  test("frame sampling respects stride and cap") {
    val decoded = Multimodal.decodeAndFeaturize(Multimodal.syntheticMedia(spark, 90))
    val fs = Multimodal.frameSamplePlan(decoded, stride = 10, maxFrames = 8)
    val bad = fs.where(size($"sampled_frames") > 8 ||
      size($"sampled_frames") === 0).count()
    assert(bad === 0)
    // every sampled index < n_frames
    val oob = fs.where(exists($"sampled_frames", f => f >= $"n_frames")).count()
    assert(oob === 0)
  }

  test("resize plan preserves aspect ratio and cap") {
    val decoded = Multimodal.decodeAndFeaturize(Multimodal.syntheticMedia(spark, 60))
    val rp = Multimodal.resizePlan(decoded, maxSide = 256)
    assert(rp.where($"target_w" > 256 || $"target_h" > 256).count() === 0)
    // relative ratio error ≤ 10% (rounding on a small side dominates)
    val ratioOff = rp.where(
      abs($"target_w".cast("double") / $"target_h" /
          ($"width".cast("double") / $"height") - 1.0) > 0.10).count()
    assert(ratioOff === 0)
  }

  test("ImageHeaderCodec: real PNG/JPEG/GIF headers parse to exact dims; " +
    "format sniffed from magic bytes; garbage flags (0,0,0)") {
    import Multimodal.{ImageEncode, ImageHeaderCodec}
    for ((w, h) <- Seq((1, 1), (16, 1064), (1904, 16), (65535, 65535))) {
      assert(ImageHeaderCodec.decode(ImageEncode.png(w, h), "image") ===
        ((w, h, 1)), s"png $w x $h")
      assert(ImageHeaderCodec.decode(ImageEncode.gif(w, h), "image") ===
        ((w, h, 1)), s"gif $w x $h")
    }
    // JPEG dims are 16-bit
    for ((w, h) <- Seq((1, 1), (640, 480), (65535, 65535)))
      assert(ImageHeaderCodec.decode(ImageEncode.jpeg(w, h), "image") ===
        ((w, h, 1)), s"jpeg $w x $h")
    // sniffing ignores the declared kind's mime lie — bytes decide
    assert(ImageHeaderCodec.decode(ImageEncode.png(10, 20), "image") ===
      ((10, 20, 1)))
    // corrupt / truncated payloads flag, never throw
    assert(ImageHeaderCodec.decode(Array[Byte](1, 2, 3), "image") ===
      ((0, 0, 0)))
    assert(ImageHeaderCodec.decode(
      ImageEncode.jpeg(640, 480).take(6), "image") === ((0, 0, 0)))
    assert(ImageHeaderCodec.decode(Array.empty[Byte], "image") ===
      ((0, 0, 0)))
    // audio/video stay on the stub seam — same values as StubCodec
    val p = ImageEncode.png(10, 20)
    assert(ImageHeaderCodec.decode(p, "video") ===
      Multimodal.StubCodec.decode(p, "video"))
  }

  test("encoded-image corpus round-trips encoder → parser distributed") {
    val got = Multimodal.syntheticEncodedImages(spark, 90).map { r =>
      val (w, h, f) = Multimodal.ImageHeaderCodec.decode(r.payload, "image")
      (r.media_id, r.format, w, h, f)
    }.collect()
    assert(got.length === 90)
    for ((id, fmt, w, h, f) <- got) {
      assert(w === 16 + (id % 1904L).toInt, s"id $id ($fmt)")
      assert(h === 16 + ((id * 31L) % 1064L).toInt, s"id $id ($fmt)")
      assert(f === 1)
    }
    assert(got.map(_._2).toSet === Set("png", "jpeg", "gif"))
  }
}
