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
}
