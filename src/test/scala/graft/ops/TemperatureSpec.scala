package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Temperature-based mixture weights — cross-checked against an
  * independent plain-Scala replay (same JVM Math.pow, so the one
  * quantized transcendental is bit-identical and everything else is
  * exact long arithmetic), plus the published scheme's properties:
  * alpha < 1 upweights small groups, alpha = 1 is proportional sampling,
  * the realized example mass approximates the target, and composition
  * with upsampleMixture yields the prescribed multiplicities.
  */
class TemperatureSpec extends SparkTestBase {
  import spark.implicits._

  // 3 groups with sizes 60 / 24 / 6
  private lazy val corpus = (
    (0 until 60).map(i => (i.toLong, "en")) ++
    (0 until 24).map(i => (100L + i, "de")) ++
    (0 until 6).map(i => (200L + i, "fi"))
  ).toDF("doc_id", "lang")

  private def replay(sizes: Map[String, Long], alpha: Double, t: Long)
      : Map[String, (Long, Long, Long, Long)] = {
    val mx = sizes.values.max.toDouble
    val powM = sizes.map { case (g, n) =>
      g -> math.floor(math.pow(n / mx, alpha) * 1e6 + 0.5).toLong }
    val tot = powM.values.sum
    sizes.map { case (g, n) =>
      val ppm = powM(g) * 1000000L / tot
      g -> ((n, powM(g), ppm, ppm * t / n))
    }
  }

  test("temperatureWeights ≡ plain-Scala replay across alphas and targets") {
    val sizes = Map("en" -> 60L, "de" -> 24L, "fi" -> 6L)
    for (alpha <- Seq(0.3, 0.5, 0.7, 1.0); t <- Seq(90L, 1000L)) {
      val got = Curation.temperatureWeights(corpus, "lang", alpha, t)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == replay(sizes, alpha, t), s"alpha=$alpha t=$t")
    }
  }

  test("alpha < 1 gives small groups more epochs; alpha = 1 equalizes") {
    val w = Curation.temperatureWeights(corpus, "lang", 0.5, 900L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(w("fi") > w("de") && w("de") > w("en"),
      s"epochs must rise as groups shrink: $w")
    // alpha = 1: p ∝ n exactly, so epochs = T/N for every group up to
    // quantization (p_ppm·T div n with p_ppm ≈ n/N·1e6)
    val w1 = Curation.temperatureWeights(corpus, "lang", 1.0, 900L)
      .collect().map(r => r.getLong(4))
    assert(w1.max - w1.min <= w1.max / 100,
      s"alpha=1 epochs must be ~equal: ${w1.toSeq}")
  }

  test("realized example mass Σ n_g·w_g approximates the target") {
    for (alpha <- Seq(0.3, 0.7)) {
      val rows = Curation.temperatureWeights(corpus, "lang", alpha, 5000L)
        .collect()
      val mass = rows.map(r => r.getLong(1) * r.getLong(4)).sum
      assert(math.abs(mass - 5000L * 1000000L) <= 5000L * 1000000L / 50,
        s"alpha=$alpha realized micro-mass $mass vs target 5e9")
    }
  }

  test("temperatureEpochs composes with upsampleMixture") {
    val eps = Curation.temperatureEpochs(corpus, "lang", 0.5, 450L)
    val up = Curation.upsampleMixture(corpus, "lang", "doc_id", eps,
      defaultWeight = 0.0)
    val counts = up.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = eps.toMap
    // per-group realized rows ∈ [floor(w)·n, ceil(w)·n] and near w·n
    Seq("en" -> 60L, "de" -> 24L, "fi" -> 6L).foreach { case (g, n) =>
      val w = expected(g)
      val c = counts.getOrElse(g, 0L)
      assert(c >= math.floor(w).toLong * n && c <= math.ceil(w).toLong * n,
        s"$g: $c copies for w=$w n=$n")
    }
  }

  test("deterministic across partitionings; guards reject bad params") {
    val a = Curation.temperatureWeights(corpus.repartition(1), "lang", 0.5,
      100L).collect().map(_.toSeq).toSet
    val b = Curation.temperatureWeights(corpus.repartition(7), "lang", 0.5,
      100L).collect().map(_.toSeq).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Curation.temperatureWeights(corpus, "lang", 0.0, 100L)
    }
    intercept[IllegalArgumentException] {
      Curation.temperatureWeights(corpus, "lang", 1.1, 100L)
    }
    intercept[IllegalArgumentException] {
      Curation.temperatureWeights(corpus, "lang", 0.5, 0L)
    }
  }

  test("single-group corpus: p = 1, epochs = T/n") {
    val one = (0 until 10).map(i => (i.toLong, "en")).toDF("doc_id", "lang")
    val r = Curation.temperatureWeights(one, "lang", 0.5, 25L)
      .collect()(0)
    assert(r.getLong(2) == 1000000L && r.getLong(3) == 1000000L)
    assert(r.getLong(4) == 2500000L) // 2.5 epochs in micro units
  }
}
