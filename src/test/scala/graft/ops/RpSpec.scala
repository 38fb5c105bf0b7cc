package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Random projection — exactness vs an independent plain-Scala replay of
  * the quantize+sign+sum arithmetic, partitioning invariance, the JL
  * distance-preservation property at generous bounds, and guards.
  */
class RpSpec extends SparkTestBase {
  import spark.implicits._

  private val seed = 11L
  private val dim = 16
  private val outDim = 8

  /** deterministic pseudo-random vectors (plain Scala, no Spark). */
  private def vec(id: Long): Array[Float] =
    Array.tabulate(dim) { i =>
      val h = ((id * 1315423911L) ^ (i * 2654435761L)) & 0xffffL
      (h.toFloat / 65536f) * 4f - 2f
    }

  private lazy val corpus =
    (0L until 40L).map(id => (id, vec(id).toSeq)).toDF("vec_id", "embedding")

  /** the engine's sign, replayed via Spark's own hash (the primitive). */
  private lazy val signs: Map[(Long, Long), Long] =
    Rp.signMatrix(spark, dim, outDim, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def replay(v: Array[Float]): Array[Long] = {
    val q = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    Array.tabulate(outDim) { j =>
      q.indices.map(i => q(i) * signs((i.toLong, j.toLong))).sum
    }
  }

  test("signMatrix is ±1, complete, deterministic") {
    assert(signs.size == dim * outDim)
    assert(signs.values.forall(s => s == 1L || s == -1L))
    assert(signs.values.toSeq.distinct.size == 2, "both signs occur")
    val again = Rp.signMatrix(spark, dim, outDim, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == signs)
  }

  test("projectMicro ≡ plain-Scala replay; partitioning-invariant") {
    def run(parts: Int): Map[Long, Seq[Long]] =
      Rp.project(corpus.repartition(parts), "vec_id", "embedding", outDim,
        seed).select("vec_id", "proj_micro")
        .as[(Long, Seq[Long])].collect().toMap
    val got = run(1)
    (0L until 40L).foreach { id =>
      assert(got(id) == replay(vec(id)).toSeq, s"vec $id")
    }
    assert(run(7) == got)
  }

  test("scaled view: squared distances preserved within JL tolerance") {
    val proj = Rp.project(corpus, "vec_id", "embedding", outDim, seed)
      .select(col("vec_id"), col("proj"))
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = (0L until 40L).map(id => id -> vec(id).map(_.toDouble).toSeq).toMap
    val ratios = for (a <- 0L until 20L; b <- (a + 1) until 20L) yield {
      val o = d2(orig(a), orig(b))
      val p = d2(proj(a), proj(b))
      p / o
    }
    // E[ratio] = 1; at outDim 8 individual pairs are noisy, the MEAN and
    // a generous per-pair envelope must hold
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"pair distortion out of envelope: ${ratios.min} .. ${ratios.max}")
  }

  test("codegen'd kernel ≡ interpreted HOF (float + double vecs, null element)") {
    // the kernel IS Rp.projectMicro now; the HOF is the independent twin
    def both(df: org.apache.spark.sql.DataFrame): (Seq[Row], Seq[Row]) = {
      def run(c: org.apache.spark.sql.Column): Seq[Row] =
        df.select(col("vec_id"), c.as("p")).orderBy("vec_id").collect().toSeq
      (run(Rp.projectMicro(col("embedding"), outDim, seed)),
       run(Rp.projectMicroHof(col("embedding"), outDim, seed)))
    }
    val (e, h) = both(corpus)
    assert(e == h, "float corpus")
    val dbl = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val (ed, hd) = both(dbl)
    assert(ed == hd, "double corpus")
    // a null element poisons every component on both paths
    val withNull = Seq((0L, Seq[java.lang.Float](1.5f, null, -2f)))
      .toDF("vec_id", "embedding")
    val (en, hn) = both(withNull)
    assert(en == hn, "null element")
    assert(en.head.getSeq[Any](1) == Seq.fill(outDim)(null))
  }

  test("kernel edge contract: empty vec → zeros; interpreted ≡ codegen") {
    // the HOF's sequence(0, -1) descent cannot express the empty vector;
    // the kernel defines it as the empty-index-set sum (all zeros)
    val empty = Seq((0L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val out = empty.select(
        Rp.projectMicro(col("embedding"), outDim, seed).as("p"))
      .as[Seq[Long]].head()
    assert(out == Seq.fill(outDim)(0L))
    // interpreted eval path ≡ codegen path (wholeStage must be off too:
    // WSCG calls doGenCode regardless of factoryMode — MinHashSpec lesson)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", false)
    try {
      val got = Rp.project(corpus, "vec_id", "embedding", outDim, seed)
        .select("vec_id", "proj_micro")
        .as[(Long, Seq[Long])].collect().toMap
      (0L until 40L).foreach { id =>
        assert(got(id) == replay(vec(id)).toSeq, s"vec $id interpreted")
      }
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", true)
    }
  }

  test("zero vector projects to zeros; guards fire") {
    val z = Seq((0L, Seq.fill(dim)(0f))).toDF("vec_id", "embedding")
    val out = Rp.project(z, "vec_id", "embedding", outDim, seed)
      .select("proj_micro").as[Seq[Long]].head()
    assert(out == Seq.fill(outDim)(0L))
    intercept[IllegalArgumentException] {
      Rp.project(corpus, "vec_id", "nope", outDim, seed)
    }
    intercept[IllegalArgumentException] {
      Rp.projectMicro(col("v"), 0, seed)
    }
  }
}
