package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact random-projection components in one fused pass — the codegen'd
  * twin of the HOF formula kept as `Rp.projectMicroHof` (the RpSpec
  * cross-check). Component j = Σ_i floor(v(i)·1e6 + 0.5) · s(i, j) with
  * s(i, j) ∈ {+1, −1} derived from `xxhash64(seed, i, j)` — the exact
  * arithmetic `Rp`'s scaladoc defines (quantize once, sum longs).
  *
  * Why an Expression: the HOF shape is a nested
  * `transform(sequence, aggregate(sequence, …))` — outDim × dim
  * interpreted tree walks per ROW, each re-evaluating two casts and an
  * xxhash64 sign derivation. At production dims (768–4096 in, 64–256
  * out) that is hundreds of thousands of interpreted nodes per row —
  * the documented `Rp` seam, the same interpreted-HOF churn the repo
  * measured at 7–14× on the minhash/simhash/ANN paths before porting
  * them ([[MinHashSig]], [[SimHash64]], [[AnnKernels]]).
  *
  * Sign parity: Spark's `xxhash64(lit(seed), i, j)` left-folds from the
  * default seed 42 — `hashLong(j, hashLong(i, hashLong(seed, 42)))`;
  * `pmod(h, 2) == 0` ⇔ the low bit is clear (two's complement), so the
  * kernel tests `(h & 1) == 0`. Signs depend only on (i, j, seed) — the
  * HOF re-derived them per row; here they are cached per kernel (an
  * immutable snapshot published via volatile, grown on demand for wider
  * rows — the [[AnnKernels.HyperplaneBucketKernel]] pattern).
  *
  * Null/edge contract (proven in RpSpec where the HOF can express it):
  * a null input vector → null output (standard unary null intolerance;
  * the HOF yields an array of nulls there — `Rp.project` never sees a
  * null vector, its select is null-intolerant upstream); any null
  * ELEMENT poisons every component → an array of `outDim` nulls (the
  * HOF's poisoned sequential aggregate); an EMPTY vector → `outDim`
  * zeros (the sum over an empty index set — the HOF instead dies on its
  * `sequence(0, −1)` descent, so the kernel is strictly more defined).
  * Quantization is `Math.floor(x·1e6 + 0.5).toLong` — bit-identical to
  * `floor(cast(x as double) · 1e6 + 0.5)` including NaN → 0 and ±Inf
  * saturation (JLS d2l).
  */
case class RpProjectMicro(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {

  require(outDim >= 1, s"rp_project: outDim must be positive: $outDim")

  override def prettyName: String = "rp_project_micro"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(s"vector must be ARRAY<FLOAT|DOUBLE>, got $t")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val kernel: RpProjectKernel =
    new RpProjectKernel(outDim, seed, isFloat)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("rpProjectKernel", kernel,
      classOf[RpProjectKernel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.apply($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): RpProjectMicro =
    copy(child = newChild)
}

/** The row loop shared by eval and generated code. The sign matrix is
  * flat `signs(j · dim + i)`, grown under lock when a wider row arrives
  * (tasks on multiple threads share one kernel instance); deliberately
  * NOT @transient so a serialized kernel arrives with a non-null
  * (possibly dim-0) cache.
  */
class RpProjectKernel(outDim: Int, seed: Long, isFloat: Boolean)
    extends Serializable {

  @volatile private var cache: (Int, Array[Byte]) = (0, Array.emptyByteArray)

  private def make(dim: Int): Array[Byte] = {
    val a = new Array[Byte](outDim * dim)
    var j = 0
    while (j < outDim) {
      // hashLong(seed, 42) is loop-invariant per kernel but kept inside
      // make (construction-time, never per row)
      val hs = XXH64.hashLong(seed, 42L)
      var i = 0
      while (i < dim) {
        val h = XXH64.hashLong(j.toLong, XXH64.hashLong(i.toLong, hs))
        a(j * dim + i) = if ((h & 1L) == 0L) 1 else -1
        i += 1
      }
      j += 1
    }
    a
  }

  private def signsFor(dim: Int): (Int, Array[Byte]) = {
    var c = cache
    if (c._1 < dim) synchronized {
      if (cache._1 < dim) cache = (dim, make(dim))
      c = cache
    }
    c
  }

  def apply(v: ArrayData): ArrayData = {
    val len = v.numElements()
    var i = 0
    while (i < len) { // any null element poisons every component (HOF parity)
      if (v.isNullAt(i)) return new GenericArrayData(
        Array.fill[Any](outDim)(null))
      i += 1
    }
    val q = new Array[Long](len)
    i = 0
    while (i < len) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      q(i) = Math.floor(x * 1000000.0d + 0.5d).toLong
      i += 1
    }
    val (cd, signs) = signsFor(len)
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      val base = j * cd
      var s = 0L
      i = 0
      while (i < len) { s += q(i) * signs(base + i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }
}

object RpProjectMicro {
  /** Column-API entry point. */
  def rp_project_micro(vec: Column, outDim: Int, seed: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(RpProjectMicro(GraftBridge.expression(vec), outDim, seed))
  }
}
