package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd ANN assignment/scoring kernels — the twins of the HOF
  * formulas kept as `Ivf.bestCellsHof` / `Pq.nearestCodeHof` /
  * `Pq.adcScoreHof` (spec cross-checks).
  *
  * Why Expressions: higher-order functions (`transform`/`array_sort`/
  * `aggregate`) have no codegen — inside the lambda every per-centroid
  * evaluation re-walks the expression tree interpreted AND re-runs
  * `Cast(array<float> → array<double>)` with per-element boxing. A jstack
  * of the 2-core AnnScalingBench ivf_build stage showed exactly that hot
  * loop (`Cast.castArray` → `ArrayData.foreach` inside
  * `ArrayTransform.eval`), tasks of ~8k rows × 64 centroids burning ~60 s
  * each — the same interpreted-HOF churn the repo measured at 7–14× on
  * the minhash/simhash/ngram paths before porting them to expressions
  * ([[MinHashSig]], [[SimHashSig]]). These kernels cast once, hoist the
  * centroid norms to construction time, and run one fused primitive loop
  * per row.
  *
  * Bit parity contracts (proven in AnnKernelSpec):
  *  - [[TopCellsByCosine]] ≡ `slice(reverse(array_sort(transform(centLit,
  *    c => struct(cosine(v, c.vec), c.cell)))), 1, n)` projected to cells:
  *    cosine = `when(norm(v)·norm(c) == 0, 0.0).otherwise(dot/d)` with
  *    both operands cast to double and sequentially accumulated ([[DotF64]]
  *    is that exact IEEE sequence); ordering is cos DESC with ties and
  *    null-cos ranking exactly like the reversed ascending struct sort
  *    (null cos < any cos, ties → larger cell first; double order is
  *    `java.lang.Double.compare`, so -0.0 < 0.0 and NaN > +Inf).
  *  - [[PqCodes]] ≡ per-subspace `element_at(reverse(array_sort(transform(
  *    bookLit, e => struct(dot(slice(vd, off, dsub), e.cw) − e.half,
  *    e.code)))), 1).code`: score s non-null iff the subvector window is
  *    fully in bounds with no null elements; argmax with ties → larger
  *    code; all-null subspace → largest code (the reversed nulls-first
  *    sort).
  *  - [[AdcScore]] ≡ `aggregate(zip_with(codes, lut, (c, row) =>
  *    element_at(row, c + 1)), 0.0, (acc, x) => acc + x)`: sequential
  *    double adds from a 0.0 seed; any null code/row (or a LUT shorter
  *    than the code array) nulls the sum.
  */
case class TopCellsByCosine(child: Expression,
                            cells: Seq[Int], cents: Seq[Seq[Double]], n: Int)
    extends UnaryExpression {

  require(cells.length == cents.length,
    s"top_cells: ${cells.length} cell ids for ${cents.length} centroids")
  require(n >= 1 && n <= cells.length,
    s"top_cells: n=$n out of [1, ${cells.length}]")

  override def prettyName: String = "top_cells_by_cosine"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(s"vector must be ARRAY<FLOAT|DOUBLE>, got $t")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val kernel: TopCellsKernel =
    new TopCellsKernel(cells.toArray, cents.map(_.toArray).toArray, n, isFloat)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("topCellsKernel", kernel,
      classOf[TopCellsKernel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.apply($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCellsByCosine =
    copy(child = newChild)
}

/** The [[TopCellsByCosine]] row loop, shared by eval and generated code.
  * Centroid norms are hoisted to construction (they are per-centroid
  * constants; sqrt of the same sequential sum-of-squares the HOF computes
  * per row, so the value is identical).
  */
class TopCellsKernel(cells: Array[Int], cents: Array[Array[Double]],
                     n: Int, isFloat: Boolean) extends Serializable {

  private val nc = cents.length
  private val dim = if (nc == 0) 0 else cents(0).length
  private val centNorm: Array[Double] = cents.map { c =>
    var s = 0.0d; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  def apply(v: ArrayData): ArrayData = {
    val len = v.numElements()
    // norm(v) is null-poisoned by any null element; a length mismatch
    // nulls every dot — both make every cosine null (HOF parity)
    var allNull = len != dim
    var nv = 0.0d
    if (!allNull) {
      var i = 0
      while (i < len && !allNull) {
        if (v.isNullAt(i)) allNull = true
        else { val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i); nv += x * x }
        i += 1
      }
    }
    if (!allNull) nv = math.sqrt(nv)
    val cos = new Array[Double](nc)
    val isNull = new Array[Boolean](nc)
    if (allNull) java.util.Arrays.fill(isNull, true)
    else {
      var j = 0
      while (j < nc) {
        val d = nv * centNorm(j)
        if (d == 0.0d) cos(j) = 0.0d
        else {
          val c = cents(j)
          var acc = 0.0d
          var i = 0
          while (i < dim) {
            val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
            acc += x * c(i)
            i += 1
          }
          cos(j) = acc / d
        }
        j += 1
      }
    }
    // reversed ascending (cos, cell) struct sort: cos DESC via
    // Double.compare (NaN largest, -0.0 < 0.0), null cos below every
    // non-null, all ties → larger cell first
    val idx = Array.range(0, nc)
    val ord = new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val (x, y) = (a.intValue(), b.intValue())
        val c =
          if (isNull(x) && isNull(y)) 0
          else if (isNull(x)) 1
          else if (isNull(y)) -1
          else -java.lang.Double.compare(cos(x), cos(y))
        if (c != 0) c else -Integer.compare(cells(x), cells(y))
      }
    }
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, ord)
    new GenericArrayData(boxed.take(n).map(i => cells(i.intValue())))
  }
}

object TopCellsByCosine {
  /** Column-API entry point. */
  def top_cells(vec: Column, centroids: Array[(Int, Array[Float])],
                n: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(TopCellsByCosine(GraftBridge.expression(vec),
      centroids.map(_._1).toSeq,
      centroids.map(_._2.map(_.toDouble).toSeq).toSeq, n))
  }
}

/** All `m` PQ codes of a vector in one fused pass — see the file doc for
  * the exact HOF parity contract.
  */
case class PqCodes(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty),
    "pq_codes: empty codebooks")

  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(s"pq_codes needs ARRAY<DOUBLE>, got $t")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val kernel: PqCodesKernel =
    new PqCodesKernel(books.map(_.map(_.toArray).toArray).toArray)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("pqCodesKernel", kernel,
      classOf[PqCodesKernel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.apply($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

class PqCodesKernel(books: Array[Array[Array[Double]]]) extends Serializable {

  private val m = books.length
  private val dsub = books(0)(0).length
  // ½|codeword|² — same left-to-right Scala sum the HOF literal builder
  // used, hoisted to construction
  private val halves: Array[Array[Double]] =
    books.map(_.map(cw => 0.5 * cw.map(x => x * x).sum))

  def apply(v: ArrayData): ArrayData = {
    val len = v.numElements()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      val book = books(j)
      val ksub = book.length
      // score is null for EVERY codeword of this subspace iff the window
      // is out of bounds or touches a null element (slice/zip_with
      // padding semantics) — the reversed nulls-first sort then picks
      // the largest code
      var windowNull = off + dsub > len
      if (!windowNull) {
        var i = off
        while (i < off + dsub && !windowNull) {
          if (v.isNullAt(i)) windowNull = true
          i += 1
        }
      }
      if (windowNull) codes(j) = ksub - 1
      else {
        var bestCode = 0
        var bestS = java.lang.Double.NEGATIVE_INFINITY
        var first = true
        var c = 0
        while (c < ksub) {
          val cw = book(c)
          var acc = 0.0d
          var i = 0
          while (i < dsub) { acc += v.getDouble(off + i) * cw(i); i += 1 }
          val s = acc - halves(j)(c)
          // ascending scan: >= keeps ties on the larger code, and
          // Double.compare keeps NaN above every finite score
          if (first || java.lang.Double.compare(s, bestS) >= 0) {
            bestS = s; bestCode = c; first = false
          }
          c += 1
        }
        codes(j) = bestCode
      }
      j += 1
    }
    new GenericArrayData(codes)
  }
}

object PqCodes {
  /** Column-API entry point; `vec` must already be cast to array<double>
    * (the caller's one-per-row cast — codegen'd, unlike the per-codeword
    * re-cast inside the HOF lambda this replaces).
    */
  def pq_codes(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(PqCodes(GraftBridge.expression(vec),
      books.map(_.map(_.toSeq).toSeq).toSeq))
  }
}

/** Sign-bit LSH bucket id from `planes` deterministic hyperplanes — the
  * codegen'd twin of `Similarity.hyperplaneBucketHof` (spec cross-check).
  *
  * HOF parity contract: per plane p, proj = Σ_i v(i) ·
  * ((pmod(xxhash64(p, i, seed), 2e6) / 1e6) − 1), accumulated
  * sequentially in double from 0.0 (v elements widened float→double);
  * bit p set iff proj ≥ 0 (a null or NaN proj sets NOTHING — the HOF's
  * `when(proj >= 0, …).otherwise(0)` null/false branch). Any null
  * element null-poisons EVERY plane's sum → bucket 0; an EMPTY vector is
  * also bucket 0 (the HOF's `sequence(0, size−1)` descends to [0, −1] at
  * size 0, null-padding the zip — not the proj = 0.0 one might expect).
  *
  * The plane components depend only on (plane, i, seed) — the HOF
  * re-derived them with two xxhash64 evaluations per element × plane ×
  * ROW; here they are cached per kernel (immutable snapshot published
  * via volatile, grown on demand for wider rows).
  */
case class HyperplaneBucketExpr(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63]: $planes")

  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(s"vector must be ARRAY<FLOAT|DOUBLE>, got $t")
    }
  }

  override def dataType: DataType = LongType

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val kernel: HyperplaneBucketKernel =
    new HyperplaneBucketKernel(planes, seed, isFloat)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("hyperplaneKernel", kernel,
      classOf[HyperplaneBucketKernel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.apply($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

class HyperplaneBucketKernel(planes: Int, seed: Long, isFloat: Boolean)
    extends Serializable {

  // comps(p)(i): immutable once published (volatile snapshot), grown
  // under lock when a wider row arrives — tasks on multiple threads share
  // this kernel instance. Deliberately NOT @transient: a serialized
  // kernel must arrive with a non-null (possibly dim-0) cache.
  @volatile private var comps: Array[Array[Double]] = make(0)

  private def make(dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, i) =>
      // Spark's xxhash64(p, i, seedLit) left-fold from seed 42:
      // hashInt(p) → hashInt(i) → hashLong(seed)
      val h = XXH64.hashLong(seed, XXH64.hashInt(i, XXH64.hashInt(p, 42L)))
      val m = ((h % 2000000L) + 2000000L) % 2000000L
      (m.toDouble / 1000000.0) - 1.0
    }

  private def compsFor(dim: Int): Array[Array[Double]] = {
    var c = comps
    if (c(0).length < dim) synchronized {
      if (comps(0).length < dim) comps = make(dim)
      c = comps
    }
    c
  }

  def apply(v: ArrayData): Long = {
    val n = v.numElements()
    // empty vector: the HOF's `sequence(0, size-1)` DESCENDS to [0, -1],
    // so the zip null-pads the empty side and every plane's sum is
    // null-poisoned — bucket 0, same as the null-element case below
    if (n == 0) return 0L
    var i = 0
    while (i < n) { // any null element poisons every plane's sum → bucket 0
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    val c = compsFor(n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val row = c(p)
      var proj = 0.0d
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        proj += x * row(i)
        i += 1
      }
      if (proj >= 0.0d) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}

object HyperplaneBucketExpr {
  /** Column-API entry point. */
  def hyperplane_bucket(vec: Column, planes: Int, seed: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(HyperplaneBucketExpr(GraftBridge.expression(vec),
      planes, seed))
  }
}

/** ADC score: sum over subspaces of `lut(j)(codes(j))` — see the file doc
  * for the exact HOF parity contract.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "adc_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"adc_score needs ARRAY<INT> codes and ARRAY<ARRAY<DOUBLE>> lut, got $l and $r")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcScore.scoreOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cv, lv) => s"""
      java.lang.Double ${ev.value}_r = graft.expr.AdcScore.scoreOrNull($cv, $lv);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {

  /** Static helper shared by eval and generated code. The HOF zips to the
    * LONGER side (null-padded), and `acc + null` poisons the sum — so any
    * length mismatch, null code, null LUT row, or out-of-range code nulls
    * the result. (The HOF's `element_at` would raise under ANSI for a
    * non-null out-of-range index; encoded codes are always in [0, ksub),
    * so that branch is unreachable on engine-produced frames — here it
    * degrades to null, the non-ANSI reading.)
    */
  def scoreOrNull(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    if (lut.numElements() != n) return null
    var acc = 0.0d
    var j = 0
    while (j < n) {
      if (codes.isNullAt(j) || lut.isNullAt(j)) return null
      val row = lut.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-API entry point. */
  def adc_score(codes: Column, lut: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(AdcScore(GraftBridge.expression(codes),
      GraftBridge.expression(lut)))
  }
}
