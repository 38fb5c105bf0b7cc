package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd double dot product — the twin of the HOF formula kept as
  * `Similarity.dotHof` (the SimilaritySpec cross-check):
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)
  *
  * Why an Expression: the HOF shape allocates a fresh product array per
  * PAIR on the scoring paths — at 64 queries × millions of corpus rows
  * (brute-force/rerank scoring, IVF cell assignment, PQ codeword argmin)
  * that is the same interpreted-HOF churn the repo measured at ~7–14× on
  * the simhash/minhash paths before porting them to expressions. This is
  * one fused loop, no intermediate array.
  *
  * Bit parity with the HOF (and with DuckDB's DOUBLE[] accumulation —
  * the q_ann oracle contract): products and the accumulator are doubles,
  * accumulated sequentially left-to-right from a 0.0 seed — identical
  * IEEE operation sequence, so scores are bit-identical. Null semantics
  * replicated exactly: a null element poisons the sum (product null →
  * acc null thereafter), and unequal lengths null the result (zip_with
  * pads the shorter side with null).
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "dot_f64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"dot_f64 needs two ARRAY<DOUBLE> inputs, got $l and $r")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF64.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv) => s"""
      java.lang.Double ${ev.value}_r = graft.expr.DotF64.dotOrNull($av, $bv);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

object DotF64 {

  /** Static helper shared by eval and generated code. Boxed so the
    * HOF's null-poisoning semantics survive (see class doc).
    */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-API entry point; callers cast inputs to array<double>. */
  def dotF64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(DotF64(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}
