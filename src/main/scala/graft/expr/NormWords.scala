package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Normalized word sequence — the codegen'd twin of the Column formula
  * `filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " "),
  * w => w =!= "")` kept as `Curation.normWordsHof` (the CurationSpec
  * cross-check). This is the tokenization every curation operator shares
  * (exact-dedup content key, repetition ratios, decontamination /
  * dup-span n-grams), and the regex chain was the measured CPU center of
  * the whole family (~hundreds of µs per doc: a char-class regex pass,
  * a split pass, an interpreted filter pass, each allocating).
  *
  * Equivalence argument: after `UTF8String.toLowerCase` (the same call
  * the Lower expression makes), the formula's tokens are exactly the
  * maximal runs of `[a-z0-9]` characters — every other char (the space
  * the regex preserves, the chars it replaces with spaces — tabs and
  * newlines included, they are not in the keep class) acts as a
  * separator, and the empty-string filter collapses separator runs.
  * In UTF-8 BYTES, `[a-z0-9]` are single bytes and multi-byte sequences
  * never contain bytes < 0x80, so scanning bytes for keep-runs yields
  * the same tokens (a multi-byte char is a separator byte-run). One
  * lowercase, one byte scan, one token array per row.
  */
case class NormWords(child: Expression) extends UnaryExpression {

  override def prettyName: String = "norm_words"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"text must be STRING, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    NormWords.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, textV =>
      s"${ev.value} = graft.expr.NormWords.compute($textV);")

  override protected def withNewChildInternal(newChild: Expression): NormWords =
    copy(child = newChild)
}

object NormWords {
  import org.apache.spark.unsafe.types.UTF8String

  private def isKeep(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Static helper shared by eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](16)
    var i = 0
    while (i < n) {
      if (isKeep(bytes(i))) {
        val start = i
        while (i < n && isKeep(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i)))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def norm_words(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NormWords(GraftBridge.expression(text)))
  }
}
