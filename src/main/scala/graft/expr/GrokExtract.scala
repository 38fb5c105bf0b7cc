package graft.expr

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-group named regex extraction → struct.
  *
  * The grok primitive of the attributesprocessor `extract` action
  * (SURVEY.md §2.3, ref `internal/processor/attraction/attraction.go:
  * extractAttributes`): each named capture group of `pattern` becomes a
  * nullable string field of the output struct. Returns NULL when the pattern
  * does not match; a field is NULL when its group did not participate.
  *
  * vs composing N× `regexp_extract`: ONE regex pass per row instead of N,
  * and one compiled Pattern per task (transient lazy — the
  * filterset compiled-regex-cache convention, SURVEY.md §4.1).
  *
  * Group names are parsed by our own scanner (not Java's), so names may
  * contain underscores (`(?<latency_ms>…)`) like real grok field names;
  * named groups are rewritten to plain positional groups before
  * `Pattern.compile`.
  *
  * Codegen: implements `doGenCode` directly (no CodegenFallback) so the
  * expression stays inside whole-stage codegen on the hot parse path.
  */
case class GrokExtract(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "grok_extract"

  @transient private lazy val patternStr: String =
    right.eval().asInstanceOf[UTF8String].toString

  @transient private lazy val compiled: (Pattern, Array[String], Array[Int]) =
    GrokExtract.compilePattern(patternStr)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType != StringType) TypeCheckFailure("text must be STRING")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckFailure("pattern must be a STRING literal")
    else if (compiled._2.isEmpty)
      TypeCheckFailure(s"pattern has no named groups: $patternStr")
    else TypeCheckSuccess
  }

  override def dataType: DataType =
    StructType(compiled._2.map(n => StructField(n, StringType, nullable = true)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(text: Any, pat: Any): Any = {
    val (p, names, idx) = compiled
    val m = p.matcher(text.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val vals = new Array[Any](names.length)
      var i = 0
      while (i < names.length) {
        val g = m.group(idx(i))
        vals(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(vals)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("grokPattern", compiled._1,
      classOf[Pattern].getName)
    val idxRef = ctx.addReferenceObj("grokGroupIdx", compiled._3, "int[]")
    val n = compiled._2.length
    val m = ctx.freshName("matcher")
    val vals = ctx.freshName("vals")
    val gi = ctx.freshName("gi")
    val g = ctx.freshName("g")
    nullSafeCodeGen(ctx, ev, (textV, _) => {
      s"""
      java.util.regex.Matcher $m = $patRef.matcher($textV.toString());
      if ($m.find()) {
        Object[] $vals = new Object[$n];
        for (int $gi = 0; $gi < $n; $gi++) {
          String $g = $m.group($idxRef[$gi]);
          $vals[$gi] = $g == null ? null :
            org.apache.spark.unsafe.types.UTF8String.fromString($g);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
      } else {
        ${ev.isNull} = true;
      }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GrokExtract =
    copy(left = newLeft, right = newRight)
}

object GrokExtract {

  /** Column-API entry point (Spark 4: Column↔Expression via
    * classic.ExpressionUtils).
    */
  def grok_extract(text: Column, pattern: String): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      GrokExtract(GraftBridge.expression(text), Literal(pattern)))
  }

  /** Register as SQL function `grok_extract(text, pattern)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "grok_extract", exprs => GrokExtract(exprs.head, exprs(1)), "scala_udf")

  /** Rewrite `(?<name>…)` named groups (underscores allowed, unlike Java's
    * own named groups) into plain positional groups; return the compiled
    * pattern, the names in declaration order, and each name's positional
    * group index in the rewritten pattern.
    */
  private[graft] def compilePattern(raw: String): (Pattern, Array[String], Array[Int]) = {
    val sb = new StringBuilder
    val names = new ArrayBuffer[String]
    val idxs = new ArrayBuffer[Int]
    var i = 0
    var groupIdx = 0
    var inClass = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        sb.append(c).append(raw.charAt(i + 1)); i += 2
      } else if (inClass) {
        if (c == ']') inClass = false
        sb.append(c); i += 1
      } else if (c == '[') {
        inClass = true; sb.append(c); i += 1
      } else if (c == '(') {
        // lookbehind (?<= / (?<! is NOT a named group
        if (raw.startsWith("(?<", i) && i + 3 < raw.length &&
            raw.charAt(i + 3) != '=' && raw.charAt(i + 3) != '!') {
          val end = raw.indexOf('>', i + 3)
          require(end > 0, s"unterminated named group at offset $i in: $raw")
          groupIdx += 1
          names += raw.substring(i + 3, end)
          idxs += groupIdx
          sb.append('(')
          i = end + 1
        } else if (raw.startsWith("(?", i)) {
          sb.append("(?"); i += 2 // non-capturing / flags / lookaround
        } else {
          groupIdx += 1
          sb.append('('); i += 1
        }
      } else {
        sb.append(c); i += 1
      }
    }
    (Pattern.compile(sb.toString), names.toArray, idxs.toArray)
  }
}
