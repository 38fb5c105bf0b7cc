package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The robots.txt fetch-permission decision as ONE codegen'd kernel —
  * the scale path of [[graft.ops.RobotsTxt.isAllowed]] (which stays as
  * the relational cross-check, RobotsTxtSpec). The relational form pays
  * the known per-row costs of data-carried patterns: `regexp_like` with a
  * non-foldable pattern compiles a `java.util.regex.Pattern` PER ROW per
  * wildcard rule (Spark only caches foldable patterns), and the
  * broadcast-array fold allocates per row. Here the whole effective rule
  * set — host → [(pattern, spec, allow)] — is carried as a reference
  * object (the [[BpeEncode]] pattern): wildcard regexes compile ONCE per
  * kernel instance, literal rules are raw `startsWith` probes, and the
  * per-row work is a hash lookup + a few matcher probes with zero
  * allocation on the literal path. Measured (CurationScalingBench robots
  * stage, 4M urls @8c): 4.81 s relational → see BASELINE.md row.
  *
  * Decision semantics are BIT-IDENTICAL to the relational fold: longest
  * pattern wins, Allow beats Disallow on ties, no match / no robots ⇒
  * allow (init (-1, allow)). The regex translation differs textually
  * (`Pattern.quote` segments vs the oracle's escape chain) but not
  * semantically — RobotsTxtSpec asserts decision equality on every
  * fixture matrix.
  *
  * Host-table ceiling: the table lives on the driver/executor heap
  * (~100 B/rule). Fine through ~10^6 hosts; at web-scale host counts
  * (10^8) partition the corpus by host range and build per-range tables,
  * or fall back to the relational join — documented seam, same contract.
  */
case class RobotsDecide(path: Expression, host: Expression,
                        table: RobotsDecide.Table)
    extends BinaryExpression {

  override def left: Expression = path
  override def right: Expression = host
  override def prettyName: String = "robots_decide"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (path.dataType == StringType && host.dataType == StringType)
      TypeCheckSuccess
    else TypeCheckFailure(
      s"path/host must be STRING, got ${path.dataType}/${host.dataType}")
  }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(p: Any, h: Any): Any =
    RobotsDecide.compute(p.asInstanceOf[UTF8String],
      h.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("robotsTable", table,
      classOf[RobotsDecide.Table].getName)
    nullSafeCodeGen(ctx, ev, (pV, hV) =>
      s"${ev.value} = graft.expr.RobotsDecide.compute($pV, $hV, $tableRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsDecide =
    copy(path = newLeft, host = newRight)
}

object RobotsDecide {

  /** One effective rule: literal rules keep only the prefix; wildcard/`$`
    * rules carry their regex SOURCE and compile it once per JVM (transient
    * lazy — survives task serialization without shipping Pattern
    * internals). `spec` = pattern length (the longest-match precedence
    * key), `allow` the verdict.
    */
  final class Rule(val prefix: String, val regexSrc: String,
                   val spec: Int, val allow: Boolean) extends Serializable {
    @transient lazy val regex: java.util.regex.Pattern =
      if (regexSrc == null) null else java.util.regex.Pattern.compile(regexSrc)
  }

  /** host → rules. Wrapped (not a bare Map) so codegen's reference-object
    * class name is concrete.
    */
  final class Table(val m: Map[String, Array[Rule]]) extends Serializable

  /** Same translation contract as `RobotsTxt.patternRegex`: `*` spans,
    * trailing `$` anchors, everything else literal, anchored at start.
    */
  private[graft] def toRegexString(p: String): String = {
    val hadDollar = p.endsWith("$")
    val core = if (hadDollar) p.dropRight(1) else p
    "^" + core.split("\\*", -1).map {
      case "" => ""
      case seg => java.util.regex.Pattern.quote(seg)
    }.mkString(".*") + (if (hadDollar) "$" else "")
  }

  def buildTable(rules: Seq[(String, String, Boolean)]): Table =
    new Table(rules.groupBy(_._1).map { case (host, rs) =>
      host -> rs.map { case (_, pat, allow) =>
        // specificity counts CODE POINTS — the relational fold uses
        // Spark's length(pattern), which is code-point based; UTF-16
        // units would diverge on supplementary-plane patterns
        val spec = pat.codePointCount(0, pat.length)
        if (!pat.contains("*") && !pat.endsWith("$"))
          new Rule(pat, null, spec, allow)
        else new Rule(null, toRegexString(pat), spec, allow)
      }.toArray
    })

  /** The per-row decision — identical fold semantics to the relational
    * `aggregate` in `RobotsTxt.isAllowed`: best (spec, allow) with init
    * (-1, allow=true).
    */
  def compute(path: UTF8String, host: UTF8String, table: Table): Boolean = {
    val rs = table.m.getOrElse(host.toString, null)
    if (rs == null) return true
    val p = path.toString
    var bestSpec = -1
    var bestAllow = true
    var i = 0
    while (i < rs.length) {
      val r = rs(i)
      val matched =
        if (r.prefix != null) p.startsWith(r.prefix)
        else r.regex.matcher(p).find()
      if (matched && (r.spec > bestSpec ||
          (r.spec == bestSpec && r.allow && !bestAllow))) {
        bestSpec = r.spec
        bestAllow = r.allow
      }
      i += 1
    }
    bestAllow
  }

  /** Column-API entry point. */
  def robots_decide(path: Column, host: Column, table: Table): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(RobotsDecide(GraftBridge.expression(path),
      GraftBridge.expression(host), table))
  }
}
