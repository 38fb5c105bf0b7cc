package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Consistent pseudonymization — identity-PRESERVING masking for
  * multi-turn transcripts, complementing [[graft.ops.Curation.redactPii]]
  * (which destroys the identity): every email / @handle occurrence is
  * replaced by a deterministic tag derived from the matched value, so
  * the same principal reads as the same pseudonym across a whole
  * conversation (and corpus) while the real identifier never survives.
  * Dialogue coherence — "did user_3f2a answer user_9c41?" — is exactly
  * what a plain `<EMAIL>` placeholder erases, and what SFT prep needs
  * kept.
  *
  * Tag derivation is standard-hash-replayable on BOTH engines: the tag
  * is the first 8 hex chars of md5(lowercase(match)) — `q_pseudonymize`
  * replays it in DuckDB as `lower(left(md5(lower(email)), 8))` on a
  * single-occurrence template, and the spec pins multi-occurrence
  * consistency, casing, and the handle arm. Matching: emails use
  * [[graft.ops.Curation.emailRe]] VERBATIM (the two PII surfaces must
  * agree on what an email is); handles are `@name` (2+ word chars) not
  * preceded by a word char (so the local part of an address never
  * double-matches after the email arm consumes it).
  *
  * Why a custom Expression: per-match COMPUTED replacements are outside
  * `regexp_replace` (static template only) — this is the
  * (c)-custom-expression tier, one compiled pattern + one StringBuilder
  * pass per row, codegen'd via the static-helper convention
  * ([[NormWords]]).
  */
case class Pseudonymize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "pseudonymize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"text must be STRING, got ${child.dataType}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    Pseudonymize.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, textV =>
      s"${ev.value} = graft.expr.Pseudonymize.compute($textV);")

  override protected def withNewChildInternal(newChild: Expression): Pseudonymize =
    copy(child = newChild)
}

object Pseudonymize {
  import org.apache.spark.unsafe.types.UTF8String

  // email arm FIRST so an address never half-matches as a handle; the
  // handle arm refuses a preceding word char for the same reason
  private val pat = java.util.regex.Pattern.compile(
    "(" + graft.ops.Curation.emailRe + ")|(?<![A-Za-z0-9_])@([A-Za-z0-9_]{2,})")

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 hex chars of md5(lowercase(value)) — the replayable tag. */
  private def tag(value: String): String = {
    val d = digest.get()
    d.reset()
    val h = d.digest(value.toLowerCase(java.util.Locale.ROOT)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(8)
    var i = 0
    while (i < 4) {
      sb.append(Character.forDigit((h(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(h(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Static helper shared by eval and generated code. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    val m = pat.matcher(s)
    if (!m.find()) return text // common case: no PII, zero allocation churn
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      if (m.group(1) != null)
        sb.append("user_").append(tag(m.group(1))).append("@example.com")
      else
        sb.append("@user_").append(tag(m.group(2)))
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }

  /** Column-API entry point. */
  def pseudonymize(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(Pseudonymize(GraftBridge.expression(text)))
  }
}
