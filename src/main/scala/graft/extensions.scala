package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the library's custom Catalyst functions, so
  * config-driven predicates (`PipelineConfig` sink SQL) and plain
  * `spark.sql(...)` can call them — not just the Column API:
  *
  *  - `grok_extract(text, pattern)` → struct of named groups
  *    ([[graft.expr.GrokExtract]], codegen'd one-pass multi-group regex)
  *  - `topk_by_score(score, id, k)` → array<struct<id,score>>
  *    ([[graft.expr.TopKByScore]], bounded k-entry partial aggregate)
  */
object GraftFunctions {

  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    require(exprs.length == n,
      s"$name expects $n arguments, got ${exprs.length}")

  val grokExtract: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("grok_extract"),
    new ExpressionInfo(classOf[graft.expr.GrokExtract].getName, "grok_extract"),
    { exprs =>
      arity("grok_extract", exprs, 2)
      graft.expr.GrokExtract(exprs.head, exprs(1))
    })

  val topkByScore: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_by_score"),
    new ExpressionInfo(classOf[graft.expr.TopKByScore].getName, "topk_by_score"),
    { exprs =>
      arity("topk_by_score", exprs, 3)
      // k parameterizes the aggregation BUFFER, so it must be a compile-
      // time constant, exactly like approx_percentile's accuracy argument.
      // Bare AggregateFunction: the analyzer wraps it in AggregateExpression
      graft.expr.TopKByScore(exprs.head, exprs(1),
        literalInt("topk_by_score", "k", exprs(2)))
    })

  /** The ONE literal-int argument parser every builder shares (a
    * second inline copy would drift on the next range/type fix).
    */
  private def literalInt(name: String, arg: String, e: Expression): Int = {
    require(e.foldable, s"$name: $arg must be a literal integer")
    e.eval() match {
      case i: Int if i >= 1 => i
      case i: Int => throw new IllegalArgumentException(
        s"$name: $arg out of range [1, ${Int.MaxValue}]: $i")
      case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
      case l: Long => throw new IllegalArgumentException(
        s"$name: $arg out of range [1, ${Int.MaxValue}]: $l")
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be an integer literal, got $other")
    }
  }

  /** Long twin of [[literalInt]] for arguments that are genuinely 64-bit
    * (hash seeds — any value is valid, so no range check).
    */
  private def literalLong(name: String, arg: String, e: Expression): Long = {
    require(e.foldable, s"$name: $arg must be a literal integer")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be an integer literal, got $other")
    }
  }

  val rpProject: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rp_project_micro"),
    new ExpressionInfo(classOf[graft.expr.RpProjectMicro].getName, "rp_project_micro"),
    { exprs =>
      arity("rp_project_micro", exprs, 3)
      // outDim sizes the kernel's sign matrix, seed derives it — both
      // compile-time constants like topk_by_score's k
      graft.expr.RpProjectMicro(exprs.head,
        literalInt("rp_project_micro", "outDim", exprs(1)),
        literalLong("rp_project_micro", "seed", exprs(2)))
    })

  val wordShingles: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[graft.expr.WordShingles].getName, "word_shingles"),
    { exprs =>
      arity("word_shingles", exprs, 2)
      graft.expr.WordShingles(exprs.head,
        literalInt("word_shingles", "k", exprs(1)))
    })

  val minhashSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[graft.expr.MinHashSig].getName, "minhash_sig"),
    { exprs =>
      arity("minhash_sig", exprs, 2)
      graft.expr.MinHashSig(exprs.head,
        literalInt("minhash_sig", "numHashes", exprs(1)))
    })

  val simhash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash"),
    new ExpressionInfo(classOf[graft.expr.SimHash64].getName, "simhash"),
    { exprs =>
      arity("simhash", exprs, 1)
      graft.expr.SimHash64(exprs.head)
    })

  val normWords: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("norm_words"),
    new ExpressionInfo(classOf[graft.expr.NormWords].getName, "norm_words"),
    { exprs =>
      arity("norm_words", exprs, 1)
      graft.expr.NormWords(exprs.head)
    })

  val pseudonymize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pseudonymize"),
    new ExpressionInfo(classOf[graft.expr.Pseudonymize].getName, "pseudonymize"),
    { exprs =>
      arity("pseudonymize", exprs, 1)
      graft.expr.Pseudonymize(exprs.head)
    })

  /** Register a Column-composition operator as a SQL function: the builder
    * rebuilds the SAME Catalyst expression tree the Column API produces
    * (one shared implementation — SQL and Column callers cannot drift).
    */
  private def columnFn(name: String, n: Int,
                       f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(GraftFunctions.getClass.getName, name),
    { exprs =>
      arity(name, exprs, n)
      import org.apache.spark.sql.GraftBridge
      GraftBridge.expressionConverted(f(exprs.map(GraftBridge.column)))
    })

  val sampleRank = columnFn("sample_rank", 1,
    cs => graft.ops.Curation.sampleRank(cs.head))

  val shardAssign: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shard_assign"),
    new ExpressionInfo(GraftFunctions.getClass.getName, "shard_assign"),
    { exprs =>
      arity("shard_assign", exprs, 2)
      import org.apache.spark.sql.GraftBridge
      GraftBridge.expressionConverted(graft.ops.Curation.shardAssign(
        GraftBridge.column(exprs.head),
        literalInt("shard_assign", "nShards", exprs(1))))
    })

  val redactPii = columnFn("redact_pii", 1,
    cs => graft.ops.Curation.redactPii(cs.head))

  val dupWordRatio = columnFn("dup_word_ratio", 1,
    cs => graft.ops.Curation.dupWordRatio(cs.head))

  val urlNormalize = columnFn("url_normalize", 1,
    cs => graft.ops.UrlCuration.urlNormalize(cs.head))

  val urlHost = columnFn("url_host", 1,
    cs => graft.ops.UrlCuration.urlHost(cs.head))

  val urlDomain = columnFn("url_domain", 1,
    cs => graft.ops.UrlCuration.urlDomain(cs.head))

  // the robots match target (path + query, fragment stripped, "" → "/")
  val urlPath = columnFn("url_path", 1,
    cs => graft.ops.RobotsTxt.urlPath(cs.head))

  // PSL registrable domain over the BUNDLED rule table (SQL surface can't
  // carry a table object; callers needing a custom table use the Column
  // API seam)
  val pslDomain = columnFn("psl_domain", 1,
    cs => graft.ops.UrlCuration.domainOfHostPsl(cs.head))

  private def all = Seq(grokExtract, topkByScore, wordShingles, minhashSig,
    simhash, normWords, pseudonymize, sampleRank, shardAssign, redactPii,
    dupWordRatio, urlNormalize, urlHost, urlDomain, urlPath, pslDomain,
    rpProject)

  /** Register every function on an existing session (the `Main`/test
    * path; temp functions live for the session).
    */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}

/** Deployment entry point for clusters: ship the jar and set
  * `spark-submit --conf spark.sql.extensions=graft.GraftExtensions` — every
  * session then has the library's SQL functions without any code calling
  * a register method (the standard Spark extension-injection contract).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.grokExtract)
    ext.injectFunction(GraftFunctions.topkByScore)
    ext.injectFunction(GraftFunctions.wordShingles)
    ext.injectFunction(GraftFunctions.minhashSig)
    ext.injectFunction(GraftFunctions.simhash)
    ext.injectFunction(GraftFunctions.normWords)
    ext.injectFunction(GraftFunctions.pseudonymize)
    ext.injectFunction(GraftFunctions.sampleRank)
    ext.injectFunction(GraftFunctions.shardAssign)
    ext.injectFunction(GraftFunctions.redactPii)
    ext.injectFunction(GraftFunctions.dupWordRatio)
    ext.injectFunction(GraftFunctions.urlNormalize)
    ext.injectFunction(GraftFunctions.urlHost)
    ext.injectFunction(GraftFunctions.urlDomain)
    ext.injectFunction(GraftFunctions.urlPath)
    ext.injectFunction(GraftFunctions.pslDomain)
    ext.injectFunction(GraftFunctions.rpProject)
  }
}
