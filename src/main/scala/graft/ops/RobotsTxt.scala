package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt compliance — the fetch-level crawl opt-out (RFC 9309),
  * complementing the page-level `<meta name=robots>` signal
  * ([[TextExtract.htmlMetaRobots]]). Published pipelines honor BOTH: a
  * crawl corpus carries each host's robots.txt alongside its captures
  * (Common Crawl ships them as robotstxt WARCs), and a curation pass must
  * be able to answer "was this URL even allowed to be fetched?" corpus-
  * wide, after the fact.
  *
  * Everything here is relational — parse, group formation, agent
  * selection, and longest-match evaluation are all Columns, no UDFs.
  *
  * Scale shapes (100 TB corpus, host-scale robots set):
  *  - [[parseRules]]: the per-host line windows (group formation needs
  *    line order) partition by HOST over the robots frame — a frame whose
  *    size is the number of hosts, not documents, and whose per-partition
  *    work is bounded by the 500 KiB robots.txt size cap crawlers apply
  *    (RFC 9309 §2.4). The corpus never enters this stage.
  *  - [[isAllowed]]: the corpus side never shuffles. Effective rules
  *    collapse to ONE row per host (`collect_list` into an array —
  *    bounded by the same 500 KiB cap), broadcast, and evaluated per row
  *    with array HOFs: filter candidates by prefix/pattern match, fold to
  *    the longest-match winner. One BroadcastHashJoin, zero exchanges on
  *    the 100 TB side (plan-gated in RobotsTxtSpec).
  *  - Literal rules (no `*`, no trailing `$`) — the overwhelming majority
  *    in real robots files — match via `startsWith`, staying in codegen.
  *    Only wildcard rules pay the regex path (the pattern is per-RULE
  *    data, so Spark compiles it at eval time; the rules array per host
  *    is tens of entries, and the literal fast path keeps the compile off
  *    the common case).
  *
  * Semantics implemented (RFC 9309 + the Google parser's documented
  * choices, which the RFC blessed):
  *  - Groups: consecutive `User-agent:` lines share one group; the
  *    group's rules apply to all of them. Rules before any User-agent
  *    line are ignored. Blank lines do NOT end a group (only a new
  *    User-agent run does). `#` starts a comment. Field names and agent
  *    tokens match case-insensitively; PATHS match case-sensitively.
  *  - Agent selection: a host's groups naming `agent` exactly
  *    (case-insensitive) win; only if none exist does the `*` group
  *    apply; no robots / no group ⇒ allow.
  *  - Rule evaluation: patterns are path prefixes (matched against
  *    path + '?' + query, fragment stripped), `*` matches any char run,
  *    trailing `$` anchors the end. The most specific (longest pattern)
  *    matching rule wins; on a tie Allow beats Disallow; no matching
  *    rule ⇒ allow. Empty-pattern rules (`Disallow:` = "no restriction",
  *    RFC 9309 §2.3.1.2) are no-ops and are dropped at parse.
  */
object RobotsTxt {

  /** Parse raw robots.txt bodies into one row per (host, agent, rule):
    * `(host, agent, allow: boolean, pattern, rule_idx)`. `rule_idx` is
    * the source line number (diagnostics / deterministic ordering).
    */
  def parseRules(robots: DataFrame, hostCol: String = "host",
                 txtCol: String = "robots_txt"): DataFrame = {
    require(robots.columns.contains(hostCol), s"missing column: $hostCol")
    require(robots.columns.contains(txtCol), s"missing column: $txtCol")
    import org.apache.spark.sql.expressions.Window
    // \r?\n: CRLF robots.txt files are the common real-world case, and
    // Spark's trim() strips only spaces — an unsplit \r would corrupt
    // every agent token and pattern (review finding; CRLF spec fixture)
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("line_idx", "raw")))
      .withColumn("clean", trim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("field",
        lower(trim(regexp_extract(col("clean"), "^([^:]+):", 1))))
      .withColumn("value",
        trim(regexp_extract(col("clean"), "^[^:]+:(.*)$", 1)))
      .where(col("field").isin("user-agent", "allow", "disallow"))
    // Group formation: a User-agent line OPENS a group unless the
    // previous kept line was also User-agent (consecutive UA lines
    // merge). Window is per host, ordered by source line — bounded by
    // the robots-file size cap, never by corpus size.
    val w = Window.partitionBy("host").orderBy("line_idx")
    val grouped = lines
      .withColumn("is_ua", col("field") === "user-agent")
      .withColumn("ng",
        (col("is_ua") && !coalesce(lag("is_ua", 1).over(w), lit(false)))
          .cast("int"))
      .withColumn("grp", sum("ng").over(w))
    val agents = grouped.where(col("is_ua"))
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
      .distinct()
    val ruleRows = grouped
      .where(!col("is_ua") && col("value") =!= "")
      .select(col("host"), col("grp"),
        (col("field") === "allow").as("allow"),
        col("value").as("pattern"), col("line_idx").as("rule_idx"))
    // LEFT join: orphan rules (grp 0, before any UA run) still drop per
    // the RFC, but a group with NO rules must SURVIVE as one
    // (agent, NULL-pattern) marker row — RFC 9309: a matched group with
    // no applicable rules means ALLOW, so the group must still win agent
    // selection in [[effectiveRules]] (a rule-less specific group that
    // vanished here would wrongly hand its crawler to the `*` group —
    // review finding). Null-pattern markers never match anything
    // downstream; callers listing rules filter `pattern IS NOT NULL`.
    agents.join(ruleRows, Seq("host", "grp"), "left")
      .select("host", "agent", "allow", "pattern", "rule_idx")
  }

  /** The rules that govern `agent` on each host: its exact
    * (case-insensitive) groups when any exist for that host, else the
    * `*` groups. All frames here are host-scale.
    */
  def effectiveRules(rules: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase
    require(a != "*", "agent must be a product token, not '*'")
    val mine = rules.where(col("agent").isin(a, "*"))
      .withColumn("_rb_spec_agent", col("agent") === a)
    val hasSpec = mine.groupBy("host")
      .agg(max(col("_rb_spec_agent")).as("_rb_has_spec"))
    mine.join(hasSpec, Seq("host"))
      .where(col("_rb_spec_agent") === col("_rb_has_spec"))
      .drop("_rb_spec_agent", "_rb_has_spec")
  }

  /** Regex translation of a robots pattern: escape RE2/Java specials,
    * `*` → `.*`, trailing `$` → end anchor, anchored at the path start.
    * Shared by engine and oracle verbatim (same two regexp_replace
    * steps), so the translation itself is replay-checked.
    */
  private[ops] def patternRegex(pat: Column): Column = {
    val esc = regexp_replace(pat, """([\\.\[\]{}()+?^$|*])""", """\\$1""")
    val star = regexp_replace(esc, """\\\*""", ".*")
    // trailing "\$" (2 escaped chars) becomes the real end anchor
    val anchored = when(pat.endsWith("$"),
      concat(star.substr(lit(1), length(star) - 2), lit("$")))
      .otherwise(star)
    concat(lit("^"), anchored)
  }

  /** The match target: path + query of the RAW url (case preserved —
    * robots paths are case-sensitive), fragment stripped, empty → "/".
    */
  def urlPath(url: Column): Column = {
    val afterScheme =
      regexp_replace(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val afterAuth = regexp_replace(afterScheme, "^[^/]*", "")
    val noFrag = regexp_replace(afterAuth, "#.*$", "")
    when(noFrag === "", "/").otherwise(noFrag)
  }

  /** Decide fetch permission for every URL: adds `allowed: boolean`.
    * `rules` is [[parseRules]] output (any agents); the decision is for
    * `agent`. The corpus side never shuffles: effective rules collapse
    * to one array row per host and broadcast (plan-gated).
    */
  def isAllowed(urls: DataFrame, urlCol: String, rules: DataFrame,
                agent: String,
                precomputedHost: Option[String] = None,
                precomputedPath: Option[String] = None): DataFrame = {
    require(urls.columns.contains(urlCol), s"missing column: $urlCol")
    Seq("_rb_host", "_rb_rules", "_rb_win", "_rb_path").foreach(c => require(
      !urls.columns.contains(c), s"input may not contain internal column $c"))
    (precomputedHost.toSeq ++ precomputedPath).foreach(c => require(
      urls.columns.contains(c), s"missing precomputed column: $c"))
    // agent selection runs on the FULL frame (rule-less marker rows must
    // count); the markers themselves match nothing and are dropped here
    val eff = effectiveRules(rules, agent)
      .where(col("pattern").isNotNull)
      .withColumn("_rb_rx", patternRegex(col("pattern")))
      .withColumn("_rb_lit",
        !col("pattern").contains("*") && !col("pattern").endsWith("$"))
      .withColumn("_rb_len", length(col("pattern")))
    val byHost = eff.groupBy(col("host").as("_rb_host"))
      .agg(collect_list(struct(
        col("pattern").as("pat"), col("_rb_rx").as("rx"),
        col("_rb_lit").as("lit"), col("_rb_len").as("spec"),
        col("allow").cast("int").as("allow"))).as("_rb_rules"))
    // The host/path regex chains are the family's measured per-row cost
    // center (the UrlCuration `precomputed` lesson): a pipeline that has
    // already derived them passes the column names and skips re-deriving.
    val path = precomputedPath.map(col).getOrElse(urlPath(col(urlCol)))
    val hostC = precomputedHost.map(col)
      .getOrElse(UrlCuration.urlHost(col(urlCol)))
    val joined = urls
      .withColumn("_rb_host", hostC)
      .join(broadcast(byHost), Seq("_rb_host"), "left")
    val p = col("_rb_path")
    val cand = filter(coalesce(col("_rb_rules"),
        array().cast("array<struct<pat:string,rx:string,lit:boolean,spec:int,allow:int>>")),
      r => when(r.getField("lit"), p.startsWith(r.getField("pat")))
        .otherwise(regexp_like(p, r.getField("rx"))))
    // longest-match fold; tie → Allow; no match → the (-1, allow) init
    val win = aggregate(cand,
      struct(lit(-1).as("spec"), lit(1).as("allow")),
      (acc, r) => when(
        r.getField("spec") > acc.getField("spec") ||
          (r.getField("spec") === acc.getField("spec") &&
            r.getField("allow") > acc.getField("allow")),
        struct(r.getField("spec").as("spec"),
          r.getField("allow").as("allow"))).otherwise(acc))
    joined
      .withColumn("_rb_path", path)
      .withColumn("_rb_win", win)
      .withColumn("allowed", col("_rb_win.allow") === 1)
      .drop("_rb_host", "_rb_rules", "_rb_win", "_rb_path")
  }

  /** [[isAllowed]] as one codegen'd kernel ([[graft.expr.RobotsDecide]]):
    * the effective rule table is collected (host-scale — the documented
    * heap ceiling at ~10^6 hosts; beyond that, range-partition hosts or
    * use the relational [[isAllowed]]) and carried as a reference object,
    * so wildcard regexes compile once per JVM instead of once per ROW
    * (the non-foldable `regexp_like` cost), literal rules are raw
    * startsWith probes, and the corpus plan is scan → one projection —
    * no join node at all. Decision-identical to [[isAllowed]]
    * (RobotsTxtSpec asserts equality on every fixture matrix). Measured
    * numbers live in the BASELINE.md robots rows: end-to-end the
    * host/path DERIVATION regex chains dominate both variants (pass
    * `precomputedHost`/`precomputedPath` in a pipeline that already has
    * them — the UrlCuration lesson); on precomputed inputs the kernel's
    * decision pass is join-free and allocation-light.
    */
  def isAllowedFast(urls: DataFrame, urlCol: String, rules: DataFrame,
                    agent: String,
                    precomputedHost: Option[String] = None,
                    precomputedPath: Option[String] = None): DataFrame = {
    require(urls.columns.contains(urlCol), s"missing column: $urlCol")
    (precomputedHost.toSeq ++ precomputedPath).foreach(c => require(
      urls.columns.contains(c), s"missing precomputed column: $c"))
    val eff = effectiveRules(rules, agent)
      .where(col("pattern").isNotNull) // rule-less-group markers
      .select("host", "pattern", "allow").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq
    val table = graft.expr.RobotsDecide.buildTable(eff)
    urls.withColumn("allowed", graft.expr.RobotsDecide.robots_decide(
      precomputedPath.map(col).getOrElse(urlPath(col(urlCol))),
      precomputedHost.map(col).getOrElse(UrlCuration.urlHost(col(urlCol))),
      table))
  }

  /** Measured cut line between the two evaluation strategies: the kernel's
    * reference-object rule table degrades past ~10^5 hosts (the
    * BASELINE.md 128k-host row reads eff 0.67 — per-row hash probes into
    * a table that no longer fits the cache hierarchy), while the
    * relational broadcast join's per-host array rows stay partitioned
    * state. Default sits just under the measured ceiling.
    */
  val KernelHostCeiling: Long = 100000L

  /** ONE entry point that picks the evaluation strategy by rule-table
    * size: hosts ≤ `hostThreshold` → the join-free codegen'd
    * [[isAllowedFast]] kernel (the steady-state winner at real-world
    * host counts); above it → the relational [[isAllowed]] broadcast
    * join, whose memory/cache footprint scales with Spark's own
    * broadcast machinery instead of a per-executor reference object.
    * The two are decision-identical (RobotsTxtSpec asserts equality on
    * every fixture matrix, and parity through THIS switch on both sides
    * of the threshold), so the choice is purely a performance route.
    * The host count is one aggregate over the HOST-scale rules frame —
    * never the corpus.
    */
  def isAllowedAuto(urls: DataFrame, urlCol: String, rules: DataFrame,
                    agent: String,
                    precomputedHost: Option[String] = None,
                    precomputedPath: Option[String] = None,
                    hostThreshold: Long = KernelHostCeiling): DataFrame = {
    val nHosts = rules.select(col("host")).distinct().count()
    if (nHosts <= hostThreshold)
      isAllowedFast(urls, urlCol, rules, agent, precomputedHost,
        precomputedPath)
    else
      isAllowed(urls, urlCol, rules, agent, precomputedHost,
        precomputedPath)
  }
}
