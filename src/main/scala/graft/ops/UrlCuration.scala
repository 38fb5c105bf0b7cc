package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation — the FIRST stage of the published web-corpus
  * pipelines (RefinedWeb's URL filtering, CCNet/C4's provenance rules):
  * normalize crawl URLs to a canonical key, extract the registrable
  * domain, drop blocklisted domains, and cap how many documents any one
  * domain may contribute (the anti-SEO-farm rule).
  *
  * Scale shapes (100 TB corpus):
  *  - normalize / host / domain: pure per-row codegen'd string Columns —
  *    embarrassingly parallel, no shuffle, whole-stage codegen keeps the
  *    regex chain fused with the scan.
  *  - blocklist: broadcast LEFT ANTI join — a blocklist of even 10^6
  *    domains is a few MB; the corpus never shuffles.
  *  - per-domain cap: [[Curation.quotaSample]]'s bounded TopKByScore
  *    partial buffers pick the ≤cap survivors per domain (map-side
  *    k-entry combine — a domain with 10^9 pages costs O(tasks × cap)
  *    shuffled entries, never a per-domain sort), then a LEFT SEMI join
  *    keyed on (domain, id) restores the full rows — the id in the key
  *    spreads hot domains across reducers, so no skew funnel anywhere
  *    (the exactKeep lesson applied to domains).
  *
  * The registrable-domain rule is the standard 2-label heuristic with a
  * second-level-domain exception list (co.uk / com.au / ac.jp …): take the
  * last TWO labels, or the last THREE when the second-to-last label is a
  * generic second-level name under a 2-letter country TLD. A full public-
  * suffix list is a data file, not an algorithm change — swap the
  * [[secondLevelNames]] set for the PSL table and the plan is identical.
  */
object UrlCuration {

  /** Generic second-level names that appear under 2-letter country TLDs
    * (bbc.co.uk, unimelb.edu.au, todai.ac.jp, …).
    */
  val secondLevelNames: Seq[String] =
    Seq("co", "com", "net", "org", "ac", "gov", "edu")

  /** Canonical URL key: lowercase, scheme / fragment / query / authority
    * userinfo (`user:pass@`) / leading `www.` (also `www2.` …) / trailing
    * slashes stripped. Every regex is anchored so it matches at most once
    * — the same chain replays verbatim in the DuckDB oracle (whose
    * regexp_replace is first-match-only). The userinfo strip runs AFTER
    * the fragment/query strips and anchors on a GREEDY `[^/?#]*` class:
    * it cannot cross into the path, so a path/query `@` is never
    * mistaken for an authority delimiter, and greediness strips to the
    * LAST pre-path `@` — the WHATWG/browser/curl rule — so doubled-`@`
    * userinfo (`a@b@blocked.com`) cannot evade a blocklist either.
    * Without this step `user@blocked.com` would not equal `blocked.com`.
    */
  def urlNormalize(url: Column): Column = {
    val u0 = lower(trim(url))
    val u1 = regexp_replace(u0, "^[a-z][a-z0-9+.-]*://", "")
    val u2 = regexp_replace(u1, "#.*$", "")
    val u3 = regexp_replace(u2, "\\?.*$", "")
    val u4 = regexp_replace(u3, "^[^/?#]*@", "")
    val u5 = regexp_replace(u4, "^www\\d*\\.", "")
    regexp_replace(u5, "/+$", "")
  }

  /** Host of a URL: the normalized key up to the first `/`, port
    * stripped.
    */
  def urlHost(url: Column): Column =
    regexp_replace(regexp_extract(urlNormalize(url), "^([^/]+)", 1),
      ":\\d+$", "")

  /** Registrable domain of a URL under the documented heuristic: last two
    * host labels, or last three when the second-to-last is a
    * [[secondLevelNames]] entry under a 2-letter TLD. A bare or
    * single-label host passes through unchanged.
    */
  def urlDomain(url: Column): Column = domainOfHost(urlHost(url))

  /** The registrable-domain rule applied to an already-extracted host.
    *
    * The label array is bound as a LAMBDA VARIABLE (a one-element outer
    * `transform` — the [[graft.ops.Dedup.wordShinglesHof]] lesson), not
    * referenced from the enclosing scope: a captured subtree is COPIED
    * into the expression per reference, so the 8-regex normalize chain
    * feeding `host` would be inlined ~12× across the CASE branches (and
    * once more in the pushed-down join-key null filter) — measured 12.5 s
    * vs ~3 s for the whole 1M-doc domainCap at 8 cores before this
    * binding. The `n ≤ 2` branch reconstructs the host as
    * `array_join(labels, ".")` (split-then-rejoin on '.' is the identity,
    * Spark's split keeping leading/trailing empties) so the lambda needs
    * ONLY the label array.
    */
  def domainOfHost(host: Column): Column =
    element_at(transform(array(split(host, "\\.")), labels => {
      val n = size(labels)
      val take3 = (n >= 3) &&
        element_at(labels, -2).isin(secondLevelNames: _*) &&
        (length(element_at(labels, -1)) === 2)
      when(n <= 2, array_join(labels, "."))
        .when(take3, array_join(slice(labels, n - 2, lit(3)), "."))
        .otherwise(array_join(slice(labels, n - 1, lit(2)), "."))
    }), 1)

  /** Registrable domain under a REAL Public Suffix List rule table — the
    * data-correct upgrade over [[domainOfHost]]'s 2-label + ccSLD
    * heuristic, which mis-groups `github.io` / multi-label-ccSLD hosts
    * (every user of a shared hosting suffix collapses into one "domain",
    * so a domain cap would throttle all of github.io as one site). The
    * heuristic stays as the dependency-free fallback; this is the same
    * contract (bare/short hosts pass through) driven by
    * [[graft.expr.PslDomain]] — full PSL algorithm (wildcards,
    * exceptions), bundled curated rule subset, swap-in seam for the
    * complete public file.
    */
  def domainOfHostPsl(host: Column,
      table: graft.expr.PslDomain.Table = graft.expr.PslDomain.loadDefault): Column =
    graft.expr.PslDomain.psl_domain(host, table)

  /** [[urlDomain]] with PSL resolution — see [[domainOfHostPsl]]. */
  def urlDomainPsl(url: Column,
      table: graft.expr.PslDomain.Table = graft.expr.PslDomain.loadDefault): Column =
    domainOfHostPsl(urlHost(url), table)

  /** Drop every row whose registrable domain appears in `blocked` (one
    * string column named `domainCol`). Broadcast LEFT ANTI — the corpus
    * side never shuffles. When several URL stages compose, derive the
    * domain ONCE (`withColumn(d, urlDomain(...))`) and pass the column
    * name as `precomputed` — the normalize chain is the family's measured
    * per-row cost center and re-deriving it per stage multiplies it.
    */
  def blockDomains(df: DataFrame, urlCol: String, blocked: DataFrame,
                   domainCol: String = "domain",
                   precomputed: Option[String] = None): DataFrame = {
    require(df.columns.contains(urlCol), s"missing input column: $urlCol")
    require(blocked.columns.contains(domainCol),
      s"blocklist is missing column: $domainCol")
    require(!df.columns.contains("_url_dom"),
      "input may not contain the internal column _url_dom")
    precomputed.foreach(c => require(df.columns.contains(c),
      s"missing precomputed domain column: $c"))
    val dom = precomputed.map(col).getOrElse(urlDomain(col(urlCol)))
    df.withColumn("_url_dom", dom)
      .join(broadcast(blocked.select(col(domainCol).as("_url_dom"))),
        Seq("_url_dom"), "left_anti")
      .drop("_url_dom")
  }

  /** Keep at most `cap` documents per registrable domain — the
    * deterministic [[Curation.sampleRank]] pick (stable across runs,
    * partitionings, and engines), with the full input row restored.
    * Requires an integral non-negative id (sampleRank's contract).
    * `precomputed` as in [[blockDomains]].
    */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
                cap: Int, precomputed: Option[String] = None): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    require(df.columns.contains(urlCol), s"missing input column: $urlCol")
    require(df.columns.contains(idCol), s"missing input column: $idCol")
    Seq("_url_dom", "_url_keep").foreach(c => require(
      !df.columns.contains(c), s"input may not contain internal column $c"))
    precomputed.foreach(c => require(df.columns.contains(c),
      s"missing precomputed domain column: $c"))
    val dom = precomputed.map(col).getOrElse(urlDomain(col(urlCol)))
    val withDom = df.withColumn("_url_dom", dom)
    val kept = Curation
      .quotaSample(withDom.select(col("_url_dom"), col(idCol)),
        Seq("_url_dom"), idCol, cap)
      .select(col("_url_dom").as("_url_dom_k"),
        col(idCol).as("_url_keep"))
    withDom
      .join(kept, col("_url_dom") === col("_url_dom_k") &&
        col(idCol).cast("long") === col("_url_keep"), "left_semi")
      .drop("_url_dom")
  }
}
