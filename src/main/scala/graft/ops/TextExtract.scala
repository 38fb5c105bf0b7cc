package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the stage every published web pipeline runs
  * BEFORE any filter in this library (C4/CCNet/RefinedWeb all start from
  * crawl HTML, not clean text): strip the non-content machinery
  * (scripts, styles, comments, tags), decode the core entities, preserve
  * block structure as newlines, and report the text-to-markup density
  * (boilerplate/navigation pages have low density — RefinedWeb §3.1 uses
  * exactly this signal to drop chrome-heavy pages).
  *
  * Deliberately a HEURISTIC single-pass regex chain, not an HTML5 parse
  * (the published pipelines' own stance: C4 treats extraction as regex
  * cleanup; a DOM parse of 100 TB is a different budget). Documented
  * limits: CDATA gets no special treatment (its markers strip like tags,
  * its content stays); an unterminated `<` is left as-is; only the
  * six core entities decode (`&lt; &gt; &quot; &#39; &nbsp; &amp;` —
  * `&amp;` LAST, so `&amp;lt;` correctly yields the literal `&lt;`).
  *
  * Scale shape: a chain of codegen'd `regexp_replace`/`replace` Columns —
  * pure per-row projection, zero exchanges at any corpus size, no UDF,
  * patterns are literals so the compiled regex is reused per task. Every
  * step is RE2-compatible (no backreferences, no lookaround), so the
  * DuckDB oracle replays the chain verbatim — the q_html_extract check is
  * engine-vs-engine on the SAME published rule list, not a dump import.
  *
  * Rule order is part of the contract (comments may contain tags, script
  * bodies may contain `<`):
  *   1. strip `<!-- … -->` comments (dot-all, lazy);
  *   2. strip `<script …>…</script>` and `<style …>…</style>` blocks
  *      (case-insensitive, dot-all, lazy — script bodies are NOT content);
  *   3. block-structure tags (`<br>`, `</p>`, `</div>`, `</li>`, `</tr>`,
  *      `</h1-6>`, `</ul>`, `</ol>`, `</table>`, `</blockquote>`,
  *      `</pre>`) → newline;
  *   4. every remaining `<…>` tag → empty;
  *   5. entity decode (`&amp;` last);
  *   6. whitespace canon: horizontal runs → one space, spaces around
  *      newlines dropped, 3+ newlines → 2 (paragraph break), trim.
  */
object TextExtract {

  /** The extraction chain as a Column (for composition into selects). */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noScript = regexp_replace(noComments,
      "(?is)<script\\b[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", "")
    val blocks = regexp_replace(noStyle,
      "(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/ul|/ol|/table|/blockquote|/pre)\\b[^>]*>",
      "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    // plain (non-regex) replaces: entity decode, &amp; strictly last
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    val hsp = regexp_replace(ent, "[ \\t\\r\\x0B\\f]+", " ")
    val tightNl = regexp_replace(hsp, " *\\n *", "\n")
    val para = regexp_replace(tightNl, "\\n{3,}", "\n\n")
    trim(para, " \n")
  }

  /** Opt-out signal extraction — the compliance gate a crawl pipeline
    * applies BEFORE any content use: the content attribute of
    * `<meta name="robots" …>` (and the `noai`-bearing variants some
    * publishers use), lowercased, or NULL when no robots meta exists.
    * Same regex discipline as the rest of the chain (case-insensitive,
    * both quote styles, attributes in either order via two alternation
    * arms, RE2-compatible — the oracle replays it verbatim). Flag, don't
    * drop: callers filter on e.g. `contains(meta_robots, 'noindex')` or
    * `'noai'` per their compliance policy — the library's stance is to
    * surface the signal exactly, not to encode policy.
    */
  def htmlMetaRobots(html: Column): Column = {
    val pat = "(?i)<meta\\b[^>]*?\\bname\\s*=\\s*[\"']robots[\"']" +
      "[^>]*?\\bcontent\\s*=\\s*[\"']([^\"']*)|" +
      "<meta\\b[^>]*?\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']" +
      "[^>]*?\\bname\\s*=\\s*[\"']robots[\"']"
    val hit = regexp_extract(html, pat, 1)
    val hit2 = regexp_extract(html, pat, 2)
    lower(when(length(hit) > 0, hit)
      .when(length(hit2) > 0, hit2)
      .otherwise(lit(null)))
  }

  /** Extract every document: (idCol, keep…, `text`, `n_chars_html`,
    * `n_chars_text`, `density_micro`) — density is exact integer
    * micro-units `len(text)·1e6 / len(html)` (the library's quantization
    * convention; 0 for an empty html). Rows are emitted for every input
    * (flag-don't-drop — callers threshold on density themselves, e.g.
    * RefinedWeb-style `density_micro < 100000` → navigation chrome).
    * `keep` names provenance columns (url, fetch timestamp, …) carried
    * through the projection — passthrough costs nothing here, while
    * re-attaching them downstream would be a doc-scale self-join.
    */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String,
                  keep: Seq[String] = Nil): DataFrame = {
    require(df.columns.contains(idCol), s"missing input column: $idCol")
    require(df.columns.contains(htmlCol), s"missing input column: $htmlCol")
    keep.foreach(c => require(df.columns.contains(c),
      s"missing keep column: $c"))
    val reserved = Seq("text", "n_chars_html", "n_chars_text", "density_micro")
    (keep :+ idCol).foreach(c => require(!reserved.contains(c),
      s"column name collides with an output column: $c"))
    df.select(col(idCol) +: keep.map(col) :+
        htmlToText(col(htmlCol)).as("text") :+
        length(col(htmlCol)).cast("long").as("n_chars_html"): _*)
      .withColumn("n_chars_text", length(col("text")).cast("long"))
      .withColumn("density_micro",
        when(col("n_chars_html") === 0L, lit(0L))
          .otherwise(expr("n_chars_text * 1000000L div n_chars_html")))
  }
}
