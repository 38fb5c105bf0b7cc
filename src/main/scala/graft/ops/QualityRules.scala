package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic document-quality filters from the published web-corpus
  * pipelines: the C4 line-level rules (Raffel et al. 2020, §2.2) and the
  * Gopher document-level rule set (Rae et al. 2021, Table A1). These are
  * the cheap first-pass filters a 100 TB crawl runs BEFORE dedup and
  * model-based scoring — so their scale shape must be (and is) pure
  * per-row column math: no explode-regroup round trip, no shuffle, no
  * UDF. Every rule is defined over exact integer counts (ratio thresholds
  * rewritten as cross-multiplied integer comparisons), so the decision is
  * bit-replayable in SQL and invariant to partitioning, retries, and
  * engine float behavior.
  *
  * Both operators work per document and compose with the rest of the
  * curation family ([[Curation.redactPii]], [[Dedup.paragraphDedup]],
  * [[Classifier]]): run these first — they reject the bulk of crawl junk
  * for cents — then spend shuffles on what survives.
  */
object QualityRules {

  /** C4 line-level filtering (Raffel et al. 2020): a document's lines are
    * individually kept or dropped, and the document is reassembled from
    * the survivors. A line is dropped by the FIRST failing rule, checked
    * in this order (the attribution order is part of the contract so the
    * per-rule counts are deterministic):
    *
    *  1. `no_punct` — the trimmed line does not end in a terminal
    *     punctuation mark (`.`, `!`, `?`, `"`);
    *  2. `few_words` — fewer than `minWordsPerLine` whitespace tokens;
    *  3. `blocklist` — any token (lowercased) is in `lineBlocklist`
    *     (C4 drops lines containing "javascript").
    *
    * Document level: `doc_keep` is false when the lowercased full text
    * contains any `docBlocklist` phrase (C4: "lorem ipsum", code braces)
    * or when fewer than `minKeptLines` lines survive. Rows are emitted
    * for EVERY input document (flag, don't lose attrition accounting) —
    * callers filter on `doc_keep`.
    *
    * Output: (idCol, n_lines, n_kept, n_no_punct, n_few_words,
    * n_blocklist, clean_text, doc_keep).
    *
    * Scale shape: one `transform` over the line array + `filter`/`size`
    * folds — a single narrow projection per row, zero exchanges at any
    * corpus size. The HOF lambdas capture only the per-element variable
    * (the [[Curation.ngramsFromWords]] lesson), so nothing re-evaluates
    * per line. If this ever becomes the benched CPU center the whole rule
    * block is a one-pass byte-scan seam like [[graft.expr.NormWords]].
    */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
                   minWordsPerLine: Int = 3,
                   lineBlocklist: Seq[String] = Seq("javascript"),
                   docBlocklist: Seq[String] = Seq("lorem ipsum", "{"),
                   minKeptLines: Int = 1): DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine must be >= 1: $minWordsPerLine")
    require(minKeptLines >= 0, s"minKeptLines must be >= 0: $minKeptLines")
    require(lineBlocklist.forall(_.nonEmpty) && docBlocklist.forall(_.nonEmpty),
      "blocklist entries must be non-empty")
    val lines = split(col(textCol), "\n", -1)
    val blockArr =
      if (lineBlocklist.isEmpty) typedLit(Seq.empty[String])
      else array(lineBlocklist.map(b => lit(b.toLowerCase)): _*)
    // Per-line verdict struct: raw line + first-failing-rule booleans.
    val info = transform(lines, l => {
      val t = trim(l)
      val words = filter(split(t, "\\s+"), w => w =!= "")
      val noPunct = !t.rlike("[.!?\"]$")
      val fewWords = size(words) < minWordsPerLine
      val blocked =
        if (lineBlocklist.isEmpty) lit(false)
        else arrays_overlap(transform(words, w => lower(w)), blockArr)
      struct(
        l.as("line"),
        noPunct.as("no_punct"),
        (!noPunct && fewWords).as("few_words"),
        (!noPunct && !fewWords && blocked).as("blocked"))
    })
    val kept = filter(col("_li"), s => !s.getField("no_punct") &&
      !s.getField("few_words") && !s.getField("blocked"))
    val docBlocked = docBlocklist
      .map(p => lower(col(textCol)).contains(lit(p.toLowerCase)))
      .foldLeft(lit(false))(_ || _)
    df.select(col(idCol), col(textCol), info.as("_li"))
      .select(col(idCol),
        size(col("_li")).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        size(filter(col("_li"), s => s.getField("no_punct")))
          .cast("long").as("n_no_punct"),
        size(filter(col("_li"), s => s.getField("few_words")))
          .cast("long").as("n_few_words"),
        size(filter(col("_li"), s => s.getField("blocked")))
          .cast("long").as("n_blocklist"),
        array_join(transform(kept, s => s.getField("line")), "\n")
          .as("clean_text"),
        (!docBlocked && size(kept) >= minKeptLines).as("doc_keep"))
  }

  /** Stopwords for the Gopher "contains at least 2 stopwords" rule —
    * the exact list from Rae et al. 2021 Table A1.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (Rae et al. 2021, Table A1), each as
    * an exact integer-arithmetic flag over the document's raw whitespace
    * tokens and newline-split lines:
    *
    *  - `f_word_count`  — word count in [minWords, maxWords];
    *  - `f_mean_len`    — mean word length in [minMeanLen, maxMeanLen]
    *                      chars (as minMeanLen·n ≤ Σlen ≤ maxMeanLen·n);
    *  - `f_symbol`      — symbol-to-word ratio ≤ 0.1, where symbols are
    *                      `#` occurrences + non-overlapping `...`
    *                      occurrences (10·n_symbols ≤ n_words);
    *  - `f_bullet`      — ≤ 90% of lines start with a bullet
    *                      (`-`, `*`, `•` after trim): 10·n_bullet ≤ 9·n_lines;
    *  - `f_ellipsis`    — ≤ 30% of lines end with `...` or `…`:
    *                      10·n_ellipsis ≤ 3·n_lines;
    *  - `f_alpha`       — ≥ 80% of words contain at least one ASCII
    *                      letter: 5·n_alpha_words ≥ 4·n_words;
    *  - `f_stop`        — at least 2 occurrences (not distinct) of the
    *                      [[gopherStopwords]] list, lowercased.
    *
    * `keep` is the conjunction. All counts are emitted alongside the
    * flags so downstream thresholds can be re-derived without a second
    * corpus pass. Ratio thresholds are cross-multiplied integer
    * comparisons — no doubles anywhere, so the verdicts are exactly
    * replayable in any engine.
    *
    * Scale shape: one narrow projection per row (HOF folds over the word
    * and line arrays), zero exchanges. An empty/whitespace-only document
    * has n_words = 0 and fails f_word_count (minWords ≥ 1 required), so
    * the degenerate divisions never arise.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minMeanLen: Long = 3L, maxMeanLen: Long = 10L,
                  stopwords: Seq[String] = gopherStopwords,
                  carryCols: Seq[String] = Nil): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1: $minWords")
    require(maxWords >= minWords, s"maxWords must be >= minWords: $maxWords")
    require(minMeanLen >= 1 && maxMeanLen >= minMeanLen,
      s"mean-length band invalid: [$minMeanLen, $maxMeanLen]")
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    // carryCols ride through both projections untouched — the zero-cost
    // alternative to joining the stats frame back on idCol (a corpus-size
    // shuffle) when a caller needs grouping columns next to the flags.
    // They must not collide with the rule outputs: withColumn would
    // silently OVERWRITE a carried `keep`/`f_*`, and a carried count
    // name would surface later as an ambiguous reference.
    val outputs = Set("n_words", "n_word_chars", "n_symbols", "n_lines",
      "n_bullet", "n_ellipsis", "n_alpha_words", "n_stop_hits",
      "f_word_count", "f_mean_len", "f_symbol", "f_bullet", "f_ellipsis",
      "f_alpha", "f_stop", "keep", "_t", "_w", "_l", idCol)
    carryCols.foreach { c =>
      require(df.columns.contains(c), s"carry column missing from input: $c")
      require(!outputs(c),
        s"carry column collides with a gopherRules output: $c")
    }
    val carry = carryCols.map(col)
    val t = trim(col(textCol))
    val words = filter(split(t, "\\s+"), w => w =!= "")
    val lines = split(col(textCol), "\n", -1)
    val stopArr = array(stopwords.map(s => lit(s.toLowerCase)): _*)
    // Non-overlapping "..." occurrences via the replace-length trick —
    // identical left-to-right semantics in Spark and DuckDB. Computed
    // over the projected `_t` alias (this runs in the second select).
    val nDots = ((length(col("_t")) -
      length(regexp_replace(col("_t"), "\\.\\.\\.", ""))) / 3).cast("long")
    val nHash = (length(col("_t")) -
      length(regexp_replace(col("_t"), "#", ""))).cast("long")
    df.select(col(idCol) +: carry ++: Seq(col(textCol).as("_t"),
        words.as("_w"), lines.as("_l")): _*)
      .select(col(idCol) +: carry ++: Seq(
        size(col("_w")).cast("long").as("n_words"),
        aggregate(col("_w"), lit(0L), (acc, w) => acc + length(w))
          .as("n_word_chars"),
        (nHash + nDots).as("n_symbols"),
        size(col("_l")).cast("long").as("n_lines"),
        size(filter(col("_l"), l => trim(l).rlike("^[-*•]")))
          .cast("long").as("n_bullet"),
        size(filter(col("_l"), l => trim(l).rlike("(\\.\\.\\.|…)$")))
          .cast("long").as("n_ellipsis"),
        size(filter(col("_w"), w => w.rlike("[A-Za-z]")))
          .cast("long").as("n_alpha_words"),
        size(filter(col("_w"), w => array_contains(stopArr, lower(w))))
          .cast("long").as("n_stop_hits")): _*)
      .withColumn("f_word_count",
        col("n_words").between(minWords, maxWords))
      .withColumn("f_mean_len",
        col("n_words") > 0 &&
          col("n_word_chars") >= lit(minMeanLen) * col("n_words") &&
          col("n_word_chars") <= lit(maxMeanLen) * col("n_words"))
      .withColumn("f_symbol", lit(10L) * col("n_symbols") <= col("n_words"))
      .withColumn("f_bullet",
        lit(10L) * col("n_bullet") <= lit(9L) * col("n_lines"))
      .withColumn("f_ellipsis",
        lit(10L) * col("n_ellipsis") <= lit(3L) * col("n_lines"))
      .withColumn("f_alpha",
        lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
      .withColumn("f_stop", col("n_stop_hits") >= 2L)
      .withColumn("keep",
        col("f_word_count") && col("f_mean_len") && col("f_symbol") &&
          col("f_bullet") && col("f_ellipsis") && col("f_alpha") &&
          col("f_stop"))
  }
}
