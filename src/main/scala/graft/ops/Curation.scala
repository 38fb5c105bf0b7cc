package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: benchmark decontamination (n-gram overlap with
  * an eval set), Gopher-style repetition signals, PII redaction, and
  * deterministic per-group quota sampling.
  *
  * Scale shapes (100 TB corpus):
  *  - decontamination: the corpus side is a narrow explode feeding a
  *    broadcast join — the only rows that ever shuffle are the (doc_id,
  *    matched-ngram) hits, which are rare by construction. The eval-set
  *    n-gram dictionary is the broadcast side (a few MB hashed even for
  *    ~100k eval items).
  *  - repetition / PII: pure per-row codegen'd Column math, embarrassingly
  *    parallel.
  *  - quota sampling: bounded [[graft.expr.TopKByScore]] partial buffers —
  *    map-side k-entry combine per group, so a group with 10^9 rows costs
  *    O(tasks × k) shuffled entries, never a per-group sort.
  */
object Curation {

  /** Normalized word sequence: lowercase, punctuation → space, empty
    * tokens dropped. Shared by decontamination and repetition stats so
    * both agree on what a "word" is. Implemented as the codegen'd
    * [[graft.expr.NormWords]] byte-scan expression — this tokenization
    * runs inside every curation operator and the regex/split/filter chain
    * it replaced was the family's measured CPU center; the original
    * formula is kept as [[normWordsHof]], CurationSpec's bit-parity
    * cross-check (the committed DuckDB oracles replay the regex form, so
    * the tokenization must not move).
    */
  def normWords(text: Column): Column = graft.expr.NormWords.norm_words(text)

  /** The original Column formula — kept ONLY as the cross-check. */
  private[ops] def normWordsHof(text: Column): Column =
    filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " "),
      w => w =!= "")

  /** All n-grams of a MATERIALIZED word-array column (an attribute
    * reference, not the normWords expression tree). The distinction is
    * the whole perf story: `transform`'s lambda body re-evaluates its
    * captured subtree once per element in the interpreted HOF path, so
    * capturing `normWords(text)` re-runs the regex/split/filter chain
    * per n-gram (~40× per doc — measured 10.7 s for 5k docs at bench
    * scale), while capturing a column reference just re-reads the row's
    * array (1.17 s for the same input). Callers project
    * `normWords(text).as("w")` first and pass `col("w")`.
    */
  def ngramsFromWords(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** All word n-grams of the normalized text as space-joined strings;
    * empty array when the document has fewer than n words. Convenience
    * form for tests/small frames — hot paths should materialize the word
    * array and use [[ngramsFromWords]] (see its scaladoc).
    */
  def ngrams(text: Column, n: Int): Column =
    ngramsFromWords(normWords(text), n)

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one word n-gram (default 13, the usual eval-contamination
    * window) with any document of the eval set. Returns (doc_id, n_hits)
    * where n_hits = number of DISTINCT eval n-grams the document contains;
    * clean documents are absent.
    *
    * `hashed=true` (the scale path) joins on xxhash64 of the n-gram
    * instead of the string — 8 bytes against ~100-byte strings through
    * the broadcast and the hit shuffle. n_hits is identical as long as
    * xxhash64 is injective on the eval dictionary (CurationSpec proves
    * hashed ≡ unhashed on the test corpus).
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    evalSet: DataFrame, evalTextCol: String,
                    n: Int = 13, hashed: Boolean = true): DataFrame = {
    val evalNg = ngramRows(evalSet.select(col(evalTextCol)), Nil, evalTextCol,
        n, hashed)
      .distinct()
    ngramRows(corpus.select(col(idCol).as("doc_id"), col(textCol)),
        Seq("doc_id"), textCol, n, hashed)
      .join(broadcast(evalNg), Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("ng")).as("n_hits"))
  }

  /** Blocked-Bloom prefilter variant of [[decontaminate]] — identical
    * output (the bloom admits every true hit and the exact verify join
    * removes its false positives), different scale shape: instead of
    * joining EVERY corpus n-gram against the eval dictionary, a compact
    * m-bit bloom bitset (one `array<long>` row, built by one aggregation
    * over the eval n-grams) is broadcast and each corpus n-gram tests k
    * bit probes map-side; only survivors — true hits plus the ~(1-e^-kn/m)^k
    * false-positive fraction — reach the exact join. The win at 100 TB is
    * when the eval/blocklist dictionary is too big to broadcast cheaply
    * (10^8-10^9 n-grams = GBs hashed): the exact path must shuffle ~10^12
    * corpus n-grams against it, while the bloom path broadcasts m/8 bytes
    * (10 bits/key ≈ 1.25 GB for 10^9 keys — one exchange, reused per
    * executor, never per task) and shuffles only the surviving sliver.
    * At the default mBits/kProbes the FP rate at the sf0.1 dictionary is
    * ~1e-4 — CurationSpec measures the prune on a disjoint corpus.
    *
    * Mechanics: probe j of key h is bit `xxhash64(h, j) mod m`; the bitset
    * is built by bit_or partials over (word, mask) rows — map-side combine
    * collapses hot words, the final fold is ≤ m/64 rows — then densified
    * into ONE array row via map lookup over `sequence(0, m/64-1)`. The
    * corpus side crossJoins the broadcast single-row bitset (a
    * BroadcastNestedLoopJoin with ONE build row — whole-stage codegen
    * evaluates the probe predicate against the shared broadcast array
    * without per-row copies, and the array is projected away right after
    * the filter).
    */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
                         evalSet: DataFrame, evalTextCol: String,
                         n: Int = 13, hashed: Boolean = true,
                         mBits: Int = 1 << 17,
                         kProbes: Int = 3): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 24),
      s"mBits must be a multiple of 64 in [64, 2^24]: $mBits")
    require(kProbes >= 1 && kProbes <= 8, s"kProbes must be in [1, 8]: $kProbes")
    val evalNg = ngramRows(evalSet.select(col(evalTextCol)), Nil, evalTextCol,
        n, hashed)
      .distinct()
      .localCheckpoint(true) // feeds the bloom build AND the exact verify
    val bloom = bloomBitset(evalNg, "ng", mBits, kProbes)
    ngramRows(corpus.select(col(idCol).as("doc_id"), col(textCol)),
        Seq("doc_id"), textCol, n, hashed)
      .crossJoin(broadcast(bloom))
      .where(bloomTest(col("ng"), col("_bloom"), mBits, kProbes))
      .select(col("doc_id"), col("ng"))
      .join(broadcast(evalNg), Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("ng")).as("n_hits"))
  }

  /** FUZZY benchmark decontamination — the near-duplicate complement of
    * the exact n-gram overlap [[decontaminate]] (the GPT-3/Llama-style
    * contamination sweep: an eval item lightly paraphrased or truncated
    * shares few exact 13-grams but is still a shingle-Jaccard near-dup):
    * flag every corpus document whose shingle set has Jaccard ≥ threshold
    * against ANY eval-set document. Returns (doc_id, n_eval_matches,
    * max_jaccard); clean documents are absent ([[decontaminate]]'s
    * convention).
    *
    * Pure composition: the eval set becomes a stored minhash signature
    * index ([[Dedup.minhashIndex]]) and the corpus streams against it as
    * an ingest batch ([[Dedup.minhashNearDupsAgainst]] — banded candidate
    * join, both sides hot-bucket capped, exact shingle-Jaccard verify on
    * candidates only; the eval index is never self-joined). Pair sides
    * are then resolved against the (small, broadcast) eval-id set, so
    * intra-corpus near-dup pairs — which the banded join also surfaces —
    * are excluded from the contamination report.
    *
    * CONTRACT: corpus ids and eval ids must be disjoint (the pair frame
    * carries ids only; a shared id would make its pairs unattributable).
    * Callers offset eval ids (the harness query uses +1,000,000).
    */
  def decontaminateFuzzy(corpus: DataFrame, idCol: String, textCol: String,
                         evalSet: DataFrame, evalIdCol: String,
                         evalTextCol: String, threshold: Double = 0.8,
                         numHashes: Int = 64, bands: Int = 16,
                         shingleK: Int = 3,
                         bucketCap: Int = Dedup.DefaultBucketCap,
                         obsTag: Option[String] = None): DataFrame = {
    val evalIds = evalSet
      .select(col(evalIdCol).cast("long").as("_eid")).distinct()
    val idx = Dedup.minhashIndex(evalSet, evalIdCol, evalTextCol,
      numHashes, shingleK)
    val pairs = Dedup.minhashNearDupsAgainst(idx, corpus, idCol, textCol,
      threshold, numHashes, bands, shingleK, bucketCap, obsTag)
    // keep only (corpus, eval) pairs, oriented corpus-first; the banded
    // join normalizes pair order by id, so the eval side can be either
    val e1 = pairs
      .join(broadcast(evalIds.select(col("_eid").as("id_a"))), Seq("id_a"))
      .select(col("id_b").as("doc_id"), col("jaccard"))
    val e2 = pairs
      .join(broadcast(evalIds.select(col("_eid").as("id_b"))), Seq("id_b"))
      .select(col("id_a").as("doc_id"), col("jaccard"))
    e1.unionByName(e2)
      .join(broadcast(evalIds.select(col("_eid").as("doc_id"))),
        Seq("doc_id"), "left_anti") // drop eval×eval orientations
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_matches"),
        max(col("jaccard")).as("max_jaccard"))
  }

  /** Probe j's bit index for key `k`: xxhash64(k, j) mod m — deterministic
    * across executors/retries/engines (plain BIGINT arithmetic, so a SQL
    * oracle can replay membership given the dumped hash primitives).
    */
  private def bloomBitIdx(key: Column, j: Int, mBits: Int): Column =
    pmod(xxhash64(key, lit(j)), lit(mBits.toLong))

  /** Build the m-bit bitset as ONE row (`_bloom: array<long>`, m/64 words).
    * bit_or partials collapse duplicate words map-side; the dense array is
    * assembled from the ≤ m/64 (word, bits) groups via a map lookup —
    * empty input yields the all-zero bitset (rejects everything).
    */
  private[ops] def bloomBitset(keys: DataFrame, keyCol: String,
                               mBits: Int, kProbes: Int): DataFrame = {
    val nWords = mBits / 64
    val probes = (0 until kProbes).map { j =>
      val idx = bloomBitIdx(col(keyCol), j, mBits)
      struct((idx / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (idx % 64).cast("int")).as("m"))
    }
    keys.select(explode(array(probes: _*)).as("p"))
      .groupBy(col("p.w").as("w"))
      .agg(bit_or(col("p.m")).as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("_m"))
      .select(transform(sequence(lit(0), lit(nWords - 1)),
        i => coalesce(element_at(col("_m"), i), lit(0L))).as("_bloom"))
  }

  /** Membership test: all k probe bits set. Unrolled AND chain (k is
    * small config) — stays in whole-stage codegen, and the repeated
    * xxhash64 subtrees fall to codegen subexpression elimination.
    */
  private[ops] def bloomTest(key: Column, bloom: Column,
                             mBits: Int, kProbes: Int): Column =
    (0 until kProbes).map { j =>
      val idx = bloomBitIdx(key, j, mBits)
      element_at(bloom, (idx / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (idx % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)

  /** One row per n-gram POSITION of each document: (ids..., ng). n-gram
    * generation without any higher-order function: explode the
    * start-position sequence, then slice+join the materialized word
    * array per output row — every expression here codegens, vs the
    * transform-lambda form whose interpreted path dominated the runtime
    * (measured 1.17 s → 0.79 s at bench scale for 190k n-grams; 10.7 s
    * for the original form that captured the normWords subtree).
    * `hashed=true` emits xxhash64 of the n-gram (8-byte keys through every
    * downstream exchange).
    */
  private def ngramRows(df: DataFrame, ids: Seq[String], textCol: String,
                        n: Int, hashed: Boolean,
                        keepPos: Boolean = false): DataFrame = {
    def key(c: Column): Column = if (hashed) xxhash64(c) else c
    val idc = ids.map(col)
    val pos = if (keepPos) Seq(col("_i")) else Nil
    df.select(idc :+ normWords(col(textCol)).as("_w"): _*)
      .select(idc :+ col("_w") :+
        explode(when(size(col("_w")) >= n,
          sequence(lit(1), size(col("_w")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("_i"): _*)
      .select(idc ++ pos :+
        key(array_join(slice(col("_w"), col("_i"), lit(n)), " ")).as("ng"): _*)
  }

  /** Intra-corpus duplicate-span signal (the cross-document exact-substring
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", approximated at n-gram granularity): for every
    * document, the fraction of its word n-gram windows that also occur in
    * at least one OTHER document. Self-repetition inside a document does
    * NOT count (that is [[dupWordRatio]]'s job) — a window is "shared" iff
    * its n-gram appears in ≥ 2 distinct documents. Returns every corpus
    * row: (doc_id, n_windows, n_shared, dup_span_ratio), zeros for
    * documents shorter than n words.
    *
    * Scale shape: ONE shingling pass and NO hot-key funnel. The n-gram
    * stream collapses to (ng, doc_id, n_pos) behind one exchange; both
    * consumers — the shared-set aggregation (partial-agg'd groupBy(ng),
    * skew-safe) and the mark join probe — read that SAME exchange, which
    * AQE deduplicates at runtime (CurationSpec gates a ReusedExchange in
    * the final adaptive plan; the reuse needs the two subtrees canonically
    * IDENTICAL — see the two guards below), so the shingle/hash pipeline
    * (the measured cost center) never runs twice. A count WINDOW partitioned
    * by ng would be the linear-plan alternative, but it funnels every
    * (hot-ngram, doc) row into one task — a boilerplate n-gram shared by
    * millions of docs becomes a straggler/OOM — while the groupBy's
    * map-side partials never concentrate a key. The shared frame is only
    * the DUPLICATED n-grams (rare in a healthy corpus), so AQE broadcasts
    * the mark join. No all-pairs doc×doc comparison anywhere.
    */
  def dupSpans(corpus: DataFrame, idCol: String, textCol: String,
               n: Int = 13, hashed: Boolean = true): DataFrame = {
    // explicit isnotnull(doc_id): the final coverage join infers it into
    // ONE consumer's scan otherwise, making the two branches' exchange
    // subtrees non-identical (reuse requires exact canonical equality)
    val ng = ngramRows(
      corpus.select(col(idCol).as("doc_id"), col(textCol))
        .where(col("doc_id").isNotNull),
      Seq("doc_id"), textCol, n, hashed)
    val perDocNg = ng.groupBy(col("ng"), col("doc_id"))
      .agg(count(lit(1)).as("n_pos"))
    // the n_pos > 0 filter is vacuously true (count ≥ 1 per group) but the
    // optimizer cannot prove it, so THIS branch keeps the collapsed
    // aggregate's count instead of pruning it to a bare distinct — which
    // would make the two consumers' exchanges non-identical and defeat
    // the ReuseExchange that guarantees the single shingling pass
    val shared = perDocNg.where(col("n_pos") > 0)
      .groupBy(col("ng"))
      .agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2)
      .select(col("ng"), lit(1).as("_hit"))
    val perDoc = perDocNg.join(shared, Seq("ng"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_pos")).as("n_windows"),
        sum(when(col("_hit").isNotNull, col("n_pos")).otherwise(0L))
          .as("n_shared"))
    corpus.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_windows"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_shared").cast("double") /
            col("n_windows").cast("double"), 4)).as("dup_span_ratio"))
  }

  /** Maximal duplicated RUNS — the fidelity upgrade over [[dupSpans]]
    * toward Lee et al.'s exact-substring semantics: where dupSpans counts
    * how many fixed n-gram WINDOWS are shared, this merges adjacent /
    * overlapping shared windows into maximal duplicated word runs and
    * reports, per document, the number of runs, the longest run's word
    * length, and the total words covered by any shared span — i.e. what a
    * suffix-array pass would report at word granularity, approximated with
    * the same one-pass n-gram machinery (a run of k consecutive shared
    * windows is a duplicated substring of k+n-1 words).
    *
    * Scale shape: the shared-ngram set is the same skew-safe partial-agg'd
    * groupBy as [[dupSpans]] (never a count window — a boilerplate n-gram
    * shared by millions of docs must not funnel). The run merge is a
    * gaps-and-islands window PER DOCUMENT — bounded by a single document's
    * window count, never by corpus-wide key frequency, so the only
    * unbounded dimension (corpus size) rides the hash shuffle. Two shared
    * windows whose starts differ by ≤ n words overlap/touch as word
    * intervals [i, i+n-1] and merge into one run; coverage is the exact
    * union length of the merged intervals.
    *
    * Output: every corpus row as (doc_id, n_runs, max_run_words,
    * covered_words), zeros for documents with no shared window.
    */
  def dupRuns(corpus: DataFrame, idCol: String, textCol: String,
              n: Int = 13, hashed: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ng = ngramRows(
      corpus.select(col(idCol).as("doc_id"), col(textCol)),
      Seq("doc_id"), textCol, n, hashed, keepPos = true)
    val shared = ng.groupBy(col("ng"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2)
      .select(col("ng"))
    val hits = ng.join(shared, Seq("ng"), "left_semi")
      // a document may repeat the same shared n-gram at several positions —
      // every position is a hit window; dedup (doc, pos) in case the same
      // position ever double-emits
      .select(col("doc_id"), col("_i")).distinct()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("_i"))
    val runs = hits
      // island start: the previous hit window's interval [p, p+n-1] does
      // not touch this one's [i, i+n-1] ⇔ i > p + n
      .withColumn("_new",
        when(col("_i") > coalesce(lag(col("_i"), 1).over(w), lit(Int.MinValue))
          + n, 1).otherwise(0))
      .withColumn("_run", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("_run"))
      .agg((max(col("_i")) - min(col("_i")) + n).as("_len"))
    val perDoc = runs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("_len")).cast("long").as("max_run_words"),
        sum(col("_len")).as("covered_words"))
    corpus.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("max_run_words"), lit(0L)).as("max_run_words"),
        coalesce(col("covered_words"), lit(0L)).as("covered_words"))
  }

  /** Shared hit-window machinery of the RAW-text exact-substring span
    * family ([[dupRunSpans]] / [[removeDupSpans]]): per document, the
    * maximal cross-document duplicated word runs as 0-based INCLUSIVE
    * word-index ranges (doc_id, s, e) over `split(text, " ")` — raw
    * tokenization, NOT [[normWords]], because span removal must cut and
    * reassemble the original text byte-exactly
    * (`array_join(split(text, " "), " ") == text` for space-separated
    * text, including empty tokens from repeated spaces).
    *
    * `keepFirst = false` (default) removes EVERY occurrence of a
    * duplicated window — the policy of the published exact-substring
    * pipeline (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better", §4.1 ExactSubstr; their released tool cuts
    * all copies). `keepFirst = true` exempts the corpus-wide first
    * occurrence of each window (min (doc_id, pos)) — the "all but one
    * copy" variant the paper discusses.
    *
    * Scale shape: identical to [[dupRuns]] — one shingling exchange, a
    * partial-agg'd groupBy(ng) for the shared set (a boilerplate n-gram
    * shared by millions of docs never funnels), and a gaps-and-islands
    * window strictly PER DOCUMENT (bounded by one document's window
    * count, never by corpus-wide key frequency).
    */
  private def rawDupWordRuns(corpus: DataFrame, idCol: String,
                             textCol: String, n: Int,
                             keepFirst: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ng = corpus
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_w"))
      .select(col("doc_id"), col("_w"),
        explode(when(size(col("_w")) >= n,
          sequence(lit(1), size(col("_w")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("_i"))
      .select(col("doc_id"), col("_i"),
        xxhash64(array_join(slice(col("_w"), col("_i"), lit(n)), " "))
          .as("ng"))
    val hits =
      if (!keepFirst) {
        val shared = ng.groupBy(col("ng"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .where(col("nd") >= 2)
          .select(col("ng"))
        ng.join(shared, Seq("ng"), "left_semi")
          .select(col("doc_id"), col("_i")).distinct()
      } else {
        // one owner row per shared n-gram joins the stream — the same
        // no-funnel shape as the semi join (build side: 1 row per key)
        val owners = ng.groupBy(col("ng"))
          .agg(min(struct(col("doc_id"), col("_i"))).as("_own"),
            count_distinct(col("doc_id")).as("nd"))
          .where(col("nd") >= 2)
          .select(col("ng"), col("_own"))
        ng.join(owners, Seq("ng"))
          .where(!(col("doc_id") === col("_own.doc_id") &&
            col("_i") === col("_own._i")))
          .select(col("doc_id"), col("_i")).distinct()
      }
    val w = Window.partitionBy(col("doc_id")).orderBy(col("_i"))
    hits
      // island start: the previous hit window's interval does not touch
      // this one's ⇔ i > p + n (same merge rule as dupRuns)
      .withColumn("_new",
        when(col("_i") > coalesce(lag(col("_i"), 1).over(w),
          lit(Int.MinValue)) + n, 1).otherwise(0))
      .withColumn("_run", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("_run"))
      // 1-based window starts [_i, _i + n - 1] → 0-based inclusive word
      // range [s, e]
      .agg((min(col("_i")) - 1).as("s"), (max(col("_i")) + n - 2).as("e"))
      .select(col("doc_id"), col("s"), col("e"))
  }

  /** Character-level exact-substring duplicate SPANS (the per-occurrence
    * report of Lee et al.'s ExactSubstr pass, at word-window resolution):
    * one row per maximal cross-document duplicated run with both the
    * word-index range and the exact character range in the ORIGINAL text.
    * `start_char`/`end_char` are a 0-based [start, end) substring range:
    * `substring(text, start_char + 1, end_char - start_char)` is the
    * duplicated substring.
    *
    * Char offsets derive from word prefixes (`length(array_join(slice(
    * words, 1, s), " ")) + 1`) — exact for space-separated text and
    * computed only at run boundaries, so the per-run cost is one bounded
    * slice of the owning document, never a corpus-wide position index.
    */
  def dupRunSpans(corpus: DataFrame, idCol: String, textCol: String,
                  n: Int = 13, keepFirst: Boolean = false): DataFrame = {
    val runs = rawDupWordRuns(corpus, idCol, textCol, n, keepFirst)
    runs.join(corpus.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("_w")), Seq("doc_id"))
      .select(col("doc_id"),
        col("s").as("start_word"), col("e").as("end_word"),
        when(col("s") === 0, 0)
          .otherwise(length(array_join(slice(col("_w"), lit(1), col("s")),
            " ")) + 1).as("start_char"),
        length(array_join(slice(col("_w"), lit(1), col("e") + 1), " "))
          .as("end_char"),
        (col("e") - col("s") + 1).cast("long").as("run_words"))
  }

  /** Exact-substring span REMOVAL — the rewrite the published curation
    * pipelines actually apply (Lee et al. 2022): cut every maximal
    * duplicated run from the text and reassemble the remainder
    * (flag-don't-drop: every input document survives, possibly empty).
    * Output: (doc_id, clean_text, n_runs, removed_words).
    *
    * Reassembly is the [[graft.ops.Dedup.paragraphDedup]] pattern one
    * level down: per-doc kept-word filter + `array_join` — pure array
    * lambdas over the already-merged run list, zero exchange beyond the
    * run computation itself (runs per doc are bounded by document
    * length, so the collect_list is bounded state, not corpus state).
    */
  def removeDupSpans(corpus: DataFrame, idCol: String, textCol: String,
                     n: Int = 13, keepFirst: Boolean = false): DataFrame = {
    val runsByDoc = rawDupWordRuns(corpus, idCol, textCol, n, keepFirst)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
        .as("_runs"))
    corpus.select(col(idCol).as("doc_id"), col(textCol).as("_t"))
      .join(runsByDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("_runs").isNull, col("_t"))
          .otherwise(array_join(filter(split(col("_t"), " "),
            (_, i) => !exists(col("_runs"),
              r => i >= r("s") && i <= r("e"))), " ")).as("clean_text"),
        coalesce(size(col("_runs")), lit(0)).cast("long").as("n_runs"),
        coalesce(aggregate(col("_runs"), lit(0L),
          (acc, r) => acc + r("e") - r("s") + 1), lit(0L))
          .as("removed_words"))
  }

  /** Leakage-safe train/val/test assignment: split membership is decided
    * by the near-dup CLUSTER representative, not the document id, so two
    * near-duplicates can never straddle train and test (the eval-leakage
    * failure mode of naive per-doc splitting). `pairs` is any near-dup
    * pair frame (minhash/simhash/embedding); components come from
    * [[Dedup.clusters]] (singletons form their own), and the component's
    * minimum id feeds the same deterministic [[splitAssign]] arithmetic as
    * per-doc splitting — so the assignment stays stable when new documents
    * join an existing cluster. Output: (idCol, comp, split).
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       splits: Seq[(String, Double)],
                       aCol: String = "id_a",
                       bCol: String = "id_b"): DataFrame =
    Dedup.clusters(df, idCol, pairs, aCol, bCol)
      .select(col(idCol), col("comp"),
        splitAssign(col("comp"), splits).as("split"))

  /** Repeat fraction of any array: 1 - distinct/size, 0.0 when empty.
    * The shared kernel of the word/n-gram repetition ratios — callers on
    * hot paths pass a MATERIALIZED column (two references to a built
    * array subtree would rebuild it twice; see [[ngramsFromWords]]).
    */
  def dupRatioOfArray(arr: Column): Column =
    when(size(arr) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(arr)).cast("double") /
        size(arr).cast("double"))

  /** Gopher-style repetition signal over a materialized word array:
    * fraction of word occurrences that are repeats of an earlier word
    * (0 = all distinct, →1 = one word repeated). 0.0 for empty documents.
    */
  def dupWordRatioFromWords(words: Column): Column = dupRatioOfArray(words)

  /** Convenience form over raw text. */
  def dupWordRatio(text: Column): Column =
    dupWordRatioFromWords(normWords(text))

  /** Same repetition signal over word n-grams (default 2) — catches
    * phrase loops that distinct single words miss. 0.0 when fewer than n
    * words. `words` must be a materialized column on hot paths (see
    * [[ngramsFromWords]]).
    */
  def dupNgramRatioFromWords(words: Column, n: Int = 2): Column =
    dupRatioOfArray(ngramsFromWords(words, n))

  /** Convenience form over raw text. */
  def dupNgramRatio(text: Column, n: Int = 2): Column =
    dupNgramRatioFromWords(normWords(text), n)

  // PII patterns (RE2-compatible so the DuckDB oracle replays them
  // verbatim): emails, IPv4 addresses, and 7+-digit runs (phone-ish).
  // Scrub order matters: digit runs LAST, so digits inside an email local
  // part or an IPv4 octet are consumed by the structured pattern instead
  // of being half-redacted as bare numbers.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
  val longDigitsRe = "\\b[0-9]{7,}\\b"

  /** Scrub emails / IPv4s / long digit runs to typed placeholder tokens.
    * Pure regexp_replace chain — codegen'd, narrow.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      longDigitsRe, "<NUM>")

  /** Per-category PII match counts as a struct(n_emails, n_ips, n_nums) —
    * counted on the progressively-redacted text exactly like [[redactPii]]
    * so the two never disagree on overlapping matches.
    */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Re, "<IP>")
    struct(
      size(regexp_extract_all(text, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(afterIp, lit(longDigitsRe), lit(0))).as("n_nums"))
  }

  /** Deterministic pseudo-random rank for quota sampling: a multiplicative
    * hash of the id (odd multiplier mod 2^32 is a bijection of Z_2^32),
    * so distinct in-range ids never tie and the sample is stable across
    * partitionings, retries, and engines — the same arithmetic is plain
    * BIGINT SQL in DuckDB.
    *
    * Domain: id ∈ [0, 2^31). The bound keeps id × 2654435761 under
    * Long.MaxValue in BOTH engines (Spark silently wraps mod 2^64 above
    * it; DuckDB raises a BIGINT overflow — they would diverge, and the
    * sample would stop being provably tie-free). Enforced per row with
    * `raise_error` rather than a silent wrap; corpora with wider ids
    * should pre-map them into the domain (e.g. dense ranks).
    */
  def sampleRank(id: Column): Column = {
    val idL = id.cast("long")
    val ranked = pmod(idL * lit(2654435761L), lit(4294967296L))
    when(idL.between(0L, (1L << 31) - 1), ranked)
      .otherwise(raise_error(concat(
        lit("sampleRank id out of [0, 2^31): "), idL.cast("string"))))
  }

  /** Deterministic shard assignment for training-data writes:
    * `sampleRank(id) mod nShards` — a stable pseudo-random spread, so a
    * re-run, a retry, or a different engine shards identically. Write
    * with `.partitionBy("shard")` for fixed-count training shards; the
    * narrow column costs one multiply+mod per row.
    */
  def shardAssign(id: Column, nShards: Int): Column =
    pmod(sampleRank(id), lit(nShards.toLong))

  /** Deterministic weighted corpus split (train/val/test …): the id's
    * [[sampleRank]] falls into consecutive [0, 2^32) ranges proportional
    * to the weights, so split membership is a pure function of the id —
    * stable across runs, partitionings, and engines, and disjoint-
    * covering by construction. Weights must sum to 1.
    */
  def splitAssign(id: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    if (splits.size == 1) lit(splits.head._1)
    else {
      val r = sampleRank(id)
      val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
        .map(c => math.round(c * 4294967296.0))
      val cases = splits.init.zip(thresholds.init)
      val first = when(r < lit(cases.head._2), lit(cases.head._1._1))
      cases.tail.foldLeft(first) { case (acc, ((name, _), t)) =>
        acc.when(r < lit(t), lit(name))
      }.otherwise(lit(splits.last._1))
    }
  }

  /** Deterministic domain-mixture sampling: keep each row of group g with
    * probability `fractions(g)` (groups absent from the map fall back to
    * `defaultFraction`), decided by comparing the row's [[sampleRank]]
    * against an integer cutoff `round(fraction × 2^32)`. Membership is a
    * pure function of the id, so the mixture is identical across retries,
    * partitionings, and engines — the scale-safe way to rebalance a corpus
    * toward target domain proportions (upsampling is out of scope: a
    * fraction must be ≤ 1).
    *
    * Scale shape: the fractions are driver-known config (hundreds of
    * domains at most), so the cutoff compiles to a codegen'd when-chain
    * inside the filter — the [[splitAssign]] pattern: no join, no
    * shuffle, schema passed through untouched.
    */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    fractions: Seq[(String, Double)],
                    defaultFraction: Double = 0.0): DataFrame = {
    require((defaultFraction +: fractions.map(_._2))
      .forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0, 1]: $fractions default=$defaultFraction")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"duplicate group in fractions: $fractions")
    df.where(mixtureKeep(col(groupCol), col(idCol), fractions,
      defaultFraction))
  }

  /** The [[mixtureSample]] keep predicate as a reusable Column — so a
    * composed pipeline can evaluate it as one flag among several in a
    * single pass instead of filtering eagerly.
    */
  def mixtureKeep(group: Column, id: Column,
                  fractions: Seq[(String, Double)],
                  defaultFraction: Double): Column = {
    def cutoff(f: Double): Long = math.round(f * 4294967296.0)
    val cutoffCol = fractions.foldLeft(lit(cutoff(defaultFraction))) {
      case (acc, (g, f)) => when(group === g, lit(cutoff(f))).otherwise(acc)
    }
    sampleRank(id) < cutoffCol
  }

  /** Mixture rebalancing WITH upsampling — weights may exceed 1
    * (fractional epochs per domain, the usual LLM data-mixture recipe
    * where high-quality sources repeat): a row of group g with weight w
    * is emitted `floor(w)` times plus one more iff
    * `sampleRank(id) < frac(w)·2^32`, so the expected multiplicity is
    * exactly w, the decision is a pure function of the id (stable across
    * runs/partitionings/engines), and w ≤ 1 degenerates to
    * [[mixtureSample]]'s keep rule. Output adds `n_copies` and a 0-based
    * `epoch` column so downstream packing/shuffling treats copies as
    * distinct examples; rows with 0 copies are dropped.
    *
    * Scale shape: the weight table folds into two literal CASE columns
    * (no join), and the explode multiplies rows by at most ⌈w⌉ — a
    * narrow generate, no shuffle anywhere.
    */
  def upsampleMixture(df: DataFrame, groupCol: String, idCol: String,
                      weights: Seq[(String, Double)],
                      defaultWeight: Double = 1.0): DataFrame = {
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate group in weights: $weights")
    require((defaultWeight +: weights.map(_._2))
      .forall(w => !w.isNaN && w >= 0.0 && w <= 1024.0),
      s"weights must be in [0, 1024]: $weights default=$defaultWeight")
    def base(w: Double): Long = math.floor(w).toLong
    def cut(w: Double): Long = math.round((w - math.floor(w)) * 4294967296.0)
    val baseCol = weights.foldLeft(lit(base(defaultWeight))) {
      case (acc, (g, w)) =>
        when(col(groupCol) === g, lit(base(w))).otherwise(acc)
    }
    val cutCol = weights.foldLeft(lit(cut(defaultWeight))) {
      case (acc, (g, w)) =>
        when(col(groupCol) === g, lit(cut(w))).otherwise(acc)
    }
    df.withColumn("n_copies",
        (baseCol + when(sampleRank(col(idCol)) < cutCol, 1L).otherwise(0L))
          .cast("int"))
      .where(col("n_copies") >= 1)
      // n_copies >= 1 here, so sequence(0, n-1) is always ascending (the
      // empty-range descending quirk cannot fire)
      .withColumn("epoch", explode(sequence(lit(0), col("n_copies") - 1)))
  }

  /** Temperature-based mixture weights — the standard multilingual /
    * multi-domain sampling scheme (Conneau & Lample 2019; mT5): group g
    * is sampled with probability p_g ∝ n_g^alpha, flattening the natural
    * distribution toward uniform as alpha → 0, and the per-group EPOCH
    * weight to realize a `targetTotal`-example draw is
    * w_g = p_g · targetTotal / n_g (small groups repeat, huge groups
    * subsample — exactly the `weights` input of [[upsampleMixture]]).
    *
    * Exactness convention (the Bm25 idf / DSIR ln discipline): the one
    * transcendental, (n_g/n_max)^alpha, quantizes ONCE per GROUP into
    * `pow_micro` ∈ [0, 10^6] (max-normalized, so no corpus size can
    * overflow the quantization); everything downstream is exact long
    * arithmetic — p_ppm = (pow_micro·10^6) div Σpow_micro and
    * weight_micro = (p_ppm·targetTotal) div n_g — so the whole frame is
    * partitioning-invariant and SQL-replayable given the dumped
    * pow_micro dictionary (joined ON (group, n_docs), cross-checking the
    * counts). Resolution: a group below ~10^-6 of the largest group's
    * alpha-scaled mass quantizes to 0 (absent from any real mixture).
    *
    * Scale shape: ONE count aggregation over the corpus (map-side
    * partials); pow/normalize/divide all run on the ≤ #groups-row frame
    * with two broadcast scalars. The corpus itself is never reshuffled.
    */
  def temperatureWeights(df: DataFrame, groupCol: String, alpha: Double,
                         targetTotal: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    require(targetTotal >= 1, s"targetTotal must be >= 1: $targetTotal")
    val g = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val mx = g.agg(max(col("n_docs")).as("_mx"))
    val p = g.crossJoin(broadcast(mx))
      .select(col(groupCol), col("n_docs"),
        floor(pow(col("n_docs").cast("double") / col("_mx").cast("double"),
          lit(alpha)) * 1e6 + lit(0.5)).as("pow_micro"))
    val tot = p.agg(sum(col("pow_micro")).as("_tot"))
    p.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("pow_micro"),
        expr("(pow_micro * 1000000L) div _tot").as("p_ppm"),
        expr(s"(((pow_micro * 1000000L) div _tot) * ${targetTotal}L)" +
          " div n_docs").as("weight_micro"))
  }

  /** [[temperatureWeights]] collected into the `weights` argument of
    * [[upsampleMixture]] (epochs as doubles, micro-resolution). The
    * collect is the ≤ #groups-row dictionary — the same tiny-frame
    * driver hop as IVF centroids, never corpus-sized.
    */
  def temperatureEpochs(df: DataFrame, groupCol: String, alpha: Double,
                        targetTotal: Long): Seq[(String, Double)] =
    temperatureWeights(df, groupCol, alpha, targetTotal)
      .select(col(groupCol).cast("string"), col("weight_micro"))
      .collect().map(r => r.getString(0) -> r.getLong(1) / 1e6).toSeq

  /** Token-BUDGET quota sampling: for each group, keep documents in
    * ascending ([[sampleRank]], id) order until the group's token budget
    * is exhausted — a doc is kept iff the token sum of every doc ordered
    * strictly before it is `< budget` (so the budget-crossing doc is
    * included, and a zero-token doc landing exactly AT the budget is
    * not). Mixtures are specified in tokens, not documents — doc-count
    * quotas ([[quotaSample]]) over-weight groups with long documents.
    * Deterministic: a pure function of (id, token counts), identical
    * across runs/partitionings/engines.
    *
    * Scale shape — the naive definition is a running-sum window
    * partitioned by GROUP, a hot-key funnel (one task owns the largest
    * domain's full sort). Instead: ranks are bucketed by their TOP
    * `bucketBits` bits (order-preserving, 2^bucketBits buckets),
    * per-(group, bucket) token sums aggregate map-side into a frame of
    * ≤ groups × 2^bucketBits rows, the cumulative-before of each bucket
    * comes from a window over that TINY frame and broadcast-joins back,
    * and then whole buckets strictly under budget keep, buckets past it
    * drop, and ONLY each group's one boundary bucket — ~1/2^bucketBits
    * of the group, uniform by construction of sampleRank — pays an
    * exact within-bucket window. The SQL oracle replays the naive
    * full-group window definition, so correctness of the bucketed
    * decomposition is proven, not argued.
    */
  def tokenQuotaSample(df: DataFrame, groupCol: String, idCol: String,
                       tokenCol: String, budget: Long,
                       bucketBits: Int = 12): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(bucketBits >= 4 && bucketBits <= 20,
      s"bucketBits must be in [4, 20]: $bucketBits")
    import org.apache.spark.sql.expressions.Window
    val cols = df.columns.map(col)
    // negative or NULL token counts would corrupt (or null-poison) every
    // prefix sum downstream — raise on the value (rides the row, pruning
    // can't drop it)
    val tokGuard = when(col(tokenCol).isNull || col(tokenCol) < 0,
        raise_error(concat(
          lit("tokenQuotaSample: negative or null token count for id "),
          col(idCol).cast("string"))))
      .otherwise(col(tokenCol).cast("long"))
    val base = df
      .withColumn("_rank", sampleRank(col(idCol)))
      .withColumn("_tok", tokGuard)
      .withColumn("_bkt", shiftright(col("_rank"), 32 - bucketBits))
      .localCheckpoint(true) // feeds the bucket agg AND both keep branches
    val bkt = base.groupBy(col(groupCol).as("_g"), col("_bkt").as("_b"))
      .agg(sum(col("_tok")).as("_bsum"))
    val wCum = Window.partitionBy(col("_g")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bkt.withColumn("_cumBefore",
      coalesce(sum(col("_bsum")).over(wCum), lit(0L)))
    // null-SAFE group equality: a NULL group is one partition in the
    // naive window definition (and the SQL oracle), so it must join back
    // to its bucket row rather than vanish through NULL === NULL
    val j = base.join(broadcast(cum),
      col(groupCol) <=> col("_g") && col("_bkt") === col("_b"))
    val keepAll = j.where(col("_cumBefore") + col("_bsum") < budget)
    val wIn = Window.partitionBy(col(groupCol), col("_bkt"))
      .orderBy(col("_rank"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val refined = j
      .where(col("_cumBefore") < budget &&
        col("_cumBefore") + col("_bsum") >= budget)
      .withColumn("_prior",
        col("_cumBefore") + coalesce(sum(col("_tok")).over(wIn), lit(0L)))
      .where(col("_prior") < budget)
      .drop("_prior")
    keepAll.unionByName(refined).select(cols.toIndexedSeq: _*)
  }

  /** Corpus-wide most-frequent word n-grams — the boilerplate/template
    * detector whose output feeds removal blocklists (headers, footers,
    * license banners repeat verbatim across a crawl). Returns at most k
    * rows `(ngram, n_occurrences)`, count desc, ties by ngram (binary —
    * ASCII-stable across engines).
    *
    * Scale shape: one explode → hash aggregate (map-side partials
    * collapse the hot n-grams — the ones this op exists to find — before
    * the shuffle), minCount prunes the long unique tail before the
    * limit, and the global top-k plans as TakeOrderedAndProject:
    * per-partition bounded k then a single driver merge of k-row
    * partials, never a full sort of the n-gram dimension.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int,
                minCount: Long = 2L): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k >= 1, s"k must be >= 1: $k")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    df.select(normWords(col(textCol)).as("_w"))
      .select(explode(ngramsFromWords(col("_w"), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") >= minCount)
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)
  }

  /** Provably-exact corpus-wide top-k n-grams with BOUNDED shuffle — the
    * 100 TB shape of [[topNgrams]]. topNgrams' `groupBy(ngram).count()`
    * shuffles one row per DISTINCT n-gram, a key space that is itself
    * TB-scale on a web corpus; this variant runs two scans and never
    * ships the key space:
    *
    *  1. SKETCH: one [[graft.expr.FreqItems]] aggregation over hashed
    *     n-grams — Misra-Gries partials of ≤ `capacity` entries per task,
    *     so the exchange carries #tasks × capacity rows regardless of
    *     corpus size. The summary provably contains every key with count
    *     > N/(capacity+1).
    *  2. RECOUNT: exact `groupBy(ngram).count()` restricted to the ≤
    *     `capacity` candidate keys (an InSet filter below the exchange) —
    *     the shuffle is now bounded by the candidate set, and counts are
    *     exact strings, so hash collisions can only over-select
    *     candidates, never distort a count.
    *
    * The result is then PROVEN complete or the call fails: any n-gram
    * outside the candidate set has exact count ≤ N/(capacity+1), so if
    * the k-th returned count (or `minCount`, when fewer than k rows
    * qualify) exceeds that bound, no missing n-gram could displace a
    * returned row. Identical output to [[topNgrams]] whenever it
    * returns — q_top_ngrams_sketch shares q_top_ngrams' oracle verbatim.
    * Raise `capacity` if it ever refuses.
    */
  def topNgramsSketch(df: DataFrame, textCol: String, n: Int, k: Int,
                      capacity: Int, minCount: Long = 2L): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k >= 1, s"k must be >= 1: $k")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")
    val spark = df.sparkSession
    def rows = df.select(normWords(col(textCol)).as("_w"))
      .select(explode(ngramsFromWords(col("_w"), n)).as("ngram"))
    val sk = rows.agg(
      graft.expr.FreqItems.freq_items(xxhash64(col("ngram")), capacity)
        .as("sk"),
      count(lit(1)).as("n_total")).head()
    val keys = sk.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0))
    val nTotal = sk.getLong(1)
    val bound = nTotal / (capacity + 1L) // missing ⇒ exact count ≤ bound
    val top = rows
      .where(xxhash64(col("ngram")).isin(keys: _*))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") >= minCount)
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)
      .collect() // ≤ k rows — the result itself
    val kth = if (top.length == k) top.last.getLong(1) else minCount
    require(kth > bound,
      s"freq_items capacity $capacity cannot PROVE top-$k exact: k-th " +
        s"count $kth ≤ error bound $bound (= $nTotal/(capacity+1)); " +
        "raise capacity")
    import spark.implicits._
    top.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("ngram", "n_occurrences")
  }

  /** Per-group quota sample: the k rows of each group with the smallest
    * [[sampleRank]] — a deterministic uniform sample per (e.g.) language
    * or source quota. Implemented as bounded TopKByScore partial buffers
    * (score = -rank so "largest score" = smallest rank): map-side combine
    * keeps at most k entries per group per task, so hot groups never
    * funnel through a single sort — the round-2 ANN top-k lesson applied
    * to sampling.
    */
  def quotaSample(df: DataFrame, keyCols: Seq[String], idCol: String,
                  k: Int): DataFrame = {
    val topk = graft.expr.TopKByScore.topk_by_score(
      -sampleRank(col(idCol)).cast("double"), col(idCol).cast("long"), k)
    df.groupBy(keyCols.map(col): _*)
      .agg(topk.as("picks"))
      .select(keyCols.map(col) :+
        explode(col("picks").getField("id")).as(idCol): _*)
  }

  /** Corpus data card: per group (source, language, shard, …) the exact
    * integer statistics a dataset datasheet reports — document/char/token
    * counts, empty docs, Gopher-rule pass counts ([[QualityRules
    * .gopherRules]] flags at their published defaults, carried through
    * the rule projection rather than joined back on the id, so the
    * corpus never shuffles on the document key), and normalized-word
    * totals (Σ per-doc words and Σ per-doc DISTINCT words — the exact
    * building blocks of a vocabulary-richness ratio; ratios themselves
    * are left to the reader so every reported number stays an exact
    * long). ONE narrow scan + one aggregation whose group count is the
    * (source × lang × …) dimensionality — broadcast-tiny at any corpus
    * size.
    */
  def corpusReport(df: DataFrame, idCol: String, textCol: String,
                   groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "corpusReport needs at least one group column")
    val internal = Seq("_rep_nchars", "_rep_ntok", "_rep_nw", "_rep_ndw")
    (groupCols :+ idCol :+ textCol).foreach(c =>
      require(df.columns.contains(c), s"missing input column: $c"))
    internal.foreach(c => require(!df.columns.contains(c),
      s"input must not contain internal column name: $c"))
    val words = normWords(col(textCol))
    val pre = df
      .withColumn("_rep_nchars", length(col(textCol)).cast("long"))
      .withColumn("_rep_ntok",
        TextAnalysis.tokenCountWs(col(textCol)).cast("long"))
      .withColumn("_rep_nw", size(words).cast("long"))
      .withColumn("_rep_ndw", size(array_distinct(words)).cast("long"))
    QualityRules.gopherRules(pre, idCol, textCol,
        carryCols = groupCols ++ internal)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_rep_nchars")).as("n_chars"),
        sum(col("_rep_ntok")).as("n_tokens"),
        sum(when(col("_rep_ntok") === 0, 1L).otherwise(0L)).as("n_empty"),
        sum(col("n_words")).as("n_gopher_words"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_gopher_keep"),
        sum(when(col("f_alpha"), 1L).otherwise(0L)).as("n_alpha_ok"),
        sum(when(col("f_stop"), 1L).otherwise(0L)).as("n_stop_ok"),
        sum(col("_rep_nw")).as("n_norm_words"),
        sum(col("_rep_ndw")).as("n_distinct_words"))
  }

  /** Crawl snapshot diff — the incremental-recrawl driver signal: which
    * documents of the NEW snapshot are `added` / `changed` / `unchanged`
    * vs the previous one, and which previous documents were `removed`.
    * Everything downstream keys off it: only added/changed docs need
    * re-extraction, re-scoring, and an incremental-dedup pass
    * ([[graft.ops.Dedup.minhashNearDupsAgainst]]); removed ids feed
    * index compaction.
    *
    * One full-outer join on the id — the minimal possible shape. Change
    * detection compares xxhash64(content) so the join ships 8-byte
    * digests, not document bodies; a real crawl store keeps a persisted
    * content digest, passed via `precomputedHash` on either side (the
    * UrlCuration precomputed seam). The oracle compares the TEXTS
    * directly — an engine-side hash collision goes red rather than
    * silently passing (the paragraphDedup convention).
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, idCol: String,
                   textCol: String,
                   precomputedHashPrev: Option[String] = None,
                   precomputedHashCur: Option[String] = None): DataFrame = {
    for ((df, side) <- Seq(prev -> "prev", cur -> "cur"))
      require(df.columns.contains(idCol), s"$side missing column: $idCol")
    def hashed(df: DataFrame, pre: Option[String], out: String) = {
      pre.foreach(c => require(df.columns.contains(c),
        s"missing precomputed hash column: $c"))
      if (pre.isEmpty) require(df.columns.contains(textCol),
        s"missing column: $textCol")
      // NULL ids would become never-matching full-outer join keys, so the
      // same logical document surfaces as both added and removed — raise
      // instead (the packGreedy null-id convention; non-numeric strings
      // already raise at the ANSI cast).
      val guardedId = when(col(idCol).isNull, raise_error(lit(
          s"snapshotDiff id column '$idCol' is NULL — ids must be non-null integral"))
          .cast("long"))
        .otherwise(col(idCol).cast("long"))
      df.select(guardedId.as(idCol),
        pre.map(col).getOrElse(xxhash64(col(textCol))).as(out))
    }
    hashed(prev, precomputedHashPrev, "_sd_prev")
      .join(hashed(cur, precomputedHashCur, "_sd_cur"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_sd_prev").isNull, "added")
          .when(col("_sd_cur").isNull, "removed")
          .when(col("_sd_prev") === col("_sd_cur"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
