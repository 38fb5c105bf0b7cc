package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and ENCODING (Sennrich, Haddow &
  * Birch, ACL 2016) — the step past [[TextAnalysis.bpePairCounts]]'s
  * single merge-candidate table: learn an ordered merge list by
  * iteratively fusing the most frequent adjacent symbol pair, then encode
  * text under it (the per-doc token counts that token-budget quotas,
  * sequence packing, and mixture math actually need).
  *
  * Scale shape — the vocab-collapse invariant: after ONE corpus pass
  * (normWords explode → (word, freq) aggregation, map-side partials
  * absorbing hot words), every training iteration and the whole encode
  * run on the DISTINCT-WORD frame, which is bounded by the language
  * (~10^7-10^8 rows for a 100 TB crawl), not the corpus. Per iteration:
  * one pair-count aggregation over the vocab (≤ alphabet²·avg-len
  * groups) + one driver-side argmax collect of a single row + one narrow
  * column rewrite of the symbol arrays. Per-document counts come back
  * via a broadcast (word → n_tokens) dictionary join — the corpus is
  * touched exactly twice end-to-end (vocab build, count join).
  *
  * Merge application is ONE codegen'd expression for the whole rule
  * list ([[graft.expr.BpeEncode]] — min-rank iteration over a hash rank
  * map, O(1) plan nodes at any rule count, so the production 32k-rule
  * regime is a constructor argument, not a plan-depth wall). The
  * original fold chain — one `aggregate` fold per rule (left-to-right,
  * non-overlapping; a properly-ranked list never re-enables an earlier
  * rule, so one in-order pass per rule is the exact encode) — is kept as
  * [[encodeVocabFold]], BpeSpec's bit-parity cross-check and the
  * semantics the committed SQL oracle replays. Measured (1M-doc datagen
  * corpus, local[8], warm): encode under 64 rules 8.80 s (fold) →
  * 1.19 s (expression, same token totals); under the full
  * 20,097-rule exhaustion list the expression takes 1.42 s — flat in
  * rule count, because min-rank pays per merge APPLIED, while the fold
  * chain would be a 20k-node plan that the analyzer alone cannot
  * survive. Training: [[train]] 64 rules = 30.8 s (one Spark job per
  * rule); [[trainLocal]] the same 64 bit-equal rules in 1.90 s, and the
  * full 20,097-rule list in 1.68 s.
  *
  * Determinism: the argmax tie-break is the total order (count desc,
  * lhs, rhs), so training is reproducible across engines — the SQL
  * oracle re-derives rank 1 from the initial pair table and replays the
  * full encode under the dumped rule list.
  */
object Bpe {

  /** Collapsed vocabulary with initial character symbols:
    * (w, freq, syms).
    */
  private[ops] def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Curation.normWords(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))))

  /** Adjacent-pair frequencies over the CURRENT symbol arrays, weighted
    * by word frequency (the trainer's per-iteration statistic; at
    * iteration 0 this equals [[TextAnalysis.bpePairCounts]]'s table).
    */
  private[ops] def pairCounts(v: DataFrame): DataFrame =
    v.select(col("freq"), explode(
        when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("lhs"),
              element_at(col("syms"), i + 1).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>")))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))

  /** One left-to-right, non-overlapping application pass of merge
    * (lhs, rhs): a single codegen'd fold — state (out, cur) where `cur`
    * is the one-symbol lookahead; a match emits the fused token and
    * clears the lookahead so the fused token never re-matches rhs-side
    * within the pass.
    */
  private[ops] def applyMerge(syms: Column, lhs: String,
                              rhs: String): Column = {
    val empty = array().cast("array<string>")
    aggregate(
      syms,
      struct(empty.as("out"), lit(null).cast("string").as("cur")),
      (acc, s) => {
        val out = acc.getField("out")
        val cur = acc.getField("cur")
        when(cur.isNull, struct(out.as("out"), s.as("cur")))
          .when(cur === lit(lhs) && s === lit(rhs),
            struct(concat(out, array(lit(lhs + rhs))).as("out"),
              lit(null).cast("string").as("cur")))
          .otherwise(struct(concat(out, array(cur)).as("out"), s.as("cur")))
      },
      acc => when(acc.getField("cur").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("cur")))))
  }

  /** Learn up to `nMerges` merge rules. Stops early when no adjacent pair
    * reaches `minCount`. Returns rules in rank order.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1: $nMerges")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    var v = vocab(df, textCol).localCheckpoint(true)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (rules.size < nMerges && !exhausted) {
      val top = pairCounts(v)
        .where(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        rules += ((l, r))
        // localCheckpoint per iteration: the vocab frame is bounded by
        // the language, and an uncheckpointed chain would re-run every
        // prior fold inside each iteration's pair count
        v = v.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    rules.toSeq
  }

  /** Driver-local BPE training over the COLLAPSED vocabulary — the path
    * to production-size (32k+) rule lists. [[train]] is exact but pays
    * one Spark job (pair-count aggregation + argmax collect) PER RULE:
    * right shape for small lists, hopeless at 32k. Real tokenizer
    * trainers (SentencePiece, HF tokenizers) train on a word-frequency
    * table, not the corpus — this does the same: ONE distributed pass
    * collapses the corpus to (word, freq) (bounded by the language,
    * ~10^7–10^8 rows at 100 TB, enforced by `maxVocab`), then the merge
    * loop runs locally with incremental pair-count maintenance (only
    * words CONTAINING the fused pair are rewritten; a lazy-deletion
    * max-heap replaces the per-iteration argmax scan), so cost is
    * O(merges applied × affected words), not O(rules × vocab).
    *
    * BIT-EQUAL to [[train]] for the same arguments (BpeSpec proves it):
    * identical counts by construction, and the argmax tie-break
    * replicates Spark's `orderBy(cnt desc, lhs, rhs)` including STRING
    * ordering — UTF8String binary comparison, not Java UTF-16
    * `compareTo` (they differ on supplementary code points).
    */
  def trainLocal(df: DataFrame, textCol: String, nMerges: Int,
                 minCount: Long = 2L, maxVocab: Int = 100000000): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1: $nMerges")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    import org.apache.spark.unsafe.types.UTF8String
    val rows = df.select(explode(Curation.normWords(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect()
    require(rows.length <= maxVocab,
      s"trainLocal: vocabulary ${rows.length} exceeds maxVocab $maxVocab — " +
        "the collapsed-vocab contract assumes a language-bounded word set")

    val nW = rows.length
    val words = new Array[Array[String]](nW)
    val freq = new Array[Long](nW)
    var wi = 0
    while (wi < nW) {
      val w = rows(wi).getString(0)
      freq(wi) = rows(wi).getLong(1)
      val syms = new Array[String](w.codePointCount(0, w.length))
      var ci = 0; var k = 0
      while (ci < w.length) {
        val next = w.offsetByCodePoints(ci, 1)
        syms(k) = w.substring(ci, next); k += 1; ci = next
      }
      words(wi) = syms
      wi += 1
    }

    final case class Entry(cnt: Long, lhs: UTF8String, rhs: UTF8String)
    // heap order = Spark's orderBy(cnt desc, lhs, rhs) total order
    val heap = new java.util.PriorityQueue[Entry](64,
      new java.util.Comparator[Entry] {
        def compare(a: Entry, b: Entry): Int = {
          val c = java.lang.Long.compare(b.cnt, a.cnt)
          if (c != 0) c
          else {
            val l = a.lhs.compareTo(b.lhs)
            if (l != 0) l else a.rhs.compareTo(b.rhs)
          }
        }
      })
    val counts = new java.util.HashMap[(String, String), Long]()
    val occur = new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()

    def bump(p: (String, String), d: Long): Unit = {
      val c = counts.getOrDefault(p, 0L) + d
      if (c <= 0L) counts.remove(p) else counts.put(p, c)
      if (c > 0L)
        heap.add(Entry(c, UTF8String.fromString(p._1), UTF8String.fromString(p._2)))
    }
    def adjPairs(syms: Array[String]): Array[(String, String)] = {
      if (syms.length < 2) Array.empty
      else Array.tabulate(syms.length - 1)(i => (syms(i), syms(i + 1)))
    }

    wi = 0
    while (wi < nW) {
      adjPairs(words(wi)).foreach { p =>
        counts.put(p, counts.getOrDefault(p, 0L) + freq(wi))
        occur.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(wi)
      }
      wi += 1
    }
    counts.forEach { (p, c) =>
      heap.add(Entry(c, UTF8String.fromString(p._1), UTF8String.fromString(p._2)))
    }

    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (rules.size < nMerges && !exhausted) {
      // lazy deletion: discard entries whose count moved since the push
      var best: Entry = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        val p = (e.lhs.toString, e.rhs.toString)
        if (counts.getOrDefault(p, 0L) == e.cnt) best = e
      }
      if (best == null || best.cnt < minCount) exhausted = true
      else {
        val (l, r) = (best.lhs.toString, best.rhs.toString)
        rules += ((l, r))
        val affected = occur.getOrDefault((l, r), new java.util.HashSet[Integer]())
          .toArray(Array.empty[Integer])
        affected.foreach { wiB =>
          val i = wiB.intValue()
          val old = words(i)
          val neu = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < old.length) {
            if (j + 1 < old.length && old(j) == l && old(j + 1) == r) {
              neu += (l + r); j += 2
            } else { neu += old(j); j += 1 }
          }
          val newArr = neu.toArray
          words(i) = newArr
          val oldP = adjPairs(old)
          val newP = adjPairs(newArr)
          // net count delta per pair, then one heap push per changed pair
          val delta = new java.util.HashMap[(String, String), Long]()
          oldP.foreach(p => delta.put(p, delta.getOrDefault(p, 0L) - freq(i)))
          newP.foreach(p => delta.put(p, delta.getOrDefault(p, 0L) + freq(i)))
          delta.forEach { (p, d) => if (d != 0L) bump(p, d) }
          oldP.foreach(p => { val s = occur.get(p); if (s != null) s.remove(wiB) })
          newP.foreach(p =>
            occur.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(wiB))
        }
        counts.remove((l, r))
        occur.remove((l, r))
      }
    }
    rules.toSeq
  }

  /** The learned rules as a (rank, lhs, rhs) frame — the dump/primitive
    * surface for SQL replay.
    */
  def mergesFrame(df: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    import df.sparkSession.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "lhs", "rhs")
  }

  /** Encode the corpus vocabulary under a merge list:
    * (w, freq, tokens) — one [[graft.expr.BpeEncode]] expression over
    * distinct words, any rule count.
    */
  def encodeVocab(df: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    vocab(df, textCol).select(col("w"), col("freq"),
      graft.expr.BpeEncode.bpe_encode(col("w"), merges).as("tokens"))

  /** The original fold-chain encode — kept ONLY as BpeSpec's bit-parity
    * cross-check for [[graft.expr.BpeEncode]] (plan depth = rule count,
    * so never use it for real lists).
    */
  private[ops] def encodeVocabFold(df: DataFrame, textCol: String,
                                   merges: Seq[(String, String)]): DataFrame = {
    val v = merges.foldLeft(vocab(df, textCol)) { case (acc, (l, r)) =>
      acc.withColumn("syms", applyMerge(col("syms"), l, r))
    }
    v.select(col("w"), col("freq"), col("syms").as("tokens"))
  }

  /** Stable token-id vocabulary for a merge list: ids 0–35 are the base
    * alphabet `[0-9a-z]` in ASCII order (the only symbols
    * [[Curation.normWords]] can emit), then each rule's fused token gets
    * `36 + rank − 1` (first producer wins when two rules fuse the same
    * string, so a duplicate rank leaves a hole rather than remapping
    * everything after it). A pure function of the merge list — training
    * FIXES the id space, exactly like a shipped tokenizer artifact.
    */
  def vocabIds(merges: Seq[(String, String)]): Seq[(String, Int)] =
    graft.expr.BpeEncode.vocabIds(merges)

  /** Per-document token-ID sequences under a learned merge list:
    * (doc_id, ids: array<int>) in document word order — the frame a
    * training pipeline actually ingests (packing and loss masks consume
    * ids, not strings). ONE codegen'd [[graft.expr.BpeDocIds]]
    * expression per row: normalize, encode each word through the
    * per-thread memo, flatten — a pure zero-exchange map stage (the
    * first cut regrouped a word-explode through a 738 MB-each-way
    * shuffle at 1M docs; see BpeDocIds' doc). A null text behaves like
    * an empty doc: empty array.
    */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame =
    df.select(col(idCol).as("doc_id"),
      coalesce(graft.expr.BpeEncode.bpe_doc_ids(col(textCol), merges),
        array().cast("array<int>")).as("ids"))

  /** The dictionary-join formulation — kept ONLY as BpeSpec's bit-parity
    * cross-check for [[encodeIds]] (its per-doc regroup ships every id
    * array through the exchange; the expression ships nothing).
    */
  private[ops] def encodeIdsDict(df: DataFrame, idCol: String, textCol: String,
                                 merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vids = vocabIds(merges).toDF("token", "tid")
    val dict = encodeVocab(df, textCol, merges)
      .select(col("w"), posexplode(col("tokens")).as(Seq("tpos", "token")))
      .join(broadcast(vids), Seq("token"), "left")
      .select(col("w"), col("tpos"),
        coalesce(col("tid"), raise_error(concat(
          lit("bpe encodeIds: token outside the vocabulary: "), col("token")))
          .cast("int")).as("tid"))
      .groupBy(col("w"))
      .agg(transform(array_sort(collect_list(struct(col("tpos"), col("tid")))),
        s => s.getField("tid")).as("_ids"))
    df.select(col(idCol).as("doc_id"),
        posexplode_outer(Curation.normWords(col(textCol))).as(Seq("wpos", "w")))
      .join(broadcast(dict), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(coalesce(
        flatten(transform(
          array_sort(collect_list(struct(col("wpos"), col("_ids")))),
          // empty doc → single all-null entry → flatten null → coalesce;
          // a NON-null word with no dictionary row is a data bug → raise
          s => when(s.getField("wpos").isNotNull && s.getField("_ids").isNull,
              raise_error(lit("bpe encodeIds: word missing from dictionary"))
                .cast("array<int>"))
            .otherwise(s.getField("_ids")))),
        array().cast("array<int>")).as("ids"))
  }

  /** Per-document BPE token counts under a learned merge list:
    * (doc_id, bpe_tokens) for EVERY corpus row (0 for empty docs). The
    * corpus side only explodes words and joins the broadcast
    * word→n_tokens dictionary — no per-doc symbol work.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val dict = encodeVocab(df, textCol, merges)
      .select(col("w"), size(col("tokens")).cast("long").as("_nt"))
    df.select(col(idCol).as("doc_id"),
        explode_outer(Curation.normWords(col(textCol))).as("w"))
      .join(broadcast(dict), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(col("_nt")), lit(0L)).as("bpe_tokens"))
  }
}
