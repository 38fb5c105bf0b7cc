package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All narrow,
  * codegen'd Column expressions — per-row cost only, embarrassingly
  * parallel at 100 TB.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic
    * language ID. Deliberately small: the point is the Spark shape
    * (argmax over per-language match scores), not lexicography.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "den", "mit", "von"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "en", "du", "pour"))

  /** Language ID: argmax of stopword hit-counts; "und" (undetermined) when
    * nothing matches.
    */
  def langId(text: Column): Column = {
    val words = split(lower(text), "\\s+")
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(
        size(array_intersect(words, array(sw.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: word pieces + digits + punctuation as separate
    * tokens (regex approximation of a byte-pair tokenizer's pre-tokenizer).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Heuristic quality score in [0,1]: mixes length band, alpha ratio,
    * stopword ratio, and mean word length band — the usual cheap filters
    * before expensive dedup/training.
    */
  def qualityScore(text: Column): Column = {
    val t = trim(text)
    val nChars = length(t).cast("double")
    val words = split(lower(t), "\\s+")
    val nWords = size(words).cast("double")
    val alphaRatio = (length(regexp_replace(t, "[^A-Za-z ]", "")).cast("double") /
      greatest(nChars, lit(1.0)))
    val allStop = array_distinct(flatten(array(
      stopwords.values.toSeq.map(sw => array(sw.map(lit): _*)): _*)))
    val stopRatio = size(array_intersect(words, allStop)).cast("double") /
      greatest(nWords, lit(1.0))
    val meanWordLen = nChars / greatest(nWords, lit(1.0))
    val lenScore = when(nWords.between(5, 5000), 1.0)
      .when(nWords.between(2, 10000), 0.5).otherwise(0.0)
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    round((lenScore * 0.3 + alphaRatio * 0.3 +
      least(stopRatio * lit(3.0), lit(1.0)) * 0.2 + wordLenScore * 0.2), 4)
  }

  /** Content fingerprint: hash of the normalized token sequence
    * (lowercase, punctuation stripped, whitespace collapsed) — a rolling-
    * hash-style canonical id; equal fingerprints ⇒ same normalized content.
    */
  def fingerprint(text: Column): Column =
    xxhash64(array_join(
      filter(split(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+"),
        w => w =!= ""), " "))

  /** BPE merge-step statistics — the inner loop of byte-pair-encoding
    * tokenizer training: the corpus-wide frequency of every ADJACENT
    * symbol pair, where the initial symbol sequence of a word is its
    * characters (the classic Sennrich et al. setup before any merge).
    * The highest-count pair is the next merge a BPE trainer would apply;
    * the top-k frame is the trainer's candidate table. Output at most k
    * rows (lhs, rhs, pair_count), count desc, ties by (lhs, rhs) —
    * a total order, so the k-boundary is deterministic across engines.
    *
    * Scale shape (the reason this is corpus-size-robust): pairs are NOT
    * exploded from the corpus. The first aggregation collapses the corpus
    * to the (word, freq) vocabulary — map-side partials absorb hot words,
    * and the vocabulary is bounded by the language, not the corpus (a
    * 100 TB crawl still has ~10^7-10^8 distinct normalized words). The
    * per-character pair explode then runs over DISTINCT words only,
    * weighted by freq; the second aggregation is over the tiny pair
    * dimension (≤ alphabet²·avg-word-len groups) and the final top-k
    * plans as TakeOrderedAndProject — bounded per-partition k, single
    * driver merge, never a full sort.
    */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int,
                    minCount: Long = 2L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val vocab = df
      .select(explode(Curation.normWords(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    vocab
      .select(col("freq"), explode(
        when(length(col("w")) >= 2,
          transform(sequence(lit(1), length(col("w")) - 1),
            i => struct(col("w").substr(i, lit(1)).as("lhs"),
              col("w").substr(i + 1, lit(1)).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>")))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("pair_count"))
      .where(col("pair_count") >= minCount)
      .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
      .limit(k)
  }

  /** Unigram LM negative-log-likelihood dictionary over a reference
    * corpus: (w, cnt, nll_micro) with nll = −ln(cnt / T), quantized ONCE
    * per dictionary row (the [[Bm25]] idf_micro convention — `ln` runs
    * per distinct word, never per token; exact counts ride along so an
    * oracle's join ON (w, cnt) cross-checks the counting while importing
    * only the quantized transcendental).
    */
  def unigramNllDict(ref: DataFrame, textCol: String): DataFrame = {
    val counts = ref
      .select(explode(Curation.normWords(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("_t"))
    counts.crossJoin(broadcast(tot))
      .select(col("w"), col("cnt"),
        floor(-log(col("cnt").cast("double") / col("_t")) * 1e6 + 0.5d)
          .cast("long").as("nll_micro"))
  }

  /** Perplexity-style quality scoring (the CCNet / Wenzek et al. LM
    * filter, scale-shaped: CCNet scores with a KenLM 5-gram — the Spark
    * side is IDENTICAL for any order (broadcast token→score dictionary,
    * exact integer sums per document); the n-gram table itself is a
    * documented model seam, like the Multimodal codec). Scores every
    * document by total and mean token NLL in integer micro-nats:
    * (doc_id, n_tokens, nll_micro, mean_nll_micro) — exact long sums and
    * an exact integer division, so ranking/thresholding on the score is
    * partitioning-invariant and bit-replayable in SQL. Documents with no
    * tokens score (0, 0, 0). Scoring corpus = dictionary corpus (the
    * self-scoring setup), so every token is in the dictionary.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dict = unigramNllDict(df, textCol)
    df.select(col(idCol).as("doc_id"),
        explode_outer(Curation.normWords(col(textCol))).as("w"))
      .join(broadcast(dict.select(col("w"), col("nll_micro"))), Seq("w"),
        "left")
      .groupBy(col("doc_id"))
      .agg(count(col("w")).as("n_tokens"),
        coalesce(sum(col("nll_micro")), lit(0L)).as("nll_micro"))
      .withColumn("mean_nll_micro",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("nll_micro div n_tokens"))) // exact integer div
  }

  /** One-stop profile frame used by tests and SparkEntry queries. */
  def profile(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_id", langId(col(textCol)))
      .withColumn("n_tokens_ws", tokenCountWs(col(textCol)))
      .withColumn("n_tokens_bpe", tokenCountBpe(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
}
