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

  /** One-stop profile frame used by tests and SparkEntry queries. */
  def profile(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_id", langId(col(textCol)))
      .withColumn("n_tokens_ws", tokenCountWs(col(textCol)))
      .withColumn("n_tokens_bpe", tokenCountBpe(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
}
