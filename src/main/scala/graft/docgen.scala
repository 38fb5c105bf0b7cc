package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic multi-million-document corpus synthesizer for the
  * curation/dedup scaling benches — the `documents`-shaped companion to
  * [[TranscriptGen]] (same contract: everything derives from xxhash64, no
  * rand(), so any cluster size / retry / engine generates identical bytes;
  * the plan is `spark.range` → narrow column math, shuffle-free, so
  * generation parallelizes to any executor count).
  *
  * Built-in dedup structure (the populations the operators exist for):
  *  - ~10% of docs are EXACT duplicates: their text derives from a
  *    template id (nDocs/100 templates), so templates recur ~10× — the
  *    hot-content-key population exactKeep's aggregate shape is for.
  *  - ~10% are NEAR duplicates of the same templates: template text with
  *    ~1/50 of words mutated per doc (3-shingle Jaccard ≈ 0.94, above the
  *    0.8 near-dup threshold) — the LSH/verify path does real work.
  *  - the rest are unique hash-derived word sequences.
  * Doc length is Zipf-ish in [20, 300] words; `lang` is skewed over five
  * values (mixture/quota stages see realistic imbalance).
  *
  * Schema matches the sf testdata `documents` table where the curation
  * operators need it: (doc_id, lang, text, n_chars).
  */
object DocGen {

  /** Number of duplicate-cluster templates for a corpus size: average
    * exact-cluster ≈ 10 copies + ≈ 10 near-dups per template.
    */
  def nTemplates(nDocs: Long): Long = math.max(1L, nDocs / 100L)

  def docs(spark: SparkSession, nDocs: Long, seed: Long = 7L,
           parallelism: Int = 0): DataFrame = {
    val slices = if (parallelism > 0) parallelism
                 else spark.sparkContext.defaultParallelism
    val nTpl = nTemplates(nDocs)
    val langArr = array(Seq("en", "en", "en", "es", "de", "fr", "it").map(lit): _*)
    val base = spark.range(0L, nDocs, 1L, slices)
      .withColumn("h", xxhash64(lit(seed), col("id")))
      // 0 → exact duplicate of a template, 1 → near duplicate, else unique
      .withColumn("kind", pmod(col("h"), lit(10L)))
      .withColumn("tpl", pmod(xxhash64(lit(seed), lit("tpl"), col("id")), lit(nTpl)))
      // content key: template docs draw words from the template id,
      // unique docs from their own id
      .withColumn("ck",
        when(col("kind") <= 1, xxhash64(lit(seed), lit("t"), col("tpl")))
          .otherwise(xxhash64(lit(seed), lit("u"), col("id"))))
      // Zipf-ish length in [20, 300] — keyed by the content key so an
      // exact duplicate reproduces its template's length exactly
      .withColumn("_u",
        pmod(xxhash64(col("ck"), lit("len")), lit(1000000L)).cast("double") / 1e6)
      .withColumn("len",
        least(lit(300), greatest(lit(20),
          floor(lit(20.0) * pow(col("_u") + lit(1e-9), lit(-0.55))).cast("int"))))
      .withColumn("lang",
        element_at(langArr, (pmod(xxhash64(lit(seed), lit("lg"), col("ck")),
          lit(7L)) + 1).cast("int")))
    // word i: template/unique stream from ck; near-dup rows mutate ~1/50
    // positions with a doc-specific token (kills ~3 of the surrounding
    // 3-shingles each — Jaccard stays ≈ 0.94)
    val word =
      (i: org.apache.spark.sql.Column) => {
        val tplWord = format_string("w%d",
          pmod(xxhash64(col("ck"), i), lit(9973L)))
        val mutated = col("kind") === 1 &&
          pmod(xxhash64(lit(seed), lit("mu"), col("id"), i), lit(50L)) === 0
        when(mutated, format_string("m%d",
          pmod(xxhash64(lit(seed), lit("mw"), col("id"), i), lit(9973L))))
          .otherwise(tplWord)
      }
    base
      .withColumn("text",
        concat_ws(" ", transform(sequence(lit(0), col("len") - 1), word)))
      .select(col("id").as("doc_id"), col("lang"), col("text"),
        length(col("text")).as("n_chars"))
  }
}
