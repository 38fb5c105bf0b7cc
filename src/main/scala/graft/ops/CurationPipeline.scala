package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition of the training-data
  * operators into the shape a real pre-training pipeline runs —
  *
  *   exact dedup → near-dup cluster resolution → benchmark
  *   decontamination → quality gates (repetition / length) → domain
  *   mixture rebalancing → PII redaction → shard + split assignment.
  *
  * Every stage is expressed as a boolean KEEP FLAG on the input frame and
  * the flags are AND-ed cumulatively, so (a) the survivor set needs ONE
  * filter pass, and (b) the per-stage attrition report is ONE aggregation
  * over the flag columns — no per-stage count() actions, no per-stage
  * materialization. The only extra passes are the ones the dedup operators
  * inherently need (the signature/cluster frames, which are
  * localCheckpointed inside [[Dedup]]).
  *
  * Determinism: every stage is a pure function of the input rows (hash
  * ranks, not `rand()`), so a retry, a different partitioning, or a
  * different engine curates identically — the property the split/shard
  * assignments already guarantee row-wise, extended to the whole pipeline.
  */
object CurationPipeline {

  final case class CurationConfig(
      shingleK: Int = 3,
      nearDupThreshold: Double = 0.8,
      decontaminateN: Int = 13,
      // fuzzy (near-duplicate) decontamination: a paraphrased/truncated
      // eval item shares few exact decontaminateN-grams but is still a
      // shingle-Jaccard near-dup. Off by default (the exact pass is the
      // published baseline); requires corpus ids ≥ 0 (eval docs get
      // synthetic negative ids for side attribution).
      fuzzyDecontaminate: Boolean = false,
      fuzzyThreshold: Double = 0.8,
      maxDupWordRatio: Double = 0.5,
      maxDupNgramRatio: Double = 0.5,
      minTokens: Int = 5,
      maxTokens: Int = 1 << 20,
      redactPii: Boolean = true,
      mixture: Seq[(String, Double)] = Nil, // empty → keep every domain
      defaultFraction: Double = 1.0,
      nShards: Int = 64,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      // URL-provenance stage (runs FIRST when `curate` gets a urlCol):
      // registrable-domain blocklist + per-domain contribution cap
      // (0 = uncapped)
      blockedDomains: Seq[String] = Nil,
      domainCap: Int = 0)

  /** Stage names in pipeline order (report rows appear in this order).
    * `url` and `fuzzy` report pass-through counts unless a urlCol /
    * [[CurationConfig.fuzzyDecontaminate]] is configured.
    */
  val Stages: Seq[String] =
    Seq("input", "url", "exact", "neardup", "decontaminated", "fuzzy",
      "quality", "mixture")

  /** Curate `docs`. Returns (curated frame, per-stage survivor counts).
    *
    * The curated frame keeps the input columns (text redacted when
    * configured) plus `shard` and `split`; the report counts survivors
    * after each cumulative stage, starting with the raw input count.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             langCol: String, evalSet: Option[DataFrame] = None,
             evalTextCol: String = "text",
             cfg: CurationConfig = CurationConfig(),
             urlCol: Option[String] = None)
      : (DataFrame, Seq[(String, Long)]) = {
    val id = col(idCol)
    val text = col(textCol)

    // stage 0 — URL provenance (the published pipelines' FIRST pass):
    // registrable-domain blocklist + per-domain cap, domain derived ONCE.
    // The flag must gate the dedup winner selection below — a blocked doc
    // winning an exact/near-dup cluster would silently delete its
    // unblocked duplicates along with itself.
    urlCol.foreach(u => require(docs.columns.contains(u),
      s"missing url column: $u"))
    val docs0 = urlCol match {
      case None => docs.withColumn("_k_url", lit(true))
      case Some(u) =>
        val withDom = docs.withColumn("_dom",
          UrlCuration.urlDomain(col(u)))
        val notBlocked =
          if (cfg.blockedDomains.isEmpty) lit(true)
          else !col("_dom").isin(cfg.blockedDomains: _*)
        if (cfg.domainCap <= 0)
          withDom.withColumn("_k_url", notBlocked).drop("_dom")
        else {
          val kept = Curation.quotaSample(
              withDom.where(notBlocked).select(col("_dom"), id),
              Seq("_dom"), idCol, cfg.domainCap)
            .select(col("_dom").as("_dom_k"),
              col(idCol).cast("long").as("_url_keep"),
              lit(true).as("_in_cap"))
          withDom
            .join(kept, col("_dom") === col("_dom_k") &&
              id.cast("long") === col("_url_keep"), "left")
            .withColumn("_k_url",
              notBlocked && coalesce(col("_in_cap"), lit(false)))
            .drop("_dom", "_dom_k", "_url_keep", "_in_cap")
        }
    }

    // stage 1 — exact dedup on normalized content (smallest id survives).
    // The winner set is a hash aggregate (map-side partials collapse a
    // mass-duplicated key before the shuffle), flagged back via a left
    // join on the COMPOSITE (content key, id) — both sides unique on it,
    // so no partition concentrates a hot key. A row_number window over the
    // content key (the round-3 shape) funnels every copy of a boilerplate
    // doc through one task — the exactKeep skew lesson (Dedup.scala).
    val contentKey = array_join(Curation.normWords(text), " ")
    val winners = docs0.where(col("_k_url"))
      .select(contentKey.as("_ck"), id.as("_win_id"))
      .groupBy(col("_ck")).agg(min(col("_win_id")).as("_win_id"))
      .withColumn("_k_exact", lit(true))
    val docsCk = docs0.withColumn("_ck", contentKey)
    // localCheckpoint: flagged0 feeds BOTH the near-dup branch (stage 2
    // shingles the exact survivors) and the flag chain — uncheckpointed,
    // the content-key normalization + winner join run twice (measured
    // ~2× the exact stage at bench scale). At extreme scale this is the
    // standard recompute-vs-materialize trade: blocks go to executor
    // memory+disk and are released with the frame.
    val flagged0 = docsCk
      .join(winners,
        docsCk("_ck") === winners("_ck") && id === col("_win_id"), "left")
      .drop(winners("_ck")).drop("_ck", "_win_id")
      .withColumn("_k_exact", coalesce(col("_k_exact"), lit(false)))
      .localCheckpoint(true)

    // stage 2 — near-dup clusters among the exact survivors (running it on
    // the pre-dedup corpus would only re-discover the exact duplicates);
    // clusters() emits (id, keep) for every survivor, keep = is the
    // canonical (min-id) member of its component
    val keepSet = Dedup.nearDupClusters(
        flagged0.where(col("_k_url") && col("_k_exact")).select(id, text),
        idCol, textCol, cfg.nearDupThreshold, shingleK = cfg.shingleK)
      .select(id.cast("long").as("_nd_id"), col("keep").as("_nd_keep"))
    val flagged1 = flagged0
      .join(keepSet, id.cast("long") === col("_nd_id"), "left")
      .drop("_nd_id")
      .withColumn("_k_neardup", coalesce(col("_nd_keep"), lit(false)))
      .drop("_nd_keep")

    // stage 3 — benchmark decontamination: the hit set is tiny (rare by
    // construction), broadcast back as an anti-flag
    val flagged2 = evalSet match {
      case Some(ev) =>
        val hits = Curation.decontaminate(docs, idCol, textCol, ev,
            evalTextCol, cfg.decontaminateN)
          .select(col("doc_id").as("_dc_id"))
        flagged1.join(broadcast(hits), id.cast("long") === col("_dc_id"), "left")
          .withColumn("_k_decontaminated", col("_dc_id").isNull)
          .drop("_dc_id")
      case None => flagged1.withColumn("_k_decontaminated", lit(true))
    }

    // stage 3b — FUZZY decontamination (opt-in): near-dup sweep against
    // the eval set via the stored-minhash-index machinery. Eval docs get
    // deterministic NEGATIVE synthetic ids (xxhash64 of their text), so
    // side attribution never collides with the (non-negative) corpus ids.
    val flagged2b = (evalSet, cfg.fuzzyDecontaminate) match {
      case (Some(ev), true) =>
        val evIds = ev.select(
          (lit(-1L) - pmod(xxhash64(col(evalTextCol)), lit(Long.MaxValue)))
            .as("_fid"),
          col(evalTextCol).as("_ftext"))
        val fhits = Curation.decontaminateFuzzy(docs, idCol, textCol,
            evIds, "_fid", "_ftext", cfg.fuzzyThreshold,
            shingleK = cfg.shingleK)
          .select(col("doc_id").as("_fz_id"))
        flagged2.join(broadcast(fhits),
            id.cast("long") === col("_fz_id"), "left")
          .withColumn("_k_fuzzy", col("_fz_id").isNull)
          .drop("_fz_id")
      case _ => flagged2.withColumn("_k_fuzzy", lit(true))
    }

    // stage 4 — quality gates: pure per-row column math. The word array is
    // MATERIALIZED as a projected column first — dupNgramRatioFromWords'
    // transform lambda must capture an attribute reference, never the
    // normWords expression tree, or the interpreted HOF path re-runs the
    // regex/split/filter chain once per n-gram (the measured-13.7× trap
    // documented on ngramsFromWords)
    // the bigram array is materialized too (`_ng2`): the ratio reads it
    // twice (size + distinct-size), and two references to the
    // ngramsFromWords subtree would rebuild every bigram string twice
    val words = col("_words")
    val qualityFlag =
      Curation.dupWordRatioFromWords(words) <= cfg.maxDupWordRatio &&
        Curation.dupRatioOfArray(col("_ng2")) <= cfg.maxDupNgramRatio &&
        TextAnalysis.tokenCountWs(text).between(cfg.minTokens, cfg.maxTokens)

    // stage 5 — domain mixture rebalancing (pure id arithmetic)
    val mixtureFlag =
      if (cfg.mixture.isEmpty) lit(true)
      else Curation.mixtureKeep(col(langCol), id, cfg.mixture,
        cfg.defaultFraction)

    val flagged = flagged2b
      .withColumn("_words", Curation.normWords(text))
      .withColumn("_ng2", Curation.ngramsFromWords(col("_words"), 2))
      .withColumn("_k_quality", qualityFlag)
      .withColumn("_k_mixture", mixtureFlag)
      .drop("_words", "_ng2")
      .localCheckpoint(true) // report + survivors read the flags once each

    // ONE aggregation for the whole attrition report
    val cum = Stages.tail.scanLeft(lit(true)) {
      case (acc, s) => acc && col(s"_k_$s")
    }.tail
    val row = flagged.agg(
      count(lit(1)).as("input"),
      Stages.tail.zip(cum).map { case (s, c) =>
        sum(when(c, 1L).otherwise(0L)).as(s)
      }: _*).head()
    val report = Stages.zipWithIndex.map { case (s, i) => s -> row.getLong(i) }

    val survivors = flagged.where(cum.last)
      .select(docs.columns.map(col): _*)
    val redacted =
      if (cfg.redactPii)
        survivors.withColumn(textCol, Curation.redactPii(text))
      else survivors
    val curated = redacted
      .withColumn("shard", Curation.shardAssign(id, cfg.nShards))
      .withColumn("split", Curation.splitAssign(id, cfg.splits))
    (curated, report)
  }

  /** Write the curated corpus as fixed training shards: `split=` is the
    * partition key (consumers read one split), `shard` stays a column used
    * to bucket files within each split via repartition — a stable layout a
    * trainer can address as (split, shard).
    */
  def writeCurated(curated: DataFrame, outDir: String): Unit =
    curated
      .repartition(col("split"), col("shard"))
      .sortWithinPartitions(col("shard"))
      .write.mode("overwrite")
      .partitionBy("split")
      .parquet(outDir)
}
