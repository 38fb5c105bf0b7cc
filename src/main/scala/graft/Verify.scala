package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name subset (fast local
    // iteration; the driver always runs the full board with 2 args)
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // The transcript-pipeline queries (q_pipeline_*, q_conv_sample,
    // q_translate_*) run on the deterministic seed-42 synthetic corpus,
    // which DuckDB cannot regenerate — dump it once (with the sampler's
    // bucket precomputed, since DuckDB has no xxhash64) so their oracle SQL
    // can read the exact same rows via read_parquet('__OUT__/_input_turns').
    // Dir name deliberately has NO .parquet suffix so a driver glob over
    // query outputs never picks it up as a correctness row.
    TranscriptGen.turnsDs(spark, 500).toDF()
      .withColumn("sample_bucket",
        pmod(xxhash64(col("conv_id"), lit(22L)), lit(Sampler.NumBuckets)))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_turns")
    // Decoded-media metadata dump: the codec is a sandbox stub, but the
    // DOWNSTREAM stages (frame sampling, resize planning) are real column
    // math — dumping the decode output lets DuckDB verify them
    // independently. `base` is the stub's payload-hash PRIMITIVE: with it
    // dumped, the decode stage's width/height/frame arithmetic itself is
    // replayable in SQL (q_media_decode), same trick as sample_bucket.
    locally {
      import spark.implicits._
      graft.ops.Multimodal.syntheticMedia(spark, 300).map { r =>
        val (w, h, f) = graft.ops.Multimodal.StubCodec.decode(r.payload, r.kind)
        (r.media_id, r.kind, w, h, f,
          graft.ops.Multimodal.StubCodec.baseHash(r.payload))
      }.toDF("media_id", "kind", "width", "height", "n_frames", "base")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_media")
    }
    // Precomputed-hash dumps for the dedup/similarity oracles (same trick
    // as sample_bucket): DuckDB has no xxhash64, so the HASH PRIMITIVES
    // (minhash band hashes, word hashes, fingerprints, LSH buckets) are
    // dumped per row, and the oracle SQL replays all the RELATIONAL logic
    // — band equi-joins, bucket caps, pair semantics, Hamming/Jaccard
    // thresholds, top-k — independently in DuckDB over them.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(col("doc_id"),
        graft.ops.Dedup.wordShingles(col("text"), 3).as("sh"),
        graft.ops.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .withColumn("sig", graft.ops.Dedup.minhashSignature(col("sh"), 64))
      .withColumn("bands", graft.ops.Dedup.minhashBandsCol(col("sig"), 64, 16))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_docs")
    // Conversation near-dup primitives (q_conv_neardups): minhash
    // sig/band hashes of the rendered+cloned conversation frame. The
    // oracle re-renders the conversations AND re-shingles them from
    // _input_turns; only these hash values import (the _input_docs
    // convention).
    graft.ops.Dedup.renderConv(SparkEntry.convDedupTurns(spark),
        "conv_id", "turn_idx", "text")
      .select(col("conv_id"),
        graft.ops.Dedup.minhashSignature(
          graft.ops.Dedup.wordShingles(col("text"), 3), 64).as("sig"))
      .withColumn("bands",
        graft.ops.Dedup.minhashBandsCol(col("sig"), 64, 16))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_convs")
    // Random-projection sign matrix (q_rp_project): the ±1 entries are
    // xxhash64-derived — the one primitive; quantization and the exact
    // long sums replay relationally.
    graft.ops.Rp.signMatrix(spark, 64, 16, 11L)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_rp")
    // corpus word-hash dictionary: lets DuckDB recompute simhash signatures
    // INDEPENDENTLY (per-bit vote + sign + bit assembly all in SQL) — only
    // the raw xxhash64(word) values are imported
    docs.select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .distinct()
      .withColumn("h", xxhash64(col("word")))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_vocab")
    // classifier word→milli-weight dictionary: feature hashing (xxhash64
    // mod dim) happens HERE; the oracle joins tokens to this dump and
    // replays the integer sum / threshold / sigmoid relationally
    docs.select(explode(graft.ops.Curation.normWords(col("text"))).as("word"))
      .distinct()
      .withColumn("feat", graft.ops.Classifier.featureIndex(col("word"), 4096))
      .join(graft.ops.Classifier.syntheticWeights(spark, 4096), Seq("feat"))
      .select(col("word"), col("wgt"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_cls")
    // BM25 idf primitive: ln is the one transcendental the oracle cannot
    // reproduce bit-for-bit across libm variants — dump the quantized
    // per-term idf (with df, so the oracle's join cross-checks df too);
    // tokenization/tf/saturation/sums/top-k replay relationally.
    graft.ops.Bm25.idfTableWords(docs, "doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_bm25")
    // Language-ID dictionaries (q_langid_ngram): counts/totals/vocab are
    // recomputed and cross-checked by the oracle's joins; only the two
    // quantized-ln columns import (the Bm25 idf convention).
    locally {
      val (lid, lfl) = graft.ops.TextAnalysis.langIdDicts(
        docs.where(col("doc_id") % 3 === 0), "lang", "text")
      lid.coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/_input_langid")
      lfl.coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/_input_langid_floors")
    }
    // Unigram-LM NLL dictionary (q_lm_score): counts recomputed and
    // cross-checked by the oracle's join ON (w, cnt); only the quantized
    // ln imports (the Bm25/DSIR convention).
    graft.ops.TextAnalysis.unigramNllDict(docs, "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_lm")
    // Bigram Stupid-Backoff primitives (q_lm2_score): dictionaries built
    // over the EVEN-doc reference subset so the backoff and OOV paths
    // genuinely fire when the full corpus is scored against them. Exact
    // counts ride along and are recomputed/cross-checked by the oracle's
    // joins; only the quantized ln imports (the Bm25 idf convention). The
    // 1-row total frame carries the OOV floor ln(T), joined ON t_total so
    // the token total itself is cross-checked.
    locally {
      import spark.implicits._
      val refDocs = docs.where(col("doc_id") % 2 === 0)
      graft.ops.TextAnalysis.bigramNllDict(refDocs, "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_lm2")
      graft.ops.TextAnalysis.trigramNllDict(refDocs, "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_lm3")
      val uni = graft.ops.TextAnalysis.unigramNllDict(refDocs, "text")
      uni.coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/_input_lm2uni")
      val tRow = uni.agg(sum(col("cnt"))).head()
      require(!tRow.isNullAt(0) && tRow.getLong(0) > 0,
        "bigram-LM dump: reference subset has no tokens")
      val t = tRow.getLong(0)
      Seq((t, graft.ops.TextAnalysis.oovFloorMicro(t)))
        .toDF("t_total", "oov_micro")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/_input_lm2tot")
    }
    // Temperature-mixture pow dictionary (q_temperature_mixture): the
    // max-normalized (n/n_max)^alpha is the one transcendental — dumped
    // quantized per group WITH n_docs so the oracle's join cross-checks
    // the counts; p_ppm/weight_micro divisions replay relationally.
    graft.ops.Curation.temperatureWeights(docs, "lang", 0.5, 1000L)
      .select(col("lang"), col("n_docs"), col("pow_micro"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_temp")
    // BPE merge list (q_bpe_encode): the trainer's iterative argmax loop
    // cannot replay in one SQL query (per-iteration global aggregation
    // inside a recursion), so the learned (rank, lhs, rhs) list is the
    // dumped primitive — but rank 1 IS independently checkable (argmax of
    // the initial pair table, which q_bpe_pairs already replays) and the
    // ENCODE under the list replays fully (recursive CTE).
    graft.ops.Bpe.mergesFrame(docs,
        graft.ops.Bpe.trainLocal(docs, "text", nMerges = 8))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_bpe_merges")
    // DSIR primitives (q_dsir_weights/q_dsir_select): the per-doc hashed
    // bigram-bucket counts (xxhash64 — the hash primitive) and the
    // quantized log-ratio dictionary. The dict rides its exact counts so
    // the oracle joins ON (bucket, c_tgt, c_raw) — the counts are
    // RECOMPUTED in SQL from the doc-bucket rows and cross-checked by the
    // join; only the ln import is trusted (the Bm25 idf convention).
    locally {
      val dsirDocs = graft.ops.Dsir.docBucketRows(docs, "doc_id", "text",
        n = 2, bucketBits = 12)
      dsirDocs.coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/_input_dsir")
      graft.ops.Dsir.weightsWithDict(docs, "doc_id", "text",
          docs.where(col("doc_id") % 7 === 0), "text",
          n = 2, bucketBits = 12)._2
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/_input_dsir_dict")
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // cell16/probes: the IVF coarse-assignment PRIMITIVES for q_ann_recall
    // (same nCells=16, kmeansIters=0, seed defaults as the query) — the
    // oracle replays the probe filter, both top-k's, and the recall
    // arithmetic relationally over them
    val cents16 = graft.ops.Ivf.pickCentroids(emb, "vec_id", "embedding", 16)
    graft.ops.Ivf.assignCells(emb, "vec_id", "embedding", cents16)
      .select(col("vec_id"),
        graft.ops.Similarity.hyperplaneBucket(col("embedding"), 4, 7L).as("bucket4"),
        graft.ops.Similarity.hyperplaneBucket(col("embedding"), 6, 7L).as("bucket6"),
        col("cell").as("cell16"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_vecs")
    graft.ops.Ivf.probeCells(emb.where(col("vec_id") < 5),
        "vec_id", "embedding", cents16, 4)
      .select(col("query_id"), col("probe"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_probes")
    // PQ primitives for q_ann_pq / q_ann_ivfpq: the codes and per-query
    // ADC lookup tables (exact doubles) — the oracle replays the scoring
    // fold, candidate joins, and top-k relationally over these. Same
    // iters = 0 codebooks as the queries (deterministic sampled
    // codewords; see the q_ann_pq note in SparkEntry).
    val cbPq = graft.ops.Pq.train(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 0)
    graft.ops.Pq.encode(emb, "vec_id", "embedding", cbPq)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_pq")
    graft.ops.Pq.lutFrame(emb.where(col("vec_id") < 5),
        "vec_id", "embedding", cbPq)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_pqlut")
    // PSL rule table dump (same dump-the-primitive trick): the parsed
    // (suffix, kind-bitmask) rows, so the oracle replays the FULL PSL
    // resolution algorithm in SQL independently of the kernel.
    locally {
      import spark.implicits._
      graft.expr.PslDomain.loadDefault.m.toSeq.toDF("sfx", "flags")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_input_psl")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Driver convention (round-1 lesson): correctness rows AND the oracle
    // lookup are keyed by the output DIRECTORY name — "<name>.parquet".
    // Bare keys made round 1's official correctness 0/45 despite 31/31
    // passing on re-check. __OUT__ in the SQL is replaced with the absolute
    // outDir so DuckDB can read the dumped pipeline input.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) =>
        s"${q(k + ".parquet")}: ${q(v.replace("__OUT__", outDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
