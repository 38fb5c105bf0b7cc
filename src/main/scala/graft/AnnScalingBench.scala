package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the ANN family — the same
  * two-parallelism-level protocol as [[ScalingBench]] /
  * [[CurationScalingBench]] (BASELINE.md), over a multi-million-vector
  * [[VecGen]] corpus: `Similarity` / `Ivf` / `Pq` were previously argued
  * scale-safe from plan shape but only ever MEASURED on the 500-row sf
  * embeddings table.
  *
  * Stages timed independently (IoListener bytes reset per stage), each a
  * production step over a DURABLE artifact, not an in-memory convenience:
  *  - bruteforce: exact top-k of nQ broadcast queries over the full
  *    corpus — the recall-1.0 baseline every ANN row is judged against.
  *  - ivf_build:  [[graft.ops.Ivf.writeIndex]] — Lloyd-refined coarse
  *    quantizer + corpus written partitionBy(cell).
  *  - ivf_probe:  [[graft.ops.Ivf.probeIndex]] at nProbe/nCells = 1/8 —
  *    the partition-pruned scan (IO ratio, not filter ratio).
  *  - pq_encode:  [[graft.ops.Pq.encode]] of the full corpus (codebooks
  *    trained untimed on a 5% hash sample — standard PQ practice; training
  *    cost amortizes across corpora) written as the durable (id, codes)
  *    compressed index.
  *  - pq_adc:     [[graft.ops.Pq.pqTopKEncoded]] — ADC scoring of every
  *    code row against broadcast per-query LUTs, O(m) per candidate.
  *  - pq_rerank:  [[graft.ops.Pq.pqTopKReranked]] — ADC shortlist (30·k)
  *    then exact-cosine rerank of only those candidates (the production
  *    retrieval pattern; quantized scores cannot resolve near-ties).
  *
  * Each level also reports measured recall@k vs the brute-force baseline
  * for the ivf_probe and pq_adc result sets — the quality number that
  * makes the speed numbers meaningful (reported per level, not asserted
  * equal across levels: Lloyd means merge float partials in
  * Spark-unpinned order, so cell boundaries may differ in the last ulp).
  *
  * Protocol notes carried from the other scaling benches: corpus written
  * ONCE (untimed) to tmpfs and scanned by the timed job; fresh JVM per
  * parallelism level (lo == hi single-level mode) is the honest protocol —
  * pair levels within one calm window, best-of-2 warm runs per level.
  */
object AnnScalingBench {

  private val Dim = 64
  private val K = 10
  private val NQ = 64
  private val NCells = 64
  private val NProbe = 8
  private val M = 8      // PQ subspaces (dsub = 8)
  private val Ksub = 16  // codewords per subspace
  private val Shortlist = 300 // rerank ADC shortlist (30·k)

  /** Latent clusters scale with the corpus (~200 members each) so the
    * neighborhood structure — and therefore recall@k — is comparable
    * across corpus sizes (a fixed cluster count would grow each cluster
    * linearly with n and silently dilute every method's recall).
    */
  private def clustersFor(nVecs: Long): Int =
    math.max(64, (nVecs / 200L).toInt)

  /** Shuffle partitions sized to DATA, identical at every level (see
    * [[CurationScalingBench.partitionsFor]]); vector rows are ~4× smaller
    * than document rows, so 4× the rows per task.
    */
  private def partitionsFor(nVecs: Long, cores: Int): Int =
    math.max(cores, (nVecs / 125000L).toInt)

  private def session(cores: Int, parts: Int): SparkSession = {
    // SPARK_GRAFT_MASTER: the spark-submit local-cluster multi-executor
    // protocol (see ScalingBench) — `cores` still sizes partitions
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]"))
      .appName(s"graft-ann-scaling-$cores")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def topkPairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val lo = args.lift(1).map(_.toInt).getOrElse(8)
    val hi = args.lift(2).map(_.toInt).getOrElse(lo)
    // optional 4th arg: comma-separated stage subset (default: all; the
    // untimed recall passes only run on a full-stage run, since they read
    // the ivf/pq artifacts those stages write)
    val stageSet: Set[String] =
      args.lift(3).map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val corpusDir = sys.env.getOrElse("SPARK_GRAFT_VECS_DIR",
      s"/dev/shm/graft-vecs-$nVecs")
    val workDir = s"/dev/shm/graft-ann-$nVecs"

    def run(cores: Int): (Map[String, (Double, (Long, Long, Long))],
                          Map[String, Double]) = {
      val spark = session(cores, partitionsFor(nVecs, cores))
      try {
        if (!new java.io.File(s"$corpusDir/_SUCCESS").exists())
          VecGen.vecs(spark, nVecs, Dim, nClusters = clustersFor(nVecs))
            .drop("cluster").repartition(128)
            .write.mode("overwrite").parquet(corpusDir)
        def corpus = spark.read.parquet(corpusDir)
        def queries = corpus.where(col("vec_id") < NQ)

        // codebooks: untimed, trained on a ~5% deterministic hash sample
        // (lazy — a stage subset without pq stages never trains them)
        lazy val cb = graft.ops.Pq.train(
          corpus.where(pmod(xxhash64(col("vec_id"), lit(3L)), lit(20L)) === 0),
          "vec_id", "embedding", M, Ksub, iters = 1)

        def bfRun(): Unit = {
          val n = graft.ops.Similarity.bruteForceTopK(corpus, "vec_id",
            "embedding", queries, "vec_id", "embedding", K).count()
          require(n == NQ.toLong * K, s"bruteforce rows: $n")
        }
        def ivfBuildRun(): Unit =
          graft.ops.Ivf.writeIndex(corpus, "vec_id", "embedding",
            s"$workDir/ivf", nCells = NCells, kmeansIters = 1)
        def ivfProbeRun(): Unit = {
          val n = graft.ops.Ivf.probeIndex(spark, s"$workDir/ivf",
            queries, "vec_id", "embedding", K, nProbe = NProbe).count()
          require(n == NQ.toLong * K, s"ivf_probe rows: $n")
        }
        def pqEncodeRun(): Unit =
          graft.ops.Pq.encode(corpus, "vec_id", "embedding", cb)
            .write.mode("overwrite").parquet(s"$workDir/pq")
        def pqAdcRun(): Unit = {
          val n = graft.ops.Pq.pqTopKEncoded(
            spark.read.parquet(s"$workDir/pq"),
            queries, "vec_id", "embedding", cb, K).count()
          require(n == NQ.toLong * K, s"pq_adc rows: $n")
        }
        def pqRerankRun(): Unit = {
          val n = graft.ops.Pq.pqTopKReranked(
            spark.read.parquet(s"$workDir/pq"), corpus, "vec_id",
            "embedding", queries, "vec_id", "embedding", cb, K,
            shortlist = Shortlist).count()
          require(n == NQ.toLong * K, s"pq_rerank rows: $n")
        }

        def semDedupRun(): Unit = {
          // SemDeDup over the clustered corpus: sampled quantizer
          // (iters=0 — the Lloyd cost is ivf_build's row), capped in-cell
          // cosine pairs, CC keep-set; the low-noise latent clusters make
          // most cells near-cliques, so this measures the op at its
          // densest realistic edge volume
          val out = graft.ops.Dedup.semanticDedup(corpus, "vec_id",
            "embedding", nCells = clustersFor(nVecs), threshold = 0.9,
            kmeansIters = 0)
          val (total, kept) = {
            val r = out.agg(count(lit(1)), count_if(col("keep"))).head()
            (r.getLong(0), r.getLong(1))
          }
          require(total == nVecs, s"semdedup rows: $total != $nVecs")
          require(kept > 0 && kept < nVecs, s"semdedup kept $kept of $nVecs")
        }

        def knnGraphRun(): Unit = {
          // approximate KNN GRAPH: every corpus row is its own query — the
          // heaviest self-join shape in the family (≈ rows × (planes+1)
          // probes × avg-bucket candidates); cap + salt bound hot buckets.
          // planes sized so avg bucket ≈ corpus/2^planes stays ~60 rows.
          val n = graft.ops.Similarity.knnGraphLsh(corpus, "vec_id",
            "embedding", k = K, planes = 12, bucketCap = 2048, salt = 4)
            .count()
          require(n > 0, s"knn_graph rows: $n")
        }

        val io = new IoListener
        spark.sparkContext.addSparkListener(io)
        // build stages run (warm + timed) before their probe stages read
        val optIn = Set("semdedup", "knn_graph")
        val stages = Seq(
          "bruteforce" -> (() => bfRun()),
          "ivf_build" -> (() => ivfBuildRun()),
          "ivf_probe" -> (() => ivfProbeRun()),
          "pq_encode" -> (() => pqEncodeRun()),
          "pq_adc" -> (() => pqAdcRun()),
          "pq_rerank" -> (() => pqRerankRun()),
          "semdedup" -> (() => semDedupRun()),
          "knn_graph" -> (() => knnGraphRun()))
          .filter { case (name, _) =>
            // semdedup/knn_graph are opt-in: the historical 6-stage full
            // run (the published ANN table) stays reproducible as-is
            if (stageSet.isEmpty) !optIn(name) else stageSet(name) }
        require(stages.nonEmpty, s"no stage matches $stageSet")
        // a probe-only subset would silently time probes against whatever
        // STALE artifact a previous run left in the persistent workDir —
        // make the dependency explicit
        if (stageSet.nonEmpty) {
          def needs(probe: String, build: String, artifact: String): Unit =
            if (stageSet(probe) && !stageSet(build))
              require(new java.io.File(artifact).exists(),
                s"stage $probe without $build in the subset needs a prior " +
                  s"$artifact (and it may be stale — prefer including $build)")
          needs("ivf_probe", "ivf_build", s"$workDir/ivf")
          needs("pq_adc", "pq_encode", s"$workDir/pq")
          needs("pq_rerank", "pq_encode", s"$workDir/pq")
        }
        val timed = stages.map { case (name, f) =>
          val w = time(f()) // full-size warm: codegen + classloading outside the timing
          io.reset()
          val s1 = time(f())
          org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark.sparkContext)
          val bytes = (io.input.get, io.shufWrite.get, io.shufRead.get)
          val s2 = time(f())
          System.err.println(f"[ann-bench $cores%dc] $name%s warm=$w%.1f t1=$s1%.1f t2=$s2%.1f")
          name -> (math.min(s1, s2), bytes)
        }.toMap

        // recall@k vs brute force (untimed; nQ × k rows per side) — full
        // runs only: stage subsets may not have written the artifacts
        val recall = if (stageSet.nonEmpty) Map.empty[String, Double] else {
          val bf = topkPairs(graft.ops.Similarity.bruteForceTopK(corpus,
            "vec_id", "embedding", queries, "vec_id", "embedding", K))
          val ivf = topkPairs(graft.ops.Ivf.probeIndex(spark, s"$workDir/ivf",
            queries, "vec_id", "embedding", K, nProbe = NProbe))
          val pq = topkPairs(graft.ops.Pq.pqTopKEncoded(
            spark.read.parquet(s"$workDir/pq"),
            queries, "vec_id", "embedding", cb, K))
          val rr = topkPairs(graft.ops.Pq.pqTopKReranked(
            spark.read.parquet(s"$workDir/pq"), corpus, "vec_id",
            "embedding", queries, "vec_id", "embedding", cb, K,
            shortlist = Shortlist))
          Map(
            "ivf_probe" -> (ivf & bf).size.toDouble / bf.size,
            "pq_adc" -> (pq & bf).size.toDouble / bf.size,
            "pq_rerank" -> (rr & bf).size.toDouble / bf.size)
        }
        (timed, recall)
      } finally spark.stop()
    }

    def fmt(cores: Int, r: Map[String, (Double, (Long, Long, Long))],
            rec: Map[String, Double]): String = {
      val rows = r.toSeq.sortBy(_._1).map { case (name, (sec, (in, sw, sr))) =>
        val recPart = rec.get(name).map(v => f""","recall_at_$K":$v%.3f""").getOrElse("")
        f""""$name":{"sec":$sec%.2f,"vecs_per_sec":${nVecs / sec}%.0f$recPart,"input_bytes":$in,"shuffle_write_bytes":$sw,"shuffle_read_bytes":$sr}"""
      }.mkString(",")
      s"""{"cores":$cores,$rows}"""
    }

    if (lo == hi) {
      val (r, rec) = run(lo)
      println(s"""{"metric":"ann_throughput","vecs":$nVecs,"dim":$Dim,"level":${fmt(lo, r, rec)}}""")
    } else {
      val (rLo, recLo) = run(lo)
      val (rHi, recHi) = run(hi)
      val effs = rLo.keys.map { k =>
        val e = (rLo(k)._1 / rHi(k)._1) / (hi.toDouble / lo)
        f""""$k":$e%.3f"""
      }.mkString("{", ",", "}")
      println(s"""{"metric":"ann_scaling","vecs":$nVecs,"dim":$Dim,"eff":$effs,"lo":${fmt(lo, rLo, recLo)},"hi":${fmt(hi, rHi, recHi)}}""")
    }
  }
}
