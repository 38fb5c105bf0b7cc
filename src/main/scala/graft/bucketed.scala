package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Conv-bucketed transcript storage — the explicit-partitioning story of
  * the north rule ("over Iceberg tables … partitioning / shuffle / skew
  * handled explicitly"; SURVEY.md §2.1 receivers).
  *
  * At 10^12 turns the transcript table must be laid out so a
  * conversation's turns co-locate: Iceberg expresses this as a
  * `bucket(N, conv_id)` partition transform; the in-sandbox stand-in is a
  * Spark bucketed parquet table (`CLUSTERED BY (conv_id) INTO N BUCKETS`,
  * same murmur3 bucket function family). The payoff is plan-level:
  * `HashPartitioning(conv_id)` from the scan satisfies
  * `ClusteredDistribution(conv_id, …)` for every conv-keyed aggregate, so
  * parse→enrich→route→rollup runs with ZERO data shuffles (broadcast
  * exchanges only) — measured on the scattered layout the salted partial
  * shuffle was ~69% of scanned bytes (ScalingBench IoListener), i.e. the
  * interconnect, the one resource that does not scale with executors, was
  * carrying most of the job.
  *
  * `SORTED BY (conv_id, turn_idx)` additionally gives the stable turn
  * ordering of the per-turn text-equality invariant for free at read time.
  */
object BucketedCorpus {

  val DefaultBuckets = 128

  /** Write `turns` as a bucketed table at `path`. One pass: the
    * `repartition(buckets, conv_id)` matches the bucket hash exactly, so
    * every task writes exactly one bucket file (without it each task
    * writes one file PER bucket → tasks × buckets small files).
    */
  def write(turns: DataFrame, path: String, table: String,
            buckets: Int = DefaultBuckets): Unit = {
    turns.repartition(buckets, col("conv_id"))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, "conv_id")
      .sortBy("conv_id", "turn_idx")
      .format("parquet")
      .saveAsTable(table)
    // persist the bucket count next to the data: the catalog entry dies
    // with the session, and re-declaring a DIFFERENT count over the same
    // files would make Spark trust a partitioning that does not hold —
    // silently wrong zero-shuffle aggregates
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_graft_buckets"), buckets.toString)
  }

  /** Open a bucketed corpus written by [[write]]. The catalog entry is
    * session-scoped (in-memory catalog), so a fresh JVM re-issues the DDL
    * over the existing files — bucket ids live in the file names, so the
    * re-created table scan still reports HashPartitioning(conv_id).
    */
  def open(spark: SparkSession, path: String, table: String,
           buckets: Int = DefaultBuckets): DataFrame = {
    val meta = java.nio.file.Paths.get(path, "_graft_buckets")
    if (java.nio.file.Files.exists(meta)) {
      val actual = java.nio.file.Files.readString(meta).trim.toInt
      require(actual == buckets,
        s"bucket-count mismatch for $path: written with $actual, " +
          s"open() asked for $buckets — declaring the wrong count would " +
          "silently break the zero-shuffle aggregation")
    }
    if (spark.catalog.tableExists(table)) {
      // name-reuse guard: the catalog entry is matched by NAME only — if
      // this session already registered `table` over a DIFFERENT path, the
      // scan below would silently read the other corpus (the
      // _graft_buckets check guards bucket count, not location)
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .where(col("col_name") === "Location")
        .collect().headOption.map(_.getString(1)).getOrElse("")
      // compare LOCATIONS as filesystem-qualified Hadoop paths, not raw
      // strings: the registered location comes back scheme-qualified and
      // URI-escaped ("file:/x", "hdfs://nn/x", "%20"), while `path` is
      // whatever the caller wrote — string equality would spuriously
      // reject valid same-path reopens on any non-local scheme
      def qualified(p: String): org.apache.hadoop.fs.Path = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sessionState.newHadoopConf()).makeQualified(hp)
      }
      require(loc.isEmpty || qualified(loc) == qualified(path),
        s"table $table is already registered at '$loc', not '$path' — " +
          "refusing to silently read a different corpus; drop the table " +
          "or use a distinct name")
    }
    if (!spark.catalog.tableExists(table)) {
      spark.sql(
        s"""CREATE TABLE $table (
           |  conv_id STRING, turn_idx INT, role STRING,
           |  text STRING, tool STRING, ts TIMESTAMP)
           |USING parquet
           |CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx)
           |INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    spark.table(table)
  }
}
