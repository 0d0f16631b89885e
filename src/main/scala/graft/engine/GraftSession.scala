package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with scale-oriented defaults.
  *
  * The reference engine (de_polars/engine/duckdb_engine.py:16-376) opens a
  * fresh in-memory DuckDB per query and eagerly materializes the whole
  * dataset. We do the opposite, Spark-first: one long-lived session, lazy
  * temp views over parquet, and Catalyst/AQE doing pruning + join planning.
  *
  * Defaults are chosen for cluster-scale behavior, tested on local[N]:
  *   - AQE on (runtime shuffle coalescing, broadcast conversion, skew-join
  *     splitting) — at 100 TB the same plans re-optimize per stage.
  *   - shuffle.partitions matched to parallelism locally; on a real cluster
  *     AQE coalesces from a high initial number, so this knob is safe.
  *   - UTC session timezone for deterministic date semantics.
  */
object GraftSession {

  def defaultParallelism: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def local(
      cores: Int = defaultParallelism,
      shufflePartitions: Int = -1,
      appName: String = "graft"): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else math.max(cores, 8)
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // Test tables carry TIMESTAMP(NANOS) parquet columns (TESTDATA.md);
      // read them as Long once session-wide instead of mutating the conf
      // inside table loaders.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft defaults to an externally built session (cluster use). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark
  }

  /** Cluster-deployment builder settings, as code instead of a wiki page.
    * Returns the conf map to merge into spark-defaults / the builder for a
    * 100 TB deployment of this library:
    *
    *  - shuffle.partitions high (AQE coalesces DOWN at runtime; it cannot
    *    split an under-partitioned stage UP) — ~2-3x total cores.
    *  - maxPartitionBytes default 128m for relational scans, but LOWERED
    *    for binary-media tables (multimodal module) so one task does not
    *    decode 128 MB of media serially while the rest idle.
    *  - skewJoin + advisory sizes let AQE split hot partitions; the
    *    explicit SkewTools salting covers pre-aggregation skew AQE cannot.
    *  - extensions installs the custom expressions cluster-wide.
    */
  def clusterDefaults(totalCores: Int, binaryHeavy: Boolean = false): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
    "spark.sql.shuffle.partitions" -> (totalCores * 3).toString,
    "spark.sql.files.maxPartitionBytes" -> (if (binaryHeavy) "16m" else "128m"),
    "spark.sql.autoBroadcastJoinThreshold" -> (64L << 20).toString,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    // Static conf, default 100 entries: a long-lived analytics session
    // runs hundreds of distinct plan shapes; at the default the codegen
    // class cache thrashes and queries silently re-pay janino compilation
    // (seconds for wide plans). Size to the session's working set.
    "spark.sql.codegen.cache.maxEntries" -> "2000",
    // graft's own scale knobs, set to their cluster-shaped values: the
    // shared dedup/vector derivation caches spill to disk instead of
    // evicting (they are re-read by many queries per session), and the
    // component solver's driver union-find threshold stays at its
    // default (2e6 edges) — raise it on fat drivers, or set
    // spark.graft.dedup.checkpointDir to make the distributed fallback
    // executor-loss-safe (see graft.queries.Caching).
    "spark.graft.dedup.storageLevel" -> "MEMORY_AND_DISK",
    "spark.graft.vector.storageLevel" -> "MEMORY_AND_DISK",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer")
}
