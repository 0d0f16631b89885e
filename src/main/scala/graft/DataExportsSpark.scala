package graft

import graft.config.{DataConfig, DataExportType}
import graft.engine.{Catalog, GraftSession}
import graft.sources.{AwsAuth, MirrorDownloader, PartitionCatalog}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Backward-compatible facade — the Spark twin of the reference's
  * `DataExportsPolars` client (de_polars/client.py:10-133): the original
  * flat-constructor surface, delegating every capability to the modular
  * engine underneath ([[GraftFinOpsEngine]]), exactly as the reference
  * wraps its `DuckDBEngine`.
  *
  * {{{
  * val data = DataExportsSpark(
  *   s3Bucket = Some("my-bucket"), s3DataPrefix = Some("cur2/cur2/data"),
  *   dataExportType = "CUR2.0", tableName = "CUR",
  *   localDataPath = Some("/data/cur"))
  * val df = data.query("SELECT * FROM CUR LIMIT 10")
  * }}}
  *
  * Credential material flows into the session's Hadoop configuration via
  * [[AwsAuth.storageOptions]] (the reference passes polars
  * `storage_options`), and the expiration warning check runs at
  * construction against the injected clock (auth.py:9-46 semantics,
  * deterministic here).
  */
final class DataExportsSpark(
    val s3Bucket: Option[String],
    val s3DataPrefix: Option[String],
    val dataExportType: String,
    val tableName: String = "CUR",
    val dateStart: Option[String] = None,
    val dateEnd: Option[String] = None,
    val localDataPath: Option[String] = None,
    val preferLocalData: Boolean = true,
    val credentials: AwsAuth.Credentials = AwsAuth.Credentials(),
    now: java.time.Instant = java.time.Instant.now(),
    spark: SparkSession = GraftSession.local()) {

  val exportType: DataExportType = DataExportType.fromName(dataExportType)
    .getOrElse(throw new IllegalArgumentException(
      s"unknown data_export_type '$dataExportType'; expected one of " +
        DataExportType.all.map(_.name).mkString(", ")))

  val config: DataConfig = DataConfig(
    s3Bucket = s3Bucket,
    s3Prefix = s3DataPrefix,
    localDataPath = localDataPath,
    exportType = exportType,
    tableName = tableName,
    dateStart = dateStart,
    dateEnd = dateEnd,
    preferLocalData = preferLocalData)

  /** Expiration triage at construction (client.py:41 → auth.py:9-46);
    * surfaced as a value instead of stdout so callers/tests can act on it. */
  val credentialStatus: AwsAuth.ExpiryStatus =
    AwsAuth.checkCredentialExpiration(credentials.expiration, now)
  credentialStatus.message.foreach(m => Console.err.println(s"[graft] $m"))

  // credential material reaches the S3A connector exactly once, at
  // construction — the reference threads storage_options through every
  // read. Scoped to this client's bucket via per-bucket override keys
  // (fs.s3a.bucket.<bucket>.*), so concurrent clients with different
  // credentials on one shared session don't clobber each other; only a
  // bucket-less client (purely local) falls back to the global keys.
  locally {
    val opts = s3Bucket match {
      case Some(b) => AwsAuth.storageOptionsForBucket(credentials, b)
      case None => AwsAuth.storageOptions(credentials)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    opts.foreach { case (k, v) => conf.set(k, v) }
  }

  /** The modular engine underneath (client.py:68). */
  val engine: GraftFinOpsEngine = GraftFinOpsEngine(config, spark)

  /** Execute SQL (or a `.sql` file path) against the registered export
    * (client.py:88-90). */
  def query(sql: String, forceS3: Boolean = false): DataFrame =
    engine.query(sql, forceS3)

  /** Local-mirror presence (client.py:92-94). */
  def hasLocalData: Boolean = MirrorDownloader.hasLocalData(config)

  /** Mirror the remote export locally (client.py:96-98). The source root
    * re-resolves with forceS3 semantics so a populated local mirror never
    * shadows the remote origin. */
  def downloadDataLocally(overwrite: Boolean = false): MirrorDownloader.DownloadReport = {
    val remote = PartitionCatalog.chooseRoot(config, forceS3 = true)
      .getOrElse(throw new IllegalStateException(
        "download requires s3Bucket (no remote root configured)"))
    MirrorDownloader.downloadDataLocally(remote, config, overwrite,
      spark.sessionState.newHadoopConf())
  }

  /** Local cache status (client.py:100-102; shape from
    * local_data_manager.py:97-137). */
  def checkLocalDataStatus: Map[String, Any] = localDataPath match {
    case None =>
      Map("local_cache_configured" -> false, "has_data" -> false,
        "total_files" -> 0, "total_size_mb" -> 0.0, "cache_path" -> None)
    case Some(p) =>
      val files = PartitionCatalog.listPartitions(p, exportType,
        new Configuration()).flatMap(_._2)
      Map(
        "local_cache_configured" -> true,
        "has_data" -> files.nonEmpty,
        "total_files" -> files.size,
        "total_size_mb" -> files.map(_.sizeBytes).sum / (1024.0 * 1024.0),
        "cache_path" -> Some(p))
  }

  /** Available partition values from the active root (client.py:104-106). */
  def listAvailablePartitions(): Seq[String] = {
    val root = PartitionCatalog.chooseRoot(config)
      .getOrElse(throw new IllegalStateException("no data source configured"))
    PartitionCatalog.listAvailablePartitions(root, exportType,
      spark.sessionState.newHadoopConf())
  }

  /** Column → type map (client.py:108-110). */
  def schema(): Map[String, String] = engine.schema()

  /** Partition directory pattern for this export type
    * (client.py:130-133 / data_config.py:88-91). */
  def partitionFormat: String =
    s"${exportType.partitionColumn}=${exportType.dateFormat}"

  /** Catalog summary (client.py:112-114; duckdb_engine.py:329-346 shape). */
  def catalog(): Map[String, Any] = Map(
    "table_name" -> tableName,
    "data_export_type" -> dataExportType,
    "partition_format" -> partitionFormat,
    "s3_location" -> s3Bucket.map(b => s"s3://$b/${s3DataPrefix.getOrElse("")}"),
    "local_location" -> localDataPath,
    "has_local_data" -> hasLocalData,
    "schema" -> schema(),
    "date_range" -> Map(
      "start" -> dateStart, "end" -> dateEnd,
      "format" -> exportType.dateFormat))

  /** First-n sample (client.py:116-118). */
  def sample(n: Int = 10): DataFrame = engine.sample(n)

  /** Human-readable source description (client.py:120-122;
    * duckdb_engine.py:352-376) — returned, not printed. */
  def info(): String = {
    val lines = Seq(
      "=" * 60,
      "graft Data Source Information",
      "=" * 60,
      s"Export Type: $dataExportType",
      s"Table Name: $tableName") ++
      s3Bucket.map(b => s"S3 Location: s3://$b/${s3DataPrefix.getOrElse("")}").toSeq ++
      localDataPath.map(p => s"Local Cache: $p").toSeq ++
      localDataPath.map(_ => s"Has Local Data: $hasLocalData").toSeq ++
      (if (dateStart.isDefined || dateEnd.isDefined)
        Seq(s"Date Filter: ${dateStart.getOrElse("earliest")} to ${dateEnd.getOrElse("latest")}")
      else Seq.empty) ++
      Seq(s"Columns: ${schema().size} columns", "=" * 60)
    lines.mkString("\n")
  }
}

object DataExportsSpark {
  /** Keyword-style constructor mirroring client.py:27-41. */
  def apply(s3Bucket: Option[String] = None,
      s3DataPrefix: Option[String] = None,
      dataExportType: String = "CUR2.0",
      tableName: String = "CUR",
      dateStart: Option[String] = None,
      dateEnd: Option[String] = None,
      localDataPath: Option[String] = None,
      preferLocalData: Boolean = true,
      credentials: AwsAuth.Credentials = AwsAuth.Credentials(),
      now: java.time.Instant = java.time.Instant.now(),
      spark: SparkSession = GraftSession.local()): DataExportsSpark =
    new DataExportsSpark(s3Bucket, s3DataPrefix, dataExportType, tableName,
      dateStart, dateEnd, localDataPath, preferLocalData, credentials, now, spark)
}
