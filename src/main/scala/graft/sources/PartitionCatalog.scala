package graft.sources

import graft.config.{DataConfig, DataExportType}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partition-pruned discovery + registration of the billing fact table,
  * mirroring the reference's data managers
  * (s3_data_manager.py:24-162, local_data_manager.py:20-95,
  * duckdb_engine.py:97-182) — but registered as a LAZY temp view so
  * Catalyst pushes filters/projections into the parquet scan instead of the
  * reference's eager CREATE TABLE AS materialization.
  *
  * All listing goes through the Hadoop `FileSystem` API, so the SAME
  * pruning drives every scheme the deployment has on its classpath —
  * `file://` locally (covered by the specs), `s3a://`/`abfs://`/`gs://` on
  * a cluster. The reference hard-splits this into a boto3 S3 manager and an
  * os.listdir local manager; one scheme-agnostic catalog replaces both.
  *
  * Pruning semantics are file-list level, reproducing the reference
  * exactly: partition dirs named `<PARTITION_COL>=<value>` are filtered by
  * string comparison for `YYYY-MM` grains (s3_data_manager.py:156-162) and
  * by parsed dates for COH daily partitions. At 100 TB the listing is one
  * LIST per partition dir (`listFiles(recursive)` is the S3A flat-list
  * fast path) — O(partitions), not O(files) — and the pruned file list
  * keeps Spark from even planning a scan of excluded months.
  */
object PartitionCatalog {

  /** One discovered data file: qualified path + size (both come straight
    * from the listing, so estimators never re-stat). */
  final case class PartFile(path: Path, sizeBytes: Long) {
    def name: String = path.getName
    def partitionDirName: String = path.getParent.getName
  }

  private[sources] def fsFor(root: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(root)
    val fs =
      try p.getFileSystem(conf)
      catch {
        case e: java.io.IOException =>
          // "No FileSystem for scheme" is the classic misconfiguration
          // (e.g. an s3a:// root without hadoop-aws on the classpath) —
          // resurface it with the fix instead of a bare scheme name
          throw new IllegalStateException(
            s"cannot access '$root': ${e.getMessage}. Remote schemes need their " +
              "Hadoop connector on the classpath (s3a: hadoop-aws + AWS SDK; " +
              "abfs: hadoop-azure; gs: gcs-connector).", e)
      }
    (fs, p)
  }

  /** `(partitionValue, files)` for every partition dir under root. */
  def listPartitions(root: String, t: DataExportType,
      conf: Configuration = new Configuration()): Seq[(String, Seq[PartFile])] = {
    val (fs, base) = fsFor(root, conf)
    if (!fs.exists(base)) return Seq.empty
    fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(t.partitionColumn + "="))
      .map { st =>
        val v = st.getPath.getName.substring(t.partitionColumn.length + 1)
        v -> dataFiles(fs, st.getPath)
      }
      .sortBy(_._1)
  }

  /** Recursive data-file walk (local_data_manager.py:20-44). One flat LIST
    * per partition dir on object stores; a plain listStatus walk on local
    * FS ([[graft.operators.Bucketing.listFileStatuses]] — the recursive
    * LocatedFileStatus listing forks `ls` per file there, r18 probe). */
  private def dataFiles(fs: FileSystem, dir: Path): Seq[PartFile] = {
    val buf = Seq.newBuilder[PartFile]
    graft.operators.Bucketing.listFileStatuses(fs, dir).foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(".parquet") || n.endsWith(".gz"))
        buf += PartFile(st.getPath, st.getLen)
    }
    buf.result()
  }

  /** Available partition values (s3_data_manager.py:65-99). */
  def listAvailablePartitions(root: String, t: DataExportType,
      conf: Configuration = new Configuration()): Seq[String] =
    listPartitions(root, t, conf).map(_._1)

  /** Range check, inclusive on both ends. `YYYY-MM`/`YYYY-MM-DD` string
    * compare is order-correct (s3_data_manager.py:132-162). */
  def inRange(v: String, start: Option[String], end: Option[String]): Boolean =
    start.forall(v >= _) && end.forall(v <= _)

  /** Pruned file list for the configured date range. */
  def discoverFiles(root: String, cfg: DataConfig,
      conf: Configuration = new Configuration()): Seq[PartFile] =
    listPartitions(root, cfg.exportType, conf)
      .filter { case (v, _) => inRange(v, cfg.dateStart, cfg.dateEnd) }
      .flatMap(_._2)

  /** Majority-vote format detection (s3_data_manager.py:206-216). */
  def detectFormat(files: Seq[PartFile]): String = {
    val pq = files.count(_.name.endsWith(".parquet"))
    val gz = files.count(_.name.endsWith(".gz"))
    if (gz > pq) "gz" else "parquet"
  }

  /** Register the pruned table as a temp view named `cfg.tableName`.
    * The partition value is surfaced as a real column (the reference
    * re-derives `billing_period` from the path inside SQL —
    * kpi_instance_all.sql:10-11 — Spark's basePath partition discovery
    * gives it natively; we select it under the export type's column name
    * lowercased for query compatibility). */
  def register(spark: SparkSession, root: String, cfg: DataConfig): DataFrame = {
    // the session's Hadoop conf carries cluster credentials/endpoints for
    // remote schemes; a bare Configuration would miss them
    val conf = spark.sessionState.newHadoopConf()
    val (fs, base) = fsFor(root, conf)
    val files = discoverFiles(root, cfg, conf)
    require(files.nonEmpty, s"no data files under $root for range " +
      s"${cfg.dateStart.getOrElse("-inf")}..${cfg.dateEnd.getOrElse("+inf")}")
    // qualify basePath the same way the listing qualified the file paths,
    // or partition-column discovery breaks on scheme mismatch
    val qualifiedBase = fs.makeQualified(base).toString
    val paths = files.map(_.path.toString)
    val df = detectFormat(files) match {
      case "parquet" =>
        spark.read.option("basePath", qualifiedBase).parquet(paths: _*)
      case "gz" => // legacy CUR CSV exports (s3_data_manager.py:206-216)
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(paths: _*)
    }
    // normalize the partition column to lowercase `billing_period` (or the
    // COH `date`) so downstream SQL is case-stable across export types
    val pcol = cfg.exportType.partitionColumn
    val out =
      if (df.columns.contains(pcol) && pcol != pcol.toLowerCase)
        df.withColumnRenamed(pcol, pcol.toLowerCase)
      else df
    out.createOrReplaceTempView(cfg.tableName)
    out
  }

  /** Source selection local-vs-S3 (duckdb_engine.py:246-266): prefer the
    * local mirror when configured and populated, unless forced to S3. The
    * returned root — local or remote — is listable by `register` through
    * the same `FileSystem` API, provided the scheme's implementation is on
    * the classpath. */
  def chooseRoot(cfg: DataConfig, forceS3: Boolean = false,
      conf: Configuration = new Configuration()): Option[String] = {
    val localOk = !forceS3 && cfg.preferLocalData &&
      cfg.localDataPath.exists(p => listPartitions(p, cfg.exportType, conf).nonEmpty)
    if (localOk) cfg.localDataPath
    else cfg.s3Bucket.map(b => s"s3a://$b/${cfg.s3Prefix.getOrElse("")}")
  }
}
