package graft.sources

import graft.config.{DataConfig, DataExportType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File

/** Partition-pruned discovery + registration of the billing fact table,
  * mirroring the reference's data managers
  * (s3_data_manager.py:24-162, local_data_manager.py:20-95,
  * duckdb_engine.py:97-182) — but registered as a LAZY temp view so
  * Catalyst pushes filters/projections into the parquet scan instead of the
  * reference's eager CREATE TABLE AS materialization.
  *
  * Pruning semantics are file-list level, reproducing the reference
  * exactly: partition dirs named `<PARTITION_COL>=<value>` are filtered by
  * string comparison for `YYYY-MM` grains (s3_data_manager.py:156-162) and
  * by parsed dates for COH daily partitions. At 100 TB the same listing is
  * a namenode/S3 LIST per partition — O(partitions), not O(files) — and
  * the pruned file list keeps Spark from even planning a scan of excluded
  * months.
  */
object PartitionCatalog {

  /** `(partitionValue, files)` for every partition dir under root. */
  def listPartitions(root: String, t: DataExportType): Seq[(String, Seq[File])] = {
    val base = new File(root)
    val dirs = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(t.partitionColumn + "="))
    dirs.toSeq.map { d =>
      val v = d.getName.substring(t.partitionColumn.length + 1)
      v -> dataFiles(d)
    }.sortBy(_._1)
  }

  /** Recursive data-file walk (local_data_manager.py:20-44). */
  private def dataFiles(dir: File): Seq[File] = {
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
    fs.toSeq.flatMap { f =>
      if (f.isDirectory) dataFiles(f)
      else if (f.getName.endsWith(".parquet") || f.getName.endsWith(".gz")) Seq(f)
      else Seq.empty
    }
  }

  /** Available partition values (s3_data_manager.py:65-99). */
  def listAvailablePartitions(root: String, t: DataExportType): Seq[String] =
    listPartitions(root, t).map(_._1)

  /** Range check, inclusive on both ends. `YYYY-MM`/`YYYY-MM-DD` string
    * compare is order-correct (s3_data_manager.py:132-162). */
  def inRange(v: String, start: Option[String], end: Option[String]): Boolean =
    start.forall(v >= _) && end.forall(v <= _)

  /** Pruned file list for the configured date range. */
  def discoverFiles(root: String, cfg: DataConfig): Seq[File] =
    listPartitions(root, cfg.exportType)
      .filter { case (v, _) => inRange(v, cfg.dateStart, cfg.dateEnd) }
      .flatMap(_._2)

  /** Majority-vote format detection (s3_data_manager.py:206-216). */
  def detectFormat(files: Seq[File]): String = {
    val pq = files.count(_.getName.endsWith(".parquet"))
    val gz = files.count(_.getName.endsWith(".gz"))
    if (gz > pq) "gz" else "parquet"
  }

  /** Register the pruned table as a temp view named `cfg.tableName`.
    * The partition value is surfaced as a real column (the reference
    * re-derives `billing_period` from the path inside SQL —
    * kpi_instance_all.sql:10-11 — Spark's basePath partition discovery
    * gives it natively; we select it under the export type's column name
    * lowercased for query compatibility). */
  def register(spark: SparkSession, root: String, cfg: DataConfig): DataFrame = {
    val files = discoverFiles(root, cfg)
    require(files.nonEmpty, s"no data files under $root for range " +
      s"${cfg.dateStart.getOrElse("-inf")}..${cfg.dateEnd.getOrElse("+inf")}")
    val df = detectFormat(files) match {
      case "parquet" =>
        spark.read.option("basePath", root)
          .parquet(files.map(_.getAbsolutePath): _*)
      case "gz" => // legacy CUR CSV exports (s3_data_manager.py:206-216)
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(files.map(_.getAbsolutePath): _*)
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
    * local mirror when configured and populated, unless forced to S3.
    * (S3 roots require a Hadoop filesystem for the scheme; same listing
    * logic applies through it — local-path tests cover the pruning.) */
  def chooseRoot(cfg: DataConfig, forceS3: Boolean = false): Option[String] = {
    val localOk = !forceS3 && cfg.preferLocalData &&
      cfg.localDataPath.exists(p => listPartitions(p, cfg.exportType).nonEmpty)
    if (localOk) cfg.localDataPath
    else cfg.s3Bucket.map(b => s"s3a://$b/${cfg.s3Prefix.getOrElse("")}")
  }
}
