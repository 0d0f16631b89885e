package graft.sources

import graft.config.DataConfig
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Remote→local mirror downloader + size/cost estimator
  * (SURVEY.md §2.1 S6/S7, reference data_downloader.py:26-240).
  *
  * The reference downloads S3 objects over boto3 with a 5-thread pool,
  * mirroring the bucket layout and skipping existing files. Here the
  * transfer runs over the Hadoop `FileSystem` API, so the SAME code copies
  * `file://`→`file://` in the zero-egress specs and `s3a://`→`file://` on
  * a cluster with the S3A connector on the classpath — partition
  * discovery, layout mirroring, skip/overwrite semantics, parallelism, and
  * the estimator's sample-and-extrapolate logic all reproduce the
  * reference behind one scheme-agnostic endpoint.
  */
object MirrorDownloader {

  val DownloadThreads = 5 // data_downloader.py:122
  val AssumedMBps = 10.0 // data_downloader.py:221-224 (estimate only)
  val DollarsPerTBScanned = 5.0 // data_downloader.py:233-240
  val QueriesPerMonth = 20

  final case class DownloadReport(downloaded: Int, skipped: Int, failed: Int)

  /** Mirror every pruned partition file from `sourceRoot` into
    * `cfg.localDataPath`, preserving the partition directory layout
    * (data_downloader.py:26-167). */
  def downloadDataLocally(sourceRoot: String, cfg: DataConfig,
      overwrite: Boolean = false,
      conf: Configuration = new Configuration()): DownloadReport = {
    val localRoot = cfg.localDataPath.getOrElse(
      throw new IllegalArgumentException("local_data_path must be configured for data download"))
    val (srcFs, srcBase) = PartitionCatalog.fsFor(sourceRoot, conf)
    val (dstFs, dstBase) = PartitionCatalog.fsFor(localRoot, conf)
    val srcBasePath = srcFs.makeQualified(srcBase).toUri.getPath
    val files = PartitionCatalog.discoverFiles(sourceRoot, cfg, conf)
    val tasks = files.map { f =>
      // relativize on the scheme-less URI path: the mirrored layout under
      // the local root matches the remote layout byte-for-byte
      val rel = f.path.toUri.getPath.stripPrefix(srcBasePath).stripPrefix("/")
      (f.path, new Path(dstBase, rel))
    }
    val (existing, toCopy) =
      tasks.partition { case (_, dst) => dstFs.exists(dst) && !overwrite }

    val pool = Executors.newFixedThreadPool(DownloadThreads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val results = Future.traverse(toCopy) { case (src, dst) =>
        Future {
          try {
            dstFs.mkdirs(dst.getParent)
            FileUtil.copy(srcFs, src, dstFs, dst,
              /*deleteSource=*/ false, /*overwrite=*/ true, conf)
          } catch { case _: Throwable => false }
        }
      }
      val done = Await.result(results, Duration.Inf)
      DownloadReport(done.count(identity), existing.size, done.count(!_))
    } finally pool.shutdown()
  }

  final case class DownloadEstimate(
      totalFiles: Int,
      totalSizeMb: Double,
      estimatedDownloadSeconds: Double,
      potentialMonthlySavingsUsd: Double)

  /** Sample ≤10 files, extrapolate total size, estimate transfer time at
    * the assumed throughput and the monthly scan-cost savings
    * (data_downloader.py:169-240). Sizes come from the partition listing
    * itself — no extra HEAD per file. */
  def estimateDownloadSize(sourceRoot: String, cfg: DataConfig,
      conf: Configuration = new Configuration()): DownloadEstimate = {
    val files = PartitionCatalog.discoverFiles(sourceRoot, cfg, conf)
    if (files.isEmpty) return DownloadEstimate(0, 0.0, 0.0, 0.0)
    val sample = files.take(10)
    val sampleBytes = sample.map(_.sizeBytes).sum
    val totalBytes =
      if (files.size > 10) sampleBytes.toDouble / sample.size * files.size
      else sampleBytes.toDouble
    val mb = totalBytes / (1024.0 * 1024.0)
    val tb = totalBytes / (1024.0 * 1024.0 * 1024.0 * 1024.0)
    DownloadEstimate(
      totalFiles = files.size,
      totalSizeMb = mb,
      estimatedDownloadSeconds = mb / AssumedMBps,
      potentialMonthlySavingsUsd = tb * DollarsPerTBScanned * QueriesPerMonth)
  }

  /** Mirror presence check (duckdb_engine.py:246-266 `has_local_data`). */
  def hasLocalData(cfg: DataConfig): Boolean =
    cfg.localDataPath.exists(p =>
      PartitionCatalog.listPartitions(p, cfg.exportType).nonEmpty)
}
