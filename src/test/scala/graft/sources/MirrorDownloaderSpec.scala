package graft.sources

import graft.SparkSpec
import graft.config.DataConfig
import graft.fixtures.CurFixture
import java.nio.file.Files

class MirrorDownloaderSpec extends SparkSpec {

  lazy val sourceRoot: String = {
    val d = Files.createTempDirectory("cur_src").toString
    CurFixture.writePartitioned(spark, d)
    d
  }

  test("download mirrors pruned partitions, skips existing, overwrites on demand") {
    val local = Files.createTempDirectory("cur_mirror").toString
    val cfg = DataConfig(localDataPath = Some(local),
      dateStart = Some("2025-06"), dateEnd = Some("2025-07"))
    val r1 = MirrorDownloader.downloadDataLocally(sourceRoot, cfg)
    assert(r1.downloaded > 0 && r1.failed == 0)
    // mirrored layout is a valid catalog root for the pruned range
    assert(PartitionCatalog.listAvailablePartitions(local, cfg.exportType) ==
      Seq("2025-06", "2025-07"))
    assert(MirrorDownloader.hasLocalData(cfg))
    // second run: everything skipped
    val r2 = MirrorDownloader.downloadDataLocally(sourceRoot, cfg)
    assert(r2.downloaded == 0 && r2.skipped == r1.downloaded)
    // overwrite re-copies
    val r3 = MirrorDownloader.downloadDataLocally(sourceRoot, cfg, overwrite = true)
    assert(r3.downloaded == r1.downloaded)
    // registered mirror answers queries
    PartitionCatalog.register(spark, local, cfg.copy(tableName = "CUR_mirror"))
    assert(spark.table("CUR_mirror").count() > 0)
  }

  test("size estimation samples and extrapolates") {
    val cfg = DataConfig(localDataPath = Some("/unused"))
    val est = MirrorDownloader.estimateDownloadSize(sourceRoot, cfg)
    assert(est.totalFiles >= 14) // >= one parquet file per month partition
    assert(est.totalSizeMb > 0)
    assert(est.estimatedDownloadSeconds > 0)
    val empty = MirrorDownloader.estimateDownloadSize(
      Files.createTempDirectory("empty").toString, cfg)
    assert(empty.totalFiles == 0 && empty.totalSizeMb == 0.0)
  }
}
