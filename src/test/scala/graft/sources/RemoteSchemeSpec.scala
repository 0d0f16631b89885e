package graft.sources

import graft.SparkSpec
import graft.config.{DataConfig, DataExportType}
import graft.fixtures.CurFixture
import java.nio.file.Files
import org.apache.hadoop.conf.Configuration

/** A local-backed Hadoop `FileSystem` registered under a NON-file scheme
  * (`mock://`), standing in for s3a/abfs/gs in the zero-egress sandbox.
  * Hadoop instantiates it reflectively from `fs.mock.impl`, exactly how a
  * cluster resolves `fs.s3a.impl` — so everything below the scheme lookup
  * (catalog listing, pruning, Spark scan, cross-FS mirror copy) runs the
  * same remote-scheme code path a real object store would. */
class MockRemoteFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path}

  override def getScheme: String = "mock"
  override def getUri: java.net.URI = java.net.URI.create("mock:///")

  /** RawLocal's lazy permission loading does `new File(path.toUri)`, which
    * rejects non-file schemes — materialize plain statuses instead (an
    * object-store FS has no POSIX permissions anyway). */
  private def strict(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      null, null, null, st.getPath)

  override def getFileStatus(f: Path): FileStatus = strict(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(strict)
}

/** Proves the scheme-agnostic claim of [[PartitionCatalog]] /
  * [[MirrorDownloader]] (SURVEY §2.1 S1/S6): the same code that the specs
  * exercise over `file://` discovers, prunes, registers, and mirrors
  * through a registered non-file scheme, with every path staying
  * scheme-qualified end to end. */
class RemoteSchemeSpec extends SparkSpec {

  private val implKey = "fs.mock.impl"
  private val implCls = classOf[MockRemoteFileSystem].getName

  private def mockConf: Configuration = {
    val c = new Configuration()
    c.set(implKey, implCls)
    c
  }

  private lazy val localRoot: String = {
    val d = Files.createTempDirectory("cur_mock_remote").toString
    CurFixture.writePartitioned(spark, d)
    d
  }
  private lazy val mockRoot: String = "mock://" + localRoot

  test("partition discovery lists through the mock:// scheme, paths stay qualified") {
    val parts = PartitionCatalog.listPartitions(mockRoot, DataExportType.Cur2, mockConf)
    assert(parts.map(_._1) == CurFixture.months.sorted)
    val allFiles = parts.flatMap(_._2)
    assert(allFiles.nonEmpty)
    allFiles.foreach { f =>
      assert(f.path.toUri.getScheme == "mock", s"path lost its scheme: ${f.path}")
    }
  }

  test("date-range pruning + size estimation work over mock://") {
    val cfg = DataConfig(localDataPath = None, dateStart = Some("2025-01"),
      dateEnd = Some("2025-03"))
    val files = PartitionCatalog.discoverFiles(mockRoot, cfg, mockConf)
    assert(files.nonEmpty)
    assert(files.map(_.partitionDirName).distinct.sorted ==
      Seq("BILLING_PERIOD=2025-01", "BILLING_PERIOD=2025-02", "BILLING_PERIOD=2025-03"))
    val est = MirrorDownloader.estimateDownloadSize(mockRoot, cfg, mockConf)
    assert(est.totalFiles == files.size)
    assert(est.totalSizeMb > 0.0)
  }

  test("register builds the pruned Spark scan through mock:// (non-file scheme end to end)") {
    // the session resolves schemes via its own Hadoop conf — register the
    // mock impl the same way a cluster would carry fs.s3a.impl
    spark.sparkContext.hadoopConfiguration.set(implKey, implCls)
    try {
      val cfg = DataConfig(localDataPath = None, tableName = "CUR_MOCK",
        dateStart = Some("2025-01"), dateEnd = Some("2025-02"))
      val df = PartitionCatalog.register(spark, mockRoot, cfg)
      assert(df.columns.contains("billing_period"))
      val months = df.select("billing_period").distinct()
        .collect().map(_.getString(0)).sorted
      assert(months.sameElements(Array("2025-01", "2025-02")))
      // the physical scan reads mock:// files — not silently rewritten
      val scanned = df.inputFiles
      assert(scanned.nonEmpty && scanned.forall(_.startsWith("mock:")),
        s"scan not through mock scheme: ${scanned.take(3).mkString(", ")}")
      assert(spark.sql(
        """SELECT sum(line_item_unblended_cost) FROM CUR_MOCK
          |WHERE line_item_unblended_cost > 0""".stripMargin).head().getDouble(0) > 0)
    } finally spark.sparkContext.hadoopConfiguration.unset(implKey)
  }

  test("MirrorDownloader mirrors mock:// to a local root, skip semantics intact") {
    val dst = Files.createTempDirectory("cur_mock_mirror").toString
    val cfg = DataConfig(localDataPath = Some(dst),
      dateStart = Some("2025-01"), dateEnd = Some("2025-02"))
    val files = PartitionCatalog.discoverFiles(mockRoot, cfg, mockConf)
    val first = MirrorDownloader.downloadDataLocally(mockRoot, cfg, conf = mockConf)
    assert(first.downloaded == files.size && first.skipped == 0 && first.failed == 0)
    // the mirrored layout is listable as a plain local root
    val mirrored = PartitionCatalog.discoverFiles(dst, cfg, new Configuration())
    assert(mirrored.map(f => (f.partitionDirName, f.name)).sorted ==
      files.map(f => (f.partitionDirName, f.name)).sorted)
    // second run skips everything (no overwrite)
    val second = MirrorDownloader.downloadDataLocally(mockRoot, cfg, conf = mockConf)
    assert(second.downloaded == 0 && second.skipped == files.size)
  }
}
