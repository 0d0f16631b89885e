package graft.sources

import graft.SparkSpec
import graft.config.{DataConfig, DataExportType}
import graft.fixtures.CurFixture
import java.nio.file.Files

class PartitionCatalogSpec extends SparkSpec {

  lazy val root: String = {
    val d = Files.createTempDirectory("cur_fixture").toString
    CurFixture.writePartitioned(spark, d)
    d
  }

  test("partition discovery lists every month") {
    val parts = PartitionCatalog.listAvailablePartitions(root, DataExportType.Cur2)
    assert(parts == CurFixture.months.sorted)
  }

  test("date-range pruning selects only in-range partitions (string compare)") {
    val cfg = DataConfig(localDataPath = Some(root),
      dateStart = Some("2025-01"), dateEnd = Some("2025-03"))
    val files = PartitionCatalog.discoverFiles(root, cfg)
    assert(files.nonEmpty)
    val parts = files.map(_.partitionDirName).distinct.sorted
    assert(parts == Seq("BILLING_PERIOD=2025-01", "BILLING_PERIOD=2025-02", "BILLING_PERIOD=2025-03"))
  }

  test("scheme-qualified root (file://) drives the same discovery and registration") {
    // the s3a:// cluster path goes through exactly this FileSystem code;
    // file:// is the scheme we can exercise in a zero-egress sandbox
    val uriRoot = "file://" + root
    val parts = PartitionCatalog.listAvailablePartitions(uriRoot, DataExportType.Cur2)
    assert(parts == CurFixture.months.sorted)
    val cfg = DataConfig(localDataPath = Some(uriRoot), tableName = "CUR_uri",
      dateStart = Some("2025-01"), dateEnd = Some("2025-02"))
    val df = PartitionCatalog.register(spark, uriRoot, cfg)
    assert(df.columns.contains("billing_period"))
    assert(df.select("billing_period").distinct().count() == 2)
  }

  test("register exposes pruned data with billing_period column") {
    val cfg = DataConfig(localDataPath = Some(root), tableName = "CUR",
      dateStart = Some("2025-01"), dateEnd = Some("2025-03"))
    val df = PartitionCatalog.register(spark, root, cfg)
    assert(df.columns.contains("billing_period"))
    val months = df.select("billing_period").distinct().collect().map(_.getString(0)).sorted
    assert(months.sameElements(Array("2025-01", "2025-02", "2025-03")))
    // the registered view answers the reference's canonical query (README.md:289-298)
    val top = spark.sql(
      """SELECT product_servicecode, SUM(line_item_unblended_cost) AS total_cost
        |FROM CUR WHERE line_item_unblended_cost > 0
        |GROUP BY 1 ORDER BY 2 DESC LIMIT 10""".stripMargin).collect()
    assert(top.nonEmpty && top.head.getString(0) == "AmazonEC2")
  }

  test("partition pruning reaches the physical scan (PartitionFilters)") {
    val cfg = DataConfig(localDataPath = Some(root), tableName = "CUR_pruned",
      dateStart = Some("2025-01"), dateEnd = Some("2025-01"))
    PartitionCatalog.register(spark, root, cfg)
    val plan = spark.sql("SELECT count(*) FROM CUR_pruned")
      .queryExecution.executedPlan.toString
    // only the selected month's files are in the scan relation
    assert(!plan.contains("2024-06"))
  }

  test("format detection majority-votes parquet") {
    val files = PartitionCatalog.discoverFiles(root,
      DataConfig(localDataPath = Some(root)))
    assert(PartitionCatalog.detectFormat(files) == "parquet")
  }

  test("chooseRoot prefers populated local mirror, falls back to s3") {
    val cfg = DataConfig(localDataPath = Some(root), s3Bucket = Some("b"), s3Prefix = Some("p"))
    assert(PartitionCatalog.chooseRoot(cfg).contains(root))
    assert(PartitionCatalog.chooseRoot(cfg, forceS3 = true).contains("s3a://b/p"))
    val empty = DataConfig(localDataPath = Some("/nonexistent"), s3Bucket = Some("b"))
    assert(PartitionCatalog.chooseRoot(empty).exists(_.startsWith("s3a://b/")))
  }

  test("COH daily-grain layout discovers and prunes by parsed day range") {
    val root = Files.createTempDirectory("coh").toString
    // date=YYYY-MM-DD daily layout (data_config.py:21)
    val days = Seq("2025-07-01", "2025-07-02", "2025-07-03", "2025-07-10")
    days.foreach { d =>
      CurFixture.df(spark).limit(5)
        .write.mode("overwrite").parquet(s"$root/date=$d")
    }
    val t = DataExportType.Coh
    assert(PartitionCatalog.listAvailablePartitions(root, t) == days)
    val cfg = DataConfig(localDataPath = Some(root), exportType = t,
      tableName = "COH", dateStart = Some("2025-07-02"), dateEnd = Some("2025-07-09"))
    val files = PartitionCatalog.discoverFiles(root, cfg)
    assert(files.map(_.partitionDirName).distinct.sorted ==
      Seq("date=2025-07-02", "date=2025-07-03"))
    val df = PartitionCatalog.register(spark, root, cfg)
    assert(df.columns.contains("date")) // lowercase partition col kept as-is
    assert(df.count() == 10)
  }

  test("FOCUS lowercase billing_period layout registers without rename") {
    val root = Files.createTempDirectory("focus").toString
    // the data column must not collide with the partition directory key
    CurFixture.df(spark).drop("billing_period").limit(3)
      .write.mode("overwrite").parquet(s"$root/billing_period=2025-07")
    val cfg = DataConfig(localDataPath = Some(root),
      exportType = DataExportType.Focus1, tableName = "FOCUS")
    val df = PartitionCatalog.register(spark, root, cfg)
    assert(df.columns.count(_ == "billing_period") == 1)
    assert(df.count() == 3)
  }

  test("legacy gz CSV exports register through the same catalog") {
    val root = Files.createTempDirectory("cur_gz").toString
    // the reference's legacy CUR path: gzipped CSV under the partition dir
    CurFixture.df(spark)
      .select("billing_period", "product_servicecode", "line_item_unblended_cost")
      .limit(50)
      .write.option("header", "true").option("compression", "gzip")
      .csv(s"$root/BILLING_PERIOD=2025-07")
    val cfg = DataConfig(localDataPath = Some(root), tableName = "CUR_GZ")
    val files = PartitionCatalog.discoverFiles(root, cfg)
    assert(files.nonEmpty && PartitionCatalog.detectFormat(files) == "gz")
    val df = PartitionCatalog.register(spark, root, cfg)
    assert(df.count() == 50)
    assert(spark.sql(
      "SELECT sum(line_item_unblended_cost) FROM CUR_GZ").head().get(0) != null)
  }

  test("missing filesystem connector fails with actionable guidance") {
    val e = intercept[IllegalStateException] {
      PartitionCatalog.listPartitions("nosuchscheme://bucket/prefix", DataExportType.Cur2)
    }
    assert(e.getMessage.contains("nosuchscheme://bucket/prefix"))
    assert(e.getMessage.contains("connector on the classpath"))
  }

  test("COH daily partitions validate date format") {
    assert(DataExportType.Coh.validDate("2025-07-14"))
    assert(!DataExportType.Coh.validDate("2025-07"))
    assert(DataExportType.Cur2.validDate("2025-07"))
    assert(!DataExportType.Cur2.validDate("2025-07-14"))
    intercept[IllegalArgumentException] {
      DataConfig(exportType = DataExportType.Coh, dateStart = Some("2025-07"))
    }
  }
}
