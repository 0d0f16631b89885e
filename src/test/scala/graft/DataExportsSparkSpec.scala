package graft

import graft.fixtures.CurFixture
import graft.sources.AwsAuth
import java.nio.file.Files
import java.time.Instant

/** The backward-compatible client facade (client.py:10-133 twin) over a
  * local fixture export: every reference method answers through the
  * modular engine. */
class DataExportsSparkSpec extends SparkSpec {

  private lazy val root: String = {
    val d = Files.createTempDirectory("cur_compat").toString
    CurFixture.writePartitioned(spark, d)
    d
  }

  private lazy val client = DataExportsSpark(
    s3Bucket = Some("example-bucket"), s3DataPrefix = Some("cur2/data"),
    dataExportType = "CUR2.0", tableName = "CUR_COMPAT",
    dateStart = Some("2025-01"), dateEnd = Some("2025-03"),
    localDataPath = Some(root), spark = spark)

  test("query answers SQL over the registered pruned export") {
    val rows = client.query(
      """SELECT product_servicecode, SUM(line_item_unblended_cost) AS total_cost
        |FROM CUR_COMPAT WHERE line_item_unblended_cost > 0
        |GROUP BY 1 ORDER BY 2 DESC LIMIT 5""".stripMargin).collect()
    assert(rows.nonEmpty && rows.head.getString(0) == "AmazonEC2")
  }

  test("schema/sample/partitions/catalog answer like the reference surface") {
    assert(client.schema().contains("line_item_unblended_cost"))
    assert(client.sample(3).count() == 3)
    assert(client.listAvailablePartitions() == CurFixture.months.sorted)
    val cat = client.catalog()
    assert(cat("table_name") == "CUR_COMPAT")
    assert(cat("data_export_type") == "CUR2.0")
    assert(cat("partition_format") == "BILLING_PERIOD=YYYY-MM")
    assert(cat("has_local_data") == true)
    assert(cat("s3_location").asInstanceOf[Option[String]]
      .contains("s3://example-bucket/cur2/data"))
    val dr = cat("date_range").asInstanceOf[Map[String, Any]]
    assert(dr("start") == Some("2025-01") && dr("end") == Some("2025-03"))
  }

  test("checkLocalDataStatus reports files and size; unconfigured cache is empty") {
    val st = client.checkLocalDataStatus
    assert(st("local_cache_configured") == true)
    assert(st("has_data") == true)
    assert(st("total_files").asInstanceOf[Int] > 0)
    assert(st("total_size_mb").asInstanceOf[Double] > 0.0)
    val bare = DataExportsSpark(s3Bucket = Some("b"), s3DataPrefix = Some("p"),
      dataExportType = "CUR2.0", tableName = "CUR_BARE", spark = spark)
    val none = bare.checkLocalDataStatus
    assert(none("local_cache_configured") == false && none("has_data") == false)
  }

  test("info renders the reference's description fields") {
    val s = client.info()
    assert(s.contains("Export Type: CUR2.0"))
    assert(s.contains("Table Name: CUR_COMPAT"))
    assert(s.contains("s3://example-bucket/cur2/data"))
    assert(s.contains("Has Local Data: true"))
    assert(s.contains("Date Filter: 2025-01 to 2025-03"))
  }

  test("credential expiration surfaces at construction under the injected clock") {
    val c = DataExportsSpark(s3Bucket = Some("b"), s3DataPrefix = Some("p"),
      dataExportType = "CUR2.0", tableName = "CUR_EXP",
      localDataPath = Some(root),
      credentials = AwsAuth.Credentials(expiration = Some("2025-01-15T10:02:00Z")),
      now = Instant.parse("2025-01-15T10:00:00Z"), spark = spark)
    assert(c.credentialStatus.isInstanceOf[AwsAuth.ExpiringSoon])
  }

  test("credential material lands per-bucket: concurrent clients don't clobber") {
    val conf = spark.sparkContext.hadoopConfiguration
    DataExportsSpark(s3Bucket = Some("bucket-a"), s3DataPrefix = Some("p"),
      dataExportType = "CUR2.0", tableName = "CUR_CREDS_A",
      localDataPath = Some(root),
      credentials = AwsAuth.Credentials(
        accessKeyId = Some("AKID-A"), secretAccessKey = Some("SECRET-A")),
      spark = spark)
    DataExportsSpark(s3Bucket = Some("bucket-b"), s3DataPrefix = Some("p"),
      dataExportType = "CUR2.0", tableName = "CUR_CREDS_B",
      localDataPath = Some(root),
      credentials = AwsAuth.Credentials(
        accessKeyId = Some("AKID-B"), secretAccessKey = Some("SECRET-B")),
      spark = spark)
    try {
      // each client's material is scoped to ITS bucket; the global key
      // stays untouched, so neither client sees the other's credentials
      assert(conf.get("fs.s3a.bucket.bucket-a.access.key") == "AKID-A")
      assert(conf.get("fs.s3a.bucket.bucket-b.access.key") == "AKID-B")
      assert(conf.get("fs.s3a.access.key") == null)
    } finally {
      Seq("a", "b").foreach { s =>
        conf.unset(s"fs.s3a.bucket.bucket-$s.access.key")
        conf.unset(s"fs.s3a.bucket.bucket-$s.secret.key")
      }
    }
  }

  test("unknown export type and missing remote root fail with actionable errors") {
    val bad = intercept[IllegalArgumentException] {
      DataExportsSpark(s3Bucket = Some("b"), s3DataPrefix = Some("p"),
        dataExportType = "CUR9.9", spark = spark)
    }
    assert(bad.getMessage.contains("CUR2.0"))
    val noRemote = DataExportsSpark(s3Bucket = None, s3DataPrefix = None,
      dataExportType = "CUR2.0", tableName = "CUR_NOREM",
      localDataPath = Some(root), spark = spark)
    val e = intercept[IllegalStateException](noRemote.downloadDataLocally())
    assert(e.getMessage.contains("s3Bucket"))
  }
}
