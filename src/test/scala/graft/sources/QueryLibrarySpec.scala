package graft.sources

import graft.SparkSpec
import graft.fixtures.CurFixture
import java.nio.file.Files

class QueryLibrarySpec extends SparkSpec {

  test("metadata header parse") {
    val meta = QueryLibrary.extractMetadata(
      "-- Title\n-- Description: something useful\n-- Output: rows\nSELECT 1")
    assert(meta.description.contains("something useful"))
    assert(meta.output.contains("rows"))
    assert(meta.partitioning.isEmpty)
  }

  test("the REFERENCE'S query-library files run end-to-end through the engine") {
    // read at test time from the read-only snapshot, never copied in
    val refLib = "/root/reference/cur2_query_library"
    assume(new java.io.File(refLib).isDirectory, "reference snapshot not present")
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    val out = Files.createTempDirectory("reflib_out").toString
    val (results, errors) = QueryLibrary.runAll(spark, refLib, out)
    assert(errors.isEmpty, s"reference library errors: $errors")
    assert(results.map(_.sqlFile).toSet ==
      Set("analytics/amazon_athena.sql", "analytics/sample.sql", "compute/lambda.sql"))
    // lambda.sql (EC2 usage categorization) finds fixture rows; the athena
    // query legitimately matches none (fixture has no Athena line items)
    assert(results.find(_.sqlFile == "compute/lambda.sql").get.rows > 0)
    assert(results.find(_.sqlFile == "analytics/sample.sql").get.rows == 10)
  }

  test("runAll executes every library file against CUR and mirrors layout") {
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    val out = Files.createTempDirectory("qlib_out").toString
    val (results, errors) = QueryLibrary.runAll(spark, "query_library", out)
    assert(errors.isEmpty, s"library errors: $errors")
    assert(results.map(_.sqlFile).toSet ==
      Set("analytics/service_costs.sql", "analytics/account_service_daily.sql",
        "compute/ec2_usage_categories.sql", "compute/purchase_option_mix.sql"))
    results.foreach { r =>
      assert(r.rows > 0)
      assert(r.outputPath.startsWith(out))
      assert(spark.read.parquet(r.outputPath).count() == r.rows)
    }
    // map-column access (product['region']) survived translation + write
    val daily = spark.read.parquet(
      results.find(_.sqlFile.contains("account_service_daily")).get.outputPath)
    assert(daily.schema.fieldNames.contains("region"))
    assert(daily.count() == 20) // LIMIT applied
    // purchase-option mix covers more than one option on the fixture
    val mix = spark.read.parquet(
      results.find(_.sqlFile.contains("purchase_option_mix")).get.outputPath)
    assert(mix.select("purchase_option").distinct().count() >= 3)
    // the :: cast file produced a date column (dialect translation ran)
    val ec2 = spark.read.parquet(
      results.find(_.sqlFile.contains("ec2")).get.outputPath)
    assert(ec2.schema("usage_day").dataType.typeName == "date")
    assert(results.find(_.sqlFile.contains("ec2")).get.meta.description.exists(_.contains("EC2")))
  }
}
