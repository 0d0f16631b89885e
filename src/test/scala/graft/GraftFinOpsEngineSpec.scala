package graft

import graft.config.DataConfig
import graft.fixtures.CurFixture
import java.nio.file.Files
import java.time.LocalDate

class GraftFinOpsEngineSpec extends SparkSpec {

  lazy val root: String = {
    val d = Files.createTempDirectory("cur_engine").toString
    CurFixture.writePartitioned(spark, d)
    d
  }

  def engine: GraftFinOpsEngine = new GraftFinOpsEngine(
    DataConfig(localDataPath = Some(root),
      dateStart = Some("2025-04"), dateEnd = Some("2025-07"),
      referenceDate = Some(LocalDate.of(2025, 7, 15))),
    spark)

  test("end-to-end: register -> query -> analytics -> health through one object") {
    val e = engine
    // the reference's canonical query (README.md:289-298)
    val top = e.query(
      """SELECT product_servicecode, SUM(line_item_unblended_cost) AS total_cost
        |FROM CUR WHERE line_item_unblended_cost > 0
        |GROUP BY 1 ORDER BY 2 DESC LIMIT 10""".stripMargin).collect()
    assert(top.head.getString(0) == "AmazonEC2")
    assert(e.schema().contains("line_item_unblended_cost"))
    assert(e.sample(5).count() == 5)
    assert(e.guardedQuery("DROP TABLE CUR").isLeft)
    val health = e.finops.healthCheck()
    assert(health.overallScore > 0)
    assert(e.mcp.ask("top services by spend").isRight)
  }

  test("date range pruning flows through the facade") {
    val e = engine
    val months = e.query("SELECT DISTINCT billing_period FROM CUR ORDER BY 1")
      .collect().map(_.getString(0))
    assert(months.head == "2025-04" && months.last == "2025-07")
  }

  test("serve() binds the REST layer over the registered engine") {
    val server = engine.serve(port = 0)
    try {
      val url = java.net.URI.create(
        s"http://127.0.0.1:${server.boundPort}/health").toURL
      val body = new String(url.openStream().readAllBytes())
      assert(body.contains("\"status\":\"healthy\""))
    } finally server.stop()
  }

  test("unconfigured source fails loudly") {
    val bare = new GraftFinOpsEngine(DataConfig(), spark)
    intercept[IllegalStateException](bare.query("SELECT 1"))
  }

  test("enabled API data sources auto-register the reference-named tables") {
    val e = new GraftFinOpsEngine(
      DataConfig(localDataPath = Some(root),
        dateStart = Some("2025-04"), dateEnd = Some("2025-07"),
        referenceDate = Some(LocalDate.of(2025, 7, 15)),
        enablePricingApi = true, enableSavingsPlansApi = true),
      spark)
    // the README's cost-efficiency join (README.md:620-633 shape) runs
    // without any manual registration call
    val eff = e.query(
      """SELECT c.product_instance_type,
        |       SUM(c.line_item_unblended_cost) AS actual_cost,
        |       MAX(p.price_per_hour_usd) AS od_rate
        |FROM CUR c
        |LEFT JOIN aws_pricing p ON p.instance_type = c.product_instance_type
        |WHERE c.line_item_product_code = 'AmazonEC2'
        |GROUP BY 1""".stripMargin).collect()
    assert(eff.nonEmpty)
    // all four reference-named tables (README.md:585-592) + spot history
    for (t <- Seq("aws_pricing", "aws_rds_pricing", "aws_savings_plans",
        "aws_savings_plans_rates", "spot_price_history"))
      assert(e.query(s"SELECT count(*) AS n FROM $t").head().getLong(0) > 0,
        s"$t not registered")
    // determinism: referenceDate (not wall clock) pins the spot history
    val latest = e.query(
      "SELECT max(timestamp) AS t FROM spot_price_history").head().getString(0)
    assert(latest == "2025-07-15T00:00:00Z")
  }

  test("forceS3 is honored per query, not only at first registration") {
    val e = engine // local-only config
    assert(e.query("SELECT count(*) AS n FROM CUR").collect().head.getLong(0) > 0)
    // duckdb_engine.py:246-251: force_s3 bypasses the local source on EVERY
    // call — with no S3 configured this must fail, not silently reuse the
    // already-registered local table
    intercept[IllegalStateException](e.query("SELECT 1", forceS3 = true))
    // and the engine still works for local queries afterwards
    assert(e.query("SELECT count(*) AS n FROM CUR").collect().head.getLong(0) > 0)
  }
}
