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
