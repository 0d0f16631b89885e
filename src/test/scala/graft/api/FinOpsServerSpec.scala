package graft.api

import graft.SparkSpec
import graft.analytics.FinOps
import graft.engine.GraftEngine
import graft.fixtures.CurFixture
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.time.LocalDate

/** End-to-end HTTP tests: real server on an ephemeral port, real requests
  * through java.net, JSON envelopes asserted (reference api/fastapi_app.py
  * route table). */
class FinOpsServerSpec extends SparkSpec {

  lazy val server: FinOpsServer = {
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    val asOf = LocalDate.of(2025, 7, 15)
    val s = new FinOpsServer(
      new FinOps(spark, "CUR", asOf), new GraftEngine(spark, Some(asOf)))
    s.start()
    s
  }

  override def afterAll(): Unit = {
    try server.stop() finally super.afterAll()
  }

  private def request(method: String, path: String,
      body: Option[String] = None): (Int, String) = {
    val url = URI.create(s"http://127.0.0.1:${server.boundPort}$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
    }
    val status = conn.getResponseCode
    val stream = if (status < 400) conn.getInputStream else conn.getErrorStream
    val text = new String(stream.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (status, text)
  }

  private def get(path: String): (Int, String) = request("GET", path)

  test("root and health endpoints answer") {
    val (s1, b1) = get("/")
    assert(s1 == 200 && b1.contains("FinOps Cost Analytics API"))
    val (s2, b2) = get("/health")
    assert(s2 == 200 && b2.contains("\"status\":\"healthy\""))
  }

  test("every GET route in the reference route table returns 200 JSON") {
    val routes = Seq(
      "/api/v1/finops/kpi/summary",
      "/api/v1/finops/kpi/health-check",
      "/api/v1/finops/kpi/executive-summary",
      "/api/v1/finops/kpi/dashboard-data",
      "/api/v1/finops/spend/trend",
      "/api/v1/finops/spend/breakdown?dimensions=region",
      "/api/v1/finops/spend/invoice/summary",
      "/api/v1/finops/spend/regions/top",
      "/api/v1/finops/spend/services/top",
      "/api/v1/finops/spend/breakdown",
      "/api/v1/finops/optimization/idle-resources",
      "/api/v1/finops/optimization/rightsizing",
      "/api/v1/finops/optimization/cross-service-migration",
      "/api/v1/finops/optimization/vpc-charges?min_transfer_cost=0",
      "/api/v1/finops/allocation/account-hierarchy",
      "/api/v1/finops/allocation/tagging-compliance",
      "/api/v1/finops/allocation/cost-center-breakdown",
      "/api/v1/finops/allocation/third-party-integration",
      "/api/v1/finops/discounts/current-agreements",
      "/api/v1/finops/discounts/negotiation-opportunities?min_annual_spend=0",
      "/api/v1/finops/discounts/usage-forecasting",
      "/api/v1/finops/ai/anomaly-detection",
      "/api/v1/finops/ai/optimization-insights?min_avg_monthly_spend=0",
      "/api/v1/finops/ai/forecasting",
      "/api/v1/finops/mcp/resources",
      "/api/v1/finops/mcp/tools",
      "/api/v1/finops/mcp/stream-config",
      "/api/v1/finops/sql/schema?table=CUR",
      "/api/v1/finops/sql/tables")
    routes.foreach { r =>
      val (status, body) = get(r)
      assert(status == 200, s"$r -> $status: ${body.take(200)}")
      assert(body.startsWith("{"), s"$r did not return a JSON object")
    }
  }

  test("vpc-charges composes analysis, recommendations, and total savings") {
    val (_, body) = get("/api/v1/finops/optimization/vpc-charges?min_transfer_cost=0")
    assert(body.contains("transfer_analysis"))
    assert(body.contains("Consolidate resources within same AZ"))
    assert(body.contains("\"savings\":"))
  }

  test("sql/query POST runs guarded SQL and returns the envelope") {
    val (status, body) = request("POST", "/api/v1/finops/sql/query",
      Some("""{"query": "SELECT product_servicecode, count(*) AS n FROM CUR GROUP BY 1 ORDER BY n DESC", "max_rows": 5}"""))
    assert(status == 200)
    assert(body.contains("\"success\":true"))
    assert(body.contains("\"row_count\":"))
    assert(body.contains("AmazonEC2"))
  }

  test("sql/query rejects non-SELECT statements via the firewall") {
    val (status, body) = request("POST", "/api/v1/finops/sql/query",
      Some("""{"query": "DROP TABLE CUR"}"""))
    assert(status == 200) // validation errors are in-envelope, like the reference
    assert(body.contains("\"success\":false"))
    assert(body.contains("VALIDATION_ERROR"))
  }

  test("sql/query maps analysis failures through the error taxonomy") {
    val (_, body) = request("POST", "/api/v1/finops/sql/query",
      Some("""{"query": "SELECT no_such_column FROM CUR"}"""))
    assert(body.contains("\"success\":false"))
    assert(body.contains("COLUMN_NOT_FOUND"))
  }

  test("mcp/query routes natural-language questions") {
    val (status, body) = request("POST", "/api/v1/finops/mcp/query",
      Some("""{"question": "top services by spend"}"""))
    assert(status == 200)
    assert(body.contains("\"success\":true"))
  }

  test("ai/custom-analysis returns data plus parsed intent") {
    val (status, body) = request("POST", "/api/v1/finops/ai/custom-analysis",
      Some("""{"query": "why did spend spike yesterday?"}"""))
    assert(status == 200)
    assert(body.contains("\"intent\":\"anomalies\""))
  }

  test("commitment-planning POST simulates the default scenarios") {
    val (status, body) = request("POST", "/api/v1/finops/discounts/commitment-planning",
      Some("{}"))
    assert(status == 200)
    assert(body.contains("simulation_results"))
  }

  test("spend/export POST returns deterministic export metadata") {
    val (status, body) = request("POST", "/api/v1/finops/spend/export",
      Some("""{"format": "xlsx", "start": "2025-07-01"}"""))
    assert(status == 200)
    assert(body.contains("/exports/spend_data_2025-07-15.xlsx"))
    assert(body.contains("\"recordCount\":"))
  }

  test("tagging-rules POST creates rules with impact estimates") {
    val (status, body) = request("POST", "/api/v1/finops/allocation/tagging-rules",
      Some("""{"rules": [
        {"name": "envs", "tag_key": "Environment", "tag_value": "prod",
         "criteria": {"service": "EC2"}},
        {"tag_key": "Team", "tag_value": "data"}]}"""))
    assert(status == 200)
    assert(body.contains("\"total_rules\":2"))
    assert(body.contains("\"total_affected_resources\":200")) // 150 (EC2) + 50 (default)
    assert(body.contains("Unnamed Rule"))
  }

  test("implement-recommendation POST tracks approval state") {
    val (status, body) = request("POST",
      "/api/v1/finops/optimization/implement-recommendation",
      Some("""{"recommendation_id": "r42", "auto_approve": true}"""))
    assert(status == 200)
    assert(body.contains("impl_r42_"))
    assert(body.contains("\"status\":\"scheduled\""))
    assert(body.contains("\"approvalRequired\":false"))
  }

  test("executive summary formats leadership insights") {
    val (_, body) = get("/api/v1/finops/kpi/executive-summary")
    assert(body.contains("Current monthly spend"))
    assert(body.contains("Cost health score"))
    assert(body.contains("\"summaryDate\":\"2025-07-15\""))
  }

  test("concurrent requests share the session and all succeed") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val paths = Seq(
        "/api/v1/finops/spend/services/top",
        "/api/v1/finops/spend/regions/top",
        "/api/v1/finops/optimization/idle-resources",
        "/api/v1/finops/allocation/tagging-compliance",
        "/api/v1/finops/discounts/negotiation-opportunities?min_annual_spend=0",
        "/api/v1/finops/ai/anomaly-detection")
      val results = Await.result(
        Future.traverse(paths)(p => Future(get(p))), 120.seconds)
      results.foreach { case (status, body) =>
        assert(status == 200 && body.startsWith("{"))
      }
    } finally pool.shutdown()
  }

  test("route listing advertises the full bound surface") {
    val (status, body) = get("/api/v1/finops/routes")
    assert(status == 200)
    assert(body.contains("/api/v1/finops/kpi/summary"))
    assert(body.contains("/api/v1/finops/sql/query"))
    assert(body.contains("/api/v1/finops/mcp/stream-config"))
  }

  test("malformed JSON body maps to a 500 error envelope, not a hang") {
    val (status, body) = request("POST", "/api/v1/finops/sql/query",
      Some("{not json"))
    assert(status == 500)
    assert(body.contains("\"success\":false"))
  }

  test("unknown path returns a 404 envelope") {
    val (status, body) = get("/api/v1/finops/nope")
    assert(status == 404)
    assert(body.contains("\"error\":\"not found\""))
  }

  test("unknown table on sql/schema maps to a 500 with error type") {
    val (status, body) = get("/api/v1/finops/sql/schema?table=NOPE")
    assert(status == 500)
    assert(body.contains("\"success\":false"))
  }
}
