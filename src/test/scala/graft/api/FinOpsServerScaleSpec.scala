package graft.api

import graft.SparkSpec
import graft.analytics.FinOps
import graft.engine.GraftEngine
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.time.LocalDate
import org.apache.spark.sql.functions._

/** Serving-path memory behavior at sf0.1: the REST layer over a 600k-row
  * CUR-shaped view (lineitem mapped into the CUR2.0 schema). The contract
  * under test is that every endpoint aggregates IN Spark and collects only
  * the bounded envelope — a route that collected the raw table would drag
  * ~600k wide rows onto the driver heap, which the post-GC heap-delta
  * assertion would catch. Runs against a SEPARATE view name (CUR_SF01) so
  * the fixture-backed FinOpsServerSpec suite is unaffected by ordering.
  */
class FinOpsServerScaleSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.1"

  /** sf0.1 lineitem (600k rows) mapped into the CUR2.0 column contract:
    * costs from extendedprice, periods from shipdate, accounts/services
    * fanned deterministically from keys so group-bys have real
    * cardinality. Values are arbitrary-but-deterministic; the assertions
    * are about envelope boundedness, not finance. */
  private def curView(): Unit = {
    val li = graft.queries.Tables.load(spark, Sf01, "lineitem")
    val svc = when(col("l_returnflag") === "R", "AmazonEC2")
      .when(col("l_returnflag") === "A", "AmazonS3")
      .otherwise("AmazonRDS")
    val prod = map(
      lit("region"), lit("us-east-1"),
      lit("operating_system"), lit("Linux"),
      lit("tenancy"), lit("Shared"),
      lit("physical_processor"), lit("Intel"),
      lit("database_engine"), lit(""),
      lit("deployment_option"), lit("Single-AZ"),
      lit("license_model"), lit("No license required"),
      lit("cache_engine"), lit(""))
    li.select(
      lit("111111111111").as("bill_payer_account_id"),
      concat(lit("44444444444"), (col("l_suppkey") % 4).cast("string"))
        .as("line_item_usage_account_id"),
      date_trunc("month", col("l_shipdate")).as("bill_billing_period_start_date"),
      date_format(col("l_shipdate"), "yyyy-MM").as("billing_period"),
      col("l_shipdate").as("line_item_usage_start_date"),
      lit("Usage").as("line_item_line_item_type"),
      svc.as("line_item_product_code"),
      svc.as("product_servicecode"),
      lit("RunInstances").as("line_item_operation"),
      lit("BoxUsage:m5.large").as("line_item_usage_type"),
      concat(lit("i-"), col("l_orderkey").cast("string"))
        .as("line_item_resource_id"),
      col("l_quantity").as("line_item_usage_amount"),
      (col("l_extendedprice") / 1000.0).as("line_item_unblended_cost"),
      (col("l_extendedprice") / 1000.0).as("line_item_blended_cost"),
      (col("l_extendedprice") / 900.0).as("pricing_public_on_demand_cost"),
      lit("OnDemand").as("pricing_term"),
      lit("").as("reservation_reservation_a_r_n"),
      lit(0.0).as("reservation_effective_cost"),
      lit(0.0).as("reservation_unused_amortized_upfront_fee_for_billing_period"),
      lit(0.0).as("reservation_unused_recurring_fee"),
      lit("").as("savings_plan_savings_plan_a_r_n"),
      lit(0.0).as("savings_plan_savings_plan_effective_cost"),
      lit(0.0).as("savings_plan_total_commitment_to_date"),
      lit(0.0).as("savings_plan_used_commitment"),
      lit("").as("savings_plan_offering_type"),
      prod.as("product"),
      lit("m5.large").as("product_instance_type"),
      lit("us-east-1").as("product_region"),
      lit("us-east-1").as("product_region_code"),
      lit("Linux").as("product_operating_system"),
      lit("Shared").as("product_tenancy"),
      lit("").as("product_database_engine"),
      lit("{}").as("resource_tags")
    ).createOrReplaceTempView("CUR_SF01")
  }

  lazy val server: FinOpsServer = {
    curView()
    val asOf = LocalDate.of(2001, 10, 15) // inside lineitem's date range
    val s = new FinOpsServer(
      new FinOps(spark, "CUR_SF01", asOf), new GraftEngine(spark, Some(asOf)))
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

  /** Post-GC used heap, STABILIZED: System.gc() is advisory and the
    * shared forked JVM carries background allocation (codegen cache,
    * prior suites' retained caches), so a single reading can flake (r13
    * advisor). Re-measure until two consecutive readings agree within
    * 16 MB (up to 8 rounds) and return the MINIMUM seen — the floor is
    * the honest retained-set signal; transients only add. */
  private def usedHeap(): Long = {
    val r = Runtime.getRuntime
    def once(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      r.totalMemory() - r.freeMemory()
    }
    var prev = once()
    var best = prev
    var i = 0
    while (i < 8) {
      val cur = once()
      best = math.min(best, cur)
      if (math.abs(cur - prev) < 16L * 1024 * 1024) i = 8
      else { prev = cur; i += 1 }
    }
    best
  }

  test("serving endpoints stay bounded-heap over the 600k-row table") {
    // touch the server (lazy init + first aggregation) off the meter —
    // session/codegen warm-up is not serving-path memory
    val (hs, _) = request("GET", "/health")
    assert(hs == 200)
    val before = usedHeap()
    val routes = Seq(
      "/api/v1/finops/kpi/summary",
      "/api/v1/finops/spend/trend",
      "/api/v1/finops/spend/breakdown",
      "/api/v1/finops/spend/services/top",
      "/api/v1/finops/ai/anomaly-detection")
    val bodies = routes.map { r =>
      val (status, body) = request("GET", r)
      assert(status == 200, s"$r -> $status: ${body.take(200)}")
      assert(body.startsWith("{"), s"$r did not return a JSON object")
      r -> body
    }
    // the guarded SQL path with an explicit row cap over all 600k rows
    val (qs, qb) = request("POST", "/api/v1/finops/sql/query",
      Some("""{"query": "SELECT product_servicecode, count(*) AS n, sum(line_item_unblended_cost) AS cost FROM CUR_SF01 GROUP BY 1 ORDER BY n DESC", "max_rows": 5}"""))
    assert(qs == 200, s"sql/query -> $qs: ${qb.take(200)}")
    assert(qb.contains("product_servicecode"))
    val after = usedHeap()
    // envelopes are row-capped aggregates: the serving path must not
    // retain anything proportional to the 600k-row table (a raw collect
    // would be ~hundreds of MB of Row objects). 256 MB post-GC headroom
    // covers codegen classes + envelope strings with a wide margin.
    val deltaMb = (after - before) / (1024.0 * 1024.0)
    info(f"post-GC heap delta across 6 endpoints: $deltaMb%.1f MB")
    assert(deltaMb < 256.0,
      f"serving path retained $deltaMb%.1f MB over the sf0.1 table")
    // and the envelopes themselves are bounded, not row-proportional
    bodies.foreach { case (r, b) =>
      assert(b.length < 2_000_000, s"$r envelope is ${b.length} bytes")
    }
  }
}
