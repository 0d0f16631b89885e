package graft.analytics

import graft.SparkSpec
import graft.fixtures.CurFixture
import java.time.LocalDate

/** Analytics-module tests over the CUR fixture, asOf pinned to 2025-07-15
  * (the fixture's final month). */
class AnalyticsSpec extends SparkSpec {

  val asOf: LocalDate = LocalDate.of(2025, 7, 15)

  def finops: FinOps = {
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    new FinOps(spark, "CUR", asOf)
  }

  test("monthly spend trend has MoM and YoY for the final month") {
    val f = finops
    val rows = f.spend.monthlySpend().collect()
    assert(rows.length == 14)
    val last = rows.head // ordered desc
    // fixture grows 5% of base per month: MoM > 0, YoY > 0
    assert(last.getDouble(2) > 0)
    assert(last.getDouble(3) > 0)
  }

  test("invoice summary forecast is positive and trending up") {
    val s = finops.spend.invoiceSummary()
    assert(s.currentMonthSpend > 0)
    assert(s.forecastNext3.forall(_ > 0))
    assert(s.momChangePct.exists(_ > 0))
  }

  test("top services ranks EC2 first with percentages summing <= 100") {
    val rows = finops.spend.topServices().collect()
    assert(rows.head.getAs[String]("service_name") == "AmazonEC2")
    val pctSum = rows.map(_.getAs[Double]("percentage")).sum
    assert(pctSum > 99.0 && pctSum < 101.0)
  }

  test("anomaly detection flags the fee-day spike at 2 sigma and the planted day-8 spike at 1 sigma") {
    val f = finops
    // day 1 carries the monthly SP/RI fee rows (10+3) — a genuine spend
    // spike the reference's query design surfaces
    val at2 = f.ai.detectAnomalies(lookbackDays = 30).collect()
    assert(at2.exists(r => r.getAs[java.sql.Date]("usage_date").toString == "2025-07-01" &&
      r.getAs[String]("anomaly_type") == "high_spend_anomaly"))
    // the planted day-8 5x usage spike clears the 1-sigma threshold
    val at1 = f.ai.detectAnomalies(lookbackDays = 30, sensitivity = 1.0).collect()
    assert(at1.exists(r => r.getAs[java.sql.Date]("usage_date").toString == "2025-07-08" &&
      r.getAs[String]("anomaly_type") == "high_spend_anomaly"))
  }

  test("severity/confidence and root-cause post-processing") {
    val f = finops
    assert(f.ai.severityOf(4.5) == ("critical", 95))
    assert(f.ai.severityOf(2.5) == ("medium", 75))
    assert(f.ai.rootCause("AmazonEC2", "high_spend_anomaly").contains("instances"))
  }

  test("ml forecast applies seasonality and confidence band") {
    val pts = finops.ai.mlForecast(Seq(10, 11, 12, 13, 14, 15), months = 3)
    assert(pts.size == 3)
    pts.foreach { p =>
      assert(p.lower <= p.cost && p.cost <= p.upper)
      assert(math.abs(p.upper - p.cost * 1.15) < 1e-9)
    }
    // month 1: (15 + 1) * (1 + 0.1*sin(pi/6)) = 16 * 1.05
    assert(math.abs(pts.head.cost - 16 * 1.05) < 1e-9)
  }

  test("intent parsing routes to modules") {
    val ai = finops.ai
    assert(ai.parseIntent("why did spend spike yesterday?") == "anomalies")
    assert(ai.parseIntent("forecast next month") == "forecast")
    assert(ai.parseIntent("top services by spend") == "top_services")
    assert(ai.parseIntent("show idle resources") == "idle_resources")
    assert(ai.parseIntent("hello") == "summary")
  }

  test("rightsizing recommends one size down for low-utilization instances") {
    // dedicated table: the shared fixture has one record per resource per
    // month, below the reference's HAVING COUNT(*) > 10 data floor
    def ts(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2025-07-$day%02d $hour%02d:00:00")
    val rows15 = (1 to 15).map { i =>
      ("i-downsize", "m5.xlarge", ts(10 + i % 5, i), "AmazonEC2", 30.0, 2.0)
    } ++ (1 to 15).map { i =>
      ("i-keep", "m5.xlarge", ts(1 + i % 5, i), "AmazonEC2", 55.0, 2.0)
    } // keep: 55 < 60 appears in results, but no downsize branch fires
    spark.createDataFrame(rows15)
      .toDF("line_item_resource_id", "product_instance_type",
        "line_item_usage_start_date", "product_servicecode",
        "line_item_usage_amount", "line_item_unblended_cost")
      .createOrReplaceTempView("CUR_RS")
    val opt = new Optimization(spark, "CUR_RS", asOf)
    val rows = opt.rightsizing().collect()
    val down = rows.find(_.getAs[String]("resource_id") == "i-downsize").get
    assert(down.getAs[String]("recommended_instance_type") == "m5.large")
    assert(math.abs(down.getAs[Double]("estimated_new_cost") -
      down.getAs[Double]("monthly_cost") * 0.5) < 1e-9)
    val keep = rows.find(_.getAs[String]("resource_id") == "i-keep").get
    assert(keep.getAs[String]("recommended_instance_type") == "m5.xlarge")
  }

  test("idle detection bands savings by utilization threshold") {
    // with a threshold above the fixture's usage (24), everything in the
    // EC2/RDS scope is idle or underutilized
    val rows = finops.optimization.idleResources(utilizationThreshold = 30.0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val status = r.getAs[String]("status")
      assert(status == "idle" || status == "underutilized")
      val expected = if (status == "idle") 0.9 else 0.3
      assert(math.abs(r.getAs[Double]("potential_savings") -
        r.getAs[Double]("monthly_cost") * expected) < 1e-9)
    }
  }

  test("tagging compliance scores the fixture's tag mix") {
    val c = finops.allocation.complianceSummary()
    assert(c.totalResources > 0)
    // fixture: most resources tagged, s3 untagged
    assert(c.complianceScore > 50 && c.complianceScore < 100)
    assert(c.coverageByService.contains("AmazonS3"))
  }

  test("cost dimensions split prod/dev environments") {
    val rows = finops.allocation.costByDimensions().collect()
    val envs = rows.map(_.getAs[String]("environment")).distinct
    assert(envs.contains("Production") && envs.contains("Development"))
    val prod = rows.filter(_.getAs[String]("environment") == "Production")
    assert(prod.exists(_.getAs[String]("project") == "alpha"))
  }

  test("savings plan utilization = used/total from fee rows") {
    val rows = finops.discounts.savingsPlanUtilization().collect()
    assert(rows.length == 1)
    assert(math.abs(rows(0).getAs[Double]("utilization_pct") - 80.0) < 1e-9)
  }

  test("commitment ROI simulation") {
    val s = finops.discounts.simulateCommitment(
      monthlyOnDemand = 1000, coveragePct = 80, termYears = 3, paymentOption = "No Upfront")
    assert(math.abs(s.estimatedMonthlySavings - 800 * 0.45) < 1e-9)
    assert(s.upfrontCost == 0.0)
    assert(s.threeYearRoi == Double.PositiveInfinity)
    val up = finops.discounts.simulateCommitment(1000, 80, 1, "All Upfront")
    assert(up.upfrontCost > 0 && up.breakEvenMonths > 0)
  }

  test("kpi comprehensive summary aggregates and rolls up savings") {
    val s = finops.kpi.comprehensiveSummary()
    assert(s.recordsAnalyzed == CurFixture.rows.size)
    assert(s.spendAllCost > 0)
    assert(s.ec2AllCost > 0)
    assert(math.abs(s.savings.annualizedSavingsOpportunity -
      s.savings.totalPotentialSavings * 12) < 0.05)
    assert(s.savings.totalPotentialSavings > 0)
  }

  test("health check composes category scores") {
    val h = finops.healthCheck()
    assert(h.categoryScores.keySet ==
      Set("cost_efficiency", "resource_optimization", "tagging_compliance"))
    assert(h.overallScore > 0 && h.overallScore <= 100)
  }

}
