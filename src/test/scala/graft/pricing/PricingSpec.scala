package graft.pricing

import graft.SparkSpec
import java.time.LocalDate

/** Pricing-source surface (SURVEY.md §2.1 S13-S18) over the deterministic
  * mock: price shapes, the bulk matrix fan-out, spot history, and the
  * registered temp views joining into SQL. */
class PricingSpec extends SparkSpec {

  val src = new MockPricingSource
  val asOf: LocalDate = LocalDate.of(2025, 7, 15)

  test("on-demand, reserved, spot, and SP rates relate sanely") {
    val od = src.onDemandPrice("m5.large", "us-east-1", "Linux").get
    assert(od > 0)
    val (upfrontAll, hourlyAll) = src.reservedPrice("m5.large", "us-east-1", 3, "All Upfront").get
    assert(upfrontAll > 0 && hourlyAll == 0.0)
    val (upfrontNo, hourlyNo) = src.reservedPrice("m5.large", "us-east-1", 1, "No Upfront").get
    assert(upfrontNo == 0.0 && hourlyNo > 0 && hourlyNo < od)
    val spot = src.spotPrice("m5.large", "us-east-1").get
    assert(spot < od) // spot trades below on-demand
    assert(src.savingsPlanRate("m5.large", "us-east-1", "ComputeSavingsPlans").get < od)
    assert(src.instanceAttributes("m6g.xlarge").get.processor.contains("Graviton"))
  }

  test("spot price history is deterministic, bounded, and most-recent-first") {
    val h1 = src.spotPriceHistory("m5.large", "us-east-1", daysBack = 7, asOf = asOf)
    val h2 = src.spotPriceHistory("m5.large", "us-east-1", daysBack = 7, asOf = asOf)
    assert(h1 == h2) // no RNG
    assert(h1.size == 14) // 7 days x 2 AZs
    assert(h1.head.timestamp == "2025-07-15T00:00:00Z")
    assert(h1.last.timestamp == "2025-07-09T00:00:00Z")
    val latest = src.spotPrice("m5.large", "us-east-1").get
    h1.foreach { p =>
      assert(p.spotPrice >= latest * 0.9 - 1e-9 && p.spotPrice <= latest * 1.1 + 1e-9)
      assert(p.productDescription == "Linux/UNIX")
    }
  }

  test("bulk pricing matrix and spot history register as SQL views") {
    val types = Seq("m5.large", "c5.xlarge")
    val regions = Seq("us-east-1", "eu-west-1")
    val matrix = PricingTables.registerPricingTable(spark, src, types, regions)
    assert(matrix.count() == 4) // types x regions x Linux x Shared
    val hist = PricingTables.registerSpotHistoryTable(
      spark, src, types, regions, daysBack = 3, asOf = asOf)
    assert(hist.count() == 2 * 2 * 3 * 2) // types x regions x days x AZs
    // price-over-time analysis runs in SQL over the view
    val trend = spark.sql(
      """SELECT instance_type, availability_zone,
        |       min(spot_price) AS lo, max(spot_price) AS hi
        |FROM spot_price_history GROUP BY 1, 2""".stripMargin).collect()
    assert(trend.length == 8)
    trend.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
  }

  test("savings plans view joins against CUR-shaped ARNs") {
    val arns = Seq("arn:sp/1", "arn:sp/2")
    val df = PricingTables.registerSavingsPlansTable(spark, arns)
    assert(df.count() == 2)
    assert(spark.sql(
      "SELECT count(*) FROM aws_savings_plans WHERE term_duration_years IN (1, 3)")
      .head().getLong(0) == 2)
  }
}
