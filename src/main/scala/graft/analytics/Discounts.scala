package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** Discount / commitment module (reference analytics/discounts.py):
  * pricing-model breakdown, RI/SP utilization, and the pure commitment-
  * scenario ROI simulation (SURVEY.md §2.9 C9) plus deterministic
  * expiration fixtures replacing the reference's random mocks (C12).
  */
final class Discounts(spark: SparkSession, table: String = "CUR",
    asOf: LocalDate) {

  private def cur = spark.table(table)
  private def curMonth = date_trunc("month", col("line_item_usage_start_date")) ===
    lit(asOf.withDayOfMonth(1).toString).cast("timestamp")

  /** Pricing-model classification + commitment summary
    * (discounts.py:30-70). */
  def pricingModelBreakdown(): DataFrame = {
    val model = when(col("line_item_line_item_type").like("%Discounted%") ||
        coalesce(col("reservation_reservation_a_r_n"), lit("")) =!= "", "Reserved Instance")
      .when(col("line_item_line_item_type").like("%SavingsPlan%"), "Savings Plan")
      .when(col("line_item_usage_type").like("%Spot%"), "Spot Instance")
      .otherwise("On-Demand")
    cur.filter(col("line_item_unblended_cost") > 0 && curMonth)
      .select(model.as("pricing_model"), col("product_servicecode"),
        col("line_item_unblended_cost"), col("line_item_usage_amount"),
        col("line_item_resource_id"))
      .groupBy("pricing_model", "product_servicecode")
      .agg(sum("line_item_unblended_cost").as("monthly_cost"),
        sum("line_item_usage_amount").as("monthly_usage"),
        countDistinct("line_item_resource_id").as("total_resources"))
      .orderBy(col("monthly_cost").desc)
  }

  /** Savings-plan utilization from the fee rows
    * (discounts.py commitment analysis; used vs total commitment). */
  def savingsPlanUtilization(): DataFrame =
    cur.filter(col("line_item_line_item_type") === "SavingsPlanRecurringFee" && curMonth)
      .groupBy(col("savings_plan_savings_plan_a_r_n").as("savings_plan_arn"))
      .agg(sum("savings_plan_total_commitment_to_date").as("total_commitment"),
        sum("savings_plan_used_commitment").as("used_commitment"))
      .withColumn("utilization_pct",
        round(col("used_commitment") / nullif(col("total_commitment"), lit(0.0)) * 100, 2))
      .orderBy("savings_plan_arn")

  final case class CommitmentScenario(
      termYears: Int, paymentOption: String, coveragePct: Double,
      monthlyOnDemandCost: Double, estimatedMonthlySavings: Double,
      upfrontCost: Double, breakEvenMonths: Double, threeYearRoi: Double)

  /** C9: commitment-scenario ROI simulation (discounts.py:359-431) —
    * coverage × discount × upfront → payback / ROI. Pure. */
  def simulateCommitment(monthlyOnDemand: Double, coveragePct: Double,
      termYears: Int, paymentOption: String): CommitmentScenario = {
    val discount = if (termYears >= 3) 0.45 else 0.30
    val covered = monthlyOnDemand * coveragePct / 100.0
    val monthlySavings = covered * discount
    val upfrontShare = paymentOption match {
      case "All Upfront" => 1.0
      case "Partial Upfront" => 0.5
      case _ => 0.0
    }
    val upfront = covered * (1 - discount) * 12 * termYears * upfrontShare
    val breakEven = if (monthlySavings > 0) upfront / monthlySavings else Double.PositiveInfinity
    val horizonSavings = monthlySavings * 36
    val roi = if (upfront > 0) (horizonSavings - upfront) / upfront * 100 else Double.PositiveInfinity
    CommitmentScenario(termYears, paymentOption, coveragePct, monthlyOnDemand,
      monthlySavings, upfront, breakEven, roi)
  }

  /** C12: deterministic expiration fixture (the reference mocks these with
    * random dates, discounts.py:433-439 — replaced with a stable offset
    * from asOf so golden tests hold). */
  def commitmentExpirations(arns: Seq[String]): Seq[(String, LocalDate)] =
    arns.sorted.zipWithIndex.map { case (arn, i) => arn -> asOf.plusMonths(3 + 2 * i) }

  /** Current RI / Savings-Plan agreements per service with annualized
    * commitment (discounts.py:23-75): the commitment_summary CTE — the
    * [[pricingModelBreakdown]] classification restricted to committed
    * models, annual_commitment = 12x monthly. */
  def currentAgreementsDf(): DataFrame =
    pricingModelBreakdown()
      .filter(col("pricing_model").isin("Reserved Instance", "Savings Plan"))
      .select(col("pricing_model").as("agreement_type"),
        col("product_servicecode").as("service"),
        col("monthly_cost"), col("monthly_usage"), col("total_resources"),
        (col("monthly_cost") * 12).as("annual_commitment"))
      .orderBy(col("monthly_cost").desc)

  final case class Agreement(
      agreementId: String, agreementType: String, service: String,
      monthlyCost: Double, annualCommitment: Double,
      utilizationRate: Int, coveragePercentage: Int,
      expirationDate: LocalDate, renewalRecommendation: String,
      termLength: String)

  final case class AgreementsReport(
      agreements: Seq[Agreement], averageUtilization: Double,
      totalAnnualCommitment: Double, underutilizedCount: Int)

  /** Deterministic utilization stand-in: the reference derives it from
    * `hash(service)` clamped to [65, 95] (discounts.py:86); String.hashCode
    * is spec-stable so this reproduces the same shape without RNG. Pure. */
  def utilizationRateOf(service: String): Int =
    math.min(95, math.max(65, 80 + math.floorMod(service.hashCode, 30)))

  /** Agreement inventory + utilization summary (discounts.py:23-126):
    * the post-SQL assembly over [[currentAgreementsDf]] — utilization and
    * expirations are the deterministic fixtures, renewal recommendation
    * flips to "review" under 75% utilization. */
  def currentAgreements(): AgreementsReport = {
    val rows = currentAgreementsDf().collect()
    val agreements = rows.toSeq.map { r =>
      val tpe = r.getAs[String]("agreement_type")
      val service = r.getAs[String]("service")
      val util = utilizationRateOf(service)
      Agreement(
        agreementId = s"$tpe-$service-${math.floorMod(service.hashCode, 1000)}",
        agreementType = tpe,
        service = service,
        monthlyCost = r.getAs[Double]("monthly_cost"),
        annualCommitment = r.getAs[Double]("annual_commitment"),
        utilizationRate = util,
        coveragePercentage = math.min(100, util + 10),
        expirationDate = commitmentExpirations(Seq(s"$tpe-$service")).head._2,
        renewalRecommendation = if (util < 75) "review" else "renew",
        termLength = "1_year")
    }
    val avgUtil =
      if (agreements.isEmpty) 0.0
      else math.rint(agreements.map(_.utilizationRate).sum.toDouble / agreements.size * 10) / 10
    AgreementsReport(agreements, avgUtil,
      math.rint(agreements.map(_.annualCommitment).sum * 100) / 100,
      agreements.count(_.utilizationRate < 75))
  }

  final case class Renewal(
      agreementId: String, service: String, expirationDate: LocalDate,
      annualValue: Double, renewalStatus: String, daysUntilExpiration: Long)

  /** Renewal timeline for the top-5 agreements by value, soonest first
    * (discounts.py:441-453). Pure. */
  def renewalTimeline(agreements: Seq[Agreement]): Seq[Renewal] =
    agreements.sortBy(-_.annualCommitment).take(5).map { a =>
      Renewal(a.agreementId, a.service, a.expirationDate, a.annualCommitment,
        if (a.utilizationRate < 75) "needs_review" else "auto_renew",
        java.time.temporal.ChronoUnit.DAYS.between(asOf, a.expirationDate))
    }.sortBy(_.daysUntilExpiration)

  /** Services eligible for volume-discount negotiation
    * (discounts.py:128-234): trailing-12-month spend per service, tiered
    * discount potential (20/15/10/5% at 500k/100k/50k) and priority.
    * `minAnnualSpend` defaults to the reference's 10k floor (tests pass 0
    * against the small fixture). */
  def negotiationOpportunities(minAnnualSpend: Double = 10000.0): DataFrame = {
    val windowStart = lit(asOf.minusMonths(12).toString).cast("timestamp")
    cur.filter(col("line_item_unblended_cost") > 0 &&
        col("line_item_usage_start_date") >= windowStart)
      .groupBy(col("product_servicecode").as("service"))
      .agg(sum("line_item_unblended_cost").as("current_spend"),
        countDistinct("line_item_usage_account_id").as("account_count"),
        countDistinct("line_item_resource_id").as("resource_count"))
      .filter(col("current_spend") > minAnnualSpend)
      .withColumn("potential_discount_pct",
        when(col("current_spend") > 500000, 20)
          .when(col("current_spend") > 100000, 15)
          .when(col("current_spend") > 50000, 10)
          .otherwise(5))
      .withColumn("estimated_savings",
        col("current_spend") * col("potential_discount_pct") / 100)
      .withColumn("negotiation_priority",
        when(col("current_spend") > 500000, "high")
          .when(col("current_spend") > 100000, "medium")
          .otherwise("low"))
      .orderBy(col("estimated_savings").desc)
  }

  /** Market-benchmark discount table (discounts.py:186-192; mock in the
    * reference too): (industry average %, top quartile %). */
  val marketBenchmarks: Map[String, (Int, Int)] = Map(
    "AmazonEC2" -> (12, 18), "AmazonRDS" -> (10, 15),
    "AmazonS3" -> (8, 12), "AWSLambda" -> (5, 8))

  /** Commitment requirement tier by annual spend (discounts.py:455-462).
    * Pure. */
  def commitmentRequirement(annualSpend: Double): String =
    if (annualSpend > 500000) "3_year"
    else if (annualSpend > 100000) "1_year"
    else "none"

  /** Negotiation next-step recommendation (discounts.py:464-471). Pure. */
  def negotiationRecommendation(spend: Double, discountPct: Double): String =
    if (spend > 500000 && discountPct > 15) "Schedule enterprise negotiation meeting"
    else if (spend > 100000) "Request volume discount review"
    else "Monitor for threshold achievement"

  /** Usage trends for commitment planning (discounts.py:240-320): per
    * (service, instance type) trailing-6-month monthly usage — average,
    * stddev, and a stable/moderate/volatile pattern from the coefficient
    * of variation; >= 3 months of data, top 20 by cost. */
  def usageForecastingDf(): DataFrame = {
    val windowStart = lit(asOf.minusMonths(6).withDayOfMonth(1).toString).cast("timestamp")
    val monthly = cur
      .filter(col("line_item_unblended_cost") > 0 &&
        col("line_item_usage_start_date") >= windowStart)
      .groupBy(date_trunc("month", col("line_item_usage_start_date")).as("month"),
        col("product_servicecode").as("service"),
        col("product_instance_type").as("instance_type"))
      .agg(sum("line_item_usage_amount").as("monthly_usage"),
        sum("line_item_unblended_cost").as("monthly_cost"))
    monthly.groupBy("service", "instance_type")
      .agg(avg("monthly_usage").as("avg_monthly_usage"),
        stddev("monthly_usage").as("usage_stddev"),
        avg("monthly_cost").as("avg_monthly_cost"),
        count(lit(1)).as("months_of_data"))
      .filter(col("months_of_data") >= 3 && col("avg_monthly_usage") > 0)
      .withColumn("usage_pattern",
        when(col("usage_stddev") / col("avg_monthly_usage") < 0.2, "stable")
          .when(col("usage_stddev") / col("avg_monthly_usage") < 0.5, "moderate")
          .otherwise("volatile"))
      .orderBy(col("avg_monthly_cost").desc)
      .limit(20)
  }

  final case class MonthlyForecast(month: Int, forecastedUsage: Double, forecastedCost: Double)

  /** 2%-growth + sinusoidal-seasonality usage forecast
    * (discounts.py:303-319). Pure. */
  def monthlyForecasts(avgUsage: Double, avgCost: Double,
      months: Int = 12): Seq[MonthlyForecast] =
    (1 to months).map { m =>
      val seasonal = 1 + 0.1 * math.sin(m * math.Pi / 6)
      val growth = math.pow(1.02, m)
      val usage = avgUsage * seasonal * growth
      MonthlyForecast(m, math.rint(usage * 100) / 100,
        math.rint(usage * (avgCost / avgUsage) * 100) / 100)
    }

  /** Forecast risk from pattern + coefficient of variation
    * (discounts.py:472-479). Pure. */
  def forecastRisk(pattern: String, stddev: Double, avgUsage: Double): String =
    if (pattern == "volatile" || (avgUsage > 0 && stddev / avgUsage > 0.5)) "high"
    else if (pattern == "moderate") "medium"
    else "low"

  final case class CommitmentRecommendation(
      service: String, recommendation: String, term: String,
      coverage: Int, confidence: String, estimatedSavings: Double)

  /** Commitment recommendation from usage pattern + risk
    * (discounts.py:481-506): stable/low → 3-year RI at 80% coverage (40%
    * savings), moderate → 1-year SP at 60% (15%); too-small or volatile →
    * none. Pure. */
  def commitmentRecommendation(service: String, annualCost: Double,
      pattern: String, risk: String): Option[CommitmentRecommendation] =
    if (annualCost < 10000) None
    else if (pattern == "stable" && risk == "low")
      Some(CommitmentRecommendation(service, "Reserved Instance", "3_year", 80,
        "high", annualCost * 0.4))
    else if (pattern == "moderate")
      Some(CommitmentRecommendation(service, "Savings Plan", "1_year", 60,
        "medium", annualCost * 0.15))
    else None

  final case class PortfolioRisk(
      portfolioRiskLevel: String, stableServicesPercentage: Double,
      highRiskServices: Int, totalServices: Int, diversificationScore: Double)

  /** Portfolio-level risk rollup over (service, pattern, risk) rows
    * (discounts.py:508-520). Pure. */
  def portfolioRisk(rows: Seq[(String, String, String)]): PortfolioRisk = {
    val total = rows.size
    if (total == 0) return PortfolioRisk("low", 0.0, 0, 0, 0.0)
    val highRisk = rows.count(_._3 == "high")
    val stable = rows.count(_._2 == "stable")
    PortfolioRisk(
      portfolioRiskLevel =
        if (highRisk > total * 0.3) "high" else if (highRisk > 0) "medium" else "low",
      stableServicesPercentage = math.rint(stable.toDouble / total * 1000) / 10,
      highRiskServices = highRisk,
      totalServices = total,
      diversificationScore =
        math.min(100.0, rows.map(_._1).distinct.size.toDouble / total * 100))
  }

  /** Overall forecast confidence: share of stable patterns, per-service
    * 90/70/40 (discounts.py:522-536). Pure. */
  def forecastConfidence(rows: Seq[(String, String)]): (Double, Map[String, Int]) =
    if (rows.isEmpty) (0.0, Map.empty)
    else {
      val overall = rows.count(_._2 == "stable").toDouble / rows.size * 100
      (math.rint(overall * 10) / 10, rows.toMap.map { case (svc, p) =>
        svc -> (if (p == "stable") 90 else if (p == "moderate") 70 else 40)
      })
    }
}
