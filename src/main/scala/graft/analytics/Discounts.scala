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
    asOf: LocalDate = LocalDate.now()) {

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
}
