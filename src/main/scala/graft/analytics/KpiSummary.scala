package graft.analytics

import graft.views.KpiViews
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** KPI comprehensive summary (reference analytics/kpi_summary.py,
  * test_12's golden `kpi_tracker_results.json` shape): builds the view
  * DAG, aggregates kpi_tracker over the window, and shapes the nested
  * summary including the savings rollup (SURVEY.md §2.9 C5).
  */
final class KpiSummary(spark: SparkSession, asOf: LocalDate,
    table: String = "CUR") {

  final case class SavingsSummary(
      totalPotentialSavings: Double,
      gravitonSavingsPotential: Double,
      commitmentSavingsPotential: Double,
      storageOptimizationPotential: Double,
      spotInstancePotential: Double,
      currentMonthlySavings: Double,
      annualizedSavingsOpportunity: Double)

  final case class ComprehensiveSummary(
      recordsAnalyzed: Long,
      spendAllCost: Double,
      ec2AllCost: Double,
      ec2SpotCost: Double,
      ec2GravitonCost: Double,
      rdsAllCost: Double,
      ebsGp3Cost: Double,
      ebsSnapshotCost: Double,
      s3AllStorageCost: Double,
      savings: SavingsSummary)

  /** Build DAG + aggregate + shape (kpi_summary.py:26-78, :322-450). */
  def comprehensiveSummary(billingPeriod: Option[String] = None,
      accountFilter: Option[Seq[String]] = None): ComprehensiveSummary = {
    KpiViews.registerAll(spark, asOf, table)
    // filter injection (kpi_summary.py:290-320)
    var t = spark.table("kpi_tracker")
    billingPeriod.foreach(bp =>
      t = t.filter(date_format(col("billing_period"), "yyyy-MM") === bp))
    accountFilter.foreach(accts => t = t.filter(col("linked_account_id").isin(accts: _*)))

    val records = spark.table(table).count()
    def s(c: String) = sum(coalesce(col(c), lit(0.0))).as(c)
    val agg = t.agg(
      s("spend_all_cost"), s("ec2_all_cost"), s("ec2_spot_cost"), s("ec2_graviton_cost"),
      s("ec2_spot_potential_savings"), s("ec2_previous_generation_potential_savings"),
      s("ec2_graviton_potential_savings"), s("ec2_amd_potential_savings"),
      s("rds_all_cost"), s("rds_graviton_potential_savings"), s("rds_commit_potential_savings"),
      s("rds_commit_savings"), s("compute_commit_potential_savings"), s("compute_commit_savings"),
      s("ebs_gp3_cost"), s("ebs_gp3_potential_savings"), s("ebs_snapshot_cost"),
      s("s3_all_storage_cost"), s("s3_standard_storage_potential_savings")).collect()(0)

    def g(r: Row, c: String): Double = r.getAs[Double](c)
    val ec2Savings = g(agg, "ec2_spot_potential_savings") +
      g(agg, "ec2_previous_generation_potential_savings") +
      g(agg, "ec2_graviton_potential_savings") + g(agg, "ec2_amd_potential_savings")
    val rdsSavings = g(agg, "rds_graviton_potential_savings") + g(agg, "rds_commit_potential_savings")
    val storageSavings = g(agg, "ebs_gp3_potential_savings") +
      g(agg, "s3_standard_storage_potential_savings")
    val computeSavings = g(agg, "compute_commit_potential_savings")
    val totalPotential = ec2Savings + rdsSavings + storageSavings + computeSavings
    def r2(v: Double): Double = math.rint(v * 100) / 100

    ComprehensiveSummary(
      recordsAnalyzed = records,
      spendAllCost = r2(g(agg, "spend_all_cost")),
      ec2AllCost = r2(g(agg, "ec2_all_cost")),
      ec2SpotCost = r2(g(agg, "ec2_spot_cost")),
      ec2GravitonCost = r2(g(agg, "ec2_graviton_cost")),
      rdsAllCost = r2(g(agg, "rds_all_cost")),
      ebsGp3Cost = r2(g(agg, "ebs_gp3_cost")),
      ebsSnapshotCost = r2(g(agg, "ebs_snapshot_cost")),
      s3AllStorageCost = r2(g(agg, "s3_all_storage_cost")),
      savings = SavingsSummary(
        totalPotentialSavings = r2(totalPotential),
        gravitonSavingsPotential = r2(g(agg, "ec2_graviton_potential_savings") +
          g(agg, "rds_graviton_potential_savings")),
        commitmentSavingsPotential = r2(rdsSavings + computeSavings),
        storageOptimizationPotential = r2(storageSavings),
        spotInstancePotential = r2(g(agg, "ec2_spot_potential_savings")),
        currentMonthlySavings = r2(g(agg, "rds_commit_savings") + g(agg, "compute_commit_savings")),
        annualizedSavingsOpportunity = r2(totalPotential * 12)))
  }
}
