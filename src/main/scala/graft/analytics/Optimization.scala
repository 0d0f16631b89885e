package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** Cost-optimization module (reference analytics/optimization.py): idle-
  * resource detection, rightsizing recommendations, and the pure risk /
  * confidence scoring (SURVEY.md §2.9 C7/C8). */
final class Optimization(spark: SparkSession, table: String = "CUR",
    asOf: LocalDate) {

  private def cur = spark.table(table)
  private def curMonth = date_trunc("month", col("line_item_usage_start_date")) ===
    lit(asOf.withDayOfMonth(1).toString).cast("timestamp")

  /** Idle / underutilized resources with potential savings
    * (optimization.py:33-71): idle saves ~90%, underutilized ~30%. */
  def idleResources(utilizationThreshold: Double = 5.0): DataFrame = {
    val util = cur
      .filter(col("line_item_unblended_cost") > 0 &&
        col("product_servicecode").isin("AmazonEC2", "AmazonRDS", "ElasticLoadBalancing") &&
        curMonth)
      .groupBy(col("line_item_resource_id").as("resource_id"),
        col("product_servicecode").as("service"),
        col("product_instance_type").as("instance_type"))
      .agg(sum("line_item_unblended_cost").as("monthly_cost"),
        count(lit(1)).as("usage_records"),
        avg(when(col("line_item_usage_amount") > 0, col("line_item_usage_amount"))
          .otherwise(0.0)).as("avg_utilization"))
    val status = when(col("avg_utilization") < utilizationThreshold, "idle")
      .when(col("avg_utilization") < utilizationThreshold * 2, "underutilized")
      .otherwise("active")
    util
      .withColumn("status", status)
      .withColumn("potential_savings",
        when(col("status") === "idle", col("monthly_cost") * 0.9)
          .when(col("status") === "underutilized", col("monthly_cost") * 0.3)
          .otherwise(0.0))
      .filter(col("avg_utilization") < utilizationThreshold * 2)
      .orderBy(col("potential_savings").desc)
      .limit(50)
  }

  /** Rightsizing: one-size-down when usage is low
    * (optimization.py:113-152): xlarge→large / large→medium /
    * medium→small at ~50% cost, HAVING COUNT(*) > 10. */
  def rightsizing(): DataFrame = {
    val inst = cur
      .filter(col("line_item_unblended_cost") > 0 &&
        col("product_servicecode") === "AmazonEC2" &&
        col("product_instance_type").isNotNull && curMonth)
      .groupBy(col("line_item_resource_id").as("resource_id"),
        col("product_instance_type").as("current_instance_type"))
      .agg(sum("line_item_unblended_cost").as("monthly_cost"),
        avg("line_item_usage_amount").as("avg_usage"),
        count(lit(1)).as("usage_records"))
      .filter(col("usage_records") > 10)
    val downsizable =
      (col("current_instance_type").like("%xlarge%") && col("avg_usage") < 50) ||
        (col("current_instance_type").like("%large%") && !col("current_instance_type").like("%xlarge%") &&
          col("avg_usage") < 30) ||
        (col("current_instance_type").like("%medium%") && col("avg_usage") < 20)
    inst
      .withColumn("recommended_instance_type",
        when(col("current_instance_type").like("%xlarge%") && col("avg_usage") < 50,
          regexp_replace(col("current_instance_type"), "xlarge", "large"))
          .when(col("current_instance_type").like("%large%") && col("avg_usage") < 30,
            regexp_replace(col("current_instance_type"), "large", "medium"))
          .when(col("current_instance_type").like("%medium%") && col("avg_usage") < 20,
            regexp_replace(col("current_instance_type"), "medium", "small"))
          .otherwise(col("current_instance_type")))
      .withColumn("estimated_new_cost",
        when(downsizable, col("monthly_cost") * 0.5).otherwise(col("monthly_cost")))
      .filter(col("avg_usage") < 60)
      .orderBy((col("monthly_cost") - col("estimated_new_cost")).desc)
      .limit(20)
  }

  /** Cross-service migration opportunities
    * (optimization.py:201-264): micro EC2 instances are the Lambda
    * candidates; estimated Lambda cost is 30% of current, so the
    * opportunity is the 70% delta. One aggregate row per migration type
    * (extensible to more types by unioning candidate frames). */
  def crossServiceMigration(): DataFrame =
    cur
      .filter(col("product_servicecode") === "AmazonEC2" &&
        col("product_instance_type").like("%micro%") &&
        col("line_item_unblended_cost") > 0 && curMonth)
      .agg(countDistinct("line_item_resource_id").as("resource_count"),
        sum("line_item_unblended_cost").as("current_monthly_cost"))
      .select(lit("EC2_to_Lambda").as("migration_type"),
        col("resource_count"),
        col("current_monthly_cost"),
        (col("current_monthly_cost") * 0.3).as("estimated_lambda_cost"),
        (col("current_monthly_cost") * 0.7).as("potential_monthly_savings"))
      .filter(col("resource_count") > 0)

  final case class MigrationPhase(phase: String, duration: String, activities: Seq[String])
  final case class MigrationBusinessCase(
      caseName: String, annualSavings: Double, paybackPeriod: String, riskAssessment: String)

  /** Migration business case (optimization.py:407-421). Pure. */
  def migrationBusinessCase(annualSavingsTotal: Double): Seq[MigrationBusinessCase] =
    if (annualSavingsTotal <= 0) Seq.empty
    else Seq(MigrationBusinessCase("Cost Reduction", annualSavingsTotal, "3-6 months", "Medium"))

  /** Migration roadmap phases (optimization.py:423-444). Pure. */
  def migrationRoadmap(hasOpportunities: Boolean): Seq[MigrationPhase] =
    if (!hasOpportunities) Seq.empty
    else Seq(
      MigrationPhase("Assessment", "2-4 weeks", Seq("Workload analysis", "Dependency mapping")),
      MigrationPhase("Pilot Migration", "4-6 weeks", Seq("Select pilot workloads", "Implement monitoring")),
      MigrationPhase("Full Migration", "3-6 months", Seq("Migrate remaining workloads", "Optimize performance")))

  /** Cross-VPC / cross-AZ data-transfer cost analysis
    * (optimization.py:266-340): per (region, AZ) transfer spend over the
    * current month with a 70%-reduction opportunity, significant costs
    * only. The reference reads `product_location`; CUR 2.0 exports carry
    * the AZ under the product map when present, else the region code
    * stands in. `minTransferCost` defaults to the reference's 100 USD
    * floor (tests pass 0 against the small fixture). */
  def vpcOptimization(minTransferCost: Double = 100.0): DataFrame =
    cur
      .filter(col("line_item_unblended_cost") > 0 &&
        (col("line_item_usage_type").like("%DataTransfer%") ||
          col("line_item_usage_type").like("%Data%")) && curMonth)
      .groupBy(col("product_region"),
        coalesce(element_at(col("product"), "location"), col("product_region_code"))
          .as("availability_zone"))
      .agg(sum(when(col("line_item_usage_type").like("%DataTransfer%"),
          col("line_item_unblended_cost")).otherwise(0.0)).as("transfer_cost"),
        countDistinct("line_item_resource_id").as("resource_count"))
      .withColumn("potential_savings", col("transfer_cost") * 0.7)
      .filter(col("transfer_cost") > minTransferCost)
      .orderBy(col("transfer_cost").desc)

  final case class VpcRecommendation(
      recommendation: String, potentialSavings: Double, complexity: String)

  /** Canned VPC optimization recommendations split 40/30 over the total
    * opportunity (optimization.py:319-331). Pure. */
  def vpcRecommendations(totalSavings: Double): Seq[VpcRecommendation] = Seq(
    VpcRecommendation("Consolidate resources within same AZ",
      math.rint(totalSavings * 0.4 * 100) / 100, "medium"),
    VpcRecommendation("Implement VPC peering optimization",
      math.rint(totalSavings * 0.3 * 100) / 100, "high"))

  final case class Implementation(
      implementationId: String, status: String, approvalRequired: Boolean,
      implementationDate: String, monitoringPeriod: String, estimatedCompletion: String)

  /** Implementation tracking for a recommendation
    * (optimization.py:340-366): the reference returns a mock tracker
    * stamped with datetime.now(); asOf keeps it deterministic. Pure. */
  def implementRecommendation(recommendationId: String,
      autoApprove: Boolean = false): Implementation = Implementation(
    implementationId = s"impl_${recommendationId}_$asOf",
    status = if (autoApprove) "scheduled" else "pending_approval",
    approvalRequired = !autoApprove,
    implementationDate = s"${asOf}T00:00:00Z",
    monitoringPeriod = "30_days",
    estimatedCompletion = "2-5 business days")

  /** C8: termination-risk classification (optimization.py:368-377). */
  def terminationRisk(service: String, status: String): String =
    if (service == "ElasticLoadBalancing") "high"
    else if (service == "AmazonRDS" && status == "idle") "medium"
    else if (status == "idle") "low"
    else "medium"

  /** C7: rightsizing confidence from utilization bands
    * (optimization.py:379-388). */
  def confidenceScore(utilization: Double): Int =
    if (utilization < 20) 95
    else if (utilization < 40) 85
    else if (utilization < 60) 70
    else 50
}
