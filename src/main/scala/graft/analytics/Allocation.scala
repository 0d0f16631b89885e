package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** Cost-allocation module (reference analytics/allocation.py): tagging
  * compliance, cost breakdown by tag-derived dimensions, and the pure
  * compliance scoring fold (SURVEY.md §2.9 C11).
  *
  * Tag matching is the reference's intentionally sloppy
  * `LIKE '%key%value%'` over the raw resource_tags string
  * (allocation.py:138-144, 251-266) — replicated exactly for parity; a
  * structured variant would use from_json.
  */
final class Allocation(spark: SparkSession, table: String = "CUR",
    asOf: LocalDate) {

  private def cur = spark.table(table)
  private def curMonth = date_trunc("month", col("line_item_usage_start_date")) ===
    lit(asOf.withDayOfMonth(1).toString).cast("timestamp")

  /** Tagging status per (status, service) with resource/cost percentages
    * (allocation.py:132-175). */
  def taggingCompliance(): DataFrame = {
    val status =
      when(col("resource_tags").isNull || col("resource_tags") === "", "untagged")
        .when(col("resource_tags").like("%Environment%") && col("resource_tags").like("%Team%"),
          "fully_tagged")
        .when(col("resource_tags").like("%Environment%") || col("resource_tags").like("%Team%"),
          "partially_tagged")
        .otherwise("custom_tagged")
    val tagging = cur
      .filter(col("line_item_unblended_cost") > 0 &&
        col("line_item_resource_id").isNotNull && curMonth)
      .select(col("line_item_resource_id"), col("product_servicecode"),
        col("line_item_unblended_cost"), status.as("tagging_status"))
    val summary = tagging.groupBy("tagging_status", "product_servicecode")
      .agg(countDistinct("line_item_resource_id").as("resource_count"),
        sum("line_item_unblended_cost").as("total_cost"))
    val overall = tagging.agg(
      countDistinct("line_item_resource_id").as("total_resources"),
      sum("line_item_unblended_cost").as("grand_cost"))
    summary.crossJoin(broadcast(overall))
      .select(col("tagging_status"), col("product_servicecode"),
        col("resource_count"), col("total_cost"),
        round(col("resource_count").cast("float") / col("total_resources") * 100, 2)
          .as("resource_percentage"),
        round(col("total_cost") / col("grand_cost") * 100, 2).as("cost_percentage"))
      .orderBy(col("total_cost").desc)
  }

  /** Environment/team/project dimensions from tag LIKE patterns
    * (allocation.py:245-290; the Project value via regexp per P8). */
  def costByDimensions(): DataFrame = {
    val env = when(col("resource_tags").like("%Environment%prod%"), "Production")
      .when(col("resource_tags").like("%Environment%dev%"), "Development")
      .when(col("resource_tags").like("%Environment%test%"), "Testing")
      .otherwise("Unallocated")
    val team = when(col("resource_tags").like("%Team%platform%"), "Platform")
      .when(col("resource_tags").like("%Team%data%"), "Data")
      .when(col("resource_tags").like("%Team%product%"), "Product")
      .otherwise("Shared")
    val project = when(col("resource_tags").like("%Project%"),
      regexp_extract(col("resource_tags"), "Project[\":]*([^,}\"]*)", 1))
      .otherwise("General")
    cur.filter(col("line_item_unblended_cost") > 0 && curMonth)
      .select(env.as("environment"), team.as("team"), project.as("project"),
        col("line_item_unblended_cost"))
      .groupBy("environment", "team", "project")
      .agg(sum("line_item_unblended_cost").as("total_cost"),
        count(lit(1)).as("line_items"))
      .orderBy(col("total_cost").desc)
  }

  /** Multi-account hierarchy with size classification
    * (allocation.py:23-120): per (payer, linked account) monthly cost and
    * resource counts, bucketed Large/Medium/Small. CUR 2.0 column names
    * (`bill_payer_account_id`/`line_item_usage_account_id`) stand in for
    * the reference's `payer_account_id`/`linked_account_id`. */
  def accountHierarchy(): DataFrame =
    cur.filter(col("line_item_unblended_cost") > 0 && curMonth)
      .groupBy(col("bill_payer_account_id").as("payer_account_id"),
        col("line_item_usage_account_id").as("linked_account_id"))
      .agg(sum("line_item_unblended_cost").as("account_total_cost"),
        countDistinct("line_item_resource_id").as("total_resources"))
      .withColumn("account_size",
        when(col("account_total_cost") > 10000, "Large")
          .when(col("account_total_cost") > 1000, "Medium")
          .otherwise("Small"))
      .orderBy(col("account_total_cost").desc)

  /** Mock cost-center assignment: last 4 digits of the account id
    * (allocation.py:81). Pure. */
  def costCenterOf(accountId: String): String =
    s"cost-center-${accountId.takeRight(4)}"

  final case class AllocationRule(
      ruleId: String, description: String, method: String,
      appliesTo: Seq[String] = Seq.empty, tagKey: Option[String] = None)

  /** Static allocation-rule catalog (allocation.py:99-113). */
  def allocationRules(): Seq[AllocationRule] = Seq(
    AllocationRule("shared_services_allocation",
      "Allocate shared services costs by usage percentage", "proportional",
      appliesTo = Seq("ElasticLoadBalancing", "AmazonVPC")),
    AllocationRule("environment_allocation",
      "Allocate by environment tags", "tag_based", tagKey = Some("Environment")))

  /** Cost-center breakdown by tag-derived (environment, team, project)
    * with resource and service counts (allocation.py:234-283) — the
    * chargeback grain on top of [[costByDimensions]]'s line-item grain. */
  def costCenterBreakdown(): DataFrame = {
    val env = when(col("resource_tags").like("%Environment%prod%"), "Production")
      .when(col("resource_tags").like("%Environment%dev%"), "Development")
      .when(col("resource_tags").like("%Environment%test%"), "Testing")
      .otherwise("Unallocated")
    val team = when(col("resource_tags").like("%Team%platform%"), "Platform")
      .when(col("resource_tags").like("%Team%data%"), "Data")
      .when(col("resource_tags").like("%Team%product%"), "Product")
      .otherwise("Shared")
    val project = when(col("resource_tags").like("%Project%"),
      regexp_extract(col("resource_tags"), "Project[\":]*([^,}\"]*)", 1))
      .otherwise("General")
    cur.filter(col("line_item_unblended_cost") > 0 && curMonth)
      .select(env.as("environment"), team.as("team"), project.as("project"),
        col("line_item_resource_id"), col("product_servicecode"),
        col("line_item_unblended_cost"))
      .groupBy("environment", "team", "project")
      .agg(countDistinct("line_item_resource_id").as("resource_count"),
        sum("line_item_unblended_cost").as("allocated_cost"),
        countDistinct("product_servicecode").as("service_count"))
      .orderBy(col("allocated_cost").desc)
  }

  final case class BudgetVariance(
      environment: String, budget: Double, actual: Double,
      variance: Double, variancePct: Double)

  /** Budget-variance fold over environment totals vs the reference's mock
    * budget table (allocation.py:288-341). Pure. */
  def budgetVariances(environmentTotals: Map[String, Double],
      budgets: Map[String, Double] = Map(
        "Production" -> 50000.0, "Development" -> 15000.0,
        "Testing" -> 8000.0, "Unallocated" -> 5000.0)): Seq[BudgetVariance] =
    environmentTotals.toSeq.sortBy(_._1).flatMap { case (env, actual) =>
      budgets.get(env).filter(_ > 0).map { budget =>
        val variance = actual - budget
        BudgetVariance(env, budget, actual,
          math.rint(variance * 100) / 100,
          math.rint(variance / budget * 1000) / 10)
      }
    }

  final case class TaggingRule(
      name: String, tagKey: String, tagValue: String,
      criteriaService: Option[String] = None, enforcement: String = "monitor")

  final case class CreatedRule(
      ruleId: String, status: String, ruleName: String, tagKey: String,
      tagValue: String, affectedResources: Int, enforcementMode: String)

  /** Mock per-service rule impact estimate (allocation.py:470-486). Pure. */
  def ruleImpactEstimate(criteriaService: Option[String]): Int =
    criteriaService.flatMap(Map(
      "EC2" -> 150, "RDS" -> 25, "S3" -> 200, "Lambda" -> 75).get).getOrElse(50)

  /** Tagging-rule creation (allocation.py:343-392): the reference mocks
    * the Organizations/Config integration and stamps rule ids with
    * datetime.now(); ids here are index-based so results are stable. */
  def createTaggingRules(rules: Seq[TaggingRule]): (Seq[CreatedRule], Int) = {
    val created = rules.zipWithIndex.map { case (r, i) =>
      CreatedRule(f"tag_rule_${i + 1}%03d", "created", r.name, r.tagKey,
        r.tagValue, ruleImpactEstimate(r.criteriaService), r.enforcement)
    }
    (created, created.map(_.affectedResources).sum)
  }

  final case class IntegrationStatus(
      integrationName: String, status: String, lastSync: String,
      resourcesManaged: Long, tagCoverage: Double, dataQualityScore: Int,
      error: Option[String] = None)

  final case class SyncStatus(
      totalIntegrations: Int, connected: Int,
      averageDataQuality: Double, lastSuccessfulSync: String)

  /** Third-party tagging-tool integration status
    * (allocation.py:393-460): the reference returns a fixed integration
    * inventory (it has no live connectors either); reproduced as a
    * deterministic fixture with the sync-status aggregation computed, not
    * hardcoded. */
  def thirdPartyIntegrations(): Seq[IntegrationStatus] = Seq(
    IntegrationStatus("Terraform", "connected", "2025-01-15T08:30:00Z", 1250, 85.5, 92),
    IntegrationStatus("CloudFormation", "connected", "2025-01-15T09:15:00Z", 850, 78.2, 88),
    IntegrationStatus("ServiceNow ITSM", "disconnected", "2025-01-10T14:20:00Z", 0, 0.0, 0,
      error = Some("Authentication failed")))

  /** Aggregate sync status over the integration inventory
    * (allocation.py:430-443). Pure. */
  def syncStatus(integrations: Seq[IntegrationStatus] = thirdPartyIntegrations()): SyncStatus = {
    val connected = integrations.filter(_.status == "connected")
    SyncStatus(
      totalIntegrations = integrations.size,
      connected = connected.size,
      averageDataQuality =
        if (connected.isEmpty) 0.0
        else math.rint(connected.map(_.dataQualityScore).sum.toDouble / connected.size * 10) / 10,
      lastSuccessfulSync = connected.map(_.lastSync).maxOption.getOrElse("Never"))
  }

  final case class ComplianceSummary(
      complianceScore: Double,
      totalResources: Long,
      taggedResources: Long,
      untaggedCostImpact: Double,
      coverageByService: Map[String, Double])

  /** C11: compliance score + per-service coverage, a pure fold over the
    * collected compliance rows (allocation.py:180-228). */
  def complianceSummary(): ComplianceSummary = {
    val rows = taggingCompliance().collect()
    var total = 0L
    var tagged = 0L
    var untaggedCost = 0.0
    val coverage = scala.collection.mutable.Map.empty[String, (Long, Long)]
    rows.foreach { r =>
      val status = r.getAs[String]("tagging_status")
      val svc = r.getAs[String]("product_servicecode")
      val n = r.getAs[Long]("resource_count")
      total += n
      val (t, a) = coverage.getOrElse(svc, (0L, 0L))
      if (status != "untagged") { tagged += n; coverage(svc) = (t + n, a + n) }
      else { untaggedCost += r.getAs[Double]("total_cost"); coverage(svc) = (t, a + n) }
    }
    val score = if (total > 0) tagged.toDouble / total * 100 else 0.0
    ComplianceSummary(
      math.rint(score * 10) / 10, total, tagged, untaggedCost,
      coverage.map { case (s, (t, a)) =>
        s -> (if (a > 0) math.rint(t.toDouble / a * 1000) / 10 else 0.0)
      }.toMap)
  }
}
