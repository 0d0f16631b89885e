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
    asOf: LocalDate = LocalDate.now()) {

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
