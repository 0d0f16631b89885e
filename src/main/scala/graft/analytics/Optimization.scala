package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** Cost-optimization module (reference analytics/optimization.py): idle-
  * resource detection, rightsizing recommendations, and the pure risk /
  * confidence scoring (SURVEY.md §2.9 C7/C8). */
final class Optimization(spark: SparkSession, table: String = "CUR",
    asOf: LocalDate = LocalDate.now()) {

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
