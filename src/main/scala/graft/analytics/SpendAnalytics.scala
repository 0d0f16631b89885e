package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.time.LocalDate

/** Spend analytics module (reference analytics/spend_analytics.py):
  * monthly invoice trend with MoM/YoY, top regions, top services, and the
  * linear forecast post-processing (SURVEY.md §2.9 C1).
  *
  * All SQL is re-expressed with the DataFrame API; `asOf` pins
  * CURRENT_DATE. Results are small post-aggregation frames; the collect
  * happens only in the typed summary methods.
  */
final class SpendAnalytics(spark: SparkSession, table: String = "CUR",
    asOf: LocalDate) {

  private def cur = spark.table(table)
  private def monthOf(d: LocalDate) = lit(d.withDayOfMonth(1).toString).cast("timestamp")

  /** Monthly spend + MoM/YoY percent changes
    * (spend_analytics.py:33-67, W1/W2). */
  def monthlySpend(monthsBack: Int = 24): DataFrame = {
    val cutoff = lit(asOf.minusMonths(monthsBack).toString).cast("timestamp")
    val monthly = cur
      .filter(col("line_item_unblended_cost") > 0 &&
        col("line_item_usage_start_date") >= cutoff)
      .groupBy(date_trunc("month", col("line_item_usage_start_date")).as("month"))
      .agg(sum("line_item_unblended_cost").as("total_spend"))
    val w = Window.orderBy("month")
    monthly
      .withColumn("prev_month_spend", lag(col("total_spend"), 1).over(w))
      .withColumn("prev_year_spend", lag(col("total_spend"), 12).over(w))
      .select(col("month"), col("total_spend"),
        when(col("prev_month_spend") > 0,
          round((col("total_spend") - col("prev_month_spend")) / col("prev_month_spend") * 100, 2))
          .as("mom_change"),
        when(col("prev_year_spend") > 0,
          round((col("total_spend") - col("prev_year_spend")) / col("prev_year_spend") * 100, 2))
          .as("yoy_change"))
      .orderBy(col("month").desc)
  }

  /** Top regions for the asOf month vs previous month
    * (spend_analytics.py:105-148, J3/J4). */
  def topRegions(limit: Int = 10): DataFrame = {
    val curMonth = cur.filter(col("line_item_unblended_cost") > 0 &&
      date_trunc("month", col("line_item_usage_start_date")) === monthOf(asOf))
      .groupBy(col("product_region")).agg(sum("line_item_unblended_cost").as("spend"))
    val prevMonth = cur.filter(col("line_item_unblended_cost") > 0 &&
      date_trunc("month", col("line_item_usage_start_date")) === monthOf(asOf.minusMonths(1)))
      .groupBy(col("product_region").as("pr")).agg(sum("line_item_unblended_cost").as("prev_spend"))
    val total = curMonth.agg(sum("spend").as("total"))
    curMonth.crossJoin(broadcast(total))
      .join(broadcast(prevMonth), col("product_region") === col("pr"), "left")
      .filter(col("product_region").isNotNull)
      .select(col("product_region").as("region_name"), col("spend"),
        round(col("spend") / col("total") * 100, 2).as("percentage"),
        when(col("prev_spend") > 0,
          round((col("spend") - col("prev_spend")) / col("prev_spend") * 100, 2))
          .as("mom_change"))
      .orderBy(col("spend").desc)
      .limit(limit)
  }

  /** Top services with resource counts (spend_analytics.py:180-203, A3). */
  def topServices(limit: Int = 10): DataFrame = {
    val svc = cur.filter(col("line_item_unblended_cost") > 0 &&
      date_trunc("month", col("line_item_usage_start_date")) === monthOf(asOf))
      .groupBy(col("product_servicecode").as("service_name"))
      .agg(sum("line_item_unblended_cost").as("spend"),
        countDistinct("line_item_resource_id").as("resource_count"))
    val total = svc.agg(sum("spend").as("total"))
    svc.crossJoin(broadcast(total))
      .filter(col("service_name").isNotNull)
      .select(col("service_name"), col("spend"),
        round(col("spend") / col("total") * 100, 2).as("percentage"),
        col("resource_count"))
      .orderBy(col("spend").desc)
      .limit(limit)
  }

  /** Golden-shape query 1 (tests/test_14, advanced_query_1_results.json):
    * per-service cost trend across billing periods with LAG-based change
    * percent — output schema (billing_period, product_servicecode,
    * current_cost, previous_cost, cost_change_percent). */
  def advancedQuery1(): DataFrame = {
    val monthly = cur
      .groupBy(col("bill_billing_period_start_date").as("billing_period"),
        col("product_servicecode"))
      .agg(sum("line_item_unblended_cost").as("current_cost"))
    val w = Window.partitionBy("product_servicecode").orderBy("billing_period")
    monthly
      .withColumn("previous_cost", lag(col("current_cost"), 1).over(w))
      .withColumn("cost_change_percent",
        when(col("previous_cost") > 0,
          round((col("current_cost") - col("previous_cost")) / col("previous_cost") * 100, 2)))
      .orderBy(col("billing_period").desc, col("current_cost").desc)
  }

  /** Golden-shape query 2 (advanced_query_2_results.json): account cost
    * distribution with rank — (line_item_usage_account_id, total_cost,
    * cost_percentage, cost_rank). */
  def advancedQuery2(): DataFrame = {
    val acct = cur.filter(col("line_item_unblended_cost") > 0)
      .groupBy(col("line_item_usage_account_id"))
      .agg(sum("line_item_unblended_cost").as("total_cost"))
    val total = acct.agg(sum("total_cost").as("grand"))
    acct.crossJoin(broadcast(total))
      .select(col("line_item_usage_account_id"), col("total_cost"),
        round(col("total_cost") / col("grand") * 100, 2).as("cost_percentage"))
      // global rank is safe HERE ONLY because input is one row per
      // ACCOUNT (post-aggregation, thousands at most) — never use an
      // un-partitioned window over line-item-grain data
      .withColumn("cost_rank", rank().over(Window.orderBy(col("total_cost").desc)).cast("long"))
      .orderBy("cost_rank")
  }

  /** C1: linear forecast — last-3-month average plus average trend
    * (spend_analytics.py:338-357). Pure function over collected months. */
  def linearForecast(monthlyTotalsAsc: Seq[Double], horizonMonths: Int = 3): Seq[Double] = {
    if (monthlyTotalsAsc.isEmpty) return Seq.fill(horizonMonths)(0.0)
    val recent = monthlyTotalsAsc.takeRight(3)
    val avg = recent.sum / recent.size
    val trend =
      if (recent.size < 2) 0.0
      else (recent.last - recent.head) / (recent.size - 1)
    (1 to horizonMonths).map(i => math.max(0.0, avg + trend * i))
  }

  final case class InvoiceSummary(
      currentMonthSpend: Double, momChangePct: Option[Double],
      yoyChangePct: Option[Double], forecastNext3: Seq[Double])

  /** Typed summary for the API layer (spend_analytics.py:69-103). */
  def invoiceSummary(): InvoiceSummary = {
    val rows = monthlySpend().collect()
    if (rows.isEmpty) return InvoiceSummary(0.0, None, None, Seq(0, 0, 0))
    val head = rows.head
    def opt(i: Int): Option[Double] = if (head.isNullAt(i)) None else Some(head.getDouble(i))
    val asc = rows.reverse.map(_.getDouble(1)).toSeq
    InvoiceSummary(head.getDouble(1), opt(2), opt(3), linearForecast(asc))
  }

  /** Multi-dimensional current-month spend breakdown
    * (spend_analytics.py:225-262): dynamic GROUP BY over the requested
    * dimensions (region/service), top 50 by spend. */
  def spendBreakdown(dimensions: Seq[String] = Seq("region", "service")): DataFrame = {
    val dims = Seq(
      "region" -> col("product_region").as("region"),
      "service" -> col("product_servicecode").as("service"))
      .collect { case (name, c) if dimensions.contains(name) => c }
    val base = cur.filter(col("line_item_unblended_cost") > 0 &&
      date_trunc("month", col("line_item_usage_start_date")) === monthOf(asOf.withDayOfMonth(1)))
    val grouped =
      if (dims.isEmpty)
        base.agg(sum("line_item_unblended_cost").as("spend"),
          countDistinct("line_item_resource_id").as("resource_count"))
          .select(lit("All").as("dimension"), col("spend"), col("resource_count"))
      else
        base.groupBy(dims: _*)
          .agg(sum("line_item_unblended_cost").as("spend"),
            countDistinct("line_item_resource_id").as("resource_count"))
    grouped.orderBy(col("spend").desc).limit(50)
  }

  final case class ExportInfo(
      exportUrl: String, format: String, expiresAt: String, recordCount: Long)

  /** Export preparation metadata (spend_analytics.py:288-332): counts the
    * date-filtered detail rows and returns the download descriptor — the
    * actual bytes come from utils.Exporters against the same frame. The
    * reference stamps the URL/expiry with datetime.now(); asOf keeps both
    * deterministic. The count is a Spark aggregate — the 10k LIMIT applies
    * to the exported file, not to a driver-side collect here. */
  def exportSpendData(format: String = "csv",
      dateStart: Option[String] = None, dateEnd: Option[String] = None): ExportInfo = {
    val filtered = cur.filter(col("line_item_unblended_cost") > 0)
    val withStart = dateStart.fold(filtered)(s =>
      filtered.filter(col("line_item_usage_start_date") >= lit(s).cast("timestamp")))
    val withEnd = dateEnd.fold(withStart)(e =>
      withStart.filter(col("line_item_usage_start_date") <= lit(e).cast("timestamp")))
    ExportInfo(
      exportUrl = s"/exports/spend_data_$asOf.$format",
      format = format,
      expiresAt = s"${asOf.plusDays(1)}T00:00:00Z",
      recordCount = math.min(10000L, withEnd.count()))
  }
}
