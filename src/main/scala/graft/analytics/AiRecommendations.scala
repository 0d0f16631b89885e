package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** AI-flavored analytics (reference analytics/ai_recommendations.py):
  * z-score spend-anomaly detection (J5), trend insights, the sinusoidal
  * "ML" forecast (C2), anomaly severity/confidence (C3), root-cause
  * templates (C4), and keyword intent parsing (C10).
  */
final class AiRecommendations(spark: SparkSession, table: String = "CUR",
    asOf: LocalDate) {

  private def cur = spark.table(table)

  /** Daily z-score anomalies per (service, region)
    * (ai_recommendations.py:35-95): needs >= 7 days of stats; returns the
    * top-20 deviations. */
  def detectAnomalies(lookbackDays: Int = 30, sensitivity: Double = 2.0): DataFrame = {
    val cutoff = lit(asOf.minusDays(lookbackDays).toString).cast("timestamp")
    val daily = cur
      .filter(col("line_item_unblended_cost") > 0 &&
        col("line_item_usage_start_date") >= cutoff)
      .groupBy(col("line_item_usage_start_date").cast("date").as("usage_date"),
        col("product_servicecode"), col("product_region"))
      .agg(sum("line_item_unblended_cost").as("daily_cost"))
    val stats = daily.groupBy(col("product_servicecode").as("svc"), col("product_region").as("reg"))
      .agg(avg("daily_cost").as("avg_daily_cost"),
        stddev("daily_cost").as("stddev_daily_cost"),
        count(lit(1)).as("days_of_data"))
      .filter(col("days_of_data") >= 7)
    val z = when(col("stddev_daily_cost") > 0,
      abs(col("daily_cost") - col("avg_daily_cost")) / col("stddev_daily_cost")).otherwise(0.0)
    val anomalyType =
      when(col("daily_cost") > col("avg_daily_cost") + col("stddev_daily_cost") * sensitivity,
        "high_spend_anomaly")
        .when(col("daily_cost") < col("avg_daily_cost") - col("stddev_daily_cost") * sensitivity &&
          col("daily_cost") > 0, "low_spend_anomaly")
        .otherwise("normal")
    daily.join(broadcast(stats),
        col("product_servicecode") === col("svc") && col("product_region") === col("reg"))
      .withColumn("z_score", z)
      .withColumn("anomaly_type", anomalyType)
      .filter(col("anomaly_type") =!= "normal")
      .select(col("usage_date"), col("product_servicecode"), col("product_region"),
        col("daily_cost"), col("avg_daily_cost"), col("z_score"), col("anomaly_type"),
        (col("daily_cost") - col("avg_daily_cost")).as("cost_deviation"))
      .orderBy(abs(col("cost_deviation")).desc)
      .limit(20)
  }

  /** Service growth trend: (MAX-MIN)/MIN monthly growth
    * (ai_recommendations.py:160-201 — the reference's dead-SQL bug at :204
    * is fixed here by actually executing the query; SURVEY.md §7.5 item 4). */
  def trendInsights(monthsBack: Int = 6): DataFrame = {
    val cutoff = lit(asOf.minusMonths(monthsBack).toString).cast("timestamp")
    cur.filter(col("line_item_unblended_cost") > 0 &&
        col("line_item_usage_start_date") >= cutoff)
      .groupBy(col("product_servicecode"),
        date_trunc("month", col("line_item_usage_start_date")).as("month"))
      .agg(sum("line_item_unblended_cost").as("monthly_cost"))
      .groupBy(col("product_servicecode"))
      .agg(min("monthly_cost").as("min_monthly"),
        max("monthly_cost").as("max_monthly"),
        avg("monthly_cost").as("avg_monthly"),
        count(lit(1)).as("months_active"))
      .filter(col("months_active") >= 2 && col("min_monthly") > 0)
      .withColumn("growth_rate_pct",
        round((col("max_monthly") - col("min_monthly")) / col("min_monthly") * 100, 2))
      .orderBy(col("growth_rate_pct").desc)
  }

  /** AI optimization insights — the INTENDED pattern-recognition query of
    * ai_recommendations.py:153-212 (`patterns_sql`; the reference defines
    * it and then executes a stale `sql` variable, so its endpoint dead-
    * letters — SURVEY.md §7.5 item 4): trailing-6-month spend per service
    * with volatility (stddev), growth rate (max-min)/min, and a
    * rapid_growth / growing / stable / declining pattern class.
    * `minAvgMonthlySpend` defaults to the reference's 1000 USD floor
    * (tests pass 0 against the small fixture). */
  def optimizationInsights(minAvgMonthlySpend: Double = 1000.0): DataFrame = {
    val cutoff = lit(asOf.minusMonths(6).toString).cast("timestamp")
    cur.filter(col("line_item_unblended_cost") > 0 &&
        col("line_item_usage_start_date") >= cutoff)
      .groupBy(date_trunc("month", col("line_item_usage_start_date")).as("month"),
        col("product_servicecode").as("service"))
      .agg(sum("line_item_unblended_cost").as("monthly_spend"),
        countDistinct("line_item_resource_id").as("resource_count"))
      .groupBy("service")
      .agg(avg("monthly_spend").as("avg_monthly_spend"),
        stddev("monthly_spend").as("spend_volatility"),
        ((max("monthly_spend") - min("monthly_spend")) /
          min("monthly_spend") * 100).as("growth_rate"),
        count(lit(1)).as("months_data"))
      .filter(col("months_data") >= 3 && col("avg_monthly_spend") > minAvgMonthlySpend)
      .withColumn("pattern_type",
        when(col("growth_rate") > 50, "rapid_growth")
          .when(col("growth_rate") > 20, "growing")
          .when(col("growth_rate") > -10, "stable")
          .otherwise("declining"))
      .orderBy(col("avg_monthly_spend").desc)
  }

  final case class ServiceInsight(
      insights: Seq[String], opportunities: Seq[String],
      priority: Int, confidence: Int)

  /** Per-service insight text + priority/confidence from the pattern class
    * (ai_recommendations.py:522-551). Pure. */
  def serviceInsight(service: String, pattern: String,
      growthRatePct: Double): ServiceInsight = pattern match {
    case "rapid_growth" => ServiceInsight(
      Seq(f"$service showing rapid $growthRatePct%.1f%% growth - review scaling efficiency"),
      Seq("Consider Reserved Instances or Savings Plans",
        "Implement automated scaling policies"), 95, 90)
    case "declining" => ServiceInsight(
      Seq(f"$service usage declining by ${math.abs(growthRatePct)}%.1f%% - potential cost savings"),
      Seq("Review unused resources for termination",
        "Optimize resource allocation"), 70, 85)
    case other => ServiceInsight(
      Seq(s"$service showing $other usage pattern"),
      Seq("Monitor for optimization opportunities"), 50, 75)
  }

  final case class Benchmark(
      service: String, ourMonthlySpend: Double, industryAverage: Double,
      vsIndustry: String, efficiencyScore: Int, percentile: Double)

  /** Industry benchmark comparison (mock table in the reference too,
    * ai_recommendations.py:553-579). Pure. */
  def industryBenchmarks(spendByService: Map[String, Double]): Seq[Benchmark] = {
    val table = Map(
      "AmazonEC2" -> (15000.0, 78), "AmazonRDS" -> (8000.0, 82),
      "AmazonS3" -> (5000.0, 85), "AWSLambda" -> (2000.0, 90))
    spendByService.toSeq.sortBy(_._1).flatMap { case (svc, ours) =>
      table.get(svc).map { case (industryAvg, eff) =>
        Benchmark(svc, ours, industryAvg,
          if (ours > industryAvg) "above" else "below", eff,
          math.min(95.0, math.max(5.0, 50 + (industryAvg - ours) / industryAvg * 50)))
      }
    }
  }

  final case class PatternSummary(
      totalServicesAnalyzed: Int, rapidGrowthServices: Int,
      decliningServices: Int, stableServices: Int,
      avgGrowthRate: Double, growthVolatility: String)

  /** Portfolio pattern rollup (ai_recommendations.py:581-597). Pure. */
  def patternSummary(rows: Seq[(String, String, Double)]): PatternSummary = {
    val total = rows.size
    val rapid = rows.count(_._2 == "rapid_growth")
    val declining = rows.count(_._2 == "declining")
    PatternSummary(total, rapid, declining, total - rapid - declining,
      if (total == 0) 0.0 else math.rint(rows.map(_._3).sum / total * 10) / 10,
      if (total > 0 && rapid > total * 0.3) "high" else "low")
  }

  // ---- pure post-processing -------------------------------------------

  /** C3: severity + confidence from the z-score
    * (ai_recommendations.py:109-112). */
  def severityOf(zScore: Double): (String, Int) =
    if (zScore >= 4) ("critical", 95)
    else if (zScore >= 3) ("high", 85)
    else if (zScore >= 2) ("medium", 75)
    else ("low", 60)

  /** C4: root-cause templates per service/anomaly type
    * (ai_recommendations.py:434-472). */
  def rootCause(service: String, anomalyType: String): String = (service, anomalyType) match {
    case ("AmazonEC2", "high_spend_anomaly") =>
      "Possible causes: new instances launched, instance size changes, or increased usage hours"
    case ("AmazonS3", "high_spend_anomaly") =>
      "Possible causes: large data uploads, increased API requests, or storage class changes"
    case ("AWSDataTransfer", "high_spend_anomaly") =>
      "Possible causes: increased cross-region traffic or external data egress"
    case (_, "high_spend_anomaly") =>
      "Possible causes: usage increase, pricing changes, or new resource deployment"
    case (_, "low_spend_anomaly") =>
      "Possible causes: resource termination, reduced usage, or credits applied"
    case _ => "No anomaly detected"
  }

  /** C2: "ML" forecast — average delta trend plus sinusoidal seasonality
    * `1 + 0.1*sin(mπ/6)` and a ±15% confidence band
    * (ai_recommendations.py:653-689). Pure. */
  final case class ForecastPoint(month: Int, cost: Double, lower: Double, upper: Double)
  def mlForecast(recentCostsAsc: Seq[Double], months: Int = 3): Seq[ForecastPoint] = {
    val recent = recentCostsAsc.takeRight(6)
    if (recent.size < 2) return Seq.empty
    val avgChange = recent.sliding(2).map { case Seq(a, b) => b - a }.sum / (recent.size - 1)
    val base = recent.last
    (1 to months).map { m =>
      val seasonal = 1 + 0.1 * math.sin(m * math.Pi / 6)
      val f = math.max(0.0, (base + avgChange * m) * seasonal)
      ForecastPoint(m, f, math.max(0, f * 0.85), f * 1.15)
    }
  }

  /** C10: keyword → intent routing (mcp_integration.py:436-480,
    * ai_recommendations.py:259-314) choosing among canned queries. */
  def parseIntent(question: String): String = {
    val q = question.toLowerCase
    if (q.contains("anomal") || q.contains("spike") || q.contains("unusual")) "anomalies"
    else if (q.contains("forecast") || q.contains("predict") || q.contains("next month")) "forecast"
    else if (q.contains("top") && (q.contains("service") || q.contains("spend"))) "top_services"
    else if (q.contains("region")) "top_regions"
    else if (q.contains("idle") || q.contains("waste") || q.contains("unused")) "idle_resources"
    else if (q.contains("tag") || q.contains("alloc")) "allocation"
    else if (q.contains("saving") || q.contains("discount") || q.contains("commit")) "discounts"
    else "summary"
  }
}
