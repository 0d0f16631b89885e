package graft.analytics

import graft.engine.GraftEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.time.LocalDate

/** MCP-style integration surface (reference analytics/mcp_integration.py):
  * a resources/tools catalog plus natural-language question routing into
  * the analytics modules (keyword intent parsing, C10). The reference's
  * WebSocket streaming config is a mock (mcp_integration.py:353-434) and
  * is represented here only as static capability metadata.
  */
final class McpIntegration(spark: SparkSession, table: String = "CUR",
    asOf: LocalDate) {

  private val finops = new FinOps(spark, table, asOf)
  private val engine = new GraftEngine(spark, Some(asOf))

  /** Queryable resources (mcp_integration.py resources listing). */
  def listResources(): Seq[Map[String, String]] = Seq(
    Map("uri" -> s"finops://$table/spend", "name" -> "Spend analytics",
      "description" -> "Monthly trends, top services/regions"),
    Map("uri" -> s"finops://$table/optimization", "name" -> "Optimization",
      "description" -> "Idle resources, rightsizing"),
    Map("uri" -> s"finops://$table/allocation", "name" -> "Allocation",
      "description" -> "Tagging compliance, cost dimensions"),
    Map("uri" -> s"finops://$table/discounts", "name" -> "Discounts",
      "description" -> "RI/SP utilization and scenarios"),
    Map("uri" -> s"finops://$table/kpi", "name" -> "KPI tracker",
      "description" -> "Comprehensive KPI summary"),
    Map("uri" -> s"finops://$table/anomalies", "name" -> "Anomalies",
      "description" -> "Daily spend anomaly detection"))

  /** Tools (mcp_integration.py tools listing). */
  def listTools(): Seq[Map[String, String]] = Seq(
    Map("name" -> "sql_query", "description" -> "Guarded read-only SQL over the billing table"),
    Map("name" -> "ask", "description" -> "Natural-language cost question"))

  /** NL question → module result (intent routing, C10). */
  def ask(question: String): Either[String, DataFrame] =
    finops.ai.parseIntent(question) match {
      case "anomalies" => Right(finops.ai.detectAnomalies())
      case "top_services" => Right(finops.spend.topServices())
      case "top_regions" => Right(finops.spend.topRegions())
      case "idle_resources" => Right(finops.optimization.idleResources())
      case "allocation" => Right(finops.allocation.taggingCompliance())
      case "discounts" => Right(finops.discounts.pricingModelBreakdown())
      case "forecast" | "summary" => Right(finops.spend.monthlySpend())
      case other => Left(s"no handler for intent: $other")
    }

  /** Guarded ad-hoc SQL tool (delegates to the engine firewall). */
  def sqlQuery(sql: String, maxRows: Int = 1000): Either[String, DataFrame] =
    engine.guardedQuery(sql, maxRows)

  final case class StreamAuth(required: Boolean, methods: Seq[String], sessionTimeoutSec: Int)
  final case class StreamConfig(
      websocketUrl: String, supportedEvents: Seq[String],
      streamModes: Seq[String], authentication: StreamAuth)
  final case class SampleEvent(eventType: String, data: Map[String, String])

  /** Real-time streaming capability metadata
    * (mcp_integration.py:353-434): the reference returns a static
    * configuration (its WebSocket is not implemented either) — reproduced
    * as typed metadata. The actual streaming execution path in this
    * engine is Structured Streaming (graft.streaming.EventStream);
    * this descriptor is what the MCP surface advertises to clients. */
  def streamConfig(): StreamConfig = StreamConfig(
    websocketUrl = "/api/v1/finops/mcp/stream",
    supportedEvents = Seq("cost_alert", "budget_threshold",
      "optimization_opportunity", "anomaly_detected", "forecast_update"),
    streamModes = Seq("real_time", "batched", "scheduled"),
    authentication = StreamAuth(required = true, Seq("jwt", "api_key"), 3600))

  /** Event JSON-schema catalog for stream consumers
    * (mcp_integration.py:384-409). */
  def eventSchemas(): Map[String, Map[String, String]] = Map(
    "cost_alert" -> Map(
      "alert_id" -> "string", "alert_type" -> "string", "service" -> "string",
      "current_cost" -> "number", "threshold" -> "number",
      "severity" -> "string", "timestamp" -> "date-time"),
    "optimization_opportunity" -> Map(
      "opportunity_id" -> "string", "type" -> "string",
      "potential_savings" -> "number", "confidence" -> "number",
      "action_required" -> "boolean"))

  /** Deterministic sample events (the reference stamps datetime.now();
    * asOf keeps golden tests stable). */
  def sampleEvents(): Seq[SampleEvent] = Seq(
    SampleEvent("cost_alert", Map(
      "alert_id" -> "alert_001", "alert_type" -> "budget_exceeded",
      "service" -> "EC2", "current_cost" -> "5200.00", "threshold" -> "5000.00",
      "severity" -> "medium", "timestamp" -> s"${asOf}T00:00:00Z")),
    SampleEvent("optimization_opportunity", Map(
      "opportunity_id" -> "opt_001", "type" -> "rightsizing",
      "potential_savings" -> "350.00", "confidence" -> "0.87",
      "action_required" -> "true")))
}
