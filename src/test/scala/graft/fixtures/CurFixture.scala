package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp
import java.time.{LocalDate, LocalDateTime}

/** Deterministic CUR-2.0-shaped fixture (FIXTURES.md §B): covers every
  * line_item_line_item_type, purchase option, processor family, EBS
  * gp2/gp3 + snapshots straddling 1 year, Lambda/DynamoDB rows, tag
  * coverage states, credits, 14 consecutive months (YoY LAG window), 2
  * accounts, and a planted daily-spend anomaly. ~families × months rows.
  */
object CurFixture {

  final case class CurRow(
      bill_payer_account_id: String,
      line_item_usage_account_id: String,
      bill_billing_period_start_date: Timestamp,
      billing_period: String,
      line_item_usage_start_date: Timestamp,
      line_item_line_item_type: String,
      line_item_product_code: String,
      product_servicecode: String,
      line_item_operation: String,
      line_item_usage_type: String,
      line_item_resource_id: String,
      line_item_usage_amount: Double,
      line_item_unblended_cost: Double,
      line_item_blended_cost: Double,
      pricing_public_on_demand_cost: Double,
      pricing_term: String,
      reservation_reservation_a_r_n: String,
      reservation_effective_cost: Double,
      reservation_unused_amortized_upfront_fee_for_billing_period: Double,
      reservation_unused_recurring_fee: Double,
      savings_plan_savings_plan_a_r_n: String,
      savings_plan_savings_plan_effective_cost: Double,
      savings_plan_total_commitment_to_date: Double,
      savings_plan_used_commitment: Double,
      savings_plan_offering_type: String,
      product: Map[String, String],
      product_instance_type: String,
      product_region: String,
      product_region_code: String,
      product_operating_system: String,
      product_tenancy: String,
      product_database_engine: String,
      resource_tags: String)

  val months: Seq[String] =
    (0 until 14).map(i => LocalDate.of(2024, 6, 1).plusMonths(i))
      .map(d => f"${d.getYear}%04d-${d.getMonthValue}%02d")

  private def ts(month: String, day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(LocalDateTime.of(month.substring(0, 4).toInt,
      month.substring(5, 7).toInt, day, hour, 0))

  private def prodMap(region: String, os: String, proc: String,
      engine: String = "", tenancy: String = "Shared"): Map[String, String] =
    Map("region" -> region, "operating_system" -> os, "tenancy" -> tenancy,
      "physical_processor" -> proc, "database_engine" -> engine,
      "deployment_option" -> "Single-AZ", "license_model" -> "No license required",
      "cache_engine" -> "")

  private def base(month: String, day: Int, acct: String): CurRow = CurRow(
    bill_payer_account_id = "111111111111",
    line_item_usage_account_id = acct,
    bill_billing_period_start_date = ts(month, 1),
    billing_period = month,
    line_item_usage_start_date = ts(month, day, 3),
    line_item_line_item_type = "Usage",
    line_item_product_code = "AmazonEC2",
    product_servicecode = "AmazonEC2",
    line_item_operation = "RunInstances",
    line_item_usage_type = "BoxUsage:m5.large",
    line_item_resource_id = s"i-$acct$day",
    line_item_usage_amount = 24.0,
    line_item_unblended_cost = 1.0,
    line_item_blended_cost = 1.0,
    pricing_public_on_demand_cost = 1.2,
    pricing_term = "OnDemand",
    reservation_reservation_a_r_n = "",
    reservation_effective_cost = 0.0,
    reservation_unused_amortized_upfront_fee_for_billing_period = 0.0,
    reservation_unused_recurring_fee = 0.0,
    savings_plan_savings_plan_a_r_n = "",
    savings_plan_savings_plan_effective_cost = 0.0,
    savings_plan_total_commitment_to_date = 0.0,
    savings_plan_used_commitment = 0.0,
    savings_plan_offering_type = "",
    product = prodMap("us-east-1", "Linux", "Intel Xeon"),
    product_instance_type = "m5.large",
    product_region = "us-east-1",
    product_region_code = "us-east-1",
    product_operating_system = "Linux",
    product_tenancy = "Shared",
    product_database_engine = "",
    resource_tags = """{"Environment":"prod","Team":"platform","Project":"alpha"}""")

  /** All fixture rows; deterministic, no RNG. */
  def rows: Seq[CurRow] = months.zipWithIndex.flatMap { case (m, mi) =>
    val growth = 1.0 + 0.05 * mi // monotone MoM growth for trend queries
    // 10 consecutive daily EC2 usage rows per account (z-score window),
    // day 8 is the planted anomaly (5x spend)
    val daily = for {
      acct <- Seq("222222222222", "333333333333")
      day <- 1 to 10
    } yield {
      val spike = if (day == 8) 5.0 else 1.0
      base(m, day, acct).copy(
        line_item_unblended_cost = 0.5 * growth * spike,
        line_item_blended_cost = 0.5 * growth * spike,
        pricing_public_on_demand_cost = 0.6 * growth * spike)
    }
    val graviton = base(m, 2, "222222222222").copy(
      line_item_usage_type = "BoxUsage:m6g.large", product_instance_type = "m6g.large",
      line_item_resource_id = "i-gravi",
      product = prodMap("us-east-1", "Linux", "AWS Graviton2"),
      line_item_unblended_cost = 0.4 * growth, line_item_blended_cost = 0.4 * growth,
      pricing_public_on_demand_cost = 0.55 * growth)
    val amd = base(m, 3, "222222222222").copy(
      line_item_usage_type = "BoxUsage:m5a.large", product_instance_type = "m5a.large",
      line_item_resource_id = "i-amd",
      product = prodMap("us-east-1", "Linux", "AMD EPYC"),
      line_item_unblended_cost = 0.45 * growth, line_item_blended_cost = 0.45 * growth)
    val spot = base(m, 4, "333333333333").copy(
      line_item_usage_type = "SpotUsage:m5.large", line_item_resource_id = "i-spot",
      line_item_unblended_cost = 0.2 * growth, line_item_blended_cost = 0.2 * growth,
      pricing_public_on_demand_cost = 0.7 * growth)
    // Savings-plan covered usage + its fee/negation rows (kpi_instance_all.sql:37-38)
    val spArn = "arn:aws:savingsplans::111111111111:savingsplan/sp-1"
    val spUsage = base(m, 5, "222222222222").copy(
      line_item_line_item_type = "SavingsPlanCoveredUsage",
      savings_plan_savings_plan_a_r_n = spArn,
      savings_plan_savings_plan_effective_cost = 0.3 * growth,
      savings_plan_offering_type = "ComputeSavingsPlans",
      line_item_unblended_cost = 0.5 * growth,
      pricing_public_on_demand_cost = 0.6 * growth)
    val spFee = base(m, 1, "111111111111").copy(
      line_item_line_item_type = "SavingsPlanRecurringFee",
      savings_plan_savings_plan_a_r_n = spArn,
      savings_plan_total_commitment_to_date = 10.0,
      savings_plan_used_commitment = 8.0,
      line_item_unblended_cost = 10.0, line_item_usage_type = "")
    val spNeg = base(m, 5, "222222222222").copy(
      line_item_line_item_type = "SavingsPlanNegation",
      line_item_unblended_cost = -0.5 * growth, line_item_usage_type = "")
    // Reserved instance rows
    val riArn = "arn:aws:ec2:us-east-1:111111111111:reserved-instances/ri-1"
    val riUsage = base(m, 6, "333333333333").copy(
      line_item_line_item_type = "DiscountedUsage",
      reservation_reservation_a_r_n = riArn,
      reservation_effective_cost = 0.35 * growth,
      pricing_term = "Reserved",
      line_item_unblended_cost = 0.0,
      pricing_public_on_demand_cost = 0.6 * growth)
    val riFee = base(m, 1, "111111111111").copy(
      line_item_line_item_type = "RIFee",
      reservation_reservation_a_r_n = riArn,
      reservation_unused_amortized_upfront_fee_for_billing_period = 0.8,
      reservation_unused_recurring_fee = 0.2,
      line_item_unblended_cost = 3.0, line_item_usage_type = "")
    // EBS gp2 + gp3 + snapshots
    val gp2 = base(m, 7, "222222222222").copy(
      line_item_product_code = "AmazonEC2", line_item_operation = "CreateVolume-Gp2",
      line_item_usage_type = "EBS:VolumeUsage.gp2", line_item_resource_id = "vol-gp2",
      line_item_unblended_cost = 0.10 * growth, line_item_blended_cost = 0.10 * growth)
    val gp3 = base(m, 7, "222222222222").copy(
      line_item_operation = "CreateVolume-Gp3",
      line_item_usage_type = "EBS:VolumeUsage.gp3", line_item_resource_id = "vol-gp3",
      line_item_unblended_cost = 0.08 * growth, line_item_blended_cost = 0.08 * growth)
    val snap = base(m, 7, "333333333333").copy(
      line_item_operation = "CreateSnapshot",
      line_item_usage_type = "EBS:SnapshotUsage", line_item_resource_id = "snap-1",
      line_item_unblended_cost = 0.05 * growth, line_item_blended_cost = 0.05 * growth)
    // Lambda + DynamoDB + RDS + S3 + VPC/data-transfer
    val lambda = base(m, 8, "222222222222").copy(
      line_item_product_code = "AWSLambda", product_servicecode = "AWSLambda",
      line_item_operation = "Invoke", line_item_usage_type = "Lambda-GB-Second",
      line_item_resource_id = "arn:aws:lambda:fn-1",
      line_item_unblended_cost = 0.15 * growth, line_item_blended_cost = 0.15 * growth,
      product = prodMap("us-east-1", "", ""))
    val dynamo = base(m, 9, "333333333333").copy(
      line_item_product_code = "AmazonDynamoDB", product_servicecode = "AmazonDynamoDB",
      line_item_operation = "CommittedThroughput",
      line_item_usage_type = "ReadCapacityUnit-Hrs", line_item_resource_id = "table/t1",
      line_item_unblended_cost = 0.12 * growth, line_item_blended_cost = 0.12 * growth,
      product = prodMap("us-east-1", "", ""))
    val rds = base(m, 9, "222222222222").copy(
      line_item_product_code = "AmazonRDS", product_servicecode = "AmazonRDS",
      line_item_operation = "CreateDBInstance",
      line_item_usage_type = "InstanceUsage:db.r6g.large",
      product_instance_type = "db.r6g.large", line_item_resource_id = "db-1",
      product = prodMap("us-east-1", "Linux", "AWS Graviton2", engine = "PostgreSQL"),
      product_database_engine = "PostgreSQL",
      line_item_unblended_cost = 0.25 * growth, line_item_blended_cost = 0.25 * growth,
      resource_tags = """{"Environment":"dev"}""")
    // RDS RIFee: in the kpi_instance_all scope (instance_type set) but NOT a
    // usage charge — must be excluded from rds_all_cost
    // (kpi_instance_all.sql:75)
    val rdsRiFee = base(m, 1, "111111111111").copy(
      line_item_line_item_type = "RIFee",
      line_item_product_code = "AmazonRDS", product_servicecode = "AmazonRDS",
      line_item_operation = "CreateDBInstance",
      line_item_usage_type = "", line_item_resource_id = "db-ri",
      product_instance_type = "db.r5.large",
      reservation_reservation_a_r_n = "arn:aws:rds:us-east-1:111111111111:ri/rds-ri-1",
      reservation_unused_amortized_upfront_fee_for_billing_period = 0.4,
      reservation_unused_recurring_fee = 0.1,
      line_item_unblended_cost = 1.5, line_item_blended_cost = 1.5,
      product = prodMap("us-east-1", "Linux", "Intel Xeon", engine = "MySQL"),
      product_database_engine = "MySQL")
    // DynamoDB on-demand (PayPerRequestThroughput): counted by
    // dynamodb_all_cost (product_code-keyed) but NOT in the commit group
    // (kpi_instance_all.sql:21,105)
    val dynamoPpr = base(m, 9, "222222222222").copy(
      line_item_product_code = "AmazonDynamoDB", product_servicecode = "AmazonDynamoDB",
      line_item_operation = "PayPerRequestThroughput",
      line_item_usage_type = "WriteCapacityUnit-Hrs", line_item_resource_id = "table/t2",
      line_item_unblended_cost = 0.09 * growth, line_item_blended_cost = 0.09 * growth,
      product = prodMap("us-east-1", "", ""))
    // RDS Intel 'Usage' row covered by a non-Compute savings plan: eligible
    // for graviton per the reference's branch (no purchase-option condition,
    // kpi_instance_all.sql:77) — would be dropped by an EC2-style
    // OnDemand/ComputeSavingsPlans gate
    val rdsSpIntel = base(m, 9, "333333333333").copy(
      line_item_product_code = "AmazonRDS", product_servicecode = "AmazonRDS",
      line_item_operation = "CreateDBInstance",
      line_item_usage_type = "InstanceUsage:db.r5.large",
      product_instance_type = "db.r5.large", line_item_resource_id = "db-2",
      savings_plan_savings_plan_a_r_n = spArn,
      savings_plan_savings_plan_effective_cost = 0.0,
      savings_plan_offering_type = "EC2InstanceSavingsPlans",
      product = prodMap("us-east-1", "Linux", "Intel Xeon", engine = "MySQL"),
      product_database_engine = "MySQL",
      line_item_unblended_cost = 0.22 * growth, line_item_blended_cost = 0.22 * growth)
    val s3r = base(m, 10, "333333333333").copy(
      line_item_product_code = "AmazonS3", product_servicecode = "AmazonS3",
      line_item_operation = "StandardStorage",
      line_item_usage_type = "TimedStorage-ByteHrs", line_item_resource_id = "bucket/b1",
      line_item_unblended_cost = 0.07 * growth, line_item_blended_cost = 0.07 * growth,
      product = prodMap("us-east-1", "", ""), resource_tags = "")
    val vpc = base(m, 11, "222222222222").copy(
      line_item_product_code = "AmazonVPC", product_servicecode = "AmazonVPC",
      line_item_operation = "NatGateway",
      line_item_usage_type = "NatGateway-Hours", line_item_resource_id = "nat-1",
      line_item_unblended_cost = 0.6 * growth, line_item_blended_cost = 0.6 * growth,
      product = prodMap("us-east-1", "", ""), resource_tags = "{}")
    val dt = base(m, 11, "333333333333").copy(
      product_servicecode = "AWSDataTransfer",
      line_item_usage_type = "USE1-DataTransfer-Out-Bytes", line_item_resource_id = "",
      line_item_unblended_cost = 0.09 * growth, line_item_blended_cost = 0.09 * growth,
      product = prodMap("us-east-1", "", ""))
    // Credit row (negative cost — validators.py:44-48)
    val credit = base(m, 12, "111111111111").copy(
      line_item_line_item_type = "Credit", line_item_usage_type = "",
      line_item_unblended_cost = -0.3, line_item_blended_cost = -0.3)
    daily ++ Seq(graviton, amd, spot, spUsage, spFee, spNeg, riUsage, riFee,
      gp2, gp3, snap, lambda, dynamo, dynamoPpr, rds, rdsRiFee, rdsSpIntel,
      s3r, vpc, dt, credit)
  }

  /** In-memory DataFrame of the fixture. */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** Write the fixture as a `BILLING_PERIOD=YYYY-MM/` partitioned parquet
    * tree (the CUR2.0 physical layout, data_config.py:20) under `dir`. */
  def writePartitioned(spark: SparkSession, dir: String): Unit =
    df(spark).withColumnRenamed("billing_period", "BILLING_PERIOD")
      .write.mode("overwrite").partitionBy("BILLING_PERIOD").parquet(dir)
}
