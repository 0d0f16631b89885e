package graft.views

import graft.SparkSpec
import graft.fixtures.CurFixture
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** View-DAG golden tests over the CUR fixture. asOf is pinned so the
  * 3-month window and snapshot-age split are deterministic. */
class KpiViewsSpec extends SparkSpec {

  val asOf: LocalDate = LocalDate.of(2025, 7, 15)

  def setup(): Unit = {
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    KpiViews.registerAll(spark, asOf)
  }

  test("kpi_tracker: one row per (window month, account), window = last 3 months + current") {
    setup()
    val rows = spark.table("kpi_tracker").collect()
    // months 2025-04..2025-07 × 3 accounts
    assert(rows.length == 12)
  }

  test("amortized cost folds SP/RI fees (the 8-branch formula)") {
    setup()
    // payer account in 2025-07: SavingsPlanRecurringFee -> commitment-used = 2.0,
    // EC2 RIFee -> unused upfront+recurring = 1.0, RDS RIFee -> 0.4+0.1 = 0.5,
    // Credit -> -0.3  =>  3.2
    val spend = spark.table("kpi_tracker")
      .filter(col("linked_account_id") === "111111111111" &&
        date_format(col("billing_period"), "yyyy-MM") === "2025-07")
      .select("spend_all_cost").collect()(0).getDouble(0)
    assert(math.abs(spend - 3.2) < 1e-9, s"payer spend was $spend")
  }

  test("ec2 graviton / amd / spot costs classify by processor and purchase option") {
    setup()
    val mi = CurFixture.months.indexOf("2025-07")
    val g = 1.0 + 0.05 * mi
    val r = spark.table("kpi_tracker")
      .filter(col("linked_account_id") === "222222222222" &&
        date_format(col("billing_period"), "yyyy-MM") === "2025-07")
      .select("ec2_graviton_cost", "ec2_amd_cost").collect()(0)
    assert(math.abs(r.getDouble(0) - 0.4 * g) < 1e-9) // m6g row
    assert(math.abs(r.getDouble(1) - 0.45 * g) < 1e-9) // m5a row
    val spot = spark.table("kpi_tracker")
      .filter(col("linked_account_id") === "333333333333" &&
        date_format(col("billing_period"), "yyyy-MM") === "2025-07")
      .select("ec2_spot_cost").collect()(0).getDouble(0)
    assert(math.abs(spot - 0.7 * g) < 1e-9) // spot priced at public on-demand
  }

  test("ebs gp3 potential savings = 20% of gp2 cost") {
    setup()
    val mi = CurFixture.months.indexOf("2025-06")
    val g = 1.0 + 0.05 * mi
    val r = spark.table("kpi_tracker")
      .filter(col("linked_account_id") === "222222222222" &&
        date_format(col("billing_period"), "yyyy-MM") === "2025-06")
      .select("ebs_gp2_cost", "ebs_gp3_cost", "ebs_gp3_potential_savings", "ebs_gp_all_cost")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 0.10 * g) < 1e-9)
    assert(math.abs(r.getDouble(1) - 0.08 * g) < 1e-9)
    assert(math.abs(r.getDouble(2) - 0.02 * g) < 1e-9)
    assert(math.abs(r.getDouble(3) - 0.18 * g) < 1e-9)
  }

  test("snapshot age splits at one year from asOf") {
    setup()
    val snap = spark.table("kpi_ebs_snap")
      .groupBy(date_format(col("billing_period"), "yyyy-MM").as("m"))
      .agg(sum("ebs_snapshots_under_1yr_cost").as("u"),
        sum("ebs_snapshots_over_1yr_cost").as("o"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // snapshots on day 7 of 2024-06 / 2024-07 predate 2024-07-15
    assert(snap("2024-06")._1 == 0.0 && snap("2024-06")._2 > 0)
    assert(snap("2024-07")._1 == 0.0 && snap("2024-07")._2 > 0)
    assert(snap("2025-06")._1 > 0 && snap("2025-06")._2 == 0.0)
  }

  test("the whole DAG answers through plain SQL (view chaining)") {
    setup()
    val top = spark.sql(
      """SELECT linked_account_id, SUM(spend_all_cost) AS total
        |FROM kpi_tracker GROUP BY 1 ORDER BY total DESC LIMIT 1""".stripMargin).collect()(0)
    // account 2222... carries the most cost in the window
    assert(top.getString(0) == "222222222222")
  }

  test("kpi_instance_all keeps only instance-scoped rows in the 3-month window") {
    setup()
    val rows = spark.table("kpi_instance_all")
    // no S3/VPC/data-transfer rows pass the scope filter
    assert(rows.filter(col("product_code").isin("AmazonS3", "AmazonVPC")).count() == 0)
    // every month in-window
    val months = rows.select(date_format(col("billing_period"), "yyyy-MM")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(months.head >= "2025-04")
  }
}
