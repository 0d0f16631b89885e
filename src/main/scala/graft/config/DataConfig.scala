package graft.config

/** Dataset flavors supported by the reference engine, with their partition
  * layout (reference de_polars/engine/data_config.py:9-31).
  *
  * Each type carries the physical partition column name (case matters: CUR2.0
  * uses uppercase `BILLING_PERIOD=`, FOCUS lowercase) and the partition-value
  * date format used for range pruning.
  */
sealed trait DataExportType {
  def name: String
  /** Partition directory key, e.g. `BILLING_PERIOD` (data_config.py:18-23). */
  def partitionColumn: String
  /** `YYYY-MM` (monthly) or `YYYY-MM-DD` (daily) — data_config.py:26-31. */
  def dateFormat: String
  def isMonthly: Boolean = dateFormat == "YYYY-MM"

  /** Validate a partition value against this type's format
    * (validators.py:129-143). */
  def validDate(v: String): Boolean =
    if (isMonthly) v.matches("""\d{4}-\d{2}""")
    else v.matches("""\d{4}-\d{2}-\d{2}""")
}

object DataExportType {
  case object Cur2 extends DataExportType {
    val name = "CUR2.0"; val partitionColumn = "BILLING_PERIOD"; val dateFormat = "YYYY-MM"
  }
  case object Focus1 extends DataExportType {
    val name = "FOCUS1.0"; val partitionColumn = "billing_period"; val dateFormat = "YYYY-MM"
  }
  /** Cost Optimization Hub — daily partitions. */
  case object Coh extends DataExportType {
    val name = "COH"; val partitionColumn = "date"; val dateFormat = "YYYY-MM-DD"
  }
  case object CarbonEmission extends DataExportType {
    val name = "CARBON_EMISSION"; val partitionColumn = "BILLING_PERIOD"; val dateFormat = "YYYY-MM"
  }
  val all: Seq[DataExportType] = Seq(Cur2, Focus1, Coh, CarbonEmission)
  def fromName(n: String): Option[DataExportType] = all.find(_.name == n)
}

/** Engine configuration, mirroring the reference `DataConfig`
  * (data_config.py:33-123): where the partitioned parquet lives (an S3
  * bucket/prefix and/or a local mirror), which export flavor, the date
  * range to register, and the logical table name queries address.
  *
  * `referenceDate` replaces the reference's implicit CURRENT_DATE in
  * relative-window queries (SURVEY.md §7.1 item 7) so results are
  * deterministic under test; None means "use the real current_date()".
  */
final case class DataConfig(
    s3Bucket: Option[String] = None,
    s3Prefix: Option[String] = None,
    localDataPath: Option[String] = None,
    exportType: DataExportType = DataExportType.Cur2,
    tableName: String = "CUR",
    dateStart: Option[String] = None, // inclusive, format per exportType
    dateEnd: Option[String] = None, // inclusive
    preferLocalData: Boolean = true,
    referenceDate: Option[java.time.LocalDate] = None,
    // API Data Source Control (reference data_config.py:53-57 +
    // README.md:596-611): when enabled, the engine auto-registers the
    // reference-named pricing tables (aws_pricing, aws_rds_pricing,
    // spot_price_history / aws_savings_plans, aws_savings_plans_rates)
    // at data-registration time, built from the engine's PricingSource
    // (the deterministic mock by default; a live client in deployment).
    // Spot history's asOf comes from referenceDate (determinism
    // contract) — apiCacheMaxAgeDays is the live-client refresh knob
    // and does not affect the mock.
    enablePricingApi: Boolean = false,
    enableSavingsPlansApi: Boolean = false,
    apiCacheMaxAgeDays: Int = 1,
    pricingApiRegions: Seq[String] = Seq("us-east-1"),
    pricingApiInstanceTypes: Seq[String] = Seq("m5.large", "c5.xlarge"),
    savingsPlansIncludeRates: Boolean = true,
    // Plan inventory for the aws_savings_plans(+_rates) tables. The
    // default is the deterministic mock stand-in (zero-egress); a live
    // deployment sets the REAL ARNs here (the reference discovers them
    // via the SavingsPlans API at registration time).
    savingsPlanArns: Seq[String] = Seq(
      "arn:aws:savingsplans::plan/graft-1",
      "arn:aws:savingsplans::plan/graft-2")) {

  require(dateStart.forall(exportType.validDate),
    s"dateStart must be ${exportType.dateFormat} for ${exportType.name}")
  require(dateEnd.forall(exportType.validDate),
    s"dateEnd must be ${exportType.dateFormat} for ${exportType.name}")
}
