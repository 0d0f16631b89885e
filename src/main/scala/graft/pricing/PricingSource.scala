package graft.pricing

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live AWS price lookups behind a trait (SURVEY.md §2.1 S13-S18,
  * reference aws_pricing_manager.py). The reference calls the Pricing /
  * EC2 / SavingsPlans APIs with thread pools; this build runs in a
  * zero-egress environment, so the HTTP client is a pluggable
  * implementation detail and the deterministic [[MockPricingSource]] backs
  * every test. Results land as DataFrames registered under the reference's
  * table names (README.md:585-592) so CUR joins (J6/J7) work verbatim.
  */
trait PricingSource {
  /** On-demand price (aws_pricing_manager.py:279-326, S13). */
  def onDemandPrice(instanceType: String, region: String, os: String,
      tenancy: String = "Shared"): Option[Double]

  /** RI terms → (upfront, hourly) (aws_pricing_manager.py:332-399, S14). */
  def reservedPrice(instanceType: String, region: String, termYears: Int,
      paymentOption: String): Option[(Double, Double)]

  /** Latest spot price (aws_pricing_manager.py:405-445, S15). */
  def spotPrice(instanceType: String, region: String): Option[Double]

  /** N-day spot price history, most recent first
    * (aws_pricing_manager.py:447-488 `get_spot_price_history`). `asOf`
    * is REQUIRED — the repo's determinism contract injects the
    * reference date instead of reading the wall clock, so two sessions
    * can build identical histories. */
  def spotPriceHistory(instanceType: String, region: String,
      daysBack: Int = 7,
      asOf: java.time.LocalDate): Seq[SpotPricePoint]

  /** Savings-plans rate (aws_pricing_manager.py:494-549, S16). */
  def savingsPlanRate(instanceType: String, region: String,
      planType: String): Option[Double]

  /** RDS on-demand instance price (reference README.md:590
    * `aws_rds_pricing` — same Price List API, ServiceCode=AmazonRDS). */
  def rdsPrice(instanceClass: String, region: String,
      engine: String): Option[Double]

  /** Instance hardware attributes (aws_pricing_manager.py:67-124, S18). */
  def instanceAttributes(instanceType: String): Option[InstanceAttrs]
}

final case class InstanceAttrs(vcpu: Int, memoryGiB: Double, processor: String)

/** One spot-price observation (the reference's SpotPriceHistory row shape,
  * aws_pricing_manager.py:474-481). */
final case class SpotPricePoint(
    timestamp: String, availabilityZone: String, instanceType: String,
    productDescription: String, spotPrice: Double)

/** Deterministic mock: prices derived from a stable hash of the lookup key
  * — exercises the full join surface with zero egress. Mirrors the shape
  * of the reference's bulk matrix fan-out (aws_pricing_manager.py:164-273,
  * S17) in [[pricingTable]].
  */
final class MockPricingSource extends PricingSource {

  private def h(key: String): Double = {
    // stable 0..1 from the key (not Random: deterministic across JVMs)
    val x = key.foldLeft(1125899906842597L)((a, c) => 31 * a + c)
    ((x % 100000L).abs + 1) / 100000.0
  }

  override def onDemandPrice(it: String, region: String, os: String,
      tenancy: String): Option[Double] =
    Some(0.01 + 0.5 * h(s"od|$it|$region|$os|$tenancy"))

  override def reservedPrice(it: String, region: String, termYears: Int,
      paymentOption: String): Option[(Double, Double)] = {
    val od = onDemandPrice(it, region, "Linux", "Shared").get
    val discount = if (termYears >= 3) 0.55 else 0.70
    val upfrontShare = paymentOption match {
      case "All Upfront" => 1.0
      case "Partial Upfront" => 0.5
      case _ => 0.0
    }
    val hourlyEff = od * discount
    val hoursPerTerm = 8760.0 * termYears
    Some((hourlyEff * hoursPerTerm * upfrontShare, hourlyEff * (1 - upfrontShare)))
  }

  override def spotPrice(it: String, region: String): Option[Double] =
    Some(onDemandPrice(it, region, "Linux", "Shared").get * (0.25 + 0.1 * h(s"spot|$it|$region")))

  /** Deterministic daily history: the latest price modulated by a
    * per-(day, AZ) factor in ±10% — stable across runs so golden tests
    * hold; most recent first, two AZs per region like the real API. */
  override def spotPriceHistory(it: String, region: String, daysBack: Int,
      asOf: java.time.LocalDate): Seq[SpotPricePoint] = {
    val latest = spotPrice(it, region).get
    for {
      d <- 0 until daysBack
      az <- Seq(s"${region}a", s"${region}b")
    } yield SpotPricePoint(
      timestamp = s"${asOf.minusDays(d)}T00:00:00Z",
      availabilityZone = az,
      instanceType = it,
      productDescription = "Linux/UNIX",
      spotPrice = math.rint(latest * (0.9 + 0.2 * h(s"hist|$it|$az|$d")) * 1e6) / 1e6)
  }

  override def savingsPlanRate(it: String, region: String, planType: String): Option[Double] = {
    val disc = if (planType == "ComputeSavingsPlans") 0.66 else 0.60
    Some(onDemandPrice(it, region, "Linux", "Shared").get * disc)
  }

  override def rdsPrice(ic: String, region: String, engine: String): Option[Double] =
    Some(0.02 + 0.6 * h(s"rds|$ic|$region|$engine"))

  override def instanceAttributes(it: String): Option[InstanceAttrs] = {
    val size = it.split('.').lastOption.getOrElse("large")
    val mult = size match {
      case "micro" => 0.25; case "small" => 0.5; case "medium" => 1.0
      case "large" => 2.0; case "xlarge" => 4.0; case "2xlarge" => 8.0
      case _ => 2.0
    }
    val proc =
      if (it.contains("g.") || it.endsWith("g")) "AWS Graviton"
      else if (it.contains("a.")) "AMD" else "Intel"
    Some(InstanceAttrs(math.max(1, (mult * 2).toInt), mult * 4.0, proc))
  }
}

/** TTL-caching decorator over any [[PricingSource]]: each lookup result is
  * memoized for `maxAgeDays` (the reference's `api_cache_max_age_days`,
  * data_config.py:55 — price lists change daily at most, so a long-lived
  * session should not re-pay API round-trips per query). Backed by the
  * shared [[graft.utils.Performance.TtlCache]]; keys are method+arguments,
  * so distinct lookups never alias. Wrap the LIVE client with this in
  * deployment; the deterministic mock is already free to call. */
final class CachingPricingSource(underlying: PricingSource, maxAgeDays: Int,
    clock: () => Long = System.currentTimeMillis) extends PricingSource {
  private val positiveTtl = maxAgeDays.toLong * 86400L
  /** Negative results (None / empty history) get a short TTL instead of
    * the full maxAgeDays: a transient live-API failure that surfaces as
    * None would otherwise pin a missing price — silently dropping rows
    * from the registered pricing tables — until restart. 5 minutes keeps
    * a hot retry loop from hammering the API while letting the next
    * query round-trip recover. */
  private val negativeTtl = 300L
  private def isNegative(v: Any): Boolean = v match {
    case None => true
    case s: Seq[_] => s.isEmpty
    case _ => false
  }
  private val cache = new graft.utils.Performance.TtlCache[Any](
    ttlSeconds = positiveTtl, clock = clock,
    normalizeKeys = false) // keys are case-sensitive identifiers, not SQL
  private def memo[V](key: String)(compute: => V): V =
    cache.getOrElseUpdateWithTtl(key) {
      val v = compute
      (v, if (isNegative(v)) negativeTtl else positiveTtl)
    }.asInstanceOf[V]

  override def onDemandPrice(it: String, region: String, os: String,
      tenancy: String): Option[Double] =
    memo(s"od|$it|$region|$os|$tenancy")(
      underlying.onDemandPrice(it, region, os, tenancy))
  override def reservedPrice(it: String, region: String, termYears: Int,
      paymentOption: String): Option[(Double, Double)] =
    memo(s"ri|$it|$region|$termYears|$paymentOption")(
      underlying.reservedPrice(it, region, termYears, paymentOption))
  override def spotPrice(it: String, region: String): Option[Double] =
    memo(s"spot|$it|$region")(underlying.spotPrice(it, region))
  override def spotPriceHistory(it: String, region: String, daysBack: Int,
      asOf: java.time.LocalDate): Seq[SpotPricePoint] =
    memo(s"hist|$it|$region|$daysBack|$asOf")(
      underlying.spotPriceHistory(it, region, daysBack, asOf))
  override def savingsPlanRate(it: String, region: String,
      planType: String): Option[Double] =
    memo(s"sp|$it|$region|$planType")(
      underlying.savingsPlanRate(it, region, planType))
  override def rdsPrice(ic: String, region: String,
      engine: String): Option[Double] =
    memo(s"rds|$ic|$region|$engine")(underlying.rdsPrice(ic, region, engine))
  override def instanceAttributes(it: String): Option[InstanceAttrs] =
    memo(s"attrs|$it")(underlying.instanceAttributes(it))
}

object PricingTables {

  /** Register the reference's named API tables in one call — the
    * "API data sources enabled" surface (reference README.md:585-592:
    * aws_pricing, aws_rds_pricing, aws_savings_plans,
    * aws_savings_plans_rates; spot_price_history is this build's bonus).
    * Every table is driver-built and broadcast-size; CUR joins see the
    * same names the reference documents. `asOf` is REQUIRED (no now()
    * default at this seam — the CLAUDE.md determinism contract: two
    * sessions registering on different days must be able to build
    * identical spot history by injecting the same date). The enable
    * flags mirror the reference's config split (pricing vs
    * savings-plans vs rate detail) so config-driven callers
    * ([[graft.GraftFinOpsEngine]]) register through THIS seam rather
    * than re-implementing the fan-out. */
  def registerApiTables(spark: SparkSession, src: PricingSource,
      instanceTypes: Seq[String], regions: Seq[String],
      asOf: java.time.LocalDate,
      rdsClasses: Seq[String] = Seq.empty,
      savingsPlanArns: Seq[String] = Seq.empty,
      spotDaysBack: Int = 7,
      enablePricing: Boolean = true,
      enableSavingsPlans: Boolean = true,
      includeRates: Boolean = true): Unit = {
    if (enablePricing) {
      registerPricingTable(spark, src, instanceTypes, regions)
      // spot history needs an EC2-scoped source; the Price List client
      // deliberately throws UnsupportedOperationException for it
      // (AwsPricingClient.spotPriceHistory) — skip that one view rather
      // than failing the whole registration for sources without spot
      try registerSpotHistoryTable(spark, src, instanceTypes, regions,
        spotDaysBack, asOf)
      catch {
        case e: UnsupportedOperationException =>
          Console.err.println(
            s"[graft] spot_price_history not registered: ${e.getMessage}")
      }
      registerRdsPricingTable(spark, src,
        if (rdsClasses.nonEmpty) rdsClasses else instanceTypes.map("db." + _), regions)
    }
    if (enableSavingsPlans) {
      registerSavingsPlansTable(spark, savingsPlanArns)
      if (includeRates)
        registerSavingsPlansRatesTable(spark, src, instanceTypes, regions,
          savingsPlanArns)
    }
  }
  /** Bulk pricing matrix → `aws_pricing` temp view (README.md:585-589,
    * S17): one row per (instance_type, region, os, tenancy). Built on the
    * driver (the matrix is tiny) and broadcast into CUR joins. */
  def registerPricingTable(spark: SparkSession, src: PricingSource,
      instanceTypes: Seq[String], regions: Seq[String],
      oses: Seq[String] = Seq("Linux"), tenancies: Seq[String] = Seq("Shared")): DataFrame = {
    val rows = for {
      it <- instanceTypes; r <- regions; os <- oses; t <- tenancies
      p <- src.onDemandPrice(it, r, os, t)
    } yield (it, r, os, t, p)
    val df = spark.createDataFrame(rows)
      .toDF("instance_type", "region_code", "operating_system", "tenancy", "price_per_hour_usd")
    df.createOrReplaceTempView("aws_pricing")
    df
  }

  /** Spot history → `spot_price_history` temp view so price-over-time
    * joins/windows run in SQL (aws_pricing_manager.py:447-488, S15). */
  def registerSpotHistoryTable(spark: SparkSession, src: PricingSource,
      instanceTypes: Seq[String], regions: Seq[String], daysBack: Int = 7,
      asOf: java.time.LocalDate): DataFrame = {
    val rows = for {
      it <- instanceTypes; r <- regions
      p <- src.spotPriceHistory(it, r, daysBack, asOf)
    } yield (p.timestamp, p.availabilityZone, p.instanceType,
      p.productDescription, p.spotPrice)
    val df = spark.createDataFrame(rows)
      .toDF("timestamp", "availability_zone", "instance_type",
        "product_description", "spot_price")
    df.createOrReplaceTempView("spot_price_history")
    df
  }

  /** `aws_savings_plans` fixture-shaped table (api_data_examples.py:101-112). */
  def registerSavingsPlansTable(spark: SparkSession, arns: Seq[String]): DataFrame = {
    val rows = arns.zipWithIndex.map { case (arn, i) =>
      (arn, 0.5 + 0.1 * i, if (i % 2 == 0) "Compute" else "EC2Instance",
        if (i % 3 == 0) "All Upfront" else "No Upfront", if (i % 2 == 0) 1 else 3)
    }
    val df = spark.createDataFrame(rows)
      .toDF("savings_plan_arn", "commitment_amount_hourly", "savings_plan_type",
        "payment_option", "term_duration_years")
    df.createOrReplaceTempView("aws_savings_plans")
    df
  }

  /** RDS pricing matrix → `aws_rds_pricing` temp view (reference
    * README.md:590: join columns instance_class, region_code,
    * database_engine). Same driver-built broadcast-size shape as
    * [[registerPricingTable]]. */
  def registerRdsPricingTable(spark: SparkSession, src: PricingSource,
      instanceClasses: Seq[String], regions: Seq[String],
      engines: Seq[String] = Seq("MySQL", "PostgreSQL")): DataFrame = {
    val rows = for {
      ic <- instanceClasses; r <- regions; e <- engines
      p <- src.rdsPrice(ic, r, e)
    } yield (ic, r, e, p)
    val df = spark.createDataFrame(rows)
      .toDF("instance_class", "region_code", "database_engine",
        "price_per_hour_usd")
    df.createOrReplaceTempView("aws_rds_pricing")
    df
  }

  /** Per-(instance_type, region, plan) SP rate detail →
    * `aws_savings_plans_rates` temp view (reference README.md:592: join
    * columns instance_type, region, savings_plan_id) — the rate-level
    * companion of the plan-level `aws_savings_plans`. The exposed
    * `savings_plan_type` column uses the SAME encoding as the plan-level
    * table ('Compute'/'EC2Instance', same i%2 parity per plan id), so
    * cross-table predicates on the type match; the longer API strings
    * ('ComputeSavingsPlans'/...) stay internal to the rate lookup. */
  def registerSavingsPlansRatesTable(spark: SparkSession, src: PricingSource,
      instanceTypes: Seq[String], regions: Seq[String],
      planIds: Seq[String]): DataFrame = {
    val rows = for {
      (pid, i) <- planIds.zipWithIndex
      planType = if (i % 2 == 0) "Compute" else "EC2Instance"
      it <- instanceTypes; r <- regions
      rate <- src.savingsPlanRate(it, r, planType + "SavingsPlans")
    } yield (it, r, pid, planType, rate)
    val df = spark.createDataFrame(rows)
      .toDF("instance_type", "region", "savings_plan_id", "savings_plan_type",
        "rate_per_hour_usd")
    df.createOrReplaceTempView("aws_savings_plans_rates")
    df
  }
}
