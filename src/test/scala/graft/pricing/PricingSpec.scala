package graft.pricing

import graft.SparkSpec
import java.time.LocalDate

/** Pricing-source surface (SURVEY.md §2.1 S13-S18) over the deterministic
  * mock: price shapes, the bulk matrix fan-out, spot history, and the
  * registered temp views joining into SQL. */
class PricingSpec extends SparkSpec {

  val src = new MockPricingSource
  val asOf: LocalDate = LocalDate.of(2025, 7, 15)

  test("on-demand, reserved, spot, and SP rates relate sanely") {
    val od = src.onDemandPrice("m5.large", "us-east-1", "Linux").get
    assert(od > 0)
    val (upfrontAll, hourlyAll) = src.reservedPrice("m5.large", "us-east-1", 3, "All Upfront").get
    assert(upfrontAll > 0 && hourlyAll == 0.0)
    val (upfrontNo, hourlyNo) = src.reservedPrice("m5.large", "us-east-1", 1, "No Upfront").get
    assert(upfrontNo == 0.0 && hourlyNo > 0 && hourlyNo < od)
    val spot = src.spotPrice("m5.large", "us-east-1").get
    assert(spot < od) // spot trades below on-demand
    assert(src.savingsPlanRate("m5.large", "us-east-1", "ComputeSavingsPlans").get < od)
    assert(src.instanceAttributes("m6g.xlarge").get.processor.contains("Graviton"))
  }

  test("spot price history is deterministic, bounded, and most-recent-first") {
    val h1 = src.spotPriceHistory("m5.large", "us-east-1", daysBack = 7, asOf = asOf)
    val h2 = src.spotPriceHistory("m5.large", "us-east-1", daysBack = 7, asOf = asOf)
    assert(h1 == h2) // no RNG
    assert(h1.size == 14) // 7 days x 2 AZs
    assert(h1.head.timestamp == "2025-07-15T00:00:00Z")
    assert(h1.last.timestamp == "2025-07-09T00:00:00Z")
    val latest = src.spotPrice("m5.large", "us-east-1").get
    h1.foreach { p =>
      assert(p.spotPrice >= latest * 0.9 - 1e-9 && p.spotPrice <= latest * 1.1 + 1e-9)
      assert(p.productDescription == "Linux/UNIX")
    }
  }

  test("bulk pricing matrix and spot history register as SQL views") {
    val types = Seq("m5.large", "c5.xlarge")
    val regions = Seq("us-east-1", "eu-west-1")
    val matrix = PricingTables.registerPricingTable(spark, src, types, regions)
    assert(matrix.count() == 4) // types x regions x Linux x Shared
    val hist = PricingTables.registerSpotHistoryTable(
      spark, src, types, regions, daysBack = 3, asOf = asOf)
    assert(hist.count() == 2 * 2 * 3 * 2) // types x regions x days x AZs
    // price-over-time analysis runs in SQL over the view
    val trend = spark.sql(
      """SELECT instance_type, availability_zone,
        |       min(spot_price) AS lo, max(spot_price) AS hi
        |FROM spot_price_history GROUP BY 1, 2""".stripMargin).collect()
    assert(trend.length == 8)
    trend.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
  }

  test("SigV4 signer reproduces the documented worked example") {
    // public SigV4 example: IAM ListUsers @ 20150830T123600Z. Expected
    // values also re-derived with an independent implementation.
    val headers = Seq(
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "host" -> "iam.amazonaws.com",
      "x-amz-date" -> "20150830T123600Z")
    val cr = AwsSigV4.canonicalRequest("GET", "/",
      Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers, Array.emptyByteArray)
    assert(AwsSigV4.sha256Hex(cr.getBytes("UTF-8")) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
    val sts = AwsSigV4.stringToSign("20150830T123600Z", "20150830",
      "us-east-1", "iam", cr)
    val sig = AwsSigV4.signature("wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      "20150830", "us-east-1", "iam", sts)
    assert(sig == "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("SigV4 canonical query sorts by encoded (key, value) pairs") {
    // '%' (0x25) < '=' (0x3D): under a joined-"k=v" string sort the key
    // "a b" (encoding to "a%20b") would wrongly sort BEFORE "a", because
    // "a%" < "a=". The spec orders by key, then value.
    val cr = AwsSigV4.canonicalRequest("GET", "/",
      Seq("a b" -> "1", "a" -> "2"), Seq("host" -> "x"), Array.emptyByteArray)
    val queryLine = cr.split("\n")(2)
    assert(queryLine == "a=2&a%20b=1")
    // duplicate keys order by value
    val cr2 = AwsSigV4.canonicalRequest("GET", "/",
      Seq("k" -> "zz", "k" -> "aa"), Seq("host" -> "x"), Array.emptyByteArray)
    assert(cr2.split("\n")(2) == "k=aa&k=zz")
  }

  test("SigV4 uri encoding uses the AWS unreserved set") {
    assert(AwsSigV4.uriEncode("AbZ09-._~") == "AbZ09-._~")
    assert(AwsSigV4.uriEncode("a b/c:d") == "a%20b%2Fc%3Ad") // space is %20, not +
    assert(AwsSigV4.uriEncode("é") == "%C3%A9") // UTF-8 bytes, uppercase hex
  }

  test("pricing client builds the boto3-shaped GetProducts request") {
    val body = AwsPricingClient.getProductsBody("AmazonEC2", Seq(
      "termType" -> "OnDemand", "instanceType" -> "m5.large"))
    assert(body.contains(""""ServiceCode":"AmazonEC2""""))
    assert(body.contains(""""Type":"TERM_MATCH","Field":"termType","Value":"OnDemand""""))
    val client = new AwsPricingClient(
      AwsSigV4.Credentials("AKIDEXAMPLE", "secret", sessionToken = Some("tok")),
      clock = () => java.time.ZonedDateTime.of(2025, 7, 15, 12, 0, 0, 0,
        java.time.ZoneOffset.UTC))
    val req = client.buildRequest("AWSPriceListService.GetProducts", body)
    assert(req.uri().toString == "https://api.pricing.us-east-1.amazonaws.com/")
    val h = req.headers()
    assert(h.firstValue("x-amz-target").get == "AWSPriceListService.GetProducts")
    assert(h.firstValue("x-amz-date").get == "20250715T120000Z")
    assert(h.firstValue("x-amz-security-token").get == "tok")
    val auth = h.firstValue("Authorization").get
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20250715/us-east-1/pricing/aws4_request"))
    assert(auth.contains(
      "SignedHeaders=content-type;host;x-amz-date;x-amz-security-token;x-amz-target"))
  }

  test("pricing client parses the double-encoded PriceList walk") {
    // PriceList items are JSON *strings* inside the JSON response, exactly
    // like the real API (the reference json.loads()es each one)
    val item =
      """{"product":{"attributes":{"vcpu":"2","memory":"8 GiB","physicalProcessor":"Intel Xeon"}},
        |"terms":{"OnDemand":{"T1":{"priceDimensions":{"D1":{"unit":"Hrs","pricePerUnit":{"USD":"0.096"}}}}}}}"""
        .stripMargin.replace("\n", "")
    val response = s"""{"PriceList":[${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(item)}]}"""
    val parsed = AwsPricingClient.parsePriceList(response)
    assert(parsed.size == 1)
    assert(AwsPricingClient.firstUsdPrice(parsed.head, "OnDemand").contains(0.096))
    assert(AwsPricingClient.firstUsdPrice(parsed.head, "Reserved").isEmpty)
    assert(AwsPricingClient.regionDisplayName("us-east-1") == "US East (N. Virginia)")
    assert(AwsPricingClient.regionDisplayName("mars-north-1") == "mars-north-1")
  }

  test("savings plans view joins against CUR-shaped ARNs") {
    val arns = Seq("arn:sp/1", "arn:sp/2")
    val df = PricingTables.registerSavingsPlansTable(spark, arns)
    assert(df.count() == 2)
    assert(spark.sql(
      "SELECT count(*) FROM aws_savings_plans WHERE term_duration_years IN (1, 3)")
      .head().getLong(0) == 2)
  }

  test("CachingPricingSource memoizes per key within the max-age window") {
    class Counting extends PricingSource {
      val m = new MockPricingSource
      var n = 0
      def onDemandPrice(it: String, r: String, os: String, t: String) = {
        n += 1; m.onDemandPrice(it, r, os, t)
      }
      def reservedPrice(it: String, r: String, y: Int, p: String) =
        m.reservedPrice(it, r, y, p)
      def spotPrice(it: String, r: String) = m.spotPrice(it, r)
      def spotPriceHistory(it: String, r: String, d: Int,
          a: java.time.LocalDate) = m.spotPriceHistory(it, r, d, a)
      def savingsPlanRate(it: String, r: String, p: String) =
        m.savingsPlanRate(it, r, p)
      def rdsPrice(ic: String, r: String, e: String) = m.rdsPrice(ic, r, e)
      def instanceAttributes(it: String) = m.instanceAttributes(it)
    }
    val underlying = new Counting
    var now = 0L
    val cached = new CachingPricingSource(underlying, maxAgeDays = 1,
      clock = () => now)
    val p1 = cached.onDemandPrice("m5.large", "us-east-1", "Linux", "Shared")
    val p2 = cached.onDemandPrice("m5.large", "us-east-1", "Linux", "Shared")
    assert(p1 == p2 && underlying.n == 1, "second lookup not served from cache")
    // distinct keys never alias
    cached.onDemandPrice("c5.xlarge", "us-east-1", "Linux", "Shared")
    assert(underlying.n == 2)
    // past the max age the entry refreshes
    now = 86400L * 1000L + 1L
    cached.onDemandPrice("m5.large", "us-east-1", "Linux", "Shared")
    assert(underlying.n == 3, "expired entry not refreshed")
  }

  test("CachingPricingSource gives negative results a short TTL, not maxAgeDays") {
    // a flaky underlying: None (transient failure shape) until healed
    class Flaky extends PricingSource {
      val m = new MockPricingSource
      var healed = false
      var n = 0
      def onDemandPrice(it: String, r: String, os: String, t: String) = {
        n += 1; if (healed) m.onDemandPrice(it, r, os, t) else None
      }
      def spotPriceHistory(it: String, r: String, d: Int,
          a: java.time.LocalDate) =
        if (healed) m.spotPriceHistory(it, r, d, a) else Seq.empty
      def reservedPrice(it: String, r: String, y: Int, p: String) =
        m.reservedPrice(it, r, y, p)
      def spotPrice(it: String, r: String) = m.spotPrice(it, r)
      def savingsPlanRate(it: String, r: String, p: String) =
        m.savingsPlanRate(it, r, p)
      def rdsPrice(ic: String, r: String, e: String) = m.rdsPrice(ic, r, e)
      def instanceAttributes(it: String) = m.instanceAttributes(it)
    }
    val underlying = new Flaky
    var now = 0L
    val cached = new CachingPricingSource(underlying, maxAgeDays = 1,
      clock = () => now)
    assert(cached.onDemandPrice("m5.large", "us-east-1", "Linux", "Shared").isEmpty)
    assert(cached.spotPriceHistory("m5.large", "us-east-1", 7,
      java.time.LocalDate.of(2026, 1, 1)).isEmpty)
    underlying.healed = true
    // inside the negative TTL the miss is still served from cache
    now = 200L * 1000L
    assert(cached.onDemandPrice("m5.large", "us-east-1", "Linux", "Shared").isEmpty,
      "negative entry must still memoize inside its short TTL")
    // past the negative TTL (300 s) — but far inside maxAgeDays — the
    // lookup retries the healed source and the price comes back
    now = 301L * 1000L
    assert(cached.onDemandPrice("m5.large", "us-east-1", "Linux", "Shared").nonEmpty,
      "healed price still pinned by a day-long negative entry")
    assert(cached.spotPriceHistory("m5.large", "us-east-1", 7,
      java.time.LocalDate.of(2026, 1, 1)).nonEmpty,
      "healed history still pinned by a day-long negative entry")
    // and the recovered POSITIVE value now lives the full maxAgeDays
    val n0 = underlying.n
    now = 86000L * 1000L
    assert(cached.onDemandPrice("m5.large", "us-east-1", "Linux", "Shared").nonEmpty)
    assert(underlying.n == n0, "positive entry should not refresh before maxAgeDays")
  }

  test("aws_rds_pricing registers with the reference's join columns") {
    val df = PricingTables.registerRdsPricingTable(spark, src,
      Seq("db.m5.large", "db.r5.xlarge"), Seq("us-east-1"))
    assert(df.count() == 4) // classes x regions x {MySQL, PostgreSQL}
    // deterministic mock: same key -> same price across calls
    val again = PricingTables.registerRdsPricingTable(spark, src,
      Seq("db.m5.large", "db.r5.xlarge"), Seq("us-east-1"))
    assert(df.collect().toSet == again.collect().toSet)
    // joins on the README's key columns (instance_class, region_code,
    // database_engine) from SQL
    val joined = spark.sql(
      """SELECT p.instance_class, p.price_per_hour_usd
        |FROM aws_rds_pricing p
        |WHERE p.region_code = 'us-east-1' AND p.database_engine = 'MySQL'""".stripMargin)
    assert(joined.count() == 2)
    joined.collect().foreach(r => assert(r.getAs[Double]("price_per_hour_usd") > 0))
  }

  test("aws_savings_plans_rates registers and joins plan-level to rate-level") {
    PricingTables.registerSavingsPlansTable(spark, Seq("arn:sp/1", "arn:sp/2"))
    val rates = PricingTables.registerSavingsPlansRatesTable(spark, src,
      Seq("m5.large", "c5.xlarge"), Seq("us-east-1"), Seq("arn:sp/1", "arn:sp/2"))
    assert(rates.count() == 4) // plans x types x regions
    // rate-level rows resolve their plan row (README join: savings_plan_id)
    val j = spark.sql(
      """SELECT r.instance_type, r.rate_per_hour_usd,
        |       r.savings_plan_type AS rt, p.savings_plan_type AS pt
        |FROM aws_savings_plans_rates r
        |JOIN aws_savings_plans p ON p.savings_plan_arn = r.savings_plan_id""".stripMargin)
    assert(j.count() == 4)
    j.collect().foreach { r =>
      assert(r.getAs[Double]("rate_per_hour_usd") > 0)
      // the two tables must agree on the type ENCODING for the same plan
      // (cross-table predicates like r.type = p.type must match)
      assert(r.getAs[String]("rt") == r.getAs[String]("pt"),
        s"type encoding diverged: ${r.getAs[String]("rt")} vs ${r.getAs[String]("pt")}")
    }
  }
}
