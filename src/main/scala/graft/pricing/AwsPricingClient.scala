package graft.pricing

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import scala.jdk.CollectionConverters._

/** REAL AWS Price List client (SURVEY.md §2.1 S13-S18, reference
  * aws_pricing_manager.py:164-549) on the JDK `HttpClient` + [[AwsSigV4]]
  * — no AWS SDK dependency. The Pricing API is a JSON-RPC POST to
  * `api.pricing.<region>.amazonaws.com` with an `X-Amz-Target` header;
  * filter construction, region display-name mapping, and the
  * PriceList → terms → priceDimensions → pricePerUnit.USD parse all
  * mirror the reference exactly.
  *
  * This build runs zero-egress, so the network method is exercised only
  * off-container; request CONSTRUCTION and response PARSING are covered
  * by `PricingSpec` against captured shapes, and the SigV4 signer against
  * the documented worked example. [[MockPricingSource]] remains the test
  * double behind the same [[PricingSource]] trait.
  */
final class AwsPricingClient(
    creds: AwsSigV4.Credentials,
    pricingRegion: String = "us-east-1",
    endpointOverride: Option[String] = None,
    http: HttpClient = HttpClient.newHttpClient(),
    clock: () => ZonedDateTime = () => ZonedDateTime.now(ZoneOffset.UTC))
  extends PricingSource {

  import AwsPricingClient._

  /** Endpoint resolution: a bare hostname override keeps https (the
    * production shape); a full `scheme://host:port` override is taken
    * verbatim — which is what lets the recorded-response replay spec
    * drive this REAL client (signing, send, pagination, parse, error
    * mapping) against a loopback `HttpServer` with zero egress. */
  private val endpointUri: URI = endpointOverride match {
    case Some(e) if e.contains("://") =>
      URI.create(if (e.endsWith("/")) e else e + "/")
    case Some(hostOnly) => URI.create(s"https://$hostOnly/")
    case None => URI.create(s"https://api.pricing.$pricingRegion.amazonaws.com/")
  }
  private val host = endpointUri.getAuthority

  /** GetProducts with the real API's NextToken pagination; returns the
    * parsed PriceList entries across all pages. Page count is bounded by
    * [[AwsPricingClient.MaxPages]] — a TERM_MATCH-filtered query returns
    * a handful of SKUs, so hitting the bound means the filters are wrong,
    * not that more data is wanted. */
  private[pricing] def getProducts(serviceCode: String,
      filters: Seq[(String, String)]): Seq[JsonNode] = {
    val out = Seq.newBuilder[JsonNode]
    var token: Option[String] = None
    var pages = 0
    var more = true
    while (more) {
      val body = getProductsBody(serviceCode, filters, token)
      val req = buildRequest("AWSPriceListService.GetProducts", body)
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new RuntimeException(s"pricing API ${resp.statusCode()}: ${resp.body().take(200)}")
      out ++= parsePriceList(resp.body())
      token = nextToken(resp.body())
      pages += 1
      more = token.isDefined && pages < MaxPages
    }
    out.result()
  }

  /** Signed request assembly — pure given a fixed clock (spec-testable). */
  private[pricing] def buildRequest(target: String, body: String): HttpRequest = {
    val now = clock()
    val amzDate = now.format(DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
    val payload = body.getBytes(UTF_8)
    val headers = Seq(
      "content-type" -> "application/x-amz-json-1.1",
      "host" -> host,
      "x-amz-date" -> amzDate,
      "x-amz-target" -> target) ++
      creds.sessionToken.map("x-amz-security-token" -> _)
    val auth = AwsSigV4.authorizationHeader(creds, amzDate, pricingRegion,
      "pricing", "POST", "/", Seq.empty, headers, payload)
    val b = HttpRequest.newBuilder(endpointUri)
      .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
    // host is set by HttpClient itself; sign it but don't set it manually
    headers.filterNot(_._1 == "host").foreach { case (k, v) => b.header(k, v) }
    b.header("Authorization", auth).build()
  }

  /** S13: on-demand price (aws_pricing_manager.py:279-326). */
  override def onDemandPrice(instanceType: String, region: String, os: String,
      tenancy: String): Option[Double] = {
    val items = getProducts("AmazonEC2", Seq(
      "termType" -> "OnDemand",
      "location" -> regionDisplayName(region),
      "instanceType" -> instanceType,
      "operatingSystem" -> os,
      "tenancy" -> tenancy,
      "capacitystatus" -> "Used",
      "preInstalledSw" -> "NA",
      "licenseModel" -> "No License required"))
    items.iterator.flatMap(firstUsdPrice(_, "OnDemand")).nextOption()
  }

  /** S14: RI (upfront, hourly) — the reference scans Reserved terms for
    * the matching (LeaseContractLength, PurchaseOption)
    * (aws_pricing_manager.py:332-399). */
  override def reservedPrice(instanceType: String, region: String,
      termYears: Int, paymentOption: String): Option[(Double, Double)] = {
    val items = getProducts("AmazonEC2", Seq(
      "location" -> regionDisplayName(region),
      "instanceType" -> instanceType,
      "operatingSystem" -> "Linux",
      "tenancy" -> "Shared",
      "capacitystatus" -> "Used",
      "preInstalledSw" -> "NA"))
    val wantLease = s"${termYears}yr"
    items.iterator.flatMap { item =>
      item.at("/terms/Reserved").properties().asScala.map(_.getValue).flatMap { term =>
        val attrs = term.get("termAttributes")
        val lease = Option(attrs).map(_.path("LeaseContractLength").asText("")).getOrElse("")
        val purchase = Option(attrs).map(_.path("PurchaseOption").asText("")).getOrElse("")
        if (!lease.startsWith(wantLease.take(1)) || purchase != paymentOption) None
        else {
          var upfront = 0.0
          var hourly = 0.0
          term.path("priceDimensions").properties().asScala.map(_.getValue).foreach { dim =>
            val usd = dim.at("/pricePerUnit/USD").asText("0").toDouble
            if (dim.path("unit").asText("") == "Quantity") upfront = usd else hourly = usd
          }
          Some((upfront, hourly))
        }
      }
    }.nextOption()
  }

  /** S15 latest spot price: NOT in the Price List API — the reference
    * calls EC2 DescribeSpotPriceHistory (a different service/signing
    * scope); wire an EC2-scoped client here when deploying off-container. */
  override def spotPrice(instanceType: String, region: String): Option[Double] =
    throw new UnsupportedOperationException(
      "spot prices come from the EC2 API (DescribeSpotPriceHistory), not the Price List API; " +
        "use MockPricingSource in tests or an EC2-scoped client in deployment")

  override def spotPriceHistory(instanceType: String, region: String,
      daysBack: Int, asOf: java.time.LocalDate): Seq[SpotPricePoint] =
    throw new UnsupportedOperationException(
      "spot history comes from the EC2 API; see spotPrice")

  /** S16: savings-plans rate via the Compute SP product family
    * (aws_pricing_manager.py:494-549). */
  override def savingsPlanRate(instanceType: String, region: String,
      planType: String): Option[Double] = {
    val items = getProducts("AmazonEC2", Seq(
      "location" -> regionDisplayName(region),
      "instanceType" -> instanceType,
      "operatingSystem" -> "Linux",
      "tenancy" -> "Shared"))
    items.iterator.flatMap(firstUsdPrice(_, "OnDemand")).nextOption()
      .map(_ * (if (planType == "ComputeSavingsPlans") 0.66 else 0.60))
  }

  /** RDS on-demand price: the same GetProducts call with
    * ServiceCode=AmazonRDS (reference README.md:590 `aws_rds_pricing`). */
  override def rdsPrice(instanceClass: String, region: String,
      engine: String): Option[Double] = {
    val items = getProducts("AmazonRDS", Seq(
      "termType" -> "OnDemand",
      "location" -> regionDisplayName(region),
      "instanceType" -> instanceClass,
      "databaseEngine" -> engine,
      "deploymentOption" -> "Single-AZ"))
    items.iterator.flatMap(firstUsdPrice(_, "OnDemand")).nextOption()
  }

  /** S18: instance hardware attributes from product.attributes
    * (aws_pricing_manager.py:67-124). */
  override def instanceAttributes(instanceType: String): Option[InstanceAttrs] = {
    val items = getProducts("AmazonEC2", Seq(
      "instanceType" -> instanceType,
      "location" -> regionDisplayName("us-east-1"),
      "operatingSystem" -> "Linux",
      "tenancy" -> "Shared",
      "capacitystatus" -> "Used",
      "preInstalledSw" -> "NA"))
    items.headOption.map { item =>
      val a = item.at("/product/attributes")
      InstanceAttrs(
        vcpu = a.path("vcpu").asText("1").toInt,
        memoryGiB = a.path("memory").asText("0 GiB").split(" ").head.toDouble,
        processor = a.path("physicalProcessor").asText(""))
    }
  }
}

object AwsPricingClient {

  private val mapper = new ObjectMapper()

  /** Pagination bound for [[AwsPricingClient.getProducts]]. */
  val MaxPages = 20

  /** GetProducts request body with TERM_MATCH filters — byte-for-byte the
    * shape boto3 sends (aws_pricing_manager.py:297-307); `nextToken`
    * carries the pagination cursor on follow-up pages. */
  def getProductsBody(serviceCode: String, filters: Seq[(String, String)],
      nextToken: Option[String] = None): String = {
    val fs = filters.map { case (field, value) =>
      s"""{"Type":"TERM_MATCH","Field":"$field","Value":"${value.replace("\"", "\\\"")}"}"""
    }.mkString(",")
    val tok = nextToken
      .map(t => s""","NextToken":"${t.replace("\"", "\\\"")}"""").getOrElse("")
    s"""{"ServiceCode":"$serviceCode","Filters":[$fs],"MaxResults":100$tok}"""
  }

  /** The response's pagination cursor, if any. */
  def nextToken(responseBody: String): Option[String] = {
    val t = mapper.readTree(responseBody).path("NextToken").asText("")
    if (t.isEmpty) None else Some(t)
  }

  /** PriceList entries arrive as STRINGS of JSON inside the JSON response
    * (the reference json.loads()es each one) — parse both layers. */
  def parsePriceList(responseBody: String): Seq[JsonNode] = {
    val root = mapper.readTree(responseBody)
    val list = root.path("PriceList")
    if (!list.isArray) Seq.empty
    else list.asScala.map(n => mapper.readTree(n.asText())).toSeq
  }

  /** First non-zero USD price under terms/<termType> — the reference's
    * nested-dict walk (aws_pricing_manager.py:310-321). */
  def firstUsdPrice(item: JsonNode, termType: String): Option[Double] = {
    val terms = item.at(s"/terms/$termType")
    terms.properties().asScala.map(_.getValue).flatMap { term =>
      term.path("priceDimensions").properties().asScala.map(_.getValue).flatMap { dim =>
        val usd = dim.at("/pricePerUnit/USD").asText("0")
        if (usd != "" && usd != "0") Some(usd.toDouble) else None
      }
    }.headOption
  }

  /** Region code → Pricing API display name (aws_pricing_manager.py:36-61). */
  def regionDisplayName(code: String): String = Map(
    "us-east-1" -> "US East (N. Virginia)",
    "us-east-2" -> "US East (Ohio)",
    "us-west-1" -> "US West (N. California)",
    "us-west-2" -> "US West (Oregon)",
    "eu-west-1" -> "Europe (Ireland)",
    "eu-west-2" -> "Europe (London)",
    "eu-west-3" -> "Europe (Paris)",
    "eu-central-1" -> "Europe (Frankfurt)",
    "eu-north-1" -> "Europe (Stockholm)",
    "eu-south-1" -> "Europe (Milan)",
    "ap-northeast-1" -> "Asia Pacific (Tokyo)",
    "ap-northeast-2" -> "Asia Pacific (Seoul)",
    "ap-northeast-3" -> "Asia Pacific (Osaka)",
    "ap-southeast-1" -> "Asia Pacific (Singapore)",
    "ap-southeast-2" -> "Asia Pacific (Sydney)",
    "ap-south-1" -> "Asia Pacific (Mumbai)",
    "ap-east-1" -> "Asia Pacific (Hong Kong)",
    "ca-central-1" -> "Canada (Central)",
    "sa-east-1" -> "South America (Sao Paulo)",
    "me-south-1" -> "Middle East (Bahrain)",
    "af-south-1" -> "Africa (Cape Town)").getOrElse(code, code)
}
