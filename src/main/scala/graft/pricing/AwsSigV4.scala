package graft.pricing

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, pure JDK (MessageDigest +
  * Mac) — the piece that turns [[AwsPricingClient]] from a mock into a
  * real client without adding the AWS SDK as a dependency. Implements the
  * published algorithm (canonical request → string to sign → derived
  * signing key → signature); verified in `PricingSpec` against the worked
  * example from the public SigV4 documentation (IAM ListUsers,
  * 20150830T123600Z), whose expected hashes were additionally re-derived
  * with an independent implementation.
  */
object AwsSigV4 {

  final case class Credentials(accessKeyId: String, secretAccessKey: String,
      sessionToken: Option[String] = None)

  def sha256Hex(data: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(data)
      .map(b => f"$b%02x").mkString

  def hmacSha256(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** Canonical request per the spec: method, URI, sorted query string,
    * canonical headers (lowercase, trimmed, sorted, trailing \n), signed
    * header list, payload hash. `headers` values must already be the
    * exact wire values. */
  def canonicalRequest(method: String, uri: String, query: Seq[(String, String)],
      headers: Seq[(String, String)], payload: Array[Byte]): String = {
    // Sort by (encoded key, encoded value) PAIRS, not the joined "k=v"
    // strings: '%' sorts before '=', so prefix-sharing keys (e.g. "a b"
    // encoding to "a%20b" vs "a") would order wrongly under string sort.
    val canonicalQuery = query
      .map { case (k, v) => (uriEncode(k), uriEncode(v)) }
      .sorted
      .map { case (k, v) => s"$k=$v" }.mkString("&")
    val sortedHeaders = headers
      .map { case (k, v) => k.toLowerCase -> v.trim }
      .sortBy(_._1)
    val canonicalHeaders = sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sortedHeaders.map(_._1).mkString(";")
    Seq(method, uri, canonicalQuery, canonicalHeaders, signedHeaders,
      sha256Hex(payload)).mkString("\n")
  }

  def signedHeaderList(headers: Seq[(String, String)]): String =
    headers.map(_._1.toLowerCase).sorted.mkString(";")

  def stringToSign(amzDate: String, dateStamp: String, region: String,
      service: String, canonicalReq: String): String =
    Seq("AWS4-HMAC-SHA256", amzDate,
      s"$dateStamp/$region/$service/aws4_request",
      sha256Hex(canonicalReq.getBytes(UTF_8))).mkString("\n")

  /** kSigning = HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date), region),
    * service), "aws4_request"). */
  def signingKey(secret: String, dateStamp: String, region: String,
      service: String): Array[Byte] = {
    val kDate = hmacSha256(s"AWS4$secret".getBytes(UTF_8), dateStamp)
    val kRegion = hmacSha256(kDate, region)
    val kService = hmacSha256(kRegion, service)
    hmacSha256(kService, "aws4_request")
  }

  def signature(secret: String, dateStamp: String, region: String,
      service: String, toSign: String): String =
    signingKey(secret, dateStamp, region, service)
      .pipe(k => hmacSha256(k, toSign)).map(b => f"$b%02x").mkString

  /** Full Authorization header value for a request. */
  def authorizationHeader(creds: Credentials, amzDate: String, region: String,
      service: String, method: String, uri: String, query: Seq[(String, String)],
      headers: Seq[(String, String)], payload: Array[Byte]): String = {
    val dateStamp = amzDate.take(8)
    val cr = canonicalRequest(method, uri, query, headers, payload)
    val sts = stringToSign(amzDate, dateStamp, region, service, cr)
    val sig = signature(creds.secretAccessKey, dateStamp, region, service, sts)
    s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$dateStamp/$region/$service/aws4_request, " +
      s"SignedHeaders=${signedHeaderList(headers)}, Signature=$sig"
  }

  /** RFC 3986 encoding with AWS's unreserved set (A-Za-z0-9-._~). */
  def uriEncode(s: String): String =
    s.flatMap {
      case c if (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || "-._~".contains(c) => c.toString
      case c => c.toString.getBytes(UTF_8).map(b => f"%%${b}%02X").mkString
    }

  private implicit class Piped[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
