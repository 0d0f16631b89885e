package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant

/** auth.py:9-46 semantics under an injected clock, plus the credential →
  * S3A storage-options mapping (auth.py:103-165 twin). Pure JVM — no
  * Spark session needed. */
class AwsAuthSpec extends AnyFunSuite {

  private val now = Instant.parse("2025-01-15T10:00:00Z")

  test("no expiration → silent (permanent credentials)") {
    assert(AwsAuth.checkCredentialExpiration(None, now) == AwsAuth.NoExpiration)
    assert(AwsAuth.checkCredentialExpiration(Some(""), now) == AwsAuth.NoExpiration)
  }

  test("expired credentials warn with the expiry time") {
    val st = AwsAuth.checkCredentialExpiration(Some("2025-01-15T09:59:00Z"), now)
    assert(st.isInstanceOf[AwsAuth.Expired])
    assert(st.message.exists(_.contains("expired at")))
  }

  test("<=5 minutes → warning with minutes left (reference 300s threshold)") {
    val st = AwsAuth.checkCredentialExpiration(Some("2025-01-15T10:04:30Z"), now)
    st match {
      case AwsAuth.ExpiringSoon(m, _) => assert(m == 4)
      case other => fail(s"expected ExpiringSoon, got $other")
    }
    assert(st.message.exists(_.contains("Consider refreshing")))
  }

  test("<=15 minutes → info (reference 900s threshold); beyond → valid, silent") {
    val info = AwsAuth.checkCredentialExpiration(Some("2025-01-15T10:12:00Z"), now)
    assert(info.isInstanceOf[AwsAuth.ExpiringInfo])
    assert(info.message.exists(_.startsWith("INFO")))
    val ok = AwsAuth.checkCredentialExpiration(Some("2025-01-15T12:00:00Z"), now)
    assert(ok.isInstanceOf[AwsAuth.Valid])
    assert(ok.message.isEmpty)
  }

  test("boundary: exactly at expiry counts as expired (<= 0 seconds)") {
    val st = AwsAuth.checkCredentialExpiration(Some("2025-01-15T10:00:00Z"), now)
    assert(st.isInstanceOf[AwsAuth.Expired])
  }

  test("parses Z suffix, explicit offset, and naive-as-UTC (auth.py:19-27)") {
    val z = AwsAuth.parseExpiration("2025-01-15T10:30:00Z").get
    val off = AwsAuth.parseExpiration("2025-01-15T11:30:00+01:00").get
    val naive = AwsAuth.parseExpiration("2025-01-15T10:30:00").get
    assert(z.toInstant == off.toInstant)
    assert(z.toInstant == naive.toInstant)
  }

  test("unparseable timestamps degrade to a warning, never throw (auth.py:44-46)") {
    val st = AwsAuth.checkCredentialExpiration(Some("not-a-date"), now)
    st match {
      case AwsAuth.Unparseable(raw, _) => assert(raw == "not-a-date")
      case other => fail(s"expected Unparseable, got $other")
    }
    assert(st.message.exists(_.contains("ISO 8601")))
  }

  test("explicit static keys map to fs.s3a access/secret") {
    val opts = AwsAuth.storageOptions(AwsAuth.Credentials(
      region = Some("us-east-1"), accessKeyId = Some("AKID"),
      secretAccessKey = Some("SECRET")))
    assert(opts("fs.s3a.access.key") == "AKID")
    assert(opts("fs.s3a.secret.key") == "SECRET")
    assert(opts("fs.s3a.endpoint.region") == "us-east-1")
    assert(!opts.contains("fs.s3a.aws.credentials.provider"))
  }

  test("session token adds the temporary-credentials provider") {
    val opts = AwsAuth.storageOptions(AwsAuth.Credentials(
      accessKeyId = Some("AKID"), secretAccessKey = Some("SECRET"),
      sessionToken = Some("TOKEN")))
    assert(opts("fs.s3a.session.token") == "TOKEN")
    assert(opts("fs.s3a.aws.credentials.provider")
      .endsWith("TemporaryAWSCredentialsProvider"))
  }

  test("role assumption maps to S3A AssumedRoleCredentialProvider (auto-renew)") {
    val opts = AwsAuth.storageOptions(AwsAuth.Credentials(
      roleArn = Some("arn:aws:iam::123456789012:role/reader"),
      externalId = Some("ext-1")))
    assert(opts("fs.s3a.aws.credentials.provider")
      .endsWith("AssumedRoleCredentialProvider"))
    assert(opts("fs.s3a.assumed.role.arn").endsWith("role/reader"))
    assert(opts("fs.s3a.assumed.role.external.id") == "ext-1")
  }

  test("no credential material → empty map (S3A default chain, auth.py:99-100)") {
    assert(AwsAuth.storageOptions(AwsAuth.Credentials()).isEmpty)
  }

  test("applyStorageOptions writes onto a Hadoop configuration") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    AwsAuth.applyStorageOptions(conf, AwsAuth.Credentials(
      accessKeyId = Some("AKID"), secretAccessKey = Some("SECRET")))
    assert(conf.get("fs.s3a.access.key") == "AKID")
  }

  test("a partial static pair is emitted as-is, not silently dropped (auth.py:117-122)") {
    val lone = AwsAuth.storageOptions(AwsAuth.Credentials(
      accessKeyId = Some("AKID"), profile = Some("should-not-win")))
    assert(lone("fs.s3a.access.key") == "AKID")
    assert(!lone.contains("fs.s3a.secret.key"))
    // the incomplete pair takes the static branch — no fall-through to profile
    assert(!lone.contains("fs.s3a.aws.credentials.provider"))
    val loneSecret = AwsAuth.storageOptions(AwsAuth.Credentials(
      secretAccessKey = Some("SECRET")))
    assert(loneSecret("fs.s3a.secret.key") == "SECRET")
    assert(!loneSecret.contains("fs.s3a.access.key"))
  }

  test("storageOptionsForBucket rewrites every key to the per-bucket namespace") {
    val opts = AwsAuth.storageOptionsForBucket(AwsAuth.Credentials(
      region = Some("us-east-1"), accessKeyId = Some("AKID"),
      secretAccessKey = Some("SECRET"), sessionToken = Some("TOKEN")),
      "my-bucket")
    assert(opts("fs.s3a.bucket.my-bucket.access.key") == "AKID")
    assert(opts("fs.s3a.bucket.my-bucket.session.token") == "TOKEN")
    assert(opts("fs.s3a.bucket.my-bucket.endpoint.region") == "us-east-1")
    // nothing escapes the bucket scope
    assert(opts.keys.forall(_.startsWith("fs.s3a.bucket.my-bucket.")))
  }
}
