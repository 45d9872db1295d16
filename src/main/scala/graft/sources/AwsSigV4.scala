package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, implemented from the
  * public specification (docs.aws.amazon.com/IAM/latest/UserGuide/
  * create-signed-request.html) over JDK crypto only — this sandbox
  * carries no AWS SDK jars, and the algorithm is small enough that a
  * from-spec implementation with the documented known-answer vector
  * pinned in tests (AwsOcrClientSpec) is the more auditable path.
  *
  * Canonical request → string-to-sign → derived signing key → HMAC,
  * exactly the four documented steps. Pure functions of their
  * inputs (timestamp passed in), so the replay test server can
  * recompute and verify every signature the client sends.
  */
object AwsSigV4 {

  final case class Credentials(accessKey: String, secretKey: String,
                               sessionToken: Option[String] = None)

  private val AMZ_DATE = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
    .withZone(ZoneOffset.UTC)
  private val DATE_ONLY = DateTimeFormatter.ofPattern("yyyyMMdd")
    .withZone(ZoneOffset.UTC)

  def amzDate(t: Instant): String = AMZ_DATE.format(t)
  def dateStamp(t: Instant): String = DATE_ONLY.format(t)

  def sha256Hex(data: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(data))

  def sha256Hex(s: String): String = sha256Hex(s.getBytes(UTF_8))

  val EMPTY_PAYLOAD_HASH: String = sha256Hex(Array.emptyByteArray)

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  /** RFC 3986 encode with AWS's unreserved set; '/' preserved only
    * when encoding a path. Uppercase percent escapes per the spec. */
  def uriEncode(s: String, encodeSlash: Boolean = true): String = {
    val sb = new StringBuilder
    for (b <- s.getBytes(UTF_8)) {
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) sb.append(c)
      else if (c == '/' && !encodeSlash) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Canonical query string: keys and values uri-encoded, sorted by
    * encoded key then encoded value, joined k=v with '&'. */
  def canonicalQuery(params: Seq[(String, String)]): String =
    params.map { case (k, v) => (uriEncode(k), uriEncode(v)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Canonical headers block + signed-headers list: lowercase names,
    * trimmed values with internal runs of spaces collapsed, sorted. */
  def canonicalHeaders(headers: Seq[(String, String)])
      : (String, String) = {
    val norm = headers
      .map { case (k, v) =>
        (k.toLowerCase, v.trim.replaceAll("\\s+", " ")) }
      .sortBy(_._1)
    (norm.map { case (k, v) => s"$k:$v\n" }.mkString,
      norm.map(_._1).mkString(";"))
  }

  def canonicalRequest(method: String, canonicalUri: String,
                       query: Seq[(String, String)],
                       headers: Seq[(String, String)],
                       payloadHash: String): (String, String) = {
    val (ch, signed) = canonicalHeaders(headers)
    (Seq(method, canonicalUri, canonicalQuery(query), ch, signed,
      payloadHash).mkString("\n"), signed)
  }

  def credentialScope(t: Instant, region: String, service: String): String =
    s"${dateStamp(t)}/$region/$service/aws4_request"

  def stringToSign(t: Instant, region: String, service: String,
                   canonicalRequestText: String): String =
    Seq("AWS4-HMAC-SHA256", amzDate(t),
      credentialScope(t, region, service),
      sha256Hex(canonicalRequestText)).mkString("\n")

  def signingKey(secretKey: String, t: Instant, region: String,
                 service: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secretKey).getBytes(UTF_8), dateStamp(t))
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    hmac(kService, "aws4_request")
  }

  def signature(secretKey: String, t: Instant, region: String,
                service: String, canonicalRequestText: String): String =
    hex(hmac(signingKey(secretKey, t, region, service),
      stringToSign(t, region, service, canonicalRequestText)))

  /** Full Authorization header value for a request whose headers
    * already include host and x-amz-date (and x-amz-content-sha256 /
    * x-amz-security-token where applicable). */
  def authorization(creds: Credentials, t: Instant, region: String,
                    service: String, method: String, canonicalUri: String,
                    query: Seq[(String, String)],
                    headers: Seq[(String, String)],
                    payloadHash: String): String = {
    val (cr, signedHeaders) =
      canonicalRequest(method, canonicalUri, query, headers, payloadHash)
    val sig = signature(creds.secretKey, t, region, service, cr)
    s"AWS4-HMAC-SHA256 Credential=${creds.accessKey}/" +
      s"${credentialScope(t, region, service)}, " +
      s"SignedHeaders=$signedHeaders, Signature=$sig"
  }
}
