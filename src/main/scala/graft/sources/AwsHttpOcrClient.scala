package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{Duration, Instant}
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.sources.AwsSigV4.Credentials
import graft.sources.TextractConnector.OcrClient

/** Production [[OcrClient]] binding: S3 + Textract over their public
  * REST protocols (SigV4-signed `java.net.http` — this sandbox has
  * no AWS SDK jars, and the two calls the reference makes are plain
  * HTTPS), covering the reference's full transport surface:
  *
  *  - bucket-region resolution via GetBucketLocation with a
  *    per-bucket cache (/root/reference/lambda_function.py:32-35 —
  *    the Textract client must live in the bucket's region, :40-42);
  *  - HeadObject pre-flight (:798) so a missing key quarantines as
  *    a `missing-key:` error row, DISTINCT from a `FAILED` OCR job
  *    (the distinction the reference's single except block loses);
  *  - StartDocumentTextDetection / GetDocumentTextDetection
  *    (async-job start :47-52, poll :57-67, paginated fetch :72-79)
  *    as x-amz-json-1.1 posts.
  *
  * Throttling/5xx responses retry with exponential backoff on the
  * IDEMPOTENT calls only (status poll, page fetch, head, location);
  * StartDocumentTextDetection never retries — a blind retry could
  * start a duplicate billed OCR job (same reason speculation is off
  * for the fetch stage, SURVEY.md §7.4-6).
  *
  * Endpoints are injectable, so AwsOcrClientSpec drives the whole
  * client — signatures verified, poll and pagination sequencing,
  * both quarantine classes — against a local record/replay server
  * loaded with saved Textract JSON fixtures; no network needed.
  * Instances are Serializable (config only; the HTTP client is
  * rebuilt lazily per executor).
  */
class AwsHttpOcrClient(cfg: AwsHttpOcrClient.Config) extends OcrClient {
  import AwsHttpOcrClient._

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(cfg.connectTimeoutMs))
    .followRedirects(HttpClient.Redirect.NEVER)
    .build()

  @transient private lazy val mapper = new ObjectMapper()

  /** Credentials are re-resolved PER REQUEST (and per retry attempt),
    * never cached on the client: a session token can expire inside
    * the reference's 900 s poll window (lambda_function.py:57-67), so
    * a long-polling job must pick up a rotated token mid-flight. The
    * static Config fields are just the default provider. */
  private def credsNow: Credentials = cfg.credentialsProvider match {
    case Some(p) => p.current()
    case None => Credentials(cfg.accessKey, cfg.secretKey,
      cfg.sessionToken)
  }

  // ---------------------------------------------------------------- region

  /** Bucket region, resolved once per (endpoint, bucket) per JVM
    * (reference :32-35: empty LocationConstraint means us-east-1). */
  private[sources] def region: String = cfg.region.getOrElse {
    val key = s"${cfg.s3Endpoint.getOrElse("aws")}/${cfg.bucket}"
    regionCache.computeIfAbsent(key, _ => resolveRegion())
  }

  private def resolveRegion(): String = {
    // GetBucketLocation is served by the global endpoint and signed
    // against us-east-1 (the one request legal to sign before the
    // bucket's region is known).
    val (host, uri) = s3HostAndPath("", global = true)
    val resp = send(() => signedS3Request("GET", host, uri,
      query = Seq("location" -> ""), body = Array.emptyByteArray,
      signRegion = "us-east-1"), retryable = true)
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"GetBucketLocation failed: HTTP ${resp.statusCode()}")
    val xml = new String(resp.body(), UTF_8)
    val m = LOCATION_RE.findFirstMatchIn(xml)
    m.map(_.group(1).trim).filter(_.nonEmpty) match {
      case Some("EU")  => "eu-west-1" // legacy constraint name
      case Some(r)     => r
      case None        => "us-east-1"
    }
  }

  // ------------------------------------------------------------------- s3

  /** HeadObject pre-flight (reference :798). 404 throws the
    * `missing-key:` message the quarantine column surfaces; any
    * other non-200 is an access failure. */
  private[sources] def headObject(key: String): Unit = {
    val (host, uri) = s3HostAndPath(key)
    val resp = send(() => signedS3Request("HEAD", host, uri, Seq.empty,
      Array.emptyByteArray, region), retryable = true)
    resp.statusCode() match {
      case 200 => ()
      case 404 => throw new java.util.NoSuchElementException(
        s"missing-key: s3://${cfg.bucket}/$key does not exist")
      case s => throw new RuntimeException(
        s"head-object failed: HTTP $s for s3://${cfg.bucket}/$key")
    }
  }

  private def s3HostAndPath(key: String, global: Boolean = false)
      : (String, String) = cfg.s3Endpoint match {
    case Some(ep) => // injected endpoint (tests / S3-compatible): path-style
      val u = URI.create(ep)
      val host = u.getHost + (if (u.getPort > 0) s":${u.getPort}" else "")
      val path = s"/${cfg.bucket}" +
        (if (key.isEmpty) "" else "/" + AwsSigV4.uriEncode(key, encodeSlash = false))
      (host, path)
    case None =>
      val host =
        if (global) s"${cfg.bucket}.s3.amazonaws.com"
        else s"${cfg.bucket}.s3.$region.amazonaws.com"
      val path =
        if (key.isEmpty) "/"
        else "/" + AwsSigV4.uriEncode(key, encodeSlash = false)
      (host, path)
  }

  private def signedS3Request(method: String, host: String, path: String,
                              query: Seq[(String, String)],
                              body: Array[Byte], signRegion: String)
      : HttpRequest = {
    val t = Instant.now()
    val c = credsNow
    val payloadHash = AwsSigV4.sha256Hex(body)
    val headers = Seq(
      "host" -> host,
      "x-amz-content-sha256" -> payloadHash,
      "x-amz-date" -> AwsSigV4.amzDate(t)) ++
      c.sessionToken.map("x-amz-security-token" -> _)
    val auth = AwsSigV4.authorization(c, t, signRegion, "s3",
      method, path, query, headers, payloadHash)
    val qs = AwsSigV4.canonicalQuery(query)
    val scheme = cfg.s3Endpoint.map(e => URI.create(e).getScheme)
      .getOrElse("https")
    val uri = URI.create(
      s"$scheme://$host$path" + (if (qs.isEmpty) "" else s"?$qs"))
    val b = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofMillis(cfg.requestTimeoutMs))
      .method(method, HttpRequest.BodyPublishers.ofByteArray(body))
      .header("Authorization", auth)
    headers.filterNot(_._1 == "host")
      .foreach { case (k, v) => b.header(k, v) }
    b.build()
  }

  // -------------------------------------------------------------- textract

  private def textractCall(target: String, bodyJson: String,
                           retryable: Boolean): JsonNode = {
    val body = bodyJson.getBytes(UTF_8)
    val host = cfg.textractEndpoint
      .map { ep => val u = URI.create(ep)
        u.getHost + (if (u.getPort > 0) s":${u.getPort}" else "") }
      .getOrElse(s"textract.$region.amazonaws.com")
    val scheme = cfg.textractEndpoint.map(e => URI.create(e).getScheme)
      .getOrElse("https")
    // Each attempt re-signs with a fresh timestamp AND freshly
    // resolved credentials — a retry after a long backoff must not
    // replay a signature whose 15-min validity (or session token)
    // has lapsed.
    def mkReq(): HttpRequest = {
      val t = Instant.now()
      val c = credsNow
      val headers = Seq(
        "content-type" -> "application/x-amz-json-1.1",
        "host" -> host,
        "x-amz-date" -> AwsSigV4.amzDate(t),
        "x-amz-target" -> target) ++
        c.sessionToken.map("x-amz-security-token" -> _)
      val auth = AwsSigV4.authorization(c, t, region, "textract",
        "POST", "/", Seq.empty, headers, AwsSigV4.sha256Hex(body))
      val req = HttpRequest.newBuilder(URI.create(s"$scheme://$host/"))
        .timeout(Duration.ofMillis(cfg.requestTimeoutMs))
        .POST(HttpRequest.BodyPublishers.ofByteArray(body))
        .header("Authorization", auth)
      headers.filterNot(_._1 == "host")
        .foreach { case (k, v) => req.header(k, v) }
      req.build()
    }
    val resp = send(() => mkReq(), retryable)
    val text = new String(resp.body(), UTF_8)
    if (resp.statusCode() != 200) {
      val errType = try {
        Option(mapper.readTree(text).get("__type"))
          .map(_.asText()).getOrElse("")
      } catch { case _: Exception => "" }
      throw new RuntimeException(
        s"$target failed: HTTP ${resp.statusCode()} $errType")
    }
    mapper.readTree(text)
  }

  // ------------------------------------------------------------ OcrClient

  override def startJob(doc: String): String = {
    headObject(doc) // fail fast, distinctly, on a missing key (:798)
    val body = s"""{"DocumentLocation":{"S3Object":{"Bucket":${jstr(cfg.bucket)},"Name":${jstr(doc)}}}}"""
    val node = textractCall("Textract.StartDocumentTextDetection", body,
      retryable = false)
    Option(node.get("JobId")).map(_.asText())
      .getOrElse(throw new RuntimeException("start returned no JobId"))
  }

  override def jobStatus(jobId: String): String = {
    val node = textractCall("Textract.GetDocumentTextDetection",
      s"""{"JobId":${jstr(jobId)},"MaxResults":1}""", retryable = true)
    Option(node.get("JobStatus")).map(_.asText()).getOrElse("IN_PROGRESS")
  }

  override def fetchPage(jobId: String, token: Option[String])
      : (Seq[(String, String, Int, Double, Double)], Option[String]) = {
    val tok = token.map(t => s""","NextToken":${jstr(t)}""").getOrElse("")
    val node = textractCall("Textract.GetDocumentTextDetection",
      s"""{"JobId":${jstr(jobId)},"MaxResults":${cfg.pageSize}$tok""" + "}",
      retryable = true)
    val blocks = Option(node.get("Blocks")).toSeq
      .flatMap(_.elements().asScalaSeq)
      .map { b =>
        val bbox = Option(b.get("Geometry")).flatMap(g =>
          Option(g.get("BoundingBox")))
        (textOf(b, "BlockType"), textOf(b, "Text"),
          Option(b.get("Page")).map(_.asInt()).getOrElse(1),
          bbox.flatMap(x => Option(x.get("Left"))).map(_.asDouble())
            .getOrElse(0.0),
          bbox.flatMap(x => Option(x.get("Top"))).map(_.asDouble())
            .getOrElse(0.0))
      }
    (blocks, Option(node.get("NextToken")).map(_.asText()))
  }

  private def textOf(n: JsonNode, field: String): String =
    Option(n.get(field)).map(_.asText()).orNull

  // ---------------------------------------------------------------- http

  /** Bounded exponential backoff with equal jitter on throttle/5xx
    * for idempotent calls; non-retryable requests and terminal codes
    * pass through. The request is REBUILT (re-signed, fresh creds +
    * timestamp) per attempt via the thunk. Jitter (half fixed, half
    * uniform-random — "equal jitter") de-synchronizes a fleet of
    * pollers that got throttled together, which otherwise re-storm
    * the API in lockstep at every backoff boundary. */
  private def send(mkReq: () => HttpRequest, retryable: Boolean)
      : HttpResponse[Array[Byte]] = {
    var attempt = 0
    while (true) {
      val resp = http.send(mkReq(),
        HttpResponse.BodyHandlers.ofByteArray())
      val throttled = resp.statusCode() == 429 || resp.statusCode() >= 500
      if (!throttled || !retryable || attempt >= cfg.maxRetries)
        return resp
      val ceil = cfg.retryBaseDelayMs << attempt
      Thread.sleep(ceil / 2 + java.util.concurrent.ThreadLocalRandom
        .current().nextLong(ceil / 2 + 1))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  private def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}

object AwsHttpOcrClient {

  /** Everything the client needs, serializable into tasks. Region
    * None = resolve per bucket via GetBucketLocation. Endpoint
    * overrides switch S3 to path-style addressing (tests and
    * S3-compatible stores). */
  final case class Config(bucket: String,
                          region: Option[String],
                          accessKey: String,
                          secretKey: String,
                          sessionToken: Option[String] = None,
                          s3Endpoint: Option[String] = None,
                          textractEndpoint: Option[String] = None,
                          pageSize: Int = 1000,
                          maxRetries: Int = 3,
                          retryBaseDelayMs: Long = 200,
                          connectTimeoutMs: Long = 10000,
                          requestTimeoutMs: Long = 60000,
                          credentialsProvider:
                            Option[CredentialsProvider] = None)
      extends Serializable

  /** Source of per-request credentials. Implementations wrap an STS
    * assume-role refresher, the instance metadata service, or a
    * rotating secret store; [[AwsHttpOcrClient]] calls `current()`
    * on EVERY request and retry attempt, so rotation inside a long
    * Textract poll window is picked up without restarting the job
    * (the reference's 900 s loop outlives typical session tokens). */
  trait CredentialsProvider extends Serializable {
    def current(): Credentials
  }

  private val regionCache = new ConcurrentHashMap[String, String]()
  private val LOCATION_RE =
    "<LocationConstraint[^>]*>([^<]*)</LocationConstraint>".r

  private[sources] def clearRegionCache(): Unit = regionCache.clear()

  /** Build from DSv2 options (`client=aws`): credentials fall back
    * to the standard AWS env variables; `awsRegion` skips the
    * GetBucketLocation round-trip when the caller already knows it. */
  def fromOptions(opts: Map[String, String]): AwsHttpOcrClient = {
    def env(k: String) = Option(System.getenv(k))
    val cfg = Config(
      bucket = opts.getOrElse("awsBucket",
        throw new IllegalArgumentException(
          "client=aws requires the awsBucket option")),
      region = opts.get("awsRegion"),
      accessKey = opts.get("awsAccessKey")
        .orElse(env("AWS_ACCESS_KEY_ID"))
        .getOrElse(throw new IllegalArgumentException(
          "no awsAccessKey option and no AWS_ACCESS_KEY_ID in env")),
      secretKey = opts.get("awsSecretKey")
        .orElse(env("AWS_SECRET_ACCESS_KEY"))
        .getOrElse(throw new IllegalArgumentException(
          "no awsSecretKey option and no AWS_SECRET_ACCESS_KEY in env")),
      sessionToken = opts.get("awsSessionToken")
        .orElse(env("AWS_SESSION_TOKEN")),
      s3Endpoint = opts.get("s3Endpoint"),
      textractEndpoint = opts.get("textractEndpoint"),
      pageSize = opts.getOrElse("awsPageSize", "1000").toInt,
      maxRetries = opts.getOrElse("awsMaxRetries", "3").toInt,
      retryBaseDelayMs = opts.getOrElse("awsRetryBaseDelayMs", "200").toLong)
    new AwsHttpOcrClient(cfg)
  }

  /** Tiny JsonNode-iterator bridge (jackson returns a java
    * Iterator). */
  private implicit class RichIt(val it: java.util.Iterator[JsonNode])
      extends AnyVal {
    def asScalaSeq: Seq[JsonNode] = {
      val b = Seq.newBuilder[JsonNode]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
