package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Local S3 + Textract record/replay endpoint for AwsOcrClientSpec:
  * serves the saved Textract JSON fixtures under
  * src/test/resources/textract/, answers S3 HeadObject /
  * GetBucketLocation, and VERIFIES every request's SigV4 signature
  * by recomputing it from the request's own components with the
  * shared secret (a malformed canonical request, missing signed
  * header, or wrong signing scope all surface as a recorded
  * violation). Routes by shape: POST with x-amz-target = Textract;
  * anything else = S3 path-style.
  *
  * Poll choreography per the public API: GetDocumentTextDetection
  * with MaxResults=1 is the status probe (two IN_PROGRESS answers,
  * then the terminal status — exercising the poll loop); larger
  * MaxResults is a page fetch keyed by NextToken. The first page
  * fetch for the ok job answers 429 once, exercising the
  * idempotent-retry path.
  */
final class AwsReplayServer(secretKey: String, bucketRegion: String) {

  private val mapper = new ObjectMapper()
  val sigViolations = new ConcurrentLinkedQueue[String]()
  val requests = new ConcurrentLinkedQueue[String]() // "METHOD path target"
  val locationCalls = new AtomicInteger(0)
  val headCalls = new ConcurrentLinkedQueue[String]()
  private val okStatusPolls = new AtomicInteger(0)
  private val okThrottles = new AtomicInteger(0)
  /** Per-access-key secrets for rotation tests: a request signed by
    * an access key present here is verified against ITS secret;
    * unknown keys fall back to the constructor secret. */
  val secrets = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Access keys observed in Authorization scopes, in order. */
  val akidsSeen = new ConcurrentLinkedQueue[String]()
  /** When > 0, every Textract GetDocumentTextDetection responds 429
    * and decrements — a throttle storm of that depth. */
  val throttleStorm = new AtomicInteger(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(null)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.start()

  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/textract/$name")
    require(in != null, s"missing fixture $name")
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  private def handle(ex: HttpExchange): Unit = try {
    val body = ex.getRequestBody.readAllBytes()
    val target = Option(ex.getRequestHeaders.getFirst("x-amz-target"))
    requests.add(s"${ex.getRequestMethod} ${ex.getRequestURI.getPath} " +
      target.getOrElse("-"))
    verifySignature(ex, body)
    target match {
      case Some(t) => textract(ex, t, new String(body, UTF_8))
      case None    => s3(ex)
    }
  } catch {
    case e: Exception =>
      sigViolations.add(s"server error: $e")
      respond(ex, 500, "{}".getBytes(UTF_8))
  } finally ex.close()

  // ------------------------------------------------------------ signature

  /** Recompute the signature from the request itself + the shared
    * secret, honoring the scope and signed-header list the client
    * declared. Any mismatch is recorded (and still served, so the
    * test can assert the violation list is empty at the end). */
  private def verifySignature(ex: HttpExchange, body: Array[Byte]): Unit = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .getOrElse { sigViolations.add("missing Authorization"); return }
    val re = ("AWS4-HMAC-SHA256 Credential=([^/]+)/(\\d{8})/([^/]+)/" +
      "([^/]+)/aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]+)").r
    val m = re.findFirstMatchIn(auth).getOrElse {
      sigViolations.add(s"malformed Authorization: $auth"); return
    }
    val (akid, dateStamp, region, service, signedHeaders, gotSig) =
      (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
        m.group(6))
    akidsSeen.add(akid)
    val secretForKey = Option(secrets.get(akid)).getOrElse(secretKey)
    val amzDate = Option(ex.getRequestHeaders.getFirst("x-amz-date"))
      .getOrElse { sigViolations.add("missing x-amz-date"); return }
    if (!amzDate.startsWith(dateStamp))
      sigViolations.add(s"scope date $dateStamp != x-amz-date $amzDate")
    val headers = signedHeaders.split(";").toSeq.map { h =>
      h -> Option(ex.getRequestHeaders.getFirst(h)).getOrElse {
        sigViolations.add(s"signed header $h absent"); ""
      }
    }
    val payloadHash =
      Option(ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
        .getOrElse(AwsSigV4.sha256Hex(body))
    val query = Option(ex.getRequestURI.getRawQuery).toSeq
      .flatMap(_.split("&")).filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
          case Array(k)    => k -> ""
        }
      }
    val (cr, _) = AwsSigV4.canonicalRequest(ex.getRequestMethod,
      ex.getRequestURI.getPath, query, headers, payloadHash)
    // string-to-sign needs the instant; reparse from x-amz-date
    val t = java.time.LocalDateTime.parse(amzDate,
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
      .toInstant(java.time.ZoneOffset.UTC)
    val expect = AwsSigV4.signature(secretForKey, t, region, service, cr)
    if (expect != gotSig)
      sigViolations.add(s"signature mismatch for ${ex.getRequestMethod} " +
        s"${ex.getRequestURI} (service=$service region=$region)")
  }

  // ------------------------------------------------------------------- s3

  private def s3(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val isLocation =
      Option(ex.getRequestURI.getQuery).exists(_.startsWith("location"))
    if (isLocation) {
      locationCalls.incrementAndGet()
      val xml = """<?xml version="1.0" encoding="UTF-8"?>""" +
        s"""<LocationConstraint xmlns="http://s3.amazonaws.com/doc/2006-03-01/">$bucketRegion</LocationConstraint>"""
      respond(ex, 200, xml.getBytes(UTF_8))
    } else if (ex.getRequestMethod == "HEAD") {
      headCalls.add(path)
      if (path.contains("missing")) respond(ex, 404, Array.emptyByteArray)
      else respond(ex, 200, Array.emptyByteArray)
    } else respond(ex, 400, Array.emptyByteArray)
  }

  // ------------------------------------------------------------- textract

  private def textract(ex: HttpExchange, target: String,
                       body: String): Unit = {
    val node = mapper.readTree(body)
    target match {
      case "Textract.StartDocumentTextDetection" =>
        val key = node.get("DocumentLocation").get("S3Object")
          .get("Name").asText()
        val job = "job-" + key.split("/").last.stripSuffix(".png")
        respond(ex, 200, s"""{"JobId":"$job"}""".getBytes(UTF_8))
      case "Textract.GetDocumentTextDetection"
          if throttleStorm.get() > 0 =>
        throttleStorm.decrementAndGet()
        respond(ex, 429,
          """{"__type":"ThrottlingException"}""".getBytes(UTF_8))
      case "Textract.GetDocumentTextDetection" =>
        val job = node.get("JobId").asText()
        val maxResults = Option(node.get("MaxResults")).map(_.asInt())
          .getOrElse(1000)
        val token = Option(node.get("NextToken")).map(_.asText())
        val out: Either[Int, String] = job match {
          case "job-ok" if maxResults == 1 =>
            // status probe: 2x IN_PROGRESS, then terminal
            if (okStatusPolls.incrementAndGet() <= 2)
              Right(fixture("in_progress.json"))
            else Right(fixture("ok_page1.json"))
          case "job-ok" =>
            token match {
              case None if okThrottles.incrementAndGet() == 1 =>
                Left(429) // first page fetch throttled once
              case None                  => Right(fixture("ok_page1.json"))
              case Some("tok-page-2")    => Right(fixture("ok_page2.json"))
              case Some(t) =>
                sigViolations.add(s"unknown NextToken $t"); Left(400)
            }
          case "job-fail" => Right(fixture("failed.json"))
          case other =>
            sigViolations.add(s"unknown job $other"); Left(400)
        }
        out match {
          case Right(json) => respond(ex, 200, json.getBytes(UTF_8))
          case Left(code) => respond(ex, code,
            """{"__type":"ThrottlingException"}""".getBytes(UTF_8))
        }
      case other =>
        sigViolations.add(s"unknown target $other")
        respond(ex, 400, "{}".getBytes(UTF_8))
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    if (ex.getRequestMethod == "HEAD") {
      ex.sendResponseHeaders(code, -1)
    } else {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
    }
  }

  def requestLog: Seq[String] = requests.asScala.toSeq
}
