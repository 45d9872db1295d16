package graft.sources

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The production AWS binding, driven entirely offline:
  *
  *  - SigV4 against the public known-answer vector from the AWS
  *    signing documentation (the ListUsers GET example), stage by
  *    stage so a failure localizes to canonical request, hashing,
  *    or key derivation;
  *  - the whole client (region resolution, HeadObject pre-flight,
  *    job start, poll with IN_PROGRESS rounds, throttle retry,
  *    token-chained pagination) against [[AwsReplayServer]] serving
  *    the saved Textract JSON fixtures, with every request's
  *    signature re-verified server-side;
  *  - quarantine class distinction: a missing S3 key must surface
  *    as `missing-key:` — a different failure class from a FAILED
  *    OCR job (round-4 verdict item 1).
  */
class AwsOcrClientSpec extends AnyFunSuite {

  private val AK = "AKIDEXAMPLE"
  private val SK = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ------------------------------------------------------------- sigv4 kat

  test("SigV4 known-answer vector (AWS docs ListUsers example), " +
       "verified stage by stage") {
    val t = Instant.parse("2015-08-30T12:36:00Z")
    val headers = Seq(
      "host" -> "iam.amazonaws.com",
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "x-amz-date" -> "20150830T123600Z")
    val query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08")
    val (cr, signed) = AwsSigV4.canonicalRequest("GET", "/", query,
      headers, AwsSigV4.EMPTY_PAYLOAD_HASH)
    assert(signed == "content-type;host;x-amz-date")
    assert(cr ==
      """GET
        |/
        |Action=ListUsers&Version=2010-05-08
        |content-type:application/x-www-form-urlencoded; charset=utf-8
        |host:iam.amazonaws.com
        |x-amz-date:20150830T123600Z
        |
        |content-type;host;x-amz-date
        |e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"""
        .stripMargin)
    assert(AwsSigV4.sha256Hex(cr) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59",
      "canonical request hash diverges from the documented value")
    assert(AwsSigV4.signature(SK, t, "us-east-1", "iam", cr) ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7",
      "final signature diverges — key derivation or string-to-sign")
  }

  test("uriEncode follows the AWS rules") {
    assert(AwsSigV4.uriEncode("a b/c~d._-") == "a%20b%2Fc~d._-")
    assert(AwsSigV4.uriEncode("raw/af kë.png", encodeSlash = false) ==
      "raw/af%20k%C3%AB.png")
    assert(AwsSigV4.canonicalQuery(Seq("b" -> "2", "a" -> "1", "a" -> "")) ==
      "a=&a=1&b=2")
  }

  // -------------------------------------------------------------- replay

  private def awsRead(server: AwsReplayServer, keys: String) =
    spark.read.format("graft-ocr")
      .option("keys", keys)
      .option("client", "aws")
      .option("awsBucket", "farm-bucket")
      .option("awsAccessKey", AK)
      .option("awsSecretKey", SK)
      .option("s3Endpoint", server.endpoint)
      .option("textractEndpoint", server.endpoint)
      .option("pollDelayMs", "1")
      .option("pollBackoffFactor", "2.0")
      .option("awsRetryBaseDelayMs", "1")
      .load()

  test("end-to-end replay: region resolved once, head pre-flight, " +
       "poll through IN_PROGRESS, throttle retried, pages chained, " +
       "every signature valid") {
    AwsHttpOcrClient.clearRegionCache()
    val server = new AwsReplayServer(SK, "us-west-2")
    try {
      val rows = awsRead(server, "rawfarmdata/ok.png").collect()
      // fixture blocks: PAGE + 3 LINE/WORD on page 1, 2 LINEs page 2
      assert(rows.length == 6, rows.mkString("\n"))
      val texts = rows.map(_.getString(3)).toSeq
      assert(texts.contains("Wayne County West Virginia"))
      assert(texts.contains("Mary Hall (Widow Hall), -, -, 2044"))
      assert(rows.forall(_.getString(7) == null), "no quarantine expected")
      // seq is the per-document arrival order across pages
      assert(rows.map(_.getLong(1)).sorted.toSeq == (0L until 6L))
      // region: exactly one GetBucketLocation, then cached
      assert(server.locationCalls.get() == 1)
      // pre-flight head happened, path-style, before the job start
      assert(server.headCalls.asScalaSeq ==
        Seq("/farm-bucket/rawfarmdata/ok.png"))
      val log = server.requestLog
      val headIdx = log.indexWhere(_.startsWith("HEAD"))
      val startIdx = log.indexWhere(
        _.contains("Textract.StartDocumentTextDetection"))
      assert(headIdx >= 0 && startIdx > headIdx,
        s"head must precede start: $log")
      // pagination: >= 2 non-status page fetches (one throttled+retried)
      assert(log.count(
        _.contains("Textract.GetDocumentTextDetection")) >= 5, log)
      assert(server.sigViolations.isEmpty,
        server.sigViolations.toArray.mkString("\n"))
    } finally server.stop()
  }

  test("second read against the same bucket skips GetBucketLocation " +
       "(per-JVM region cache)") {
    AwsHttpOcrClient.clearRegionCache()
    val server = new AwsReplayServer(SK, "us-west-2")
    try {
      assert(awsRead(server, "rawfarmdata/ok.png").collect().length == 6)
      val after = server.locationCalls.get()
      assert(after == 1)
      val server2Rows = awsRead(server, "rawfarmdata/ok.png").collect()
      assert(server2Rows.length == 6)
      assert(server.locationCalls.get() == after, "region must be cached")
    } finally server.stop()
  }

  test("quarantine distinguishes missing-key from failed-OCR") {
    AwsHttpOcrClient.clearRegionCache()
    val server = new AwsReplayServer(SK, "eu-central-1")
    try {
      val rows = awsRead(server,
        "rawfarmdata/missing.png,rawfarmdata/fail.png").collect()
      assert(rows.length == 2)
      val byDoc = rows.map(r => r.getString(0) -> r.getString(7)).toMap
      assert(byDoc("rawfarmdata/missing.png").startsWith("missing-key:"),
        byDoc.toString)
      assert(byDoc("rawfarmdata/fail.png").contains("FAILED"),
        byDoc.toString)
      assert(!byDoc("rawfarmdata/fail.png").startsWith("missing-key:"))
      // the missing key never started a (billed) OCR job
      assert(!server.requestLog.exists(r =>
        r.contains("StartDocumentTextDetection") && r.contains("missing")),
        server.requestLog.toString)
      assert(server.sigViolations.isEmpty,
        server.sigViolations.toArray.mkString("\n"))
    } finally server.stop()
  }

  test("explicit awsRegion skips resolution entirely") {
    AwsHttpOcrClient.clearRegionCache()
    val server = new AwsReplayServer(SK, "ap-south-1")
    try {
      val rows = spark.read.format("graft-ocr")
        .option("keys", "rawfarmdata/ok.png")
        .option("client", "aws")
        .option("awsBucket", "farm-bucket")
        .option("awsRegion", "ap-south-1")
        .option("awsAccessKey", AK).option("awsSecretKey", SK)
        .option("s3Endpoint", server.endpoint)
        .option("textractEndpoint", server.endpoint)
        .option("pollDelayMs", "1").option("awsRetryBaseDelayMs", "1")
        .load().collect()
      assert(rows.length == 6)
      assert(server.locationCalls.get() == 0, "no GetBucketLocation")
      assert(server.sigViolations.isEmpty,
        server.sigViolations.toArray.mkString("\n"))
    } finally server.stop()
  }

  test("mid-poll credential rotation: the provider is re-read per " +
       "request, so every post-rotation signature uses the new secret") {
    AwsHttpOcrClient.clearRegionCache()
    val server = new AwsReplayServer(SK, "us-west-2")
    try {
      val ak2 = "AKIDROTATED"
      val sk2 = "rotatedSecretKeyForTheSecondSessionXYZ"
      server.secrets.put(AK, SK)
      server.secrets.put(ak2, sk2)
      // rotates after the Nth current() call — mid-poll
      val provider = new AwsHttpOcrClient.CredentialsProvider {
        val calls = new java.util.concurrent.atomic.AtomicInteger(0)
        override def current(): AwsSigV4.Credentials =
          if (calls.incrementAndGet() <= 3)
            AwsSigV4.Credentials(AK, SK, Some("session-1"))
          else AwsSigV4.Credentials(ak2, sk2, Some("session-2"))
      }
      val client = new AwsHttpOcrClient(AwsHttpOcrClient.Config(
        bucket = "farm-bucket", region = Some("us-west-2"),
        accessKey = "unused", secretKey = "unused",
        s3Endpoint = Some(server.endpoint),
        textractEndpoint = Some(server.endpoint),
        retryBaseDelayMs = 1,
        credentialsProvider = Some(provider)))
      val job = client.startJob("rawfarmdata/ok.png") // head + start = 2 creds reads
      var st = client.jobStatus(job)                  // 3rd read (old creds)
      var polls = 0
      while (st == "IN_PROGRESS" && polls < 10) {     // rotation hits here
        st = client.jobStatus(job)
        polls += 1
      }
      assert(st == "SUCCEEDED", st)
      val (blocks, tok) = client.fetchPage(job, None)
      assert(blocks.nonEmpty && tok.contains("tok-page-2"))
      // both identities actually hit the wire, and every signature —
      // including all post-rotation ones — verified against the
      // secret belonging to ITS access key
      val seen = server.akidsSeen.asScalaSeq.distinct
      assert(seen.contains(AK) && seen.contains(ak2), seen.toString)
      assert(server.sigViolations.isEmpty,
        server.sigViolations.toArray.mkString("\n"))
    } finally server.stop()
  }

  test("throttle storm: each retry is re-signed and jitter-backed; " +
       "depth within maxRetries succeeds, beyond it surfaces") {
    AwsHttpOcrClient.clearRegionCache()
    val server = new AwsReplayServer(SK, "us-west-2")
    try {
      def client(maxRetries: Int) = new AwsHttpOcrClient(
        AwsHttpOcrClient.Config(
          bucket = "farm-bucket", region = Some("us-west-2"),
          accessKey = AK, secretKey = SK,
          s3Endpoint = Some(server.endpoint),
          textractEndpoint = Some(server.endpoint),
          maxRetries = maxRetries, retryBaseDelayMs = 1))
      // depth 3 storm, 5 retries allowed: survives
      server.throttleStorm.set(3)
      val before = server.requestLog.size
      assert(client(5).jobStatus("job-fail") == "FAILED")
      val attempts = server.requestLog.size - before
      assert(attempts == 4, s"3 throttled + 1 success, got $attempts")
      // depth 10 storm, 2 retries: surfaces as ThrottlingException
      server.throttleStorm.set(10)
      val e = intercept[RuntimeException] {
        client(2).jobStatus("job-fail")
      }
      assert(e.getMessage.contains("ThrottlingException"), e.getMessage)
      server.throttleStorm.set(0)
      // every attempt (throttled or not) carried a VALID signature —
      // i.e. retries re-signed rather than replaying stale requests
      assert(server.sigViolations.isEmpty,
        server.sigViolations.toArray.mkString("\n"))
    } finally server.stop()
  }

  test("fromOptions demands bucket and credentials") {
    intercept[IllegalArgumentException] {
      AwsHttpOcrClient.fromOptions(Map("awsAccessKey" -> AK,
        "awsSecretKey" -> SK))
    }
    intercept[IllegalArgumentException] {
      AwsHttpOcrClient.fromOptions(Map("awsBucket" -> "b"))
    }
  }

  private implicit class QSeq[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScalaSeq: Seq[A] = {
      import scala.jdk.CollectionConverters._
      q.asScala.toSeq
    }
  }
}
