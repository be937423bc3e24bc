package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.QueryHttpApi
import graft.engine.{QueryEngine, ReplaySequencer, Telemetry}

/** The HTTP/SSE transport shell: a reference client's wire contract —
  * SSE framing (`data: {...}\r\n\r\n`), the timeseries/event/done
  * payload shapes, tag/cardinality streams, and the JSON side routes —
  * all served over the same engine calls the oracles pin. */
class HttpApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val base = 1704067200000L // 2024-01-01T00:00:00Z
  private val hour = 3600000L

  private lazy val events = {
    (0 until 480).map { i =>
      ((base + i * 6L * 60000L) * 1000000L,
        if (i % 3 == 0) "click" else "view",
        (i % 50) / 2.0, s"""{"k": $i}""")
    }.toDF("ts", "event_type", "value", "props")
  }
  private lazy val tel = Telemetry.nanos(events, "ts",
    valueCol = col("value"), message = Some(col("props")))

  private val chartAst =
    """{"baseExpressions": {"a": {
      |  "dataset": "logs",
      |  "filter": {"k": "event_type", "v": ["click", "view"], "op": "in"},
      |  "chart": {"aggregation": "sum", "groupBys": ["event_type"]}
      |}}}""".stripMargin

  private def withApi(segments: Seq[ReplaySequencer.SegmentSpan] = Nil)(
      f: Int => Unit): Unit = {
    val api = new QueryHttpApi(_ => tel, segments = segments,
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour))
    val port = api.start(0)
    try f(port) finally api.stop()
  }

  private def http(port: Int, method: String, path: String,
      body: String = ""): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    if (body.nonEmpty || method == "POST") {
      conn.setDoOutput(true)
      conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = if (is == null) ""
      else new String(is.readAllBytes(), StandardCharsets.UTF_8)
    (code, text)
  }

  /** Parse an SSE body into its `data:` JSON events (wire framing
    * asserted here: every event is `data: {json}\r\n\r\n`). */
  private def sseEvents(bodyText: String): Seq[JsonNode] = {
    val chunks = bodyText.split("\r\n\r\n").filter(_.nonEmpty)
    chunks.map { c =>
      assert(c.startsWith("data: "), s"bad SSE frame: $c")
      mapper.readTree(c.stripPrefix("data: "))
    }.toSeq
  }

  test("GET /ready answers 200; scopeTags/functionSpecs serve JSON") {
    withApi() { port =>
      assert(http(port, "GET", "/ready")._1 == 200)
      val (c1, scopes) = http(port, "GET", "/api/v1/scopeTags")
      assert(c1 == 200)
      val arr = mapper.readTree(scopes)
      assert(arr.isArray &&
        (0 until arr.size).map(arr.get(_).asText()).toSet ==
          QueryEngine.scopeTags.toSet)
      val (c2, fns) = http(port, "GET", "/api/v1/functionSpecs")
      assert(c2 == 200)
      assert(mapper.readTree(fns).size ==
        graft.plans.GraftExtensions.functions.size)
    }
  }

  test("POST /api/v1/graph?explain=true answers the formatted plan and " +
    "replay-group count without executing the query") {
    val span = ReplaySequencer.SegmentSpan("s", base, base + 48 * hour)
    val api = new QueryHttpApi(_ => tel, segments = Seq(span),
      minGroupSize = 4,
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour))
    val port = api.start(0)
    try {
      val (code, bodyText) = http(port, "POST",
        s"/api/v1/graph?s=$base&e=${base + 48 * hour}&explain=true",
        chartAst)
      assert(code == 200)
      val evs = sseEvents(bodyText)
      assert(evs.map(_.get("type").asText()) == Seq("explain", "done"))
      val m = evs.head.get("message")
      val plan = m.get("plan").asText()
      // the formatted plan carries the chart shape: step bucketing and
      // the partial/final aggregate pair
      assert(plan.contains("HashAggregate"), plan.take(400))
      assert(m.get("stepMs").asLong() ==
        graft.functions.TimeRange.autoStepMillis(base, base + 48 * hour))
      assert(m.get("replayGroups").asInt() ==
        ReplaySequencer.sequence(Seq(span), base, base + 48 * hour,
          m.get("stepMs").asLong(), 4).size)
    } finally api.stop()
  }

  test("POST /api/v1/graph streams timeseries events that equal the " +
    "engine evaluation, then exemplar events, then done") {
    withApi() { port =>
      val s = base.toString
      val e = (base + 48 * hour).toString
      val (code, bodyText) = http(port, "POST",
        s"/api/v1/graph?s=$s&e=$e", chartAst)
      assert(code == 200)
      val events0 = sseEvents(bodyText)
      assert(events0.last.get("type").asText() == "done")
      val ts = events0.filter(n =>
        Option(n.get("type")).exists(_.asText() == "timeseries"))
      val ex = events0.filter(n =>
        Option(n.get("type")).exists(_.asText() == "event"))
      assert(ts.nonEmpty)
      // 48h window → the reference step ladder picks 20m for ≤ 3d
      val stepMs = graft.functions.TimeRange.autoStepMillis(
        base, base + 48 * hour)
      val expected = QueryEngine.evaluate(_ => tel,
          graft.ast.AstJson.parseAstInput(chartAst),
          base, base + 48 * hour, stepMs)
        .collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2), r.getString(3)))
        .sortBy(t => (t._1, t._2))
      val got = ts.map { n =>
        val m = n.get("message")
        (m.get("timestamp").asLong(),
          m.get("tags").get("event_type").asText(),
          m.get("value").asDouble(), m.get("label").asText())
      }.sortBy(t => (t._1, t._2))
      assert(got == expected.toSeq)
      // auto-exemplars beside the log chart expression: raw event rows
      assert(ex.nonEmpty)
      assert(ex.forall(_.get("id").asText() == "a"))
      assert(ex.head.get("message").has("event_type"))
      // timeseriesOnly=true suppresses them
      val (_, noEx) = http(port, "POST",
        s"/api/v1/graph?s=$s&e=$e&timeseriesOnly=true", chartAst)
      assert(!sseEvents(noEx).exists(n =>
        Option(n.get("type")).exists(_.asText() == "event")))
    }
  }

  test("graph over registered segments delivers incrementally and " +
    "concatenates to the same series") {
    val span = ReplaySequencer.SegmentSpan("s", base, base + 48 * hour)
    withApi(Seq(span)) { port =>
      val (code, bodyText) = http(port, "POST",
        s"/api/v1/graph?s=$base&e=${base + 48 * hour}&timeseriesOnly=true",
        chartAst)
      assert(code == 200)
      val ts = sseEvents(bodyText).filter(n =>
        Option(n.get("type")).exists(_.asText() == "timeseries"))
      val stepMs = graft.functions.TimeRange.autoStepMillis(
        base, base + 48 * hour)
      val expected = QueryEngine.evaluate(_ => tel,
          graft.ast.AstJson.parseAstInput(chartAst),
          base, base + 48 * hour, stepMs)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      val got = ts.map { n =>
        val m = n.get("message")
        (m.get("timestamp").asLong(),
          m.get("tags").get("event_type").asText(),
          m.get("value").asDouble())
      }
      // replay order: timestamps non-decreasing across sealed groups
      assert(got.map(_._1).sliding(2).forall {
        case Seq(a, b) => a <= b
        case _ => true
      })
      assert(got.sortBy(t => (t._1, t._2)) == expected.toSeq)
    }
  }

  test("POST /api/v1/tags/{dataset} streams tag values (and names " +
    "without tagName); limit caps the stream") {
    withApi() { port =>
      val (code, bodyText) = http(port, "POST",
        s"/api/v1/tags/logs?tagName=event_type&s=$base&e=${base + 48 * hour}")
      assert(code == 200)
      val vals = sseEvents(bodyText).filter(_.has("message"))
        .filter(n => Option(n.get("type")).exists(_.asText() == "data"))
        .map(_.get("message").get("event_type").asText())
      assert(vals.toSet == Set("click", "view"))
      val (_, names) = http(port, "POST",
        s"/api/v1/tags/logs?s=$base&e=${base + 48 * hour}")
      val nameList = sseEvents(names)
        .filter(n => Option(n.get("type")).exists(_.asText() == "data"))
        .map(_.get("message").get("name").asText())
      assert(nameList.contains("event_type"))
      val (_, capped) = http(port, "POST",
        s"/api/v1/tags/logs?tagName=event_type&limit=1&s=$base&e=${base + 48 * hour}")
      assert(sseEvents(capped).count(n =>
        Option(n.get("type")).exists(_.asText() == "data")) == 1)
    }
  }

  test("heartbeat frames keep the stream alive between replay-group " +
    "jobs and parsers skip them (T5)") {
    // 50 ms heartbeat + 8 single-interval replay groups: every group is
    // its own Spark job (>> 50 ms), so heartbeats appear between events
    val span = ReplaySequencer.SegmentSpan("s", base, base + 48 * hour)
    val api = new QueryHttpApi(_ => tel, segments = Seq(span),
      minGroupSize = 1, heartbeatMillis = 50,
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour))
    val port = api.start(0)
    try {
      val (code, bodyText) = http(port, "POST",
        s"/api/v1/graph?s=$base&e=${base + 48 * hour}&timeseriesOnly=true",
        chartAst)
      assert(code == 200)
      val evs = sseEvents(bodyText)
      assert(evs.exists(n =>
        Option(n.get("type")).exists(_.asText() == "heartbeat")))
      assert(evs.last.get("type").asText() == "done")
      // data events are unaffected by interleaved heartbeats
      val ts = evs.filter(n =>
        Option(n.get("type")).exists(_.asText() == "timeseries"))
      val stepMs = graft.functions.TimeRange.autoStepMillis(
        base, base + 48 * hour)
      val nExpected = QueryEngine.evaluate(_ => tel,
        graft.ast.AstJson.parseAstInput(chartAst),
        base, base + 48 * hour, stepMs).count()
      assert(ts.size.toLong == nExpected)
    } finally api.stop()
  }

  test("a client disconnect cancels the request's remaining Spark work " +
    "(job group teardown, the engine half of stream abort)") {
    // 48 single-interval replay groups = 48 sequential jobs (~5 s);
    // the client reads ONE event and slams the socket. The heartbeat
    // write then fails within ~100 ms and cancels the job group, so
    // the group's job count must stop growing almost immediately.
    val span = ReplaySequencer.SegmentSpan("s", base, base + 48 * hour)
    val api = new QueryHttpApi(_ => tel, segments = Seq(span),
      minGroupSize = 1, heartbeatMillis = 100,
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour))
    val port = api.start(0)
    try {
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = sock.getOutputStream
      val req = s"POST /api/v1/graph?s=$base&e=${base + 48 * hour}" +
        "&timeseriesOnly=true HTTP/1.1\r\nHost: x\r\n" +
        s"Content-Length: ${chartAst.length}\r\n\r\n$chartAst"
      out.write(req.getBytes(StandardCharsets.UTF_8)); out.flush()
      val in = sock.getInputStream
      // read until the first SSE event has arrived, then disconnect
      // (chunked framing puts a size line between CRLFCRLF and the
      // first "data: ", so match the frame prefix alone)
      val buf = new StringBuilder
      val b = new Array[Byte](4096)
      while (!buf.toString.contains("\"timeseries\"")) {
        val n = in.read(b)
        assert(n > 0, s"stream ended early: $buf")
        buf.append(new String(b, 0, n, StandardCharsets.UTF_8))
      }
      sock.close()
      val tracker = spark.sparkContext.statusTracker
      // give the heartbeat a beat to notice, then watch for quiescence
      Thread.sleep(600)
      val at600 = tracker.getActiveJobIds().length
      Thread.sleep(1200)
      val at1800 = tracker.getActiveJobIds().length
      assert(at1800 == 0,
        s"jobs still active 1.8s after disconnect: $at1800 (at600=$at600)")
      // without cancellation the 48-group replay would still be running
      // (~5 s of jobs); with it the handler thread dies on the next
      // write and no further group jobs launch
    } finally api.stop()
  }

  test("tag values over registered segments stream incrementally with " +
    "first-seen dedup: each value arrives once, in replay-group order") {
    // "early" occurs in EVERY hour, "late" only after hour 24; forward
    // replay (single-interval groups) must emit "early" from the first
    // group and "late" exactly once when its first group completes —
    // never re-emitting "early" from later groups
    val ev2 = (0 until 480).map { i =>
      ((base + i * 6L * 60000L) * 1000000L,
        if (i >= 240 && i % 7 == 0) "late" else "early", 1.0)
    }.toDF("ts", "event_type", "value")
    val tel2 = Telemetry.nanos(ev2, "ts", valueCol = col("value"))
    val span = ReplaySequencer.SegmentSpan("s", base, base + 48 * hour)
    val api = new QueryHttpApi(_ => tel2, segments = Seq(span),
      minGroupSize = 1,
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour))
    val port = api.start(0)
    try {
      val (code, bodyText) = http(port, "POST",
        s"/api/v1/tags/logs?tagName=event_type&s=$base&e=${base + 48 * hour}")
      assert(code == 200)
      val vals = sseEvents(bodyText)
        .filter(n => Option(n.get("type")).exists(_.asText() == "data"))
        .map(_.get("message").get("event_type").asText())
      assert(vals == Seq("early", "late")) // once each, first-seen order
      // limit caps ACROSS groups, not per group
      val (_, capped) = http(port, "POST",
        s"/api/v1/tags/logs?tagName=event_type&limit=1&s=$base&e=${base + 48 * hour}")
      assert(sseEvents(capped).count(n =>
        Option(n.get("type")).exists(_.asText() == "data")) == 1)
    } finally api.stop()
  }

  test("multi-tenant: Bearer key scopes every route to that tenant's " +
    "tables and segments; missing/unknown credentials answer 401") {
    val evA = (0 until 48).map(i =>
      ((base + i * hour) * 1000000L, "alpha_only", 1.0))
      .toDF("ts", "event_type", "value")
    val evB = (0 until 48).map(i =>
      ((base + i * hour) * 1000000L, "beta_only", 2.0))
      .toDF("ts", "event_type", "value")
    val telA = Telemetry.nanos(evA, "ts", valueCol = col("value"))
    val telB = Telemetry.nanos(evB, "ts", valueCol = col("value"))
    // tenant B registers segments; tenant A registers none — A's replay
    // sequencing must not see B's spans (isolation in BOTH dimensions)
    val spanB = ReplaySequencer.SegmentSpan("b", base, base + 48 * hour)
    val api = new QueryHttpApi(_ => tel,
      tenants = Map(
        "cust-a" -> QueryHttpApi.Tenant(_ => telA),
        "cust-b" -> QueryHttpApi.Tenant(_ => telB, Seq(spanB))),
      minGroupSize = 1,
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour))
    val port = api.start(0)
    def authed(key: Option[String], path: String): (Int, String) = {
      val conn = new URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      key.foreach(k => conn.setRequestProperty("Authorization", s"Bearer $k"))
      conn.setDoOutput(true)
      conn.getOutputStream.write("".getBytes(StandardCharsets.UTF_8))
      val code = conn.getResponseCode
      val is = if (code < 400) conn.getInputStream else conn.getErrorStream
      (code, if (is == null) ""
        else new String(is.readAllBytes(), StandardCharsets.UTF_8))
    }
    try {
      val path = s"/api/v1/tags/logs?tagName=event_type&s=$base&e=${base + 48 * hour}"
      // no credential / unknown credential → 401, nothing streams
      assert(authed(None, path)._1 == 401)
      assert(authed(Some("nope"), path)._1 == 401)
      // each tenant sees ONLY its own tag values
      def valsFor(key: String): Seq[String] = {
        val (code, text) = authed(Some(key), path)
        assert(code == 200)
        sseEvents(text)
          .filter(n => Option(n.get("type")).exists(_.asText() == "data"))
          .map(_.get("message").get("event_type").asText())
      }
      assert(valsFor("cust-a") == Seq("alpha_only"))
      assert(valsFor("cust-b") == Seq("beta_only"))
      // JSON routes gate too
      val conn = new URI(s"http://127.0.0.1:$port/api/v1/scopeTags").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 401)
    } finally api.stop()
  }

  test("signed-token auth: valid HMAC token scopes to its tenant; " +
    "expired and forged tokens answer 401") {
    val evA = (0 until 48).map(i =>
      ((base + i * hour) * 1000000L, "alpha_only", 1.0))
      .toDF("ts", "event_type", "value")
    val telA = Telemetry.nanos(evA, "ts", valueCol = col("value"))
    val secret = "test-secret-key".getBytes(StandardCharsets.UTF_8)
    // controllable clock: issue at t0, verify "later"
    var clock = java.time.Instant.ofEpochSecond(1700000000L)
    val tokens = new graft.api.SignedToken(secret, issuer = "graft",
      ttlSeconds = 60, now = () => clock)
    val api = new QueryHttpApi(_ => tel,
      tenants = Map("cust-a" -> QueryHttpApi.Tenant(_ => telA)),
      minGroupSize = 1,
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour),
      verifier = tokens.verifier)
    val port = api.start(0)
    def authed(key: Option[String], path: String): (Int, String) = {
      val conn = new URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      key.foreach(k => conn.setRequestProperty("Authorization", s"Bearer $k"))
      conn.setDoOutput(true)
      conn.getOutputStream.write("".getBytes(StandardCharsets.UTF_8))
      val code = conn.getResponseCode
      val is = if (code < 400) conn.getInputStream else conn.getErrorStream
      (code, if (is == null) ""
        else new String(is.readAllBytes(), StandardCharsets.UTF_8))
    }
    try {
      val path = s"/api/v1/tags/logs?tagName=event_type&s=$base&e=${base + 48 * hour}"
      val valid = tokens.issue("cust-a")
      // the raw customerId is NOT a credential under a real verifier
      assert(authed(Some("cust-a"), path)._1 == 401)
      // valid signed token → scoped tenant data
      val (code, text) = authed(Some(valid), path)
      assert(code == 200)
      assert(sseEvents(text)
        .filter(n => Option(n.get("type")).exists(_.asText() == "data"))
        .map(_.get("message").get("event_type").asText()) ==
        Seq("alpha_only"))
      // forged signature (valid shape, wrong key) → 401
      val forged = new graft.api.SignedToken(
        "wrong-key".getBytes(StandardCharsets.UTF_8), issuer = "graft",
        ttlSeconds = 60, now = () => clock).issue("cust-a")
      assert(authed(Some(forged), path)._1 == 401)
      // tampered payload (claim swap, original signature) → 401
      val Array(h, p, sig) = valid.split('.')
      val enc = java.util.Base64.getUrlEncoder.withoutPadding()
      val dec = java.util.Base64.getUrlDecoder
      val swapped = enc.encodeToString(
        new String(dec.decode(p), StandardCharsets.UTF_8)
          .replace("cust-a", "cust-x")
          .getBytes(StandardCharsets.UTF_8))
      assert(authed(Some(s"$h.$swapped.$sig"), path)._1 == 401)
      // alg-none downgrade → 401
      val noneHdr = enc.encodeToString(
        """{"alg":"none","typ":"JWT"}""".getBytes(StandardCharsets.UTF_8))
      assert(authed(Some(s"$noneHdr.$p."), path)._1 == 401)
      // token for an unknown tenant verifies but resolves no scope → 401
      assert(authed(Some(tokens.issue("cust-z")), path)._1 == 401)
      // expiry: same token, clock advanced past ttl → 401
      clock = clock.plusSeconds(61)
      assert(authed(Some(valid), path)._1 == 401)
      // a re-issued token under the advanced clock works again
      assert(authed(Some(tokens.issue("cust-a")), path)._1 == 200)
    } finally api.stop()
  }

  test("two concurrent SSE streams both progress to done with " +
    "heartbeats — one stream cannot starve or wedge the other") {
    // 48 single-interval replay groups each (= 48 sequential jobs per
    // stream) + 50 ms heartbeats: the pooled dispatcher, per-request
    // FAIR pools, and the shared heartbeat scheduler (writes dispatched
    // off-thread) must service both sockets side by side
    val span = ReplaySequencer.SegmentSpan("s", base, base + 48 * hour)
    val api = new QueryHttpApi(_ => tel, segments = Seq(span),
      minGroupSize = 1, heartbeatMillis = 50,
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour))
    val port = api.start(0)
    try {
      val results = new java.util.concurrent.ConcurrentHashMap[Int, Seq[JsonNode]]()
      val threads = (0 until 2).map { i =>
        new Thread(() => {
          val (code, text) = http(port, "POST",
            s"/api/v1/graph?s=$base&e=${base + 48 * hour}&timeseriesOnly=true",
            chartAst)
          assert(code == 200)
          results.put(i, sseEvents(text))
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      val stepMs = graft.functions.TimeRange.autoStepMillis(
        base, base + 48 * hour)
      val nExpected = QueryEngine.evaluate(_ => tel,
        graft.ast.AstJson.parseAstInput(chartAst),
        base, base + 48 * hour, stepMs).count()
      (0 until 2).foreach { i =>
        val evs = results.get(i)
        assert(evs != null, s"stream $i did not complete")
        assert(evs.last.get("type").asText() == "done")
        assert(evs.count(n => Option(n.get("type"))
          .exists(_.asText() == "timeseries")).toLong == nExpected)
        assert(evs.exists(n => Option(n.get("type"))
          .exists(_.asText() == "heartbeat")), s"stream $i: no heartbeat")
      }
    } finally api.stop()
  }

  test("POST /api/v1/cardinality streams the estimate; malformed AST " +
    "answers 400 before the stream starts") {
    withApi() { port =>
      val bodyAst =
        """{"dataset": "logs",
          |  "filter": {"k": "event_type", "v": [], "op": "exists"},
          |  "chart": {"aggregation": "sum", "groupBys": ["event_type"]}
          |}""".stripMargin
      val (code, text) = http(port, "POST",
        s"/api/v1/cardinality?s=$base&e=${base + 48 * hour}", bodyAst)
      assert(code == 200)
      val msgs = sseEvents(text).filter(_.has("message"))
      assert(msgs.map(_.get("message").asLong()) == Seq(2L))
      val (bad, _) = http(port, "POST",
        s"/api/v1/cardinality?s=$base&e=${base + 48 * hour}", "{nope")
      assert(bad == 400)
    }
  }
}
