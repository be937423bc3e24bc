package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.QueryHttpApi
import graft.engine.{ReplaySequencer, Telemetry}

/** Golden wire-format replay of the reference's own conformance queries
  * (query-api ASTUtilsBaseExprTest.scala:30-74 tag query, :80-216 logs
  * filter + extract + chart + exemplar, :219-289 groupBy on an extracted
  * field): the exact JSON payloads those tests feed the reference's SQL
  * generator are POSTed here through the HTTP/SSE shell against a
  * deterministic fixture, and the full SSE frame sequence is pinned.
  * This is the closest thing to a reference-blessed end-to-end suite:
  * parser → filter/extract/chart compilation → incremental delivery →
  * wire framing, one assertion per golden query. */
class GoldenWireSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val base = 1704067200000L // 2024-01-01T00:00:00Z
  private val hour = 3600000L

  // Columns named exactly as the reference's storage contract: dotted
  // resource tags, `_cardinalhq.message` as the extraction input,
  // `_cardinalhq.level` as a groupable tag.
  private lazy val tel: Telemetry = {
    val rows = Seq(
      // golden #2 matches (container=agent, 13-group pipe regex, word
      // "compressed" in the message)
      (base, "agent", "adservice", "info", 1.5,
        "Info | Flush | Rotate | (wal) | file has rotated, compressed (gzip)queue-a 10/20 done"),
      // one minute later: same chart bucket, but exemplar ts-DESC order
      // becomes total (no tie to leave the wire order unpinned)
      (base + 60000L, "agent", "adservice", "error", 2.0,
        "Warn | Flush | Rotate | (wal) | file has rotated, compressed (gzip)queue-b 30/40 fail"),
      (base + hour, "agent", "adservice", "info", 3.0,
        "Info | Merge | Rotate | (idx) | file has rotated, compressed (zstd)queue-a 50/60 done"),
      // golden #3 matches (service=adservice, bracketed rec tail)
      (base, "web", "adservice", "info", 5.0,
        "one two three four five [recA]"),
      (base + hour, "web", "adservice", "info", 7.0,
        "one two three four five [recB]"),
      // noise: wrong container / no regex match
      (base, "web", "cartservice", "info", 11.0, "compressed but no pipes"),
      (base + hour, "agent", "cartservice", "warn", 13.0, "no match at all"))
    val df = rows.map { case (ms, c, svc, lvl, v, m) =>
      (ms * 1000000L, c, svc, lvl, v, m)
    }.toDF("ts", "resource.container.name", "resource.service.name",
      "_cardinalhq.level", "value", "_cardinalhq.message")
    Telemetry.nanos(df, "ts", valueCol = col("value"),
      message = Some(col("`_cardinalhq.message`")))
  }

  private def withApi(f: Int => Unit): Unit = {
    val span = ReplaySequencer.SegmentSpan("s", base, base + 48 * hour)
    val api = new QueryHttpApi(_ => tel, segments = Seq(span),
      now = () => java.time.Instant.ofEpochMilli(base + 48 * hour))
    val port = api.start(0)
    try f(port) finally api.stop()
  }

  private def http(port: Int, path: String, body: String): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    (code, if (is == null) ""
      else new String(is.readAllBytes(), StandardCharsets.UTF_8))
  }

  /** The `data:` payloads, heartbeats dropped (timing-dependent). */
  private def frames(bodyText: String): Seq[JsonNode] =
    bodyText.split("\r\n\r\n").filter(_.nonEmpty).toSeq.map { c =>
      assert(c.startsWith("data: "), s"bad SSE frame: $c")
      mapper.readTree(c.stripPrefix("data: "))
    }.filterNot(n =>
      Option(n.get("type")).exists(_.asText() == "heartbeat"))

  // ---- the reference's golden payloads, verbatim ----------------------

  private val goldenTagPayload =
    """{
      |  "baseExpressions": {
      |    "A": {
      |      "dataset": "logs",
      |      "limit": 1000,
      |      "order": "DESC",
      |      "filter": {
      |        "q1": {
      |          "k": "resource.container.name",
      |          "v": ["agent"],
      |          "op": "eq",
      |          "dataType": "string",
      |          "extracted": false,
      |          "computed": false
      |        },
      |        "q2": {
      |          "k": "_cardinalhq.message",
      |          "v": ["compressed"],
      |          "op": "contains",
      |          "dataType": "string",
      |          "extracted": false,
      |          "computed": false
      |        },
      |        "op": "and"
      |      }
      |    }
      |  }
      |}""".stripMargin

  private val goldenExtractPayload =
    """{
      |  "baseExpressions": {
      |    "A": {
      |      "dataset": "logs",
      |      "limit": 1000,
      |      "order": "DESC",
      |      "filter": {
      |        "q1": {
      |          "k": "resource.container.name",
      |          "v": ["agent"],
      |          "op": "eq",
      |          "dataType": "string",
      |          "extracted": false,
      |          "computed": false
      |        },
      |        "q2": {
      |          "k": "_cardinalhq.message",
      |          "v": ["compressed"],
      |          "op": "contains",
      |          "dataType": "string",
      |          "extracted": false,
      |          "computed": false
      |        },
      |        "q3": {
      |          "k": "raw",
      |          "v": [""],
      |          "op": "has",
      |          "dataType": "number",
      |          "extracted": true,
      |          "computed": false
      |        },
      |        "q4": {
      |          "k": "compressed",
      |          "v": [""],
      |          "op": "has",
      |          "dataType": "number",
      |          "extracted": true,
      |          "computed": false
      |        },
      |        "op": "and"
      |      },
      |      "extract": {
      |        "regex": "([A-Za-z]+) \\| ([A-Za-z]+) \\| ([A-Za-z]+) \\| \\(([^)]*)\\) \\| ([A-Za-z]+) ([A-Za-z]+) ([A-Za-z]+), ([A-Za-z]+) \\(([^)]*)\\)([A-Za-z0-9-_.:]+) ([0-9]+)/([0-9]+) ([A-Za-z0-9-_.:]+)",
      |        "fields": [
      |          { "name": "var_1", "type": "string" },
      |          { "name": "var_2", "type": "string" },
      |          { "name": "var_3", "type": "string" },
      |          { "name": "var_4", "type": "string" },
      |          { "name": "var_5", "type": "string" },
      |          { "name": "var_6", "type": "string" },
      |          { "name": "var_7", "type": "string" },
      |          { "name": "var_8", "type": "string" },
      |          { "name": "var_9", "type": "string" },
      |          { "name": "var_10", "type": "string" },
      |          { "name": "raw", "type": "number" },
      |          { "name": "compressed", "type": "number" },
      |          { "name": "var_13", "type": "string" }
      |        ]
      |      },
      |      "chart": {
      |        "aggregation": "sum",
      |        "rollup": "sum",
      |        "groupBys": ["_cardinalhq.level"],
      |        "type": "count"
      |      }
      |    }
      |  }
      |}""".stripMargin

  private val goldenExtractGroupByPayload =
    """{
      |  "baseExpressions": {
      |    "a": {
      |      "dataset": "logs",
      |      "returnResults": true,
      |      "filter": {
      |        "op": "and",
      |        "q1": {
      |          "k": "resource.service.name",
      |          "v": ["adservice"],
      |          "op": "eq",
      |          "dataType": "string",
      |          "extracted": false,
      |          "computed": false
      |        },
      |        "q2": {
      |          "k": "rec",
      |          "v": [""],
      |          "op": "has",
      |          "dataType": "string",
      |          "extracted": true,
      |          "computed": false
      |        }
      |      },
      |      "extract": {
      |        "regex": "([A-Za-z]+) ([A-Za-z]+) ([A-Za-z]+) ([A-Za-z]+) ([A-Za-z]+) \\[([A-Za-z]+)\\]",
      |        "fields": [
      |          { "name": "var_0", "type": "string" },
      |          { "name": "var_1", "type": "string" },
      |          { "name": "var_2", "type": "string" },
      |          { "name": "var_3", "type": "string" },
      |          { "name": "var_4", "type": "string" },
      |          { "name": "rec",   "type": "string" }
      |        ]
      |      },
      |      "chart": {
      |        "aggregation": "sum",
      |        "rollup": "sum",
      |        "groupBys": ["rec"],
      |        "type": "count"
      |      }
      |    }
      |  }
      |}""".stripMargin

  /** Frame-sequence pin: parse both sides so JSON key order is free but
    * frame ORDER, count, and every field value are exact. */
  private def assertFrames(got: Seq[JsonNode], expected: Seq[String]): Unit = {
    val exp = expected.map(mapper.readTree)
    assert(got.size == exp.size,
      s"frame count ${got.size} != ${exp.size}:\n${got.mkString("\n")}")
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"frame $i:\n  got      $g\n  expected $e")
    }
  }

  test("golden tag query (ASTUtilsBaseExprTest.scala:30-74) over the " +
    "tags route: pinned frame sequence") {
    withApi { port =>
      val (code, text) = http(port,
        s"/api/v1/tags/logs?tagName=resource.container.name&s=$base&e=${base + 48 * hour}",
        goldenTagPayload)
      assert(code == 200)
      assertFrames(frames(text), Seq(
        """{"id":"_","type":"data","message":{"resource.container.name":"agent"}}""",
        """{"type":"done"}"""))
    }
  }

  test("golden extract+chart+exemplar query (ASTUtilsBaseExprTest.scala:" +
    "80-216) over the graph route: pinned frame sequence") {
    withApi { port =>
      val (code, text) = http(port,
        s"/api/v1/graph?s=$base&e=${base + 48 * hour}", goldenExtractPayload)
      assert(code == 200)
      // timeseries in (step_ts, label) replay order — the sum over the
      // extract-filtered rows, grouped by level; then exemplars in
      // ts-DESC order with the extracted struct fields flattened; done
      assertFrames(frames(text), Seq(
        """{"id":"_","type":"timeseries","message":{"timestamp":1704067200000,"tags":{"_cardinalhq.level":"error"},"value":2.0,"label":"error"}}""",
        """{"id":"_","type":"timeseries","message":{"timestamp":1704067200000,"tags":{"_cardinalhq.level":"info"},"value":1.5,"label":"info"}}""",
        """{"id":"_","type":"timeseries","message":{"timestamp":1704070800000,"tags":{"_cardinalhq.level":"info"},"value":3.0,"label":"info"}}""",
        """{"id":"A","type":"event","message":{"ts":1704070800000000000,"value":3.0,"resource.container.name":"agent","resource.service.name":"adservice","_cardinalhq.level":"info","_cardinalhq.message":"Info | Merge | Rotate | (idx) | file has rotated, compressed (zstd)queue-a 50/60 done","var_1":"Info","var_2":"Merge","var_3":"Rotate","var_4":"idx","var_5":"file","var_6":"has","var_7":"rotated","var_8":"compressed","var_9":"zstd","var_10":"queue-a","raw":50.0,"compressed":60.0,"var_13":"done"}}""",
        """{"id":"A","type":"event","message":{"ts":1704067260000000000,"value":2.0,"resource.container.name":"agent","resource.service.name":"adservice","_cardinalhq.level":"error","_cardinalhq.message":"Warn | Flush | Rotate | (wal) | file has rotated, compressed (gzip)queue-b 30/40 fail","var_1":"Warn","var_2":"Flush","var_3":"Rotate","var_4":"wal","var_5":"file","var_6":"has","var_7":"rotated","var_8":"compressed","var_9":"gzip","var_10":"queue-b","raw":30.0,"compressed":40.0,"var_13":"fail"}}""",
        """{"id":"A","type":"event","message":{"ts":1704067200000000000,"value":1.5,"resource.container.name":"agent","resource.service.name":"adservice","_cardinalhq.level":"info","_cardinalhq.message":"Info | Flush | Rotate | (wal) | file has rotated, compressed (gzip)queue-a 10/20 done","var_1":"Info","var_2":"Flush","var_3":"Rotate","var_4":"wal","var_5":"file","var_6":"has","var_7":"rotated","var_8":"compressed","var_9":"gzip","var_10":"queue-a","raw":10.0,"compressed":20.0,"var_13":"done"}}""",
        """{"type":"done"}"""))
    }
  }

  test("golden groupBy-on-extracted-field query (ASTUtilsBaseExprTest" +
    ".scala:219-289) over the graph route: pinned frame sequence") {
    withApi { port =>
      val (code, text) = http(port,
        s"/api/v1/graph?s=$base&e=${base + 48 * hour}",
        goldenExtractGroupByPayload)
      assert(code == 200)
      assertFrames(frames(text), Seq(
        """{"id":"_","type":"timeseries","message":{"timestamp":1704067200000,"tags":{"rec":"recA"},"value":5.0,"label":"recA"}}""",
        """{"id":"_","type":"timeseries","message":{"timestamp":1704070800000,"tags":{"rec":"recB"},"value":7.0,"label":"recB"}}""",
        """{"id":"a","type":"event","message":{"ts":1704070800000000000,"value":7.0,"resource.container.name":"web","resource.service.name":"adservice","_cardinalhq.level":"info","_cardinalhq.message":"one two three four five [recB]","var_0":"one","var_1":"two","var_2":"three","var_3":"four","var_4":"five","rec":"recB"}}""",
        """{"id":"a","type":"event","message":{"ts":1704067200000000000,"value":5.0,"resource.container.name":"web","resource.service.name":"adservice","_cardinalhq.level":"info","_cardinalhq.message":"one two three four five [recA]","var_0":"one","var_1":"two","var_2":"three","var_3":"four","var_4":"five","rec":"recA"}}""",
        """{"type":"done"}"""))
    }
  }
}
