package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.Row

import graft.ast.{AstJson, BaseExpr, Filter, Ops, BinaryClause}
import graft.engine.{QueryEngine, ReplaySequencer, Telemetry}
import graft.functions.TimeRange

/** The HTTP/SSE transport shell over [[graft.engine.QueryEngine]] — the
  * reference's query-api route surface (QueryApi.scala:57-401) served
  * from the JDK's built-in HTTP server, so a reference client can point
  * at this engine unchanged:
  *
  *  - `POST /api/v1/graph?s=&e=[&timeseriesOnly=]` — SSE stream of
  *    `{"id","type":"timeseries","message":{timestamp,tags,value,label}}`
  *    events (QueryEngineV2.scala:400-417), auto-exemplar
  *    `type:"event"` payloads beside every log/trace chart expression
  *    (QueryApi.scala:236-270, QueryEngineV2.scala:545-552), terminated
  *    by `{"type":"done"}` (SSEMessage.scala:30). When segment spans
  *    are registered, delivery is INCREMENTAL: sealed replay groups
  *    stream group-at-a-time through
  *    [[QueryEngine.evaluateIncremental]], flushed per batch — the SSE
  *    half of O4/T6.
  *  - `POST /api/v1/tags/{dataset}?tagName=&s=&e=&limit=` — SSE of tag
  *    payloads (`message = {tag: value}` / name→count for the name
  *    query), default limit 1000 (QueryApi.scala:99-175).
  *  - `POST /api/v1/cardinality?s=&e=` — SSE of
  *    `{"message": <estimate>}` strings (QueryApi.scala:71-95).
  *  - `GET /api/v1/scopeTags`, `/api/v1/functionSpecs`,
  *    `/api/v1/metricMetadata` — plain JSON; `GET /ready` — 200.
  *
  * Time strings (`s`,`e` = `"e-1h"`, `"now"`, epoch ms, ISO) resolve
  * via [[TimeRange.resolve]]; the step mirrors the reference's
  * duration ladder ([[TimeRange.autoStepMillis]],
  * QueryApi.scala:297-309). Transport only: every data-plane behavior
  * lives in the engine and is oracle-checked there.
  *
  * Multi-tenant scoping: the reference runs every route inside
  * `auth { customerId => … }` (QueryApi.scala:73,101) and keys storage
  * by customer/collector (Commons.scala:160-177). When `tenants` is
  * non-empty, every /api route requires `Authorization: Bearer <key>`;
  * the key resolves (via `authenticate`) to a customerId whose
  * [[QueryHttpApi.Tenant]] carries its OWN table provider and segment
  * registry — queries, pruning, and replay sequencing all scope to that
  * tenant's data. Missing/unknown credentials → 401 before any stream
  * starts. With `tenants` empty the shell is single-tenant (no auth),
  * the embedded-test posture.
  */
final class QueryHttpApi(
    tables: String => Telemetry,
    segments: Seq[ReplaySequencer.SegmentSpan] = Nil,
    minGroupSize: Int = 4,
    metricNameColumn: String = "event_type",
    heartbeatMillis: Long = 1000,
    now: () => java.time.Instant = () => java.time.Instant.now(),
    tenants: Map[String, QueryHttpApi.Tenant] = Map.empty,
    authenticate: HttpExchange => Option[String] = QueryHttpApi.bearerAuth,
    verifier: String => Option[String] = Some(_),
    writeStallMillis: Long = 15000) {

  import QueryHttpApi.{Tenant, Unauthorized}

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private val heartbeater =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-sse-heartbeat"); t.setDaemon(true); t
    })
  // heartbeat WRITES run here, never on the scheduler thread: one
  // stalled client (full socket buffer) must not wedge the shared timer
  // and silence keep-alives/disconnect-detection for every other stream
  private val hbWriters = java.util.concurrent.Executors
    .newCachedThreadPool(r => {
      val t = new Thread(r, "graft-sse-hb-write"); t.setDaemon(true); t
    })

  /** The per-request tenant scope: single-tenant when no registry, else
    * Bearer credential → `verifier` → customerId → that tenant's
    * tables+segments, 401 otherwise (thrown pre-stream, so the client
    * sees a real status). The default verifier is the identity
    * (credential IS the customerId — the static-registry posture);
    * production plugs [[SignedToken.verifier]], the reference's
    * JWT-validation twin (AuthToken.scala:17-40), so expiry and forged
    * signatures reject before the tenant lookup. */
  private def scope(ex: HttpExchange): Tenant =
    if (tenants.isEmpty) Tenant(tables, segments)
    else authenticate(ex).flatMap(verifier).flatMap(tenants.get)
      .getOrElse(throw new Unauthorized)

  /** Start on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/ready", exchange => {
      exchange.sendResponseHeaders(200, -1); exchange.close()
    })
    server.createContext("/api/v1/scopeTags", json { (_, _) =>
      mapper.writeValueAsString(
        QueryEngine.scopeTags.toArray)
    })
    server.createContext("/api/v1/functionSpecs", json { (_, _) =>
      mapper.writeValueAsString(
        graft.plans.GraftExtensions.functions.map(_._1).sorted.toArray)
    })
    server.createContext("/api/v1/metricMetadata", json { (_, tenant) =>
      val rows = QueryEngine.metricMetadata(
        tenant.tables("metrics"), metricNameColumn).collect()
      mapper.writeValueAsString(rows.map(r => java.util.Map.of(
        "metricName", r.getString(0), "metricType", r.getString(1))))
    })
    server.createContext("/api/v1/graph", sse(handleGraph))
    server.createContext("/api/v1/tags", sse(handleTags))
    server.createContext("/api/v1/cardinality", sse(handleCardinality))
    // one pooled thread per in-flight request (the default is a single
    // dispatcher thread — one slow SSE stream would serialize every
    // other request); job groups are thread-local, so each request's
    // Spark work stays attributable and cancellable
    server.setExecutor(java.util.concurrent.Executors
      .newCachedThreadPool(r => {
        val t = new Thread(r, "graft-http"); t.setDaemon(true); t
      }))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    heartbeater.shutdownNow()
    hbWriters.shutdownNow()
  }

  // ------------------------------------------------------------ plumbing

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def timeRange(p: Map[String, String]): (Long, Long) =
    TimeRange.resolve(p.getOrElse("s", "e-1h"), p.getOrElse("e", "now"),
      now())

  private def json(f: (HttpExchange, Tenant) => String)
      : com.sun.net.httpserver.HttpHandler = { ex =>
    try {
      val bytes = f(ex, scope(ex)).getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
    } catch {
      case _: Unauthorized => ex.sendResponseHeaders(401, -1)
      case e: Exception =>
        val msg = String.valueOf(e.getMessage)
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(400, msg.length)
        ex.getResponseBody.write(msg)
    } finally ex.close()
  }

  /** SSE endpoint shell: chunked text/event-stream, handler emits
    * events through `emit`, then the done sentinel; a pre-stream error
    * becomes a 400 like the reference (QueryApi.scala:283-288), a
    * missing/unknown credential a 401. */
  private[api] def sse(f: (HttpExchange, Tenant, String => Unit) => Unit)
      : com.sun.net.httpserver.HttpHandler = { ex =>
    // headers go out on the FIRST event, so parse/plan errors (which
    // all happen before any emit) can still answer 400 like the
    // reference (QueryApi.scala:283-288). `streaming` is written by the
    // handler thread and read by the heartbeat scheduler — volatile so
    // the scheduler reliably observes the stream going live.
    @volatile var streaming = false
    // heartbeat/handler share the socket; ReentrantLock (not
    // synchronized) so state stays inspectable from the scheduler
    val lock = new java.util.concurrent.locks.ReentrantLock()
    @volatile var lastWrite = System.nanoTime()
    // nanoTime when a socket write BEGAN; 0 = no write in flight. The
    // scheduler uses it as a write deadline: a client that stopped
    // reading leaves some thread blocked on a full socket buffer —
    // after writeStallMillis the scheduler force-closes the exchange
    // (breaking the blocked write) and cancels the job group, instead
    // of letting the stall wedge heartbeats for every other stream.
    @volatile var writeStart = 0L
    val hbPending = new java.util.concurrent.atomic.AtomicBoolean(false)
    // per-request Spark job group (thread-local, inherited by every job
    // this handler launches) so an abandoned stream can be CANCELLED —
    // the reference tears the Akka stream down on disconnect; here a
    // disconnect must stop the remaining replay groups' cluster work,
    // not just the writes
    val qid = "graft-sse-" +
      java.util.UUID.randomUUID().toString.substring(0, 8)
    val sc = org.apache.spark.sql.SparkSession.getDefaultSession
      .orElse(org.apache.spark.sql.SparkSession.getActiveSession)
      .map(_.sparkContext)
    def cancel(): Unit =
      sc.foreach(c => try c.cancelJobGroup(qid)
      catch { case _: Exception => () })
    def raw(jsonStr: String): Unit = {
      lock.lock()
      try {
        writeStart = System.nanoTime()
        ex.getResponseBody.write(("data: " + jsonStr + "\r\n\r\n")
          .getBytes(StandardCharsets.UTF_8))
        ex.getResponseBody.flush() // per-event flush = incremental delivery
        lastWrite = System.nanoTime()
      } finally {
        writeStart = 0L
        lock.unlock()
      }
    }
    def emit(jsonStr: String): Unit = {
      if (!streaming) {
        ex.getResponseHeaders.add("Content-Type", "text/event-stream")
        ex.sendResponseHeaders(200, 0) // 0 = chunked
        streaming = true
      }
      raw(jsonStr)
    }
    // T5 keep-alive (reference Commons.scala:501 keepAlive(1s,
    // Heartbeat)): while a replay group's job runs, the client still
    // sees bytes — only AFTER the headers are committed, so the 400
    // path never races. The heartbeat doubles as the DISCONNECT
    // detector: a failed keep-alive write cancels the job group within
    // one interval, even while a long job is still running
    var hb: java.util.concurrent.ScheduledFuture[_] = null
    try {
      val tenant = scope(ex) // 401 before any header commits
      ex.setAttribute("body", body(ex)) // read before responding
      sc.foreach { c =>
        c.setJobGroup(qid, s"sse ${ex.getRequestURI.getPath}",
          interruptOnCancel = true)
        // own FAIR pool per request (weight-1 on-demand pools, same
        // posture ConcurrentBench measures): one heavy query fair-shares
        // the cluster instead of starving every other stream. Inert
        // under the default FIFO scheduler.
        c.setLocalProperty("spark.scheduler.pool", qid)
      }
      // The scheduler tick NEVER touches the socket — it watches the
      // write deadline and dispatches due heartbeats to hbWriters, so a
      // stalled stream can only wedge its own writer thread (and the
      // deadline breaks even that by force-closing the exchange).
      hb = heartbeater.scheduleAtFixedRate(() => {
        val ws = writeStart
        if (ws != 0 &&
            (System.nanoTime() - ws) / 1000000 >= writeStallMillis) {
          cancel() // client stopped reading: stop the cluster work...
          try ex.close() // ...and break the thread blocked in write()
          catch { case _: Exception => () }
        } else if (streaming && ws == 0 &&
            (System.nanoTime() - lastWrite) / 1000000 >= heartbeatMillis &&
            hbPending.compareAndSet(false, true)) {
          hbWriters.execute(() => {
            try raw("""{"type":"heartbeat"}""")
            catch { case _: Exception => cancel() } // client went away
            finally hbPending.set(false)
          })
        }
      }, heartbeatMillis, heartbeatMillis,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      f(ex, tenant, emit)
      emit("""{"type":"done"}""")
    } catch {
      case _: Unauthorized =>
        ex.sendResponseHeaders(401, -1)
      case e: Exception if !streaming =>
        val msg = String.valueOf(e.getMessage)
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(400, msg.length)
        ex.getResponseBody.write(msg)
      case _: Exception =>
        // mid-stream: the truncated stream (no done sentinel) is the
        // error signal, as in SSE generally; stop the remaining work
        cancel()
    } finally {
      // Teardown: stop scheduling new heartbeats, then close the
      // exchange UNDER the write lock when it can be acquired quickly —
      // a healthy in-flight heartbeat raw() holds the lock for
      // microseconds, and close()'s terminal chunk must not interleave
      // with its write on the non-thread-safe chunked stream. Fall back
      // to a LOCK-FREE close only when the lock doesn't come in time:
      // that means a writer is parked on a stalled socket (it holds the
      // lock until the write deadline), and close() is precisely what
      // breaks that parked write — blocking on the lock here would
      // deadlock this handler thread behind the parked writer whenever
      // it unwinds via a mid-stream exception before the deadline.
      if (hb != null) hb.cancel(false)
      val locked =
        try lock.tryLock(250, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch { case _: InterruptedException =>
          Thread.currentThread().interrupt(); false }
      try ex.close() catch { case _: Exception => () }
      finally if (locked) lock.unlock()
      sc.foreach { c =>
        c.clearJobGroup()
        c.setLocalProperty("spark.scheduler.pool", null)
      }
    }
  }

  private def payload(id: String, tpe: String,
      message: java.util.Map[String, AnyRef]): String =
    mapper.writeValueAsString(java.util.Map.of(
      "id", id, "type", tpe, "message", message))

  // ------------------------------------------------------------- routes

  private def handleGraph(ex: HttpExchange, tenant: Tenant,
      emit: String => Unit): Unit = {
    val tables = tenant.tables
    val segments = tenant.segments
    val p = params(ex)
    val (startMs, endMs) = timeRange(p)
    val stepMs = TimeRange.autoStepMillis(startMs, endMs)
    val ast = AstJson.parseAstInput(
      ex.getAttribute("body").asInstanceOf[String])
    val groupBys = ast.baseExpressions.values.flatMap(_.chart)
      .flatMap(_.groupBys).toList.distinct

    def tagsOf(groupKey: String): java.util.Map[String, AnyRef] = {
      val m = new java.util.LinkedHashMap[String, AnyRef]()
      val parts = groupKey.split(":", -1)
      if (groupBys.nonEmpty && parts.length == groupBys.length)
        groupBys.zip(parts).foreach { case (k, v) => m.put(k, v) }
      else if (groupKey.nonEmpty) m.put("group", groupKey)
      m
    }
    def emitChartRow(r: Row): Unit = {
      val m = new java.util.LinkedHashMap[String, AnyRef]()
      m.put("timestamp", Long.box(r.getLong(r.fieldIndex("step_ts"))))
      m.put("tags", tagsOf(r.getString(r.fieldIndex("group_key"))))
      m.put("value", Double.box(r.getDouble(r.fieldIndex("value"))))
      m.put("label", r.getString(r.fieldIndex("label")))
      emit(payload("_", "timeseries", m))
    }

    if (p.get("explain").exists(_.toBoolean)) {
      // plan-only mode: one "explain" event with the formatted physical
      // plan (pushdown/pruning/codegen spans visible to the operator)
      // and the replay-group count the incremental path would run —
      // nothing executes, so this answers in planning time even when
      // the window covers months of segments
      val df = QueryEngine.evaluate(tables, ast, startMs, endMs, stepMs)
      val m = new java.util.LinkedHashMap[String, AnyRef]()
      m.put("stepMs", Long.box(stepMs))
      if (segments.nonEmpty)
        m.put("replayGroups", Int.box(ReplaySequencer.sequence(
          segments, startMs, endMs, stepMs, minGroupSize).size))
      m.put("plan",
        org.apache.spark.sql.GraftColumnBridge.explainString(df))
      emit(payload("_", "explain", m))
      return
    }

    if (segments.nonEmpty) {
      // incremental: sealed replay groups stream group-at-a-time; the
      // lazy iterator runs each group's pruned job as the socket drains
      QueryEngine.streamRows(QueryEngine.evaluateIncremental(
          tables, ast, startMs, endMs, stepMs, segments, minGroupSize))
        .foreach { case (_, _, r) => emitChartRow(r) }
    } else {
      // batch path drains through toLocalIterator like the incremental
      // one — one partition in flight, never the whole chart buffered on
      // the driver (a year at 1h step × a high-cardinality groupBy would
      // otherwise sit in driver memory before the first byte goes out)
      import scala.jdk.CollectionConverters._
      QueryEngine.evaluate(tables, ast, startMs, endMs, stepMs)
        .toLocalIterator().asScala.foreach(emitChartRow)
    }

    // auto-exemplars beside every returning log/trace chart expression
    if (!p.get("timeseriesOnly").exists(_.toBoolean)) {
      import scala.jdk.CollectionConverters._
      def emitExemplar(id: String)(r: Row): Unit = {
        val m = new java.util.LinkedHashMap[String, AnyRef]()
        r.schema.fields.zipWithIndex.foreach { case (f2, i) =>
          m.put(f2.name,
            if (r.isNullAt(i)) null
            else r.get(i).asInstanceOf[AnyRef])
        }
        emit(payload(id, "event", m))
      }
      ast.baseExpressions.toList.sortBy(_._1).foreach { case (id, b) =>
        if (b.returnResults && b.chart.nonEmpty &&
            (b.dataset == "logs" || b.dataset == "traces")) {
          if (segments.nonEmpty)
            // per-replay-group exemplar frames, flushed as each group's
            // pruned job completes (QueryEngineV2.scala:493-543)
            QueryEngine.exemplarsIncremental(tables(b.dataset), b,
                startMs, endMs, stepMs, segments, minGroupSize)
              .foreach { case (_, df) =>
                df.toLocalIterator().asScala.foreach(emitExemplar(id))
              }
          else
            QueryEngine.exemplars(tables(b.dataset), b, startMs, endMs)
              .toLocalIterator().asScala.foreach(emitExemplar(id))
        }
      }
    }
  }

  private def handleTags(ex: HttpExchange, tenant: Tenant,
      emit: String => Unit): Unit = {
    import scala.jdk.CollectionConverters._
    val p = params(ex)
    val (startMs, endMs) = timeRange(p)
    val dataset = ex.getRequestURI.getPath.stripPrefix("/api/v1/tags")
      .stripPrefix("/") match { case "" => "logs"; case d => d }
    val q = ex.getAttribute("body").asInstanceOf[String]
    // The reference's tag route parses a BARE BaseExpr only —
    // ASTUtils.toBaseExpr (ASTUtils.scala:290) reads top-level
    // id/dataset/filter and would reject a `baseExpressions` wrapper.
    // Accepting the wrapper here is a deliberate LENIENT EXTENSION (not
    // parity): dashboards tend to re-POST the /graph payload verbatim,
    // and rejecting it buys nothing. When a wrapper arrives we scope
    // tags to its first expression by id — tag discovery needs ONE
    // filter context, ids order deterministically, and silently merging
    // several expressions' filters would answer a question nobody
    // asked; the other expressions are intentionally ignored.
    val expr =
      if (q.trim.isEmpty)
        BaseExpr(id = "_", dataset = dataset,
          filter = Filter("event_type", Nil, Ops.EXISTS))
      else if (mapper.readTree(q).has("baseExpressions"))
        AstJson.parseAstInput(q).baseExpressions.toList.sortBy(_._1)
          .headOption.map(_._2).getOrElse(
            throw new IllegalArgumentException("empty baseExpressions"))
      else AstJson.parseBaseExpr(q)
    val limit = p.get("limit").map(_.toInt).getOrElse(1000)
    val tel = tenant.tables(dataset)
    p.get("tagName") match {
      case Some(tag) if tenant.segments.nonEmpty =>
        // replay-group incremental delivery: each group flushes only the
        // values NOT seen in any earlier group (first-seen dedup at the
        // coordinator, QueryEngineV2.scala:419-491), so a dropdown fills
        // from the first group while the rest of the window replays
        var sent = 0
        val it = QueryEngine.tagValuesIncremental(tel, expr, tag,
          startMs, endMs, TimeRange.autoStepMillis(startMs, endMs),
          tenant.segments, minGroupSize)
        while (sent < limit && it.hasNext) {
          val (_, fresh) = it.next()
          fresh.take(limit - sent).foreach { v =>
            emit(payload("_", "data", java.util.Map.of(tag, v)))
            sent += 1
          }
        }
      case Some(tag) =>
        QueryEngine.tagValues(tel, expr, tag, startMs, endMs, limit)
          .toLocalIterator().asScala.foreach { r =>
            emit(payload("_", "data", java.util.Map.of(
              tag, r.getString(r.fieldIndex("tagValue")))))
          }
      case None =>
        QueryEngine.tagNames(tel, expr, startMs, endMs, limit)
          .toLocalIterator().asScala.foreach { r =>
            emit(payload("_", "data",
              java.util.Map.of("name", r.getString(0))))
          }
    }
  }

  private def handleCardinality(ex: HttpExchange, tenant: Tenant,
      emit: String => Unit): Unit = {
    val segments = tenant.segments
    val p = params(ex)
    val (startMs, endMs) = timeRange(p)
    // Same LENIENT EXTENSION as the tags route (see handleTags): the
    // reference accepts only a bare BaseExpr here; we additionally
    // accept the /graph-style `baseExpressions` wrapper and scope to
    // its first expression by id, ignoring the rest.
    val q = ex.getAttribute("body").asInstanceOf[String]
    val expr =
      if (mapper.readTree(q).has("baseExpressions"))
        AstJson.parseAstInput(q).baseExpressions.toList.sortBy(_._1)
          .headOption.map(_._2).getOrElse(
            throw new IllegalArgumentException("empty baseExpressions"))
      else AstJson.parseBaseExpr(q)
    val groupBys = expr.chart.map(_.groupBys).getOrElse(Nil)
    val tel = tenant.tables(expr.dataset)
    if (segments.nonEmpty) {
      // running estimate per replay group, the reference's converging
      // cardinality stream (QueryEngineV2.scala:599-668)
      QueryEngine.cardinalityIncremental(tel, expr, groupBys,
          startMs, endMs, TimeRange.autoStepMillis(startMs, endMs),
          segments, minGroupSize)
        .foreach { case (_, est) =>
          emit(s"""{"message": ${math.rint(est).toLong}}""")
        }
    } else {
      val est = QueryEngine.cardinality(tel, expr, groupBys,
        startMs, endMs).head().getLong(0)
      emit(s"""{"message": $est}""")
    }
  }
}

object QueryHttpApi {

  /** One tenant's data scope: its table provider and its registered
    * sealed-segment replay spans. The reference keys both by
    * customer/collector in the storage layout (Commons.scala:160-177);
    * here each customerId maps to its own Tenant, so every route —
    * queries, pruning, replay sequencing, metadata — sees only that
    * tenant's data. */
  case class Tenant(tables: String => Telemetry,
      segments: Seq[ReplaySequencer.SegmentSpan] = Nil)

  /** Default credential extractor: `Authorization: Bearer <key>`, the
    * key doubling as the tenant registry lookup (swap in a real
    * token-validation function for production auth). */
  def bearerAuth(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer "))
      .map(_.stripPrefix("Bearer ").trim)
      .filter(_.nonEmpty)

  /** Pre-stream auth failure → 401, mirroring the reference's
    * `auth { customerId => … }` reject path (QueryApi.scala:73,101). */
  private[api] final class Unauthorized extends Exception("unauthorized")
}
