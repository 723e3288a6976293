package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.storage.SeriesStore
import graft.sydraql.{CompileOptions, Engine, QueryError}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** The reference's HTTP surface rebuilt on the JDK server (zero extra
  * deps): ingest, range query, tag find, sydraQL, SQL-compat, metrics,
  * status (`/root/reference/src/sydra/http.zig`; §2.3/§2.14/§2.15 of
  * SURVEY.md). Bearer auth guards the api paths when a token is configured
  * (`http.zig:74-85`).
  *
  * This is the control plane: responses are capped (`maxRows`) — bulk
  * extraction belongs to the DataFrame/parquet surface, not JSON-over-HTTP.
  */
final class HttpApi(store: SeriesStore, token: Option[String] = None, maxRows: Int = 10000) {

  private val mapper = new ObjectMapper()
  private val ingestTotal = new AtomicLong
  private val queryTotal = new AtomicLong
  private val errorTotal = new AtomicLong
  private def translations = TranslationLog.translations
  private def fallbacks = TranslationLog.fallbacks
  private var server: HttpServer = _

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(Executors.newFixedThreadPool(4))
    server.createContext("/status", (ex: HttpExchange) => respond(ex, 200, """{"status":"ok"}"""))
    server.createContext("/metrics", (ex: HttpExchange) => handleSafely(ex)(handleMetrics))
    // debug endpoints (http.zig:87-119): compat stats + pg catalog dump
    server.createContext("/debug/compat/stats", (ex: HttpExchange) =>
      respond(ex, 200, s"""{"translations":${translations.get},"fallbacks":${fallbacks.get},"cache_hits":${TranslationLog.cacheHits.get}}"""))
    server.createContext("/debug/compat/catalog", (ex: HttpExchange) =>
      handleSafely(ex)(e => respond(e, 200, mapper.writeValueAsString(PgCatalog.toJsonNode(mapper)))))
    // allocator-shard stats have no JVM analog (http.zig:96-98); report
    // heap occupancy in the same slot
    server.createContext("/debug/alloc/stats", (ex: HttpExchange) => {
      val rt = Runtime.getRuntime
      respond(ex, 200,
        s"""{"mode":"jvm","heap_used":${rt.totalMemory - rt.freeMemory},"heap_max":${rt.maxMemory}}""")
    })
    server.createContext("/api/v1/ingest", (ex: HttpExchange) => handleSafely(ex)(handleIngest))
    server.createContext("/api/v1/query/range", (ex: HttpExchange) => handleSafely(ex)(handleRange))
    server.createContext("/api/v1/query/find", (ex: HttpExchange) => handleSafely(ex)(handleFind))
    server.createContext("/api/v1/sydraql", (ex: HttpExchange) => handleSafely(ex)(handleSydraql))
    server.createContext("/api/v1/sql", (ex: HttpExchange) => handleSafely(ex)(handleSql))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ------------------------------------------------------------- handlers

  private def handleIngest(ex: HttpExchange): Unit = {
    val lines = body(ex).split('\n').map(_.trim).filter(_.nonEmpty)
    val rows = lines.toSeq.map { line =>
      val n = mapper.readTree(line)
      val series = Option(n.get("series")).map(_.asText())
        .getOrElse(throw QueryError(QueryError.InvalidSyntax, "series required"))
      val ts = Option(n.get("ts")).map(_.asLong())
        .getOrElse(throw QueryError(QueryError.InvalidSyntax, "ts required"))
      val value: java.lang.Double = Option(n.get("value")).map(v => Double.box(v.asDouble()))
        .orElse(firstNumericField(n.get("fields")))
        .getOrElse(Double.box(0.0))
      // ListMap preserves JSON document key order: the reference hashes the
      // tags JSON in document order (http.zig extractTagsJson), so a plain
      // HashMap (>4 entries) would derive a different series_id
      val tags: Map[String, String] = Option(n.get("tags")).map(t =>
        scala.collection.immutable.ListMap(
          t.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq: _*)).getOrElse(Map.empty)
      Row(series, tags, ts, value: java.lang.Double)
    }
    val schema = StructType(Seq(
      StructField("series", StringType), StructField("tags", MapType(StringType, StringType)),
      StructField("time", LongType), StructField("value", DoubleType)))
    store.append(store.spark.createDataFrame(rows.asJava, schema))
    ingestTotal.addAndGet(lines.length.toLong)
    respond(ex, 200, s"""{"ingested":${lines.length}}""")
  }

  private def firstNumericField(fields: JsonNode): Option[java.lang.Double] =
    Option(fields).flatMap(f =>
      f.fields().asScala.find(_.getValue.isNumber).map(e => Double.box(e.getValue.asDouble())))

  private def handleRange(ex: HttpExchange): Unit = {
    val p: Map[String, String] =
      if (ex.getRequestMethod == "GET") queryParams(ex)
      else {
        val n = mapper.readTree(body(ex))
        n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }
    val start = p.getOrElse("start", "0").toLong
    val end = p.getOrElse("end", Long.MaxValue.toString).toLong
    var df = store.scanRange(start, end)
    df = p.get("series_id") match {
      case Some(id) => df.filter(col("series_id") === id.toLong)
      case None => p.get("series") match {
        case Some(s) => df.filter(col("series") === s)
        case None => throw QueryError(QueryError.InvalidSyntax, "series or series_id required")
      }
    }
    queryTotal.incrementAndGet()
    val pts = df.orderBy("time").limit(maxRows).select("time", "value").collect()
    val arr = mapper.createArrayNode()
    pts.foreach { r =>
      val o = arr.addObject()
      o.put("ts", r.getLong(0))
      if (r.isNullAt(1)) o.putNull("value") else o.put("value", r.getDouble(1))
    }
    respond(ex, 200, mapper.writeValueAsString(arr))
  }

  private def handleFind(ex: HttpExchange): Unit = {
    val n = mapper.readTree(body(ex))
    val tags = Option(n.get("tags")).map(t =>
      t.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
    val op = Option(n.get("op")).map(_.asText()).getOrElse("and")
    val ids = store.findSeries(tags, op).collect().map(_.getLong(0))
    queryTotal.incrementAndGet()
    respond(ex, 200, mapper.writeValueAsString(ids))
  }

  private def handleSydraql(ex: HttpExchange): Unit = {
    val q = Option(mapper.readTree(body(ex)).get("query")).map(_.asText())
      .getOrElse(throw QueryError(QueryError.InvalidSyntax, "query required"))
    respondQuery(ex, q)
  }

  /** pg-compat analog over HTTP: SQL → sydraQL → engine. */
  private def handleSql(ex: HttpExchange): Unit = {
    val q = Option(mapper.readTree(body(ex)).get("query")).map(_.asText())
      .getOrElse(throw QueryError(QueryError.InvalidSyntax, "query required"))
    TranslationLog.translate(q) match {
      case Translator.Success(sydraql) => respondQuery(ex, sydraql)
      case Translator.Failure(state, msg) =>
        respond(ex, 400, s"""{"sqlstate":"$state","error":"$msg"}""")
    }
  }

  private def respondQuery(ex: HttpExchange, sydraql: String): Unit = {
    val t0 = System.nanoTime()
    val res = Engine.executeOnStore(store, sydraql, CompileOptions())
    val limited = res.df.limit(maxRows)
    val rows = limited.collect()
    val pipelineUs = (System.nanoTime() - t0) / 1000
    queryTotal.incrementAndGet()
    val out: ObjectNode = mapper.createObjectNode()
    val colsNode = out.putArray("columns")
    res.df.columns.foreach(colsNode.add)
    val data: ArrayNode = out.putArray("rows")
    rows.foreach { r => data.add(rowToJson(r)) }
    val stats = out.putObject("stats")
    stats.put("parse_us", res.stats.parseUs)
    stats.put("validate_us", res.stats.validateUs)
    stats.put("compile_us", res.stats.compileUs)
    // Catalyst phase timings (QueryPlanningTracker) — the analog of the
    // reference's optimize_ms/physical_ms stages (exec.zig:48-58)
    try {
      val phases = limited.queryExecution.tracker.phases
      def us(k: String): Long =
        phases.get(k).map(p => (p.endTimeMs - p.startTimeMs) * 1000).getOrElse(0L)
      stats.put("optimize_us", us("optimization"))
      stats.put("physical_us", us("planning"))
    } catch { case _: Throwable => () }
    stats.put("pipeline_us", pipelineUs)
    stats.put("rows_emitted", rows.length)
    stats.put("trace_id", res.stats.traceId)
    // serve-route attribution (r15): "raw", "served:cells:td",
    // "served:hybrid:tdtag", "insert", "delete" — so a raw-path
    // fallthrough on a dashboard shape is visible without EXPLAIN
    stats.put("route", res.stats.route)
    // per-operator instrumentation (reference: operator.zig:30-48 snapshots)
    try {
      val ops = stats.putArray("operators")
      org.apache.spark.sql.graftshim.GraftShim
        .operatorStats(limited.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
        .foreach { case (name, rowsOut) =>
          val o = ops.addObject()
          o.put("name", name)
          o.put("rows_out", rowsOut)
        }
    } catch { case _: Throwable => () } // stats are best-effort
    respond(ex, 200, mapper.writeValueAsString(out))
  }

  private def rowToJson(r: Row): ArrayNode = {
    val arr = mapper.createArrayNode()
    (0 until r.length).foreach { i =>
      if (r.isNullAt(i)) arr.addNull()
      else r.get(i) match {
        case l: Long => arr.add(l)
        case n: Int => arr.add(n)
        case d: Double => arr.add(d)
        case b: Boolean => arr.add(b)
        case other => arr.add(other.toString)
      }
    }
    arr
  }

  private def handleMetrics(ex: HttpExchange): Unit = {
    val nSeries = if (store.isEmpty) 0L else store.catalog().count()
    val text =
      s"""# TYPE sydra_ingest_total counter
         |sydra_ingest_total ${ingestTotal.get}
         |# TYPE sydra_query_total counter
         |sydra_query_total ${queryTotal.get}
         |# TYPE sydra_error_total counter
         |sydra_error_total ${errorTotal.get}
         |# TYPE sydra_compat_translations_total counter
         |sydra_compat_translations_total ${translations.get}
         |# TYPE sydra_compat_fallbacks_total counter
         |sydra_compat_fallbacks_total ${fallbacks.get}
         |# TYPE sydra_series gauge
         |sydra_series $nSeries
         |""".stripMargin
    respond(ex, 200, text, "text/plain; version=0.0.4")
  }

  // -------------------------------------------------------------- helpers

  private def handleSafely(ex: HttpExchange)(f: HttpExchange => Unit): Unit =
    try {
      if (ex.getRequestURI.getPath.startsWith("/api/") && !authorized(ex))
        respond(ex, 401, """{"error":"unauthorized"}""")
      else f(ex)
    } catch {
      case qe: QueryError =>
        errorTotal.incrementAndGet()
        respond(ex, 400,
          s"""{"sqlstate":"${SqlState.fromQueryError(qe.code)}","code":"${qe.code}","error":${mapper.writeValueAsString(qe.message)}}""")
      case e: Throwable =>
        errorTotal.incrementAndGet()
        respond(ex, 500, s"""{"sqlstate":"${SqlState.InternalError}","error":${mapper.writeValueAsString(String.valueOf(e.getMessage))}}""")
    }

  private def authorized(ex: HttpExchange): Boolean = token.forall { t =>
    Option(ex.getRequestHeaders.getFirst("Authorization")).contains(s"Bearer $t")
  }

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split('&').flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, UTF_8))
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  private def respond(ex: HttpExchange, status: Int, bodyStr: String,
      contentType: String = "application/json"): Unit = {
    val bytes = bodyStr.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    os.write(bytes)
    os.close()
  }
}
