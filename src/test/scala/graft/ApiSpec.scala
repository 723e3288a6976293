package graft

import graft.api.{HttpApi, Translator}
import graft.storage.SeriesStore
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** Translator corpus (behavior-matched to the reference fixture
  * tests/translator/cases.jsonl) + HTTP surface round-trip.
  */
class ApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- translator corpus -------------------------------------------------

  private def ok(sql: String, expected: String): Unit =
    Translator.translate(sql) match {
      case Translator.Success(s) => assert(s === expected, sql)
      case f => fail(s"$sql → $f, expected success")
    }
  private def err(sql: String): Unit =
    Translator.translate(sql) match {
      case Translator.Failure(state, msg) =>
        assert(state === "0A000"); assert(msg === "feature not supported")
      case s => fail(s"$sql → $s, expected 0A000")
    }

  test("translator success corpus") {
    ok("SELECT 1", "select 1")
    ok("SELECT 1;", "select 1")
    ok("INSERT INTO users(id) VALUES (1)", "insert into users (id) values (1)")
    ok("SELECT id, name FROM users", "select id,name from users")
    ok("SELECT name FROM users WHERE id = 42", "select name from users where id = 42")
    ok("select * from accounts", "select * from accounts")
    ok("DELETE FROM users WHERE id = 42", "delete from users where id = 42")
    ok("DELETE FROM sessions", "delete from sessions")
  }

  test("translator failure corpus (UPDATE / RETURNING / malformed)") {
    err("UPDATE users SET name = 'rex' WHERE id = 1")
    err("UPDATE accounts SET balance = balance + 1")
    err("UPDATE users SET")
    err("INSERT INTO users (id) VALUES (2) RETURNING id")
    err("INSERT INTO users (id) VALUES (3) RETURNING")
    err("UPDATE users SET name = 'rex' WHERE id = 1 RETURNING id")
    err("UPDATE users SET name = 'rex' RETURNING")
    err("DELETE FROM users WHERE")
    err("DELETE FROM users WHERE id = 5 RETURNING id")
    err("DELETE FROM users RETURNING")
  }

  // ---- HTTP surface ------------------------------------------------------

  private val client = HttpClient.newHttpClient()
  private def post(port: Int, path: String, bodyStr: String, tok: Option[String] = Some("t0")): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(bodyStr))
    tok.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }
  private def get(port: Int, path: String, tok: Option[String] = Some("t0")): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET()
    tok.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("translation log: counters + sampled JSONL emission (compat/log.zig:4-53)") {
    import graft.api.TranslationLog
    val t0 = TranslationLog.translations.get
    val f0 = TranslationLog.fallbacks.get
    val err = new java.io.ByteArrayOutputStream()
    Console.withErr(new java.io.PrintStream(err)) {
      assert(TranslationLog.translate("SELECT 1").isInstanceOf[Translator.Success])
      assert(TranslationLog.translate("UPDATE x SET y = 1").isInstanceOf[Translator.Failure])
    }
    assert(TranslationLog.translations.get === t0 + 1)
    assert(TranslationLog.fallbacks.get === f0 + 1)
    val lines = err.toString.trim.linesIterator.toSeq
    assert(lines.length === 2)
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(lines.head)
    assert(n.get("event").asText() === "compat.translate")
    assert(n.get("sydraql").asText() === "select 1")
    assert(n.get("fallback").asBoolean() === false)
    assert(n.get("duration_ns").asLong() >= 0)
  }

  test("translation cache: a repeated statement counts a cache hit (compat/stats.zig:22-33)") {
    import graft.api.TranslationLog
    val sql = s"SELECT value FROM cachehit_${System.nanoTime()} WHERE time > 0"
    val h0 = TranslationLog.cacheHits.get
    TranslationLog.enabled = false
    try {
      val first = TranslationLog.translate(sql)
      assert(TranslationLog.cacheHits.get === h0, "first sight is a miss")
      val second = TranslationLog.translate(sql)
      assert(second === first, "cached result must be identical")
      assert(TranslationLog.cacheHits.get === h0 + 1, "second identical statement hits the cache")
    } finally TranslationLog.enabled = true
  }

  test("HTTP API: ingest -> range -> find -> sydraql -> sql -> metrics") {
    val store = new SeriesStore(spark, Files.createTempDirectory("graft-api").toString)
    val api = new HttpApi(store, token = Some("t0"))
    val port = api.start()
    try {
      // auth enforced on /api/*
      assert(post(port, "/api/v1/sydraql", """{"query":"select 1"}""", tok = None).statusCode() === 401)
      assert(get(port, "/status", tok = None).statusCode() === 200)

      val ing = post(port, "/api/v1/ingest",
        """{"series":"weather.room1","ts":1694300000,"value":24.2}
          |{"series":"weather.room1","ts":1694300010,"value":24.5,"tags":{"host":"a","city":"ams"}}
          |{"series":"cpu.total","ts":1694300000,"fields":{"usage":0.93}}""".stripMargin)
      assert(ing.statusCode() === 200 && ing.body().contains("\"ingested\":3"))

      val rng = get(port, s"/api/v1/query/range?series=weather.room1&start=0&end=2694300000")
      assert(rng.statusCode() === 200)
      assert(rng.body().contains("24.2") && rng.body().contains("24.5"))

      val find = post(port, "/api/v1/query/find", """{"tags":{"host":"a"},"op":"and"}""")
      assert(find.statusCode() === 200 && find.body().startsWith("["))

      val q = post(port, "/api/v1/sydraql",
        """{"query":"select time, value from weather.room1 where time >= 0 order by time"}""")
      assert(q.statusCode() === 200)
      assert(q.body().contains("\"columns\":[\"time\",\"value\"]"))
      assert(q.body().contains("trace_id"))
      // per-operator instrumentation present with live metrics
      // (operator.zig:30-48 analog)
      assert(q.body().contains("\"operators\":["), q.body().take(400))
      val rowsOut = """"rows_out":(\d+)""".r.findAllMatchIn(q.body()).map(_.group(1).toLong).toSeq
      assert(rowsOut.exists(_ > 0), s"expected live operator metrics: $rowsOut")

      val sql = post(port, "/api/v1/sql",
        """{"query":"SELECT value FROM cpu.total WHERE time >= 0"}""")
      assert(sql.statusCode() === 200 && sql.body().contains("0.93"))

      val bad = post(port, "/api/v1/sql", """{"query":"UPDATE x SET y = 1"}""")
      assert(bad.statusCode() === 400 && bad.body().contains("0A000"))

      val invalid = post(port, "/api/v1/sydraql", """{"query":"select value from m"}""")
      assert(invalid.statusCode() === 400 && invalid.body().contains("time_range_required"))

      val m = get(port, "/metrics")
      assert(m.statusCode() === 200)
      assert(m.body().contains("sydra_ingest_total 3"))
      assert(m.body().contains("sydra_query_total"))
    } finally api.stop()
  }

  test("served-route stats: real stage timings + route attribution (r15)") {
    import graft.storage.{SeriesStore, SketchCells}
    import org.apache.spark.sql.functions.{col, lit, map}
    import spark.implicits._
    val store = new SeriesStore(spark, Files.createTempDirectory("graft-api-served").toString)
    val pts = (0 until 8).map(i => ("cpu", i.toLong * 21600L, i.toDouble))
      .toDF("series", "time", "value")
      .withColumn("tags", map().cast("map<string,string>"))
      .select("series", "tags", "time", "value")
    store.append(pts)
    SketchCells.build(store, SketchCells.dirFor(store))
    val api = new HttpApi(store, token = Some("t0"))
    val port = api.start()
    try {
      // day-aligned window over the cell tier: the engine serves from
      // cells, and the stats object says so — with REAL stage timings
      // (both were zeroed on served routes before r15)
      val q = post(port, "/api/v1/sydraql",
        """{"query":"select avg(value) as a from cpu where time >= 0 and time < 172800"}""")
      assert(q.statusCode() === 200, q.body().take(300))
      assert(q.body().contains("\"route\":\"served:cells:td\""), q.body().take(600))
      def statOf(name: String, body: String): Long =
        ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(-1L)
      assert(statOf("parse_us", q.body()) > 0,
        s"served route must report non-zero parse_us: ${q.body().take(400)}")
      assert(statOf("compile_us", q.body()) > 0,
        "compile_us must cover serving-route resolution")
      // the raw route attributes itself too
      val raw = post(port, "/api/v1/sydraql",
        """{"query":"select time, value from cpu where time >= 0 and time < 100 order by time"}""")
      assert(raw.statusCode() === 200)
      assert(raw.body().contains("\"route\":\"raw\""), raw.body().take(600))
    } finally api.stop()
  }
}
