package graft.api

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors

import graft.storage.SeriesStore
import graft.sydraql.{CompileOptions, Engine, QueryError}
import org.apache.spark.sql.DataFrame

import PgProtocol._

/** `psql`-compatible wire server: startup handshake, simple-query ('Q')
  * SQL → sydraQL → engine → RowDescription/DataRow/CommandComplete, with
  * the reference's observability NOTICEs (schema, trace id, per-operator
  * stats, metrics). Mirrors
  * `/root/reference/src/sydra/compat/wire/server.zig:24-318` and
  * `session.zig:75-140` on JDK sockets — one thread per connection; the
  * Spark session itself is thread-safe for concurrent query execution.
  *
  * Rows stream to the client via `toLocalIterator` (one partition resident
  * on the driver at a time), so a large result doesn't materialize
  * driver-side — the wire is the bottleneck, not memory.
  */
final class PgWireServer(store: SeriesStore, maxRows: Int = Int.MaxValue) {

  // session.zig:4-14 SessionConfig defaults
  private val serverVersion = "15.2"

  @volatile private var server: ServerSocket = _
  private val pool = Executors.newCachedThreadPool()

  def start(port: Int = 0): Int = {
    server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", port))
    pool.submit(new Runnable {
      def run(): Unit = acceptLoop()
    })
    server.getLocalPort
  }

  def stop(): Unit = {
    if (server != null) server.close()
    pool.shutdownNow()
  }

  private def acceptLoop(): Unit =
    try {
      while (!server.isClosed) {
        val sock = server.accept()
        pool.submit(new Runnable {
          def run(): Unit =
            try handleConnection(sock)
            catch { case _: Throwable => () } // connection-scoped; never kill the acceptor
            finally sock.close()
        })
      }
    } catch { case _: SocketException => () } // closed during stop()

  // ------------------------------------------------------------- connection

  private def handleConnection(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

    val startup =
      try readStartup(in, out)
      catch { case _: WireError | _: EOFException => return } // handshake terminated early

    val user = startup.find("user").getOrElse {
      // session.zig:88-91
      writeErrorResponse(out, "FATAL", SqlState.InvalidAuthorization, "user parameter required")
      out.flush()
      return
    }
    val app = startup.find("application_name").getOrElse("sydradb")

    writeAuthenticationOk(out)
    // session.zig:114-127 status pairs
    Seq(
      "server_version" -> serverVersion,
      "server_encoding" -> "UTF8",
      "client_encoding" -> "UTF8",
      "application_name" -> app,
      "DateStyle" -> "ISO, MDY",
      "TimeZone" -> "UTC",
      "integer_datetimes" -> "on",
      "standard_conforming_strings" -> "on"
    ).foreach { case (k, v) => writeParameterStatus(out, k, v) }
    writeReadyForQuery(out)
    out.flush()

    messageLoop(in, out)
  }

  /** server.zig:82-123. */
  private def messageLoop(in: DataInputStream, out: DataOutputStream): Unit = {
    while (true) {
      val typeByte =
        try in.readByte()
        catch { case _: EOFException => return }
      val messageLength = in.readInt()
      if (messageLength < 4) return // InvalidMessageLength
      val payloadLen = messageLength - 4
      if (payloadLen > MaxMessageSize) return // MessageTooLarge
      val payload = new Array[Byte](payloadLen)
      in.readFully(payload)

      typeByte.toChar match {
        case 'X' => return
        case 'Q' => handleSimpleQuery(out, payload)
        case 'P' => handleParseMessage(out, payload)
        case 'S' => writeReadyForQuery(out)
        case _ =>
          writeErrorResponse(out, "ERROR", SqlState.FeatureNotSupported, "message type not implemented")
          writeReadyForQuery(out)
      }
      out.flush()
    }
  }

  // ---------------------------------------------------------------- queries

  /** server.zig:139-182. */
  private def handleSimpleQuery(out: DataOutputStream, payload: Array[Byte]): Unit = {
    val sql = cString(payload).trim
    if (sql.isEmpty) {
      writeEmptyQueryResponse(out)
      writeReadyForQuery(out)
      return
    }
    if (PgCatalog.isCatalogQuery(sql)) {
      // connect-time catalog probes (psql/JDBC) route to Spark SQL over the
      // static catalog views — beyond the reference, whose wire server
      // cannot answer catalog SQL (catalog.zig is /debug-only there)
      try {
        val df = PgCatalog.execute(store.spark, sql, serverVersion)
        streamResult(out, df)
      } catch {
        case e: Throwable =>
          writeErrorResponse(out, "ERROR", SqlState.SyntaxError, String.valueOf(e.getMessage))
          writeReadyForQuery(out)
      }
      return
    }
    TranslationLog.translate(sql) match {
      case Translator.Success(sydraql) => executeSydraql(out, sydraql)
      case Translator.Failure(state, msg) =>
        writeErrorResponse(out, "ERROR", state, if (msg.isEmpty) "translation failed" else msg)
        writeReadyForQuery(out)
    }
  }

  /** Stream a DataFrame as RowDescription + DataRows + CommandComplete. */
  private def streamResult(out: DataOutputStream, df: DataFrame): Long = {
    writeRowDescription(out, df.schema)
    var rowCount = 0L
    val it = df.toLocalIterator()
    while (it.hasNext && rowCount < maxRows) {
      val r = it.next()
      writeDataRow(out, (0 until r.length).map(i => formatValue(r.get(i))))
      rowCount += 1
    }
    writeCommandComplete(out, s"SELECT $rowCount")
    writeReadyForQuery(out)
    rowCount
  }

  /** Extended protocol: Parse is validated through the translator but
    * execution is declined, exactly like the reference
    * (server.zig:184-247).
    */
  private def handleParseMessage(out: DataOutputStream, payload: Array[Byte]): Unit = {
    val firstNul = payload.indexOf(0.toByte)
    val secondNul = if (firstNul < 0) -1 else payload.indexOf(0.toByte, firstNul + 1)
    if (firstNul < 0 || secondNul < 0 || payload.length < secondNul + 3) {
      writeErrorResponse(out, "ERROR", SqlState.ProtocolViolation, "malformed parse message")
      writeReadyForQuery(out)
      return
    }
    val sql = new String(payload, firstNul + 1, secondNul - firstNul - 1, UTF_8).trim
    TranslationLog.translate(sql) match {
      case Translator.Success(_) =>
        writeErrorResponse(out, "ERROR", SqlState.FeatureNotSupported, "extended protocol not implemented yet")
      case Translator.Failure(state, msg) =>
        writeErrorResponse(out, "ERROR", state, if (msg.isEmpty) "translation failed" else msg)
    }
    writeReadyForQuery(out)
  }

  /** server.zig:249-318: execute, stream rows, then the NOTICE block
    * (schema, trace_id, per-operator rows_out, metrics) and
    * CommandComplete.
    */
  private def executeSydraql(out: DataOutputStream, sydraql: String): Unit = {
    val startNs = System.nanoTime()
    val res =
      try Engine.executeOnStore(store, sydraql, CompileOptions())
      catch {
        case qe: QueryError =>
          writeErrorResponse(out, "ERROR", SqlState.fromQueryError(qe.code), qe.message)
          writeReadyForQuery(out)
          return
        case e: Throwable =>
          writeErrorResponse(out, "ERROR", SqlState.InternalError, String.valueOf(e.getMessage))
          writeReadyForQuery(out)
          return
      }

    // INSERT/DELETE (translator-normalized verbs): no row stream, just the
    // postgres command tag — psql prints `INSERT 0 n` / `DELETE n`.
    val verb = sydraql.trim.toLowerCase
    if (verb.startsWith("insert") || verb.startsWith("delete")) {
      val n = res.df.head().getLong(0)
      writeCommandComplete(out, if (verb.startsWith("insert")) s"INSERT 0 $n" else s"DELETE $n")
      writeReadyForQuery(out)
      return
    }

    val schema = res.df.schema
    writeRowDescription(out, schema)

    var rowCount = 0L
    val it = res.df.toLocalIterator()
    while (it.hasNext && rowCount < maxRows) {
      val r = it.next()
      writeDataRow(out, (0 until r.length).map(i => formatValue(r.get(i))))
      rowCount += 1
    }

    writeNotices(out, res.df, schema, res.stats.traceId, rowCount, startNs,
      planUs = res.stats.parseUs + res.stats.validateUs + res.stats.compileUs)
    writeCommandComplete(out, s"SELECT $rowCount")
    writeReadyForQuery(out)
  }

  /** The reference's post-query NOTICE block (server.zig:294-312). */
  private def writeNotices(out: DataOutputStream, df: DataFrame,
      schema: org.apache.spark.sql.types.StructType, traceId: String,
      rowCount: Long, startNs: Long, planUs: Long): Unit = {
    if (schema.fields.nonEmpty) {
      val cols = schema.fields.map(f =>
        s"""{name:"${f.name}",type:"${displayName(f.dataType)}",nullable:${f.nullable}}""")
      writeNoticeResponse(out, cols.mkString("schema=[", ", ", "]"))
    }
    if (traceId.nonEmpty) writeNoticeResponse(out, s"trace_id=$traceId")

    var rowsScanned = 0L
    try {
      val stats = org.apache.spark.sql.graftshim.GraftShim
        .operatorStats(df.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
      stats.foreach { case (name, rowsOut) =>
        writeNoticeResponse(out, s"operator=$name rows_out=$rowsOut elapsed_ms=0")
        if (name.toLowerCase.contains("scan")) rowsScanned += math.max(rowsOut, 0L)
      }
    } catch { case _: Throwable => () } // stats are best-effort

    val streamMs = (System.nanoTime() - startNs) / 1000000
    writeNoticeResponse(out,
      s"metrics rows=$rowCount scanned=$rowsScanned stream_ms=$streamMs plan_ms=${planUs / 1000}")
  }

  private def cString(payload: Array[Byte]): String = {
    val end = payload.indexOf(0.toByte)
    new String(payload, 0, if (end < 0) payload.length else end, UTF_8)
  }
}
