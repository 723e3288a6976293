package graft.api

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.types._

/** PostgreSQL v3 wire-protocol message codec, byte-layout-matched to the
  * reference's compat layer
  * (`/root/reference/src/sydra/compat/wire/protocol.zig:1-228`):
  * startup negotiation with SSL decline, AuthenticationOk, ParameterStatus,
  * ReadyForQuery, CommandComplete, EmptyQueryResponse, ErrorResponse,
  * NoticeResponse, RowDescription, DataRow (text format).
  *
  * All integers are big-endian; message length fields include themselves
  * but not the type byte.
  */
object PgProtocol {

  val SslRequestCode = 80877103
  val CancelRequestCode = 80877102
  val ProtocolVersion3: Int = 3 << 16 // 196608
  val MaxMessageSize: Int = 16 * 1024 * 1024 // server.zig:15

  final case class Startup(
      protocolVersion: Int,
      parameters: Seq[(String, String)],
      sslRequestSeen: Boolean) {
    def find(key: String): Option[String] = parameters.find(_._1 == key).map(_._2)
  }

  /** Handshake failures that terminate the connection without a response
    * (`protocol.zig:102-107`, `session.zig:47-53`).
    */
  final case class WireError(kind: String) extends Exception(kind)

  /** Consume the startup negotiation: zero or more SSLRequests (each
    * declined with a single 'N') followed by a v3 StartupMessage
    * (`protocol.zig:65-134`). CancelRequest is unsupported, like the
    * reference.
    */
  def readStartup(in: DataInputStream, out: DataOutputStream): Startup = {
    var sslSeen = false
    while (true) {
      val totalLen = in.readInt()
      if (totalLen < 8) throw WireError("InvalidStartupLength")
      // pre-auth allocation cap: the length is untrusted client input
      if (totalLen - 4 > MaxMessageSize) throw WireError("StartupTooLarge")
      val body = new Array[Byte](totalLen - 4)
      in.readFully(body)
      val protocol = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
        ((body(2) & 0xff) << 8) | (body(3) & 0xff)
      if (protocol == SslRequestCode) {
        out.write('N'); out.flush() // TLS is future work, decline
        sslSeen = true
      } else if (protocol == CancelRequestCode) {
        throw WireError("CancelRequestUnsupported")
      } else if ((protocol & 0xffff0000) != ProtocolVersion3) {
        throw WireError("UnsupportedProtocol")
      } else {
        // key\0value\0 ... \0
        val params = Seq.newBuilder[(String, String)]
        var idx = 4
        var done = false
        while (idx < body.length && !done) {
          val keyEnd = body.indexOf(0.toByte, idx)
          if (keyEnd < 0) throw WireError("MalformedStartupPacket")
          if (keyEnd == idx) done = true // trailing NUL
          else {
            val valStart = keyEnd + 1
            if (valStart >= body.length) throw WireError("MalformedStartupPacket")
            val valEnd = body.indexOf(0.toByte, valStart)
            if (valEnd < 0) throw WireError("MalformedStartupPacket")
            params += (new String(body, idx, keyEnd - idx, UTF_8) ->
              new String(body, valStart, valEnd - valStart, UTF_8))
            idx = valEnd + 1
          }
        }
        return Startup(protocol, params.result(), sslSeen)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ------------------------------------------------------- backend messages

  /** 'R' len=8 code=0 (`protocol.zig:136-142`). */
  def writeAuthenticationOk(out: DataOutputStream): Unit = {
    out.write('R'); out.writeInt(8); out.writeInt(0)
  }

  /** 'S' len key\0 value\0 (`protocol.zig:144-157`). */
  def writeParameterStatus(out: DataOutputStream, key: String, value: String): Unit = {
    val k = key.getBytes(UTF_8); val v = value.getBytes(UTF_8)
    out.write('S'); out.writeInt(4 + k.length + 1 + v.length + 1)
    out.write(k); out.write(0); out.write(v); out.write(0)
  }

  /** 'Z' len=5 status ('I' idle) (`protocol.zig:159-165`). */
  def writeReadyForQuery(out: DataOutputStream, status: Char = 'I'): Unit = {
    out.write('Z'); out.writeInt(5); out.write(status)
  }

  /** 'C' len tag\0 (`protocol.zig:167-175`). */
  def writeCommandComplete(out: DataOutputStream, tag: String): Unit = {
    val t = tag.getBytes(UTF_8)
    out.write('C'); out.writeInt(4 + t.length + 1); out.write(t); out.write(0)
  }

  /** 'I' len=4 (`protocol.zig:177-182`). */
  def writeEmptyQueryResponse(out: DataOutputStream): Unit = {
    out.write('I'); out.writeInt(4)
  }

  /** 'E' with S/C/M fields (`protocol.zig:184-201`). Note: the reference's
    * length arithmetic counts the three field tags but not the three
    * per-field NUL terminators (its NoticeResponse counts both), leaving
    * the declared length 3 bytes short of the bytes it writes — a client
    * reading by declared length desyncs. The correct count is used here.
    */
  def writeErrorResponse(out: DataOutputStream, severity: String, code: String, message: String): Unit = {
    val s = severity.getBytes(UTF_8); val c = code.getBytes(UTF_8); val m = message.getBytes(UTF_8)
    out.write('E'); out.writeInt(4 + (1 + s.length + 1) + (1 + c.length + 1) + (1 + m.length + 1) + 1)
    out.write('S'); out.write(s); out.write(0)
    out.write('C'); out.write(c); out.write(0)
    out.write('M'); out.write(m); out.write(0)
    out.write(0)
  }

  /** 'N' with S=NOTICE and M fields (`protocol.zig:203-219`). */
  def writeNoticeResponse(out: DataOutputStream, message: String): Unit = {
    val s = "NOTICE".getBytes(UTF_8); val m = message.getBytes(UTF_8)
    out.write('N'); out.writeInt(4 + 1 + s.length + 2 + m.length + 2)
    out.write('S'); out.write(s); out.write(0)
    out.write('M'); out.write(m); out.write(0)
    out.write(0)
  }

  /** 'G' CopyInResponse: overall format 0 (text — per-row messages are
    * still opaque bytes to the protocol layer; the server parses rows),
    * then a zero (text) format code per column.
    */
  def writeCopyInResponse(out: DataOutputStream, nCols: Int): Unit = {
    out.write('G'); out.writeInt(4 + 1 + 2 + 2 * nCols)
    out.write(0); out.writeShort(nCols)
    (0 until nCols).foreach(_ => out.writeShort(0))
  }

  /** 'T' row description from a Spark schema (`server.zig:320-353`): per
    * column name\0, table oid 0, attnum 0, type oid, typlen, typmod -1,
    * text format 0. Unlike the reference (which tags every column with the
    * catch-all `value` type, oid 25), the Spark schema carries real output
    * types, so the oid reflects the column type (`functions.zig:449-461`).
    */
  def writeRowDescription(out: DataOutputStream, schema: StructType): Unit = {
    val names = schema.fields.map(_.name.getBytes(UTF_8))
    out.write('T')
    out.writeInt(4 + 2 + names.map(_.length + 19).sum)
    out.writeShort(schema.fields.length)
    schema.fields.zip(names).foreach { case (f, name) =>
      val (oid, typlen) = pgTypeInfo(f.dataType)
      out.write(name); out.write(0)
      out.writeInt(0)     // table oid
      out.writeShort(0)   // attnum
      out.writeInt(oid)
      out.writeShort(typlen)
      out.writeInt(-1)    // typmod
      out.writeShort(0)   // text format
    }
  }

  /** 'D' text-format row; None encodes SQL NULL as length -1
    * (`server.zig:398-429`).
    */
  def writeDataRow(out: DataOutputStream, values: Seq[Option[String]]): Unit = {
    val encoded = values.map(_.map(_.getBytes(UTF_8)))
    out.write('D')
    out.writeInt(4 + 2 + encoded.map(_.map(_.length + 4).getOrElse(4)).sum)
    out.writeShort(encoded.length)
    encoded.foreach {
      case Some(b) => out.writeInt(b.length); out.write(b)
      case None => out.writeInt(-1)
    }
  }

  // ----------------------------------------------------------- type mapping

  /** (oid, typlen) per Spark type — the reference's pg catalog mapping
    * (`functions.zig:449-461`): bool 16, int8 20, float8 701, text 25,
    * timestamp 1114.
    */
  def pgTypeInfo(dt: DataType): (Int, Int) = dt match {
    case BooleanType => (16, 1)
    case ByteType | ShortType | IntegerType | LongType => (20, 8)
    case FloatType | DoubleType => (701, 8)
    case TimestampType | TimestampNTZType => (1114, 8)
    case _ => (25, -1)
  }

  /** Display name used by the schema NOTICE (`functions.zig:426-447`). */
  def displayName(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType => "float"
    case TimestampType | TimestampNTZType => "timestamp"
    case StringType => "string"
    case _: MapType => "tags"
    case _ => "value"
  }

  /** Text-format value rendering (`server.zig:431-451`): booleans as t/f,
    * integral floats without a trailing `.0` (Zig's `{d}` prints `1`, not
    * `1.0`), NULL as None.
    */
  def formatValue(v: Any): Option[String] = v match {
    case null => None
    case b: Boolean => Some(if (b) "t" else "f")
    case d: Double => Some(formatFloat(d))
    case f: Float => Some(formatFloat(f.toDouble))
    case other => Some(other.toString)
  }

  private def formatFloat(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15 && !d.isInfinite) d.toLong.toString
    else d.toString
}
