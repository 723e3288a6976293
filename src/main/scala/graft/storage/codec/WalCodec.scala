package graft.storage.codec

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Reader/writer for the reference's WAL v0 record format
  * (`/root/reference/src/sydra/storage/wal.zig:4-5`):
  *
  * ```
  * record = [u32 len][payload][u32 crc32(payload)]
  * payload = [u8 type=1 Put][u64 series_id][i64 ts][f64 value]
  * ```
  * All integers little-endian; crc32 is IEEE (same polynomial as
  * `java.util.zip.CRC32` / Zig `std.hash.Crc32`). A data dir's `wal/`
  * holds rotated `<epoch>.wal` files plus `current.wal`; replay order is
  * lexical with `current.wal` last (`wal.zig:96-103`).
  */
object WalCodec {

  final case class Record(seriesId: Long, ts: Long, value: Double)

  def encode(records: Seq[Record]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val payload = ByteBuffer.allocate(1 + 8 + 8 + 8).order(ByteOrder.LITTLE_ENDIAN)
      payload.put(1.toByte)
      payload.putLong(r.seriesId)
      payload.putLong(r.ts)
      payload.putLong(java.lang.Double.doubleToLongBits(r.value))
      val p = payload.array()
      val crc = new CRC32(); crc.update(p)
      val rec = ByteBuffer.allocate(4 + p.length + 4).order(ByteOrder.LITTLE_ENDIAN)
      rec.putInt(p.length).put(p).putInt(crc.getValue.toInt)
      out.write(rec.array())
    }
    out.toByteArray
  }

  /** Decode one WAL file. Mirrors `wal.zig:110-147`: clean EOF at a record
    * boundary ends the stream; a truncated record, zero/oversized length,
    * or CRC mismatch is corruption; non-Put or short payloads are skipped.
    */
  def decode(bytes: Array[Byte]): Seq[Record] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[Record]
    while (buf.remaining() > 0) {
      if (buf.remaining() < 4) throw new IllegalStateException("corrupt wal: truncated length")
      val len = buf.getInt
      if (len <= 0 || len > (1 << 20)) throw new IllegalStateException("corrupt wal: bad record length")
      if (buf.remaining() < len + 4) throw new IllegalStateException("corrupt wal: truncated record")
      val payload = new Array[Byte](len)
      buf.get(payload)
      val expected = buf.getInt
      val crc = new CRC32(); crc.update(payload)
      if (crc.getValue.toInt != expected) throw new IllegalStateException("corrupt wal: crc mismatch")
      if (len >= 25 && payload(0) == 1) {
        val pb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
        pb.get() // type
        out += Record(pb.getLong, pb.getLong, java.lang.Double.longBitsToDouble(pb.getLong))
      }
    }
    out.result()
  }

  /** All WAL records under `dataDir/wal` in replay order: `*.wal` sorted
    * lexically, `current.wal` last (`wal.zig:96-103`). WAL files are
    * rotation-capped at 64 MiB (`wal.zig:63`) and hold only the unflushed
    * tail, so driver-side decode is the right size class.
    */
  def readDir(dataDir: String): Seq[Record] = {
    val walDir = new java.io.File(dataDir, "wal")
    if (!walDir.isDirectory) return Nil
    val files = walDir.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".wal"))
      .sortBy(f => (f.getName == "current.wal", f.getName))
    files.toSeq.flatMap(f => decode(java.nio.file.Files.readAllBytes(f.toPath)))
  }
}
