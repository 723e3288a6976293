package graft.storage.codec

import java.io.{ByteArrayOutputStream, DataOutput}
import java.nio.{ByteBuffer, ByteOrder}

/** Reader/writer for the reference's on-disk segment format, re-implemented
  * from the format definition (SYSEG2 v1,
  * `/root/reference/src/sydra/storage/segment.zig:5-9` and codec behavior
  * `/root/reference/src/sydra/codec/gorilla.zig`):
  *
  * ```
  * [magic:6 'SYSEG2'][series_id:u64][hour:i64][count:u32]
  * [start_ts:i64][end_ts:i64][ts_codec:u8=1][val_codec:u8=1]
  * <timestamps: delta-of-delta, ZigZag varint, seeded with
  *   prev_ts = start_ts, prev_delta = 0>
  * <values: byte-aligned XOR — marker 2 = first/raw (8 bytes LE),
  *   0 = same as prev, 1 = changed: [lz:u8][tz:u8][nbytes:u8]
  *   [payload = xor >> tz, nbytes LE bytes]>
  * ```
  * All integers little-endian. Enables importing a sydradb data dir into
  * the Spark store (and writing segments it can read back).
  */
object SegmentCodec {

  val Magic: Array[Byte] = "SYSEG2".getBytes("US-ASCII")

  final case class Segment(seriesId: Long, hour: Long, points: Seq[(Long, Double)])

  // ------------------------------------------------------------------ write

  def encode(seg: Segment): Array[Byte] = {
    require(seg.points.nonEmpty, "segment must contain points")
    val out = new ByteArrayOutputStream()
    val startTs = seg.points.head._1
    val endTs = seg.points.last._1
    val header = ByteBuffer.allocate(6 + 8 + 8 + 4 + 8 + 8 + 2).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Magic)
    header.putLong(seg.seriesId)
    header.putLong(seg.hour)
    header.putInt(seg.points.length)
    header.putLong(startTs)
    header.putLong(endTs)
    header.put(1.toByte) // ts codec: dod + zigzag varint
    header.put(1.toByte) // val codec: xor byte-aligned
    out.write(header.array())

    // timestamps
    var prevTs = startTs
    var prevDelta = 0L
    seg.points.foreach { case (ts, _) =>
      val delta = ts - prevTs
      writeZigZagVarint(out, delta - prevDelta)
      prevDelta = delta
      prevTs = ts
    }

    // values
    var prevBits = 0L
    seg.points.zipWithIndex.foreach { case ((_, v), idx) =>
      val bits = java.lang.Double.doubleToRawLongBits(v)
      if (idx == 0) {
        out.write(2)
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(bits)
        out.write(b.array())
      } else {
        val x = bits ^ prevBits
        if (x == 0L) out.write(0)
        else {
          val lz = java.lang.Long.numberOfLeadingZeros(x)
          val tz = java.lang.Long.numberOfTrailingZeros(x)
          val sigBits = 64 - lz - tz
          val nbytes = (sigBits + 7) / 8
          val payload = x >>> tz
          out.write(1)
          out.write(lz)
          out.write(tz)
          out.write(nbytes)
          val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(payload)
          out.write(b.array(), 0, nbytes)
        }
      }
      prevBits = bits
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------- read

  def decode(bytes: Array[Byte]): Segment = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](6)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, Magic), "bad segment magic (expected SYSEG2)")
    val seriesId = buf.getLong
    val hour = buf.getLong
    val count = buf.getInt
    val startTs = buf.getLong
    buf.getLong // end_ts (redundant with decoded stream)
    val tsCodec = buf.get()
    val valCodec = buf.get()
    require(tsCodec == 1 && valCodec == 1, s"unsupported codecs ts=$tsCodec val=$valCodec")

    val ts = new Array[Long](count)
    var prevTs = startTs
    var prevDelta = 0L
    var i = 0
    while (i < count) {
      val dod = readZigZagVarint(buf)
      val delta = prevDelta + dod
      val t = prevTs + delta
      ts(i) = t
      prevTs = t
      prevDelta = delta
      i += 1
    }

    val vals = new Array[Double](count)
    var prevBits = 0L
    i = 0
    while (i < count) {
      buf.get() match {
        case 2 =>
          prevBits = buf.getLong
          vals(i) = java.lang.Double.longBitsToDouble(prevBits)
        case 0 =>
          vals(i) = java.lang.Double.longBitsToDouble(prevBits)
        case 1 =>
          buf.get() // lz (unused by the decode path, as in the reference)
          val tz = buf.get() & 0xFF
          val nbytes = buf.get() & 0xFF
          val b = new Array[Byte](8)
          buf.get(b, 0, nbytes)
          val payload = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
          prevBits = prevBits ^ (payload << tz)
          vals(i) = java.lang.Double.longBitsToDouble(prevBits)
        case m => throw new IllegalArgumentException(s"invalid value marker $m")
      }
      i += 1
    }
    Segment(seriesId, hour, ts.toSeq.zip(vals.toSeq))
  }

  // -------------------------------------------------------------- varints

  private def zigZag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unZigZag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  private def writeZigZagVarint(out: ByteArrayOutputStream, v: Long): Unit = {
    var x = zigZag(v)
    while ((x & ~0x7FL) != 0L) {
      out.write(((x & 0x7F) | 0x80).toInt)
      x >>>= 7
    }
    out.write(x.toInt)
  }

  private def readZigZagVarint(buf: ByteBuffer): Long = {
    var x = 0L
    var shift = 0
    var b = 0
    do {
      b = buf.get() & 0xFF
      x |= (b & 0x7FL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    unZigZag(x)
  }
}
