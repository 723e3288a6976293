package graft

import graft.storage.codec.SegmentCodec
import graft.storage.codec.SegmentCodec.Segment
import graft.storage.{SeriesStore, SydraImport}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SYSEG2 codec: byte-level golden vectors pinned to the format definition
  * + property round-trips + data-dir import/export round-trip.
  */
class CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("golden bytes: header layout, varint dod, value markers") {
    val seg = Segment(seriesId = 0x1122334455667788L, hour = 3600L,
      points = Seq((3601L, 1.5), (3602L, 1.5), (3604L, 2.5)))
    val b = SegmentCodec.encode(seg)
    // header
    assert(new String(b.slice(0, 6), "US-ASCII") === "SYSEG2")
    assert(b.slice(6, 14).toSeq === Seq(0x88, 0x77, 0x66, 0x55, 0x44, 0x33, 0x22, 0x11).map(_.toByte)) // LE u64
    assert(b(14) === 0x10.toByte && b(15) === 0x0e.toByte) // hour 3600 LE
    assert(b(22) === 3.toByte) // count u32 LE low byte
    assert(b(42) === 1.toByte && b(43) === 1.toByte) // codec bytes (header = 44 bytes)
    // timestamps: dod sequence = 0 (first: delta 0 vs start), zz(1-0)=2, zz(2-1)=2
    assert(b(44) === 0.toByte && b(45) === 2.toByte && b(46) === 2.toByte)
    // values: marker 2 + 8 bytes of 1.5 (0x3FF8000000000000 LE), marker 0,
    // marker 1 for 2.5
    assert(b(47) === 2.toByte)
    assert(b.slice(48, 56).toSeq === Seq(0, 0, 0, 0, 0, 0, 0xF8, 0x3F).map(_.toByte))
    assert(b(56) === 0.toByte)
    assert(b(57) === 1.toByte)
    // decode back
    assert(SegmentCodec.decode(b) === seg)
  }

  test("property: encode/decode round-trips arbitrary sorted points") {
    val pointGen = for {
      n <- Gen.chooseNum(1, 300)
      t0 <- Gen.chooseNum(0L, 4102444800L)
      deltas <- Gen.listOfN(n, Gen.chooseNum(0L, 100000L))
      vals <- Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-1e12, 1e12), Gen.oneOf(0.0, -0.0, 1.5, 1.5, Double.MinPositiveValue)))
    } yield deltas.scanLeft(t0)(_ + _).tail.zip(vals)
    check(Prop.forAll(pointGen) { pts =>
      pts.isEmpty || {
        val seg = Segment(42L, 0L, pts)
        SegmentCodec.decode(SegmentCodec.encode(seg)) == seg
      }
    })
  }

  test("repeated and special values use compact markers") {
    val pts = Seq((1L, 7.25), (2L, 7.25), (3L, 7.25), (4L, 0.0))
    val b = SegmentCodec.encode(Segment(1L, 0L, pts))
    assert(SegmentCodec.decode(b).points === pts)
    // 3 repeats → two 0-markers: far smaller than raw 8B/value
    assert(b.length < 46 + 4 + 9 + 2 + 12)
  }

  test("data-dir export -> import round-trip preserves reference series ids") {
    val store = new SeriesStore(spark, Files.createTempDirectory("graft-codec-store").toString)
    graft.storage.Ingest.batch(store, {
      val d = Files.createTempDirectory("graft-codec-nd")
      Files.write(d.resolve("in.ndjson"), Seq(
        """{"series":"cpu.total","ts":1000,"value":1.5,"tags":{"host":"a"}}""",
        """{"series":"cpu.total","ts":1500,"value":2.25,"tags":{"host":"a"}}""",
        """{"series":"mem.free","ts":5000,"value":1024.0}""").mkString("\n").getBytes)
      d.toString
    })
    val origIds = store.scan().select("series_id").distinct()
      .collect().map(_.getLong(0)).toSet

    val dataDir = Files.createTempDirectory("graft-codec-export").toString
    val n = SydraImport.exportDataDir(store, dataDir)
    assert(n === 3)
    assert(new java.io.File(s"$dataDir/MANIFEST").exists())

    val restored = new SeriesStore(spark, Files.createTempDirectory("graft-codec-import").toString)
    SydraImport.importDataDir(restored, dataDir)
    val back = restored.scan()
    assert(back.count() === 3)
    val backIds = back.select("series_id").distinct().collect().map(_.getLong(0)).toSet
    assert(backIds === origIds, "reference series ids must survive the binary round-trip")
    val vals = back.orderBy("time").select("value").collect().map(_.getDouble(0))
    assert(vals.toSeq === Seq(1.5, 2.25, 1024.0))
    // tags survive via tags.json → tag find works on the imported store
    assert(restored.findSeries(Map("host" -> "a")).count() === 1)
  }

  test("WAL golden bytes: record layout and crc (wal.zig:4-5)") {
    import graft.storage.codec.WalCodec
    val bytes = WalCodec.encode(Seq(WalCodec.Record(3L, 100L, 1.5)))
    // [len=25 LE][type=1][sid=3 LE][ts=100 LE][1.5 bits LE][crc32 LE]
    // crc32(payload) = 2468982817 (IEEE, computed with zlib)
    assert(bytes.map("%02x".format(_)).mkString ===
      "190000000103000000000000006400000000000000000000000000f83f21b02993")
    assert(WalCodec.decode(bytes) === Seq(WalCodec.Record(3L, 100L, 1.5)))
    // corruption detection: flipped payload byte fails crc
    val bad = bytes.clone(); bad(10) = (bad(10) ^ 1).toByte
    assertThrows[IllegalStateException](WalCodec.decode(bad))
    // truncated tail record is corruption, not silence (wal.zig:121-131)
    assertThrows[IllegalStateException](WalCodec.decode(bytes.dropRight(2)))
  }

  test("import replays WAL tail above the segment highwater (engine.zig:406-437)") {
    import graft.storage.codec.{SegmentCodec, WalCodec}
    val dir = Files.createTempDirectory("graft-waldir").toString
    val sid = 7L
    // flushed segment: ts 100, 200 → highwater 200
    val segDir = new java.io.File(s"$dir/segments/0"); segDir.mkdirs()
    Files.write(segDir.toPath.resolve(f"$sid%x-100-200-0.seg"),
      SegmentCodec.encode(SegmentCodec.Segment(sid, 0L, Seq(100L -> 1.0, 200L -> 2.0))))
    // WAL: rotated file + current; replay order = rotated first
    val walDir = new java.io.File(s"$dir/wal"); walDir.mkdirs()
    Files.write(walDir.toPath.resolve("1000.wal"), WalCodec.encode(Seq(
      WalCodec.Record(sid, 150L, 9.0),   // ≤ highwater → skipped
      WalCodec.Record(sid, 250L, 2.5)))) // above → applied, highwater := 250
    Files.write(walDir.toPath.resolve("current.wal"), WalCodec.encode(Seq(
      WalCodec.Record(sid, 250L, 8.0),   // duplicate ts → skipped (first wins)
      WalCodec.Record(sid, 300L, 3.0),   // applied
      WalCodec.Record(99L, 50L, 4.5))))  // unknown series: no highwater → applied
    val got = SydraImport.readDataDir(spark, dir)
      .orderBy("series_id", "time")
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (7L, 100L, 1.0), (7L, 200L, 2.0), (7L, 250L, 2.5), (7L, 300L, 3.0),
      (99L, 50L, 4.5)))
  }
}
