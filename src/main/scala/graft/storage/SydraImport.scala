package graft.storage

import graft.storage.codec.SegmentCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Import a sydradb data directory (binary SYSEG2 segments + tags.json)
  * into the Spark store.
  *
  * Decoding is distributed: `binaryFile` source → per-partition segment
  * decode (one scan, no driver loop), so an arbitrarily large reference
  * data dir imports in parallel. Series *names* don't exist in the
  * reference's segment files (only hashed ids, `types.zig:16-22`), so
  * imported rows carry a synthetic `sid:<id>` name plus the tag postings
  * reconstructed from tags.json (`storage/tags.zig:52-75`:
  * `{"k=v":[sid,...]}`).
  */
object SydraImport {

  /** tags.json → series_id → Map(tag key → value). */
  def loadTagIndex(path: String): Map[Long, Map[String, String]] = {
    val f = new java.io.File(path)
    if (!f.exists()) return Map.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(f)
    val out = scala.collection.mutable.Map[Long, Map[String, String]]()
    root.properties().forEach { e =>
      val kv = e.getKey.split("=", 2)
      if (kv.length == 2) {
        e.getValue.forEach { idNode =>
          val id = idNode.asLong()
          out(id) = out.getOrElse(id, Map.empty) + (kv(0) -> kv(1))
        }
      }
    }
    out.toMap
  }

  /** Decode every `*.seg` under `dataDir/segments` into (series, series_id,
    * tags, time, value) rows, then replay the WAL tail above each series'
    * segment highwater — recovery semantics from the reference
    * (`engine.zig:406-437`): a record applies only when its ts is strictly
    * above the series' running highwater (max flushed ts, advanced by each
    * applied record, so equal-ts WAL duplicates keep the first). The
    * store's own append re-derives ids from (name|tags); imported rows
    * keep the REFERENCE id so by_id queries against imported data match
    * the original system.
    */
  def readDataDir(spark: SparkSession, dataDir: String): DataFrame = {
    import spark.implicits._
    // the WAL/tags decoders are local-filesystem readers — fail loudly on
    // a remote URI rather than silently importing zero rows
    require(!dataDir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*"),
      s"readDataDir reads a local sydradb data dir; got URI '$dataDir' — copy it to local disk first")
    require(new java.io.File(dataDir).isDirectory, s"no such data dir: $dataDir")
    val tagIndex = spark.sparkContext.broadcast(loadTagIndex(s"$dataDir/tags.json"))
    val hasSegs = new java.io.File(dataDir, "segments").isDirectory
    val segs: DataFrame =
      if (!hasSegs) spark.emptyDataset[(String, Long, Map[String, String], Long, Double)].toDF(
        "series", "series_id", "tags", "time", "value")
      else spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.seg")
        .option("recursiveFileLookup", "true")
        .load(s"$dataDir/segments")
        .select("content")
        .as[Array[Byte]]
        .flatMap { bytes =>
          val seg = SegmentCodec.decode(bytes)
          val tags = tagIndex.value.getOrElse(seg.seriesId, Map.empty)
          seg.points.map { case (ts, v) =>
            (s"sid:${seg.seriesId}", seg.seriesId, tags, ts, v)
          }
        }.toDF("series", "series_id", "tags", "time", "value")

    val wal = codec.WalCodec.readDir(dataDir)
    if (wal.isEmpty) return segs

    // per-series flushed highwater; the WAL tail is rotation-capped
    // (64 MiB, wal.zig:63) so the driver-side fold mirrors the
    // reference's recover() hashmap at the same size class. The segs frame
    // is scanned exactly twice (here and by the caller) — recomputing is
    // cheaper than a cache() that would leak executor storage across
    // repeated imports in a long-lived server
    val highwater = scala.collection.mutable.Map[Long, Long]() ++=
      segs.groupBy("series_id").agg(max("time"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
    val applied = Seq.newBuilder[(String, Long, Map[String, String], Long, Double)]
    wal.foreach { r =>
      if (highwater.get(r.seriesId).forall(r.ts > _)) {
        applied += ((s"sid:${r.seriesId}", r.seriesId,
          tagIndex.value.getOrElse(r.seriesId, Map.empty), r.ts, r.value))
        highwater(r.seriesId) = r.ts
      }
    }
    segs.unionAll(
      applied.result().toDF("series", "series_id", "tags", "time", "value"))
  }

  /** Import into a store, preserving reference series ids. */
  def importDataDir(store: SeriesStore, dataDir: String): Long = {
    val df = readDataDir(store.spark, dataDir)
    // append() re-derives series_id from (series|tags); bypass it to keep
    // the reference ids byte-for-byte
    val seq = lit(SeriesStore.nextBatchSeq())
    val out = df
      .withColumn("seq", seq)
      .withColumn("hour_bucket", (col("time") - pmod(col("time"), lit(3600L))).cast("long"))
      .repartition(col("hour_bucket"))
      .sortWithinPartitions(col("series_id"), col("time"))
      .select("series", "series_id", "tags", "time", "value", "seq", "hour_bucket")
    out.write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("hour_bucket").parquet(s"${store.root}/segments")
    store.scan().count()
  }

  /** Export a store's points back to SYSEG2 segment files + manifest
    * (JSONL per `storage/manifest.zig`) — round-trip capability.
    */
  def exportDataDir(store: SeriesStore, destDir: String): Long = {
    import store.spark.implicits._
    // segment files are written executor-side to a plain java.io path while
    // MANIFEST/tags.json are written on the driver — on a non-local master
    // the segments would land on executor-local disks and the manifest
    // would reference missing files. Fail loudly (mirror of readDataDir's
    // local-dir guard); a cluster export needs a shared-filesystem writer.
    require(store.spark.sparkContext.master.startsWith("local"),
      s"exportDataDir writes segments from executors to local path '$destDir'; " +
        s"master '${store.spark.sparkContext.master}' would splinter the export — " +
        "run with a local master or copy via a shared filesystem")
    val dest = new java.io.File(destDir)
    new java.io.File(dest, "segments").mkdirs()
    // last-wins dedup first: exporting the raw scan would ship superseded
    // writes alongside winners, losing arrival order (seq) on re-import.
    // Segment encode + file write run on executors — each (series, hour)
    // group is co-located by the repartition and contiguous after the
    // sort; only the per-segment manifest metadata returns to the driver
    val meta = Maintenance.dedupLastWins(store.scan())
      .select(col("series_id"), col("hour_bucket"), col("time"), col("value"))
      .repartition(col("series_id"), col("hour_bucket"))
      .sortWithinPartitions(col("series_id"), col("hour_bucket"), col("time"), col("value"))
      .as[(Long, Long, Long, Double)]
      .mapPartitions { it =>
        val out = Seq.newBuilder[(Long, Long, Long, Long, Int, String)]
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
        var key: (Long, Long) = null
        def flush(): Unit = if (buf.nonEmpty) {
          val (sid, hour) = key
          val pts = buf.toSeq
          val bytes = SegmentCodec.encode(SegmentCodec.Segment(sid, hour, pts))
          val hourDir = new java.io.File(destDir, s"segments/$hour")
          hourDir.mkdirs()
          val name = f"$sid%x-${pts.head._1}-${pts.last._1}-0.seg"
          java.nio.file.Files.write(hourDir.toPath.resolve(name), bytes)
          out += ((sid, hour, pts.head._1, pts.last._1, pts.length, s"segments/$hour/$name"))
          buf.clear()
        }
        it.foreach { case (sid, hour, ts, v) =>
          if (key != ((sid, hour))) { flush(); key = (sid, hour) }
          buf += ((ts, v))
        }
        flush()
        out.result().iterator
      }
      .collect() // one row per (series, hour) segment — catalog-sized
    val manifest = new StringBuilder
    var n = 0L
    meta.sortBy { case (sid, hour, _, _, _, _) => (hour, java.lang.Long.toUnsignedString(sid)) }
      .foreach { case (sid, hour, startTs, endTs, count, path) =>
        // series_id is u64 in the reference (@intCast from i64 panics on
        // negatives, manifest.zig:48) — emit the unsigned decimal form
        manifest.append(
          s"""{"series_id":${java.lang.Long.toUnsignedString(sid)},"hour_bucket":$hour,"start_ts":$startTs,"end_ts":$endTs,"count":$count,"path":"$path"}\n""")
        n += count
      }
    java.nio.file.Files.write(dest.toPath.resolve("MANIFEST"), manifest.toString.getBytes)
    // tags.json (`storage/tags.zig:52-75`: {"k=v":[sid,...]}) — without it
    // an import can only address series via by_id(); with it, tag filters
    // work on the imported store too
    val postings = scala.collection.mutable.Map[String, scala.collection.mutable.TreeSet[Long]]()
    store.catalog().collect().foreach { r =>
      val sid = r.getAs[Long]("series_id")
      val tags = Option(r.getAs[scala.collection.Map[String, String]]("tags")).getOrElse(Map.empty)
      tags.foreach { case (k, v) =>
        postings.getOrElseUpdate(s"$k=$v", scala.collection.mutable.TreeSet[Long]()) += sid
      }
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    postings.toSeq.sortBy(_._1).foreach { case (kv, ids) =>
      val arr = rootNode.putArray(kv)
      // unsigned emission (tags.zig:25 @intCasts to u64); Jackson's asLong
      // on the BigInteger node still round-trips the bit pattern on import
      ids.foreach(id => arr.add(new java.math.BigInteger(java.lang.Long.toUnsignedString(id))))
    }
    java.nio.file.Files.write(dest.toPath.resolve("tags.json"),
      mapper.writeValueAsBytes(rootNode))
    n
  }
}
