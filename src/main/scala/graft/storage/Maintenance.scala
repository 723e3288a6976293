package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compaction + retention jobs, ported semantics:
  *  - compaction merges each (series, hour)'s rows and dedups identical
  *    timestamps keeping the LAST write
  *    (`/root/reference/src/sydra/storage/compact.zig:36-50`) — arrival
  *    order here is the monotone `seq` column;
  *  - retention drops whole hour partitions older than the TTL cutoff
  *    (`storage/retention.zig:4-20`) — a metadata-only partition delete.
  */
object Maintenance {

  /** Continuous aggregate maintenance (the TimescaleDB continuous-
    * aggregate / materialized-rollup pattern): keep a per-(series,
    * `step`-bucket) rollup table at `dir` incrementally up to date with
    * the store.
    *
    * Incrementality is hour-partition-granular and METADATA-driven: a
    * manifest records each source hour partition's file signature
    * (name:length list — no data read); refresh recomputes ONLY hours
    * whose signature changed since the last run and rewrites exactly
    * those rollup partitions (dynamic partition overwrite). An append
    * touching one hour re-aggregates one hour, never the table — the
    * property that makes a rollup maintainable over years of history.
    *
    * The rollup stores MERGEABLE partials (sum, n, min, max), not
    * averages: serving layers derive avg = sum/n, and coarser re-rollups
    * (day from hour) stay exact by re-summing. Rollup rows reflect the
    * stored rows as-is (same multiplicity contract as `scan()`);
    * run [[compact]] first if last-wins visibility is wanted.
    * `step` must divide 3600 so buckets never straddle the hour
    * partitioning. Returns the refreshed hour buckets.
    */
  def continuousRollup(store: SeriesStore, dir: String,
      step: Long = 3600L): Seq[Long] = {
    require(step > 0 && 3600 % step == 0,
      "rollup step must divide the hour partition")
    val spark = store.spark
    val manifestFile = new java.io.File(dir, "_manifest.tsv")
    val prev: Map[Long, String] =
      if (!manifestFile.exists()) Map.empty
      else scala.io.Source.fromFile(manifestFile).getLines().map { l =>
        val Array(h, s) = l.split("\t", 2); h.toLong -> s
      }.toMap
    def sigOf(h: Long): String = {
      val d = new java.io.File(s"${store.root}/segments/hour_bucket=$h")
      d.listFiles().toSeq.filter(_.isFile).filterNot(_.getName.startsWith("_"))
        .map(f => s"${f.getName}:${f.length()}").sorted.mkString(",")
    }
    val current = store.partitions().map(h => h -> sigOf(h)).toMap
    val changed = current.collect {
      case (h, s) if !prev.get(h).contains(s) => h
    }.toSeq.sorted
    if (changed.nonEmpty) {
      val roll = store.scan()
        .filter(col("hour_bucket").isInCollection(changed))
        .groupBy(col("series_id"), col("series"), col("hour_bucket"),
          (col("time") - pmod(col("time"), lit(step))).as("bucket"))
        .agg(sum(col("value")).as("sum_v"), count(col("value")).as("n"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try roll.write.mode(SaveMode.Overwrite)
        .partitionBy("hour_bucket").parquet(s"$dir/rollup")
      finally saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    // hours DROPPED from the store (retention) leave stale rollup
    // partitions — remove them so the rollup tracks deletes too
    val dropped = prev.keySet -- current.keySet
    dropped.foreach { h =>
      val d = new java.io.File(s"$dir/rollup/hour_bucket=$h")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    manifestFile.getParentFile.mkdirs()
    java.nio.file.Files.write(manifestFile.toPath,
      current.toSeq.sorted.map { case (h, s) => s"$h\t$s" }
        .mkString("\n").getBytes)
    changed
  }

  /** Read the rollup table maintained by [[continuousRollup]]. */
  def readRollup(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/rollup")

  /** Last-wins dedup on (series_id, time). */
  def dedupLastWins(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series_id"), col("time")).orderBy(col("seq").desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Rewrite the whole segment table deduped (small stores / tests). At
    * scale, compact per-partition: read one hour_bucket dir, dedup, write
    * back — embarrassingly parallel across partitions.
    */
  def compact(store: SeriesStore): Unit = {
    val spark = store.spark
    val deduped = dedupLastWins(store.scan()).cache()
    deduped.count() // materialize before overwrite
    deduped
      .repartition(col("hour_bucket"))
      .sortWithinPartitions(col("series_id"), col("time"))
      .write.mode(SaveMode.Overwrite).partitionBy("hour_bucket")
      .parquet(s"${store.root}/segments.compact")
    // atomic-ish swap (manifest-entry swap in the reference, compact.zig:52-78)
    val rootDir = new java.io.File(store.root)
    val live = new java.io.File(rootDir, "segments")
    val next = new java.io.File(rootDir, "segments.compact")
    val bak = new java.io.File(rootDir, "segments.old")
    if (bak.exists()) deleteRecursively(bak)
    if (live.exists()) { live.renameTo(bak); () }
    next.renameTo(live)
    if (bak.exists()) deleteRecursively(bak)
    spark.catalog.clearCache()
  }

  /** Compact selected hour partitions independently — one read+dedup+
    * rewrite per partition dir, no global shuffle; at scale each hour is
    * its own job (embarrassingly parallel, mirrors the reference's
    * per-(series,hour) compaction unit).
    */
  def compactPartitions(store: SeriesStore, hours: Seq[Long]): Unit = hours.foreach { h =>
    val dir = s"${store.root}/segments/hour_bucket=$h"
    if (new java.io.File(dir).exists()) {
      val deduped = dedupLastWins(
        store.spark.read.schema(store.schema).parquet(dir))
        .sortWithinPartitions(col("series_id"), col("time"))
        .cache()
      deduped.count()
      deduped.write.mode(SaveMode.Overwrite).parquet(s"$dir.new")
      deleteRecursively(new java.io.File(dir))
      new java.io.File(s"$dir.new").renameTo(new java.io.File(dir))
      store.spark.catalog.clearCache()
    }
  }

  /** Drop hour partitions strictly older than `cutoffTs` (epoch seconds).
    * Pure directory delete — no data rewrite, constant-time per partition.
    */
  /** Small-file compaction: re-layout every hour partition whose parquet
    * files average under `targetBytes / 2` into
    * `ceil(totalBytes / targetBytes)` files — the bin-packing maintenance
    * pass that keeps scan task counts proportional to DATA, not to
    * ingest-batch count (each streaming micro-batch appends its own
    * files; a day of 1-minute triggers is 1 440 tiny files per hot hour,
    * and at 1 000 executors that is 1 440 scan tasks per hour doing
    * per-file open/footer work).
    *
    * Pure layout: no dedup (that is [[compact]]'s job), rows re-sorted
    * (series_id, time) within each output file — the same order segment
    * writes guarantee. Per-hour independent jobs with the same
    * rewrite-then-rename swap as [[compactPartitions]]; a crash between
    * rename steps leaves either the old or the new complete directory on
    * atomic-rename filesystems.
    *
    * Returns (hour, files_before, files_after, bytes) per compacted hour;
    * hours already at-or-under target density are untouched.
    */
  def compactSmallFiles(store: SeriesStore, targetBytes: Long): Seq[(Long, Int, Int, Long)] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val segRoot = new java.io.File(store.root, "segments")
    val hourDirs = Option(segRoot.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("hour_bucket="))
    hourDirs.toSeq.sortBy(_.getName).flatMap { hd =>
      val files = Option(hd.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.getName.endsWith(".parquet"))
      val total = files.map(_.length).sum
      val n = files.length
      val want = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
      if (n > want && total.toDouble / n < targetBytes / 2.0) {
        val hour = hd.getName.stripPrefix("hour_bucket=").toLong
        val packed = store.spark.read.schema(store.schema).parquet(hd.toString)
          .coalesce(want)
          .sortWithinPartitions(col("series_id"), col("time"))
          .cache()
        packed.count() // materialize before the overwrite
        packed.write.mode(SaveMode.Overwrite).parquet(hd.toString + ".new")
        deleteRecursively(hd)
        new java.io.File(hd.toString + ".new").renameTo(hd)
        store.spark.catalog.clearCache()
        Some((hour, n, want, total))
      } else None
    }
  }

  def applyRetention(store: SeriesStore, cutoffTs: Long): Seq[Long] = {
    val dropped = store.partitions().filter(h => h + 3599 < cutoffTs)
    dropped.foreach { h =>
      deleteRecursively(new java.io.File(s"${store.root}/segments/hour_bucket=$h"))
    }
    dropped
  }

  /** Per-namespace TTL retention (`config.zig:96-105` `retention.<ns>`
    * overrides + `ttlForSeries`, `storage/retention.zig:4-20`): namespace
    * is the series prefix before the first '.' (whole name if none,
    * `config.zig:96-99`); `ttlDays == 0` keeps forever.
    *
    * Hour partitions mix namespaces, so namespace-dependent expiry needs a
    * row-level rewrite — but only of partitions old enough to contain ANY
    * expirable row. Two phases:
    *  1. fast path: when every TTL is finite, partitions older than the
    *     LONGEST TTL are expired for every namespace → constant-time
    *     directory drop (the global-TTL path);
    *  2. row-level: `deleteRows` with a per-row TTL predicate — touches
    *     only partitions the predicate can match (all newer partitions
    *     prune away), each rewritten independently, no global shuffle.
    *
    * Returns the fast-path-dropped partition hours.
    */
  def applyRetention(
      store: SeriesStore,
      defaultTtlDays: Long,
      nsTtlDays: Map[String, Long],
      nowTs: Long): Seq[Long] = {
    if (store.isEmpty) return Nil
    val ttls = defaultTtlDays +: nsTtlDays.values.toSeq
    val dropped =
      if (ttls.forall(_ > 0)) applyRetention(store, nowTs - ttls.max * 86400L)
      else Nil
    // namespaceOf(series): prefix before the first '.' (config.zig:96-99)
    val ns = substring_index(col("series"), ".", 1)
    val ttlCol = nsTtlDays.foldLeft(lit(defaultTtlDays)) {
      case (acc, (n, d)) => when(ns === n, lit(d)).otherwise(acc)
    }
    deleteRows(store, ttlCol > 0 && col("time") < (lit(nowTs) - ttlCol * 86400L))
    dropped
  }

  /** Row-level delete for `DELETE FROM <sel> WHERE <pred>`: rewrite only
    * the hour partitions that may contain matches.
    */
  def deleteRows(store: SeriesStore, predicate: org.apache.spark.sql.Column): Unit = {
    val affected = store.scan().filter(predicate)
      .select("hour_bucket").distinct().collect().map(_.getLong(0))
    if (affected.isEmpty) return
    affected.foreach { h =>
      val dir = s"${store.root}/segments/hour_bucket=$h"
      val remaining = store.spark.read.schema(store.schema).parquet(dir)
        .withColumn("hour_bucket", lit(h))
        .filter(!predicate || predicate.isNull)
        .drop("hour_bucket")
        .cache()
      remaining.count()
      remaining.write.mode(SaveMode.Overwrite).parquet(s"$dir.new")
      deleteRecursively(new java.io.File(dir))
      new java.io.File(s"$dir.new").renameTo(new java.io.File(dir))
      store.spark.catalog.clearCache()
    }
  }

  /** Snapshot: recursive copy of the data dir (`snapshot.zig:3-47`). */
  def snapshot(store: SeriesStore, dest: String): Unit =
    copyRecursively(new java.io.File(store.root), new java.io.File(dest))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
    ()
  }

  private def copyRecursively(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      src.listFiles().foreach(c => copyRecursively(c, new java.io.File(dst, c.getName)))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }
}
