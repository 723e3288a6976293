package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode}
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
