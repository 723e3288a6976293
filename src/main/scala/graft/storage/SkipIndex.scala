package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping manifest for a [[SeriesStore]] — the layer
  * between partition pruning and parquet row-group stats.
  *
  * The store's hour partitioning already turns time predicates into
  * directory pruning, and parquet footers carry per-row-group min/max.
  * But at 100 TB a selective probe ("series S, 6-hour window") still has
  * to LIST every surviving partition and open every file's footer before
  * it can skip anything — tens of thousands of round-trips on an object
  * store. This manifest is one metadata-sized parquet table, read once:
  *
  *   file, hour_bucket, min_time, max_time, min_value, max_value,
  *   n_rows, bloom ARRAY<LONG>(16)
  *
  * per data file, where `bloom` is a 1024-bit / 3-hash Bloom filter over
  * the file's distinct `series_id`s. A probe prunes the manifest frame
  * (time-range overlap + bloom membership), collects the surviving file
  * list (metadata-sized), and reads ONLY those files; exact residual
  * predicates run on what is read, so a bloom false positive costs one
  * extra file read, never a wrong row. The same role as Delta/Iceberg
  * file statistics + bloom column indexes, rebuilt store-native.
  *
  * Scale shape: the build is one pass over the data (two aggregates that
  * share the scan: per-file stats, and per-(file, distinct series)
  * bit-position OR); the manifest is O(files) rows. Incremental refresh
  * composes with compaction the same way the BM25 index's changed-bucket
  * rewrite does — rebuild is cheap enough per hour partition that the
  * gate uses full rebuild.
  *
  * Reference: file-stat pruning generalizes the segment store's
  * TimeBounds skip (`/root/reference/src/sydra/query/physical.zig:138-264`)
  * from partitions to individual files, and adds the series dimension the
  * reference's per-(series, hour) file naming gives it implicitly.
  */
object SkipIndex {

  private val Bits = 1024
  private val Words = Bits / 64
  private val Hashes = 3

  /** Bit positions of `id` (a series_id column) — k salted xxhash64s. */
  private def positions(id: org.apache.spark.sql.Column) =
    (0 until Hashes).map(k => pmod(xxhash64(id, lit(k)), lit(Bits.toLong)))

  /** Build (overwrite) the manifest for every data file in the store. */
  def build(store: SeriesStore, manifestDir: String): Unit = {
    val raw = store.scan().withColumn("__file", col("_metadata.file_path"))
    val stats = raw.groupBy(col("__file"))
      .agg(first(col("hour_bucket")).as("hour_bucket"),
        min(col("time")).as("min_time"), max(col("time")).as("max_time"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"),
        count(lit(1)).as("n_rows"))
    val blooms = raw.select(col("__file"), col("series_id")).distinct()
      .select(col("__file"), explode(array(positions(col("series_id")): _*)).as("pos"))
      .select(col("__file"), (col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("mask"))
      .groupBy(col("__file"), col("word"))
      .agg(bit_or(col("mask")).as("bits"))
      .groupBy(col("__file"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("m"))
      .select(col("__file"),
        array((0 until Words).map(w =>
          coalesce(element_at(col("m"), lit(w)), lit(0L))): _*).as("bloom"))
    stats.join(blooms, "__file")
      .withColumnRenamed("__file", "file")
      .coalesce(1) // O(files) rows — one manifest file reads in one round-trip
      .write.mode(SaveMode.Overwrite).parquet(manifestDir)
  }

  def read(spark: SparkSession, manifestDir: String): DataFrame =
    spark.read.parquet(manifestDir)

  /** A manifest-pruned scan plus its skipping evidence. */
  final case class SkipScan(df: DataFrame, filesRead: Int, filesTotal: Int)

  /** Rows of `series_id = seriesId` with `startTs <= time <= endTs`
    * (inclusive, the [[SeriesStore.scanRange]] convention), reading only
    * files whose manifest entry overlaps the range AND whose bloom may
    * contain the series. Identical rows to the full-scan filter — the
    * manifest changes what is READ, never what is true.
    */
  def probeScan(store: SeriesStore, manifestDir: String,
      startTs: Long, endTs: Long, seriesId: Long): SkipScan = {
    val spark = store.spark
    // probe-side bit positions via the SAME Spark expressions that built
    // the filter (one metadata-sized local projection — no reimplemented
    // xxhash64 to drift out of sync)
    val pos = spark.range(1)
      .select(positions(lit(seriesId)): _*).head().toSeq.map(_.asInstanceOf[Long].toInt)
    val m = read(spark, manifestDir)
    val bloomHit = pos.map { p =>
      (element_at(col("bloom"), lit(p / 64 + 1)).bitwiseAND(lit(1L << (p % 64)))) =!= 0L
    }.reduce(_ && _)
    val survivors = m
      .filter(col("min_time") <= endTs && col("max_time") >= startTs && bloomHit)
      .select("file").collect().map(_.getString(0))
    val total = m.count().toInt
    val df =
      if (survivors.isEmpty) store.scan().filter(lit(false))
      else {
        val fs = new org.apache.hadoop.fs.Path(store.segDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val base = fs.makeQualified(new org.apache.hadoop.fs.Path(store.segDir)).toString
        spark.read.option("basePath", base).parquet(survivors.toIndexedSeq: _*)
      }
    SkipScan(
      df.filter(col("series_id") === seriesId &&
        col("time") >= startTs && col("time") <= endTs),
      survivors.length, total)
  }
}
