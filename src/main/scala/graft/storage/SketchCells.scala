package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest t-digest cell store for a [[SeriesStore]] — the engine-facing
  * slice of the sketch tier: one few-KB mergeable digest per
  * (series, day) cell, day-PARTITIONED parquet, so any later quantile
  * over a day-aligned window is a partition-pruned read + blob merge —
  * never a raw-point rescan. `q_ts_tdigest` gates the sketch math; this
  * object gives the store a PLACE for the cells and
  * [[graft.sydraql.Engine]] a routing rule: a sydraQL
  * `percentile_approx` whose group keys coarsen the (series, day) cell
  * keys is served from here instead of the raw scan.
  *
  * Scale shape: the build is one partial-aggregated pass over the store
  * (digest state is bounded per cell); the store is O(series × days)
  * KB-sized rows; serving reads only the probed days' partitions
  * (PlanSpec pins the PartitionFilters). Append freshness follows the
  * skip-manifest stance ([[SkipIndex.dirFor]]): [[SeriesStore.append]]
  * recomputes the touched days when the store exists — a stale cell
  * would silently under-count, the one failure mode that isn't loud.
  * Offline compaction/retention change history wholesale — rebuild (or
  * refresh the affected days) after, as with the skip manifest.
  */
object SketchCells {

  /** Engine-integration convention: a store's cells live at
    * `<root>/sketchcells`.
    */
  def dirFor(store: SeriesStore): String = s"${store.root}/sketchcells"

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/td")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def cellsOf(scan: DataFrame, ndvTags: Seq[String]): DataFrame = {
    val aggs = Seq(first(col("series")).as("series"),
      graft.functions.TDigest.agg(col("value")).as("td"),
      count(lit(1)).as("n_rows")) ++
      ndvTags.map(k => hll_sketch_agg(
        try_element_at(col("tags"), lit(k)), lit(12)).as(s"hll_$k"))
    scan
      .groupBy(col("series_id"),
        (col("time") - pmod(col("time"), lit(86400L))).as("day"))
      .agg(aggs.head, aggs.tail: _*)
      .select((Seq(col("series_id"), col("series"), col("td"), col("n_rows")) ++
        ndvTags.map(k => col(s"hll_$k")) :+ col("day")): _*)
  }

  /** Build (overwrite) the full cell store: one t-digest per
    * (series, day), plus — per `ndvTags` key — an HLL sketch of that
    * tag's distinct values (the NDV half the engine's `ndv(tag.k)`
    * routing serves from). The cell schema is self-describing: the
    * `hll_<k>` columns record which tag keys the store carries, and
    * [[refresh]] re-derives them from the existing schema so incremental
    * upkeep can never silently change the store's shape.
    */
  def build(store: SeriesStore, dir: String, ndvTags: Seq[String] = Seq.empty): Unit = {
    require(!store.isEmpty, s"store at ${store.root} has no flushed segments")
    cellsOf(store.scan(), ndvTags)
      .write.mode(SaveMode.Overwrite).partitionBy("day").parquet(s"$dir/td")
  }

  /** Tag keys whose HLL cells the store carries (from the cell schema). */
  def ndvTagsOf(spark: SparkSession, dir: String): Seq[String] =
    read(spark, dir).columns.toSeq
      .filter(_.startsWith("hll_")).map(_.stripPrefix("hll_"))

  /** Recompute ONLY `days`' cells from the store (hour-partition-pruned
    * scan) and overwrite exactly those day partitions — the incremental
    * ingest path (same dynamic-partition-overwrite shape as the
    * streaming sketch-maintenance twin). The HLL tag keys come from the
    * existing store's schema.
    */
  def refresh(store: SeriesStore, dir: String, days: Seq[Long]): Unit = {
    if (days.isEmpty) return
    val spark = store.spark
    val touched = store.scan().filter(
      (col("time") - pmod(col("time"), lit(86400L))).isin(days: _*))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    cellsOf(touched, ndvTagsOf(spark, dir))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(s"$dir/td")
  }

  /** Refresh the store-convention cells for `days`, if the store exists. */
  def autoRefresh(store: SeriesStore, days: Seq[Long]): Unit = {
    val dir = dirFor(store)
    if (days.nonEmpty && exists(store.spark, dir)) refresh(store, dir, days)
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/td")
}
