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
  * Since r13 every [[Maintenance]] mutator (deleteRows, retention,
  * compaction) runs the same refresh hook for what it touched, so
  * engine DELETEs and TTL sweeps can no longer leave the cells serving
  * deleted rows.
  */
object SketchCells {

  /** Engine-integration convention: a store's cells live at
    * `<root>/sketchcells`.
    */
  def dirFor(store: SeriesStore): String = s"${store.root}/sketchcells"

  /** Memoized per (dir, refresh generation) — [[MetaCache]]: existence,
    * NDV keys and group keys are pure metadata a dashboard pays on EVERY
    * served query; every writer ([[build]], [[refresh]] incl. the
    * whole-store drop, the streaming maintenance twin) bumps the
    * generation via [[invalidate]].
    */
  def exists(spark: SparkSession, dir: String): Boolean =
    MetaCache.cached(dir, "exists") {
      val p = new org.apache.hadoop.fs.Path(s"$dir/td")
      java.lang.Boolean.valueOf(
        p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
    }.booleanValue()

  /** Writer hook: bump `dir`'s metadata generation after mutating the
    * tier outside [[build]]/[[refresh]] (the streaming twin's publishes).
    */
  def invalidate(dir: String): Unit = MetaCache.invalidate(dir)

  /** Basic-aggregate columns every cell carries beside `n_rows` (r14) —
    * the mergeable partials that let the engine serve
    * `avg/sum/count/min/max(value)` EXACTLY from the tier (avg = merged
    * sum / merged non-null count; min/max/count merge losslessly). The
    * reference's own RollupHint breadcrumb
    * (`/root/reference/src/sydra/query/plan.zig:19-21`,
    * `physical.zig:47-54`) marks exactly these plans for pre-aggregated
    * serving; the sketch columns served only the approximate half until
    * now.
    */
  private[graft] val basicCols = Seq("sum_v", "min_v", "max_v", "n_vals",
    "fl_first", "fl_last", "nn_first", "nn_last")

  private def basicAggs = Seq(
    sum(col("value")).as("sum_v"),
    min(col("value")).as("min_v"),
    max(col("value")).as("max_v"),
    count(col("value")).as("n_vals"), // non-null count — the avg/count(value) denominator
    // first/last partials: min/max over struct(time, value) IS the raw
    // route's min_by/max_by on (time, value) — lexicographic struct
    // ordering, value tiebreak included — and the struct min of day
    // minima is the window's min, so first/last coarsen like min/max.
    // Two variants because the language's aggregates disagree on nulls:
    // first()/last() rank null-valued rows (fl_*), delta()/rate() skip
    // them (nn_*, the orderedExtremes contract) — serving must be
    // raw-route-exact on EITHER, whatever the store holds
    min(struct(col("time").as("t"), col("value").as("v"))).as("fl_first"),
    max(struct(col("time").as("t"), col("value").as("v"))).as("fl_last"),
    min(when(col("value").isNotNull,
      struct(col("time").as("t"), col("value").as("v")))).as("nn_first"),
    max(when(col("value").isNotNull,
      struct(col("time").as("t"), col("value").as("v")))).as("nn_last"))

  private def cellsOf(scan: DataFrame, ndvTags: Seq[String]): DataFrame = {
    // NDV cells are THETA sketches (lgK 12), the SAME estimator family —
    // same lgK, same exact-mode range — as the raw-scan `ndv()` route
    // (Compiler's ThetaSketch.agg): creating or dropping the cell tier
    // must never change what a query returns merely by switching
    // estimator (the r12 HLL cells did exactly that past the sparse
    // range). The value is cast to string exactly as the raw route casts
    // its argument, so both routes hash identical bytes.
    val aggs = Seq(first(col("series")).as("series"),
      graft.functions.TDigest.agg(col("value")).as("td"),
      count(lit(1)).as("n_rows")) ++ basicAggs ++
      ndvTags.map(k => graft.functions.ThetaSketch.agg(
        try_element_at(col("tags"), lit(k)).cast("string")).as(s"theta_$k"))
    scan
      .groupBy(col("series_id"),
        (col("time") - pmod(col("time"), lit(86400L))).as("day"))
      .agg(aggs.head, aggs.tail: _*)
      .select((Seq(col("series_id"), col("series"), col("td"), col("n_rows")) ++
        basicCols.map(col) ++ ndvTags.map(k => col(s"theta_$k")) :+ col("day")): _*)
  }

  /** Tag-tier layout: one t-digest per (series, day, tag `k`=v), its own
    * day-partitioned table per key — the tier that serves
    * `percentile_approx … GROUP BY tag.k` without a raw rescan.
    */
  def tagDir(dir: String, k: String): String = s"$dir/tdtag/$k"

  /** One cell per (series, day, tag `k`=v). Since r14 the tag tier also
    * carries the store's theta NDV cells (`ndvTags`, same estimator
    * family/lgK discipline as [[cellsOf]]) so `ndv(tag.j) … GROUP BY
    * tag.k` — "distinct users per host per day" — merges KB blobs
    * instead of rescanning raw points.
    */
  private def tagCellsOf(scan: DataFrame, k: String,
      ndvTags: Seq[String]): DataFrame = {
    val aggs = Seq(first(col("series")).as("series"),
      graft.functions.TDigest.agg(col("value")).as("td"),
      count(lit(1)).as("n_rows")) ++ basicAggs ++
      ndvTags.map(j => graft.functions.ThetaSketch.agg(
        try_element_at(col("tags"), lit(j)).cast("string")).as(s"theta_$j"))
    scan
      .groupBy(col("series_id"),
        try_element_at(col("tags"), lit(k)).as("tagval"),
        (col("time") - pmod(col("time"), lit(86400L))).as("day"))
      .agg(aggs.head, aggs.tail: _*)
      .select((Seq(col("series_id"), col("series"), col("tagval"),
        col("td"), col("n_rows")) ++ basicCols.map(col) ++
        ndvTags.map(j => col(s"theta_$j")) :+ col("day")): _*)
  }

  /** Build (overwrite) the full cell store: one t-digest per
    * (series, day), plus — per `ndvTags` key — a theta sketch of that
    * tag's distinct values (the NDV half the engine's `ndv(tag.k)`
    * routing serves from), plus — per `groupTags` key — a tag-keyed
    * t-digest tier ([[tagDir]]) for `GROUP BY tag.k` serving. The store
    * is self-describing: `theta_<k>` columns record the NDV keys,
    * `tdtag/<k>` child dirs record the group keys, and [[refresh]]
    * re-derives both from what exists so incremental upkeep can never
    * silently change the store's shape.
    */
  def build(store: SeriesStore, dir: String, ndvTags: Seq[String] = Seq.empty,
      groupTags: Seq[String] = Seq.empty): Unit = {
    require(!store.isEmpty, s"store at ${store.root} has no flushed segments")
    cellsOf(store.scan(), ndvTags)
      .write.mode(SaveMode.Overwrite)
      // full rebuild replaces the WHOLE store: static overwrite explicitly,
      // so a session whose conf defaults to dynamic can never leave
      // removed-day partitions behind
      .option("partitionOverwriteMode", "static")
      .partitionBy("day").parquet(s"$dir/td")
    groupTags.foreach { k =>
      // the tag tier carries the SAME theta NDV keys as the td table, so
      // any NDV a global window can serve, a tag-grouped one can too
      tagCellsOf(store.scan(), k, ndvTags)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "static")
        .partitionBy("day").parquet(tagDir(dir, k))
    }
    // a rebuild may add/remove NDV or group-tag tiers: the serving
    // metadata memo must reload
    MetaCache.invalidate(dir)
  }

  /** Tag keys with a [[tagDir]] group tier in the store (memoized —
    * one directory listing per refresh generation, not per query).
    */
  def groupTagsOf(spark: SparkSession, dir: String): Seq[String] =
    MetaCache.cached(dir, "groupTags") {
      val p = new org.apache.hadoop.fs.Path(s"$dir/tdtag")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) Seq.empty[String]
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted
    }

  def readTag(spark: SparkSession, dir: String, k: String): DataFrame =
    spark.read.parquet(tagDir(dir, k))

  /** Tag keys whose theta NDV cells the store carries (from the cell
    * schema). A pre-r13 store's `hll_*` columns are NOT reported — its
    * ndv queries fall through to the raw route (correct, just unserved)
    * until the store is rebuilt with the theta cells.
    */
  def ndvTagsOf(spark: SparkSession, dir: String): Seq[String] =
    MetaCache.cached(dir, "ndvTags") {
      read(spark, dir).columns.toSeq
        .filter(_.startsWith("theta_")).map(_.stripPrefix("theta_"))
    }

  /** Recompute ONLY `days`' cells from the store (hour-partition-pruned
    * scan) and overwrite exactly those day partitions — the incremental
    * ingest path (same dynamic-partition-overwrite shape as the
    * streaming sketch-maintenance twin). The NDV tag keys come from the
    * existing store's schema. The dynamic mode is a WRITER option only —
    * never a session conf set (a leaked session-wide dynamic mode would
    * silently turn a later [[build]]'s intended full overwrite into a
    * partial one).
    *
    * Days in `days` with NO remaining rows (a delete or retention emptied
    * them) produce no fresh cells, which dynamic overwrite alone would
    * leave serving stale estimates — their partitions are dropped
    * explicitly after the write. (A crash between write and drop leaves
    * the emptied day's old cells behind — the same bounded crash window
    * as a crash before any refresh; the next refresh of that day heals it.)
    */
  /** Loud legacy guard: an incremental refresh writes recomputed day
    * partitions with [[cellsOf]]'s CURRENT schema while untouched days
    * keep theirs — on a store whose schema predates it (r12 `hll_*` NDV
    * cells, or pre-r14 cells without the basic-aggregate columns) that
    * would leave the table with inconsistent per-partition schemas, and
    * which columns a later read sees would depend on which footer Spark
    * samples. Mixed schemas are a silent-corruption mode; demand the
    * rebuild instead.
    */
  private def requireCurrentSchema(spark: SparkSession, path: String,
      cols: Seq[String]): Unit = {
    if (cols.exists(_.startsWith("hll_")))
      throw new IllegalStateException(
        s"cell store at $path carries pre-r13 hll_* NDV cells; an incremental " +
          "refresh would mix schemas across day partitions — rebuild via " +
          "SketchCells.build (NDV cells are theta sketches since r13)")
    if (!basicCols.forall(cols.contains))
      throw new IllegalStateException(
        s"cell store at $path lacks the basic-aggregate columns " +
          s"(${basicCols.mkString(", ")}); an incremental refresh would mix " +
          "schemas across day partitions — rebuild via SketchCells.build")
  }

  def refresh(store: SeriesStore, dir: String, days: Seq[Long]): Unit = {
    if (days.isEmpty) return
    val spark = store.spark
    requireCurrentSchema(spark, s"$dir/td", read(spark, dir).columns.toSeq)
    groupTagsOf(spark, dir).foreach(k =>
      requireCurrentSchema(spark, tagDir(dir, k),
        readTag(spark, dir, k).columns.toSeq))
    val dayCol = (col("time") - pmod(col("time"), lit(86400L)))
    val touched = store.scan().filter(dayCol.isin(days: _*))
    val remaining = touched.select(dayCol.as("day")).distinct()
      .collect().map(_.getLong(0)).toSet
    // one sweep per table (td + each group-tag tier): dynamic-overwrite
    // the recomputed days, drop the emptied ones
    def sweep(path: String, fresh: => DataFrame): Unit = {
      if (remaining.nonEmpty)
        fresh.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("day").parquet(path)
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      days.filterNot(remaining.contains).foreach { d =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"day=$d"), true)
      }
    }
    sweep(s"$dir/td", cellsOf(touched, ndvTagsOf(spark, dir)))
    groupTagsOf(spark, dir).foreach { k =>
      // each tag tier is self-describing: recompute with ITS theta keys
      val tagNdv = readTag(spark, dir, k).columns.toSeq
        .filter(_.startsWith("theta_")).map(_.stripPrefix("theta_"))
      sweep(tagDir(dir, k), tagCellsOf(touched, k, tagNdv))
    }
    // everything emptied → no partitions left to read; drop the whole
    // store (td + tag tiers) so exists() turns false and the engine
    // falls through to the raw route
    val tdRoot = new org.apache.hadoop.fs.Path(s"$dir/td")
    val fs = tdRoot.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(tdRoot) &&
        !fs.listStatus(tdRoot).exists(_.getPath.getName.startsWith("day="))) {
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    // any refresh (including the whole-store drop above) changes what the
    // serving metadata would answer — bump the memo generation
    MetaCache.invalidate(dir)
  }

  /** Refresh the store-convention cells for `days`, if the store exists. */
  def autoRefresh(store: SeriesStore, days: Seq[Long]): Unit = {
    val dir = dirFor(store)
    if (days.nonEmpty && exists(store.spark, dir)) refresh(store, dir, days)
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/td")
}
