package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding windows over SKETCH CELLS — the temporal half of the at-rest
  * sketch story (`Approx.hllCells` / `TDigest.agg` build the cells;
  * `q_ts_hll_rollup` / `q_ts_tdigest` gate the whole-range merge): a
  * rolling "p95 over the trailing 7 days" or "distinct users over the
  * trailing 30 days" per series re-merges KB-sized per-day blobs instead
  * of rescanning raw points per window — at 100 TB the difference between
  * O(days × series) cell work and O(windows × raw-points) rescans.
  *
  * Window mechanics: each day cell contributes to `windowDays` trailing
  * windows, so the cell frame EXPLODES to its window offsets (a
  * windowDays-element literal array — the same stencil trick as the
  * grid-DBSCAN 9-neighbor join) and equi-joins/aggregates on
  * (series, target_day). No range join, no BroadcastNestedLoopJoin at
  * any size; the exploded frame is cells × windowDays, still
  * cell-dimension-sized (≪ raw points).
  *
  * Emission: every (series, target_day) with ≥1 contributing cell —
  * leading-edge windows are PARTIAL (the first day's window covers one
  * day), and target days past the last data day are dropped by joining
  * back to the observed day set. Callers wanting full windows only
  * filter `n_days = windowDays`.
  */
object SketchWindows {

  private def exploded(cells: DataFrame, windowDays: Int, step: Long): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val offsets = array((0 until windowDays).map(o => lit(o.toLong * step)): _*)
    cells.withColumn("__off", explode(offsets))
      .withColumn("target_day", col("day") + col("__off"))
  }

  /** Observed (series, day) keys — the emission domain. */
  private def observedDays(cells: DataFrame): DataFrame =
    cells.select(col("series"), col("day").as("target_day")).distinct()

  /** Rolling quantiles from t-digest day cells (series, day, td).
    * Output: (series, target_day, n_days, p50, p95, p99).
    */
  def rollingQuantiles(cells: DataFrame, windowDays: Int,
      step: Long = 86400L): DataFrame = {
    val merged = exploded(cells, windowDays, step)
      .groupBy(col("series"), col("target_day"))
      .agg(graft.functions.TDigest.mergeAgg(col("td")).as("td"),
        count(lit(1)).as("n_days"))
    merged.join(observedDays(cells), Seq("series", "target_day"))
      .select(col("series"), col("target_day"), col("n_days"),
        graft.functions.TDigest.quantileOf(col("td"), 0.5).as("p50"),
        graft.functions.TDigest.quantileOf(col("td"), 0.95).as("p95"),
        graft.functions.TDigest.quantileOf(col("td"), 0.99).as("p99"))
  }

  /** Rolling NDV from HLL day cells (series, day, hll, n_rows).
    * Output: (series, target_day, n_days, n_rows, ndv_est).
    */
  def rollingNdv(cells: DataFrame, windowDays: Int,
      step: Long = 86400L): DataFrame = {
    val merged = exploded(cells, windowDays, step)
      .groupBy(col("series"), col("target_day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"), lit(false))).as("ndv_est"),
        sum(col("n_rows")).as("n_rows"),
        count(lit(1)).as("n_days"))
    merged.join(observedDays(cells), Seq("series", "target_day"))
      .select(col("series"), col("target_day"), col("n_days"),
        col("n_rows"), col("ndv_est"))
  }
}
