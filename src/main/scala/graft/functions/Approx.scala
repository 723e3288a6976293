package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB path for the operators whose exact
  * forms need a full sort or full distinct set:
  *
  *  - exact `percentile` (the oracle-parity default in the sydraQL engine)
  *    materializes and sorts each group; [[pApprox]] is a t-digest-style
  *    sketch with bounded state and mergeable partials;
  *  - `count(distinct x)` double-shuffles; [[distinctApprox]] is
  *    HyperLogLog++ with per-partition sketches merged map-side.
  *
  * These are deliberately NOT wired into the DuckDB-oracled gate (sketch
  * algorithms differ across engines); accuracy is asserted in tests
  * against the exact forms instead.
  */
object Approx {

  /** Approximate percentile with bounded sketch state (higher accuracy =
    * larger sketch; 10000 ≈ 0.01% rank error).
    */
  def pApprox(value: Column, p: Double, accuracy: Int = 10000): Column =
    percentile_approx(value, lit(p), lit(accuracy))

  /** HLL++ approximate distinct (rsd = relative standard deviation). */
  def distinctApprox(value: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(value, rsd)

  /** Per-series approximate quantile summary — the scale form of
    * `q_ts_percentile`.
    */
  def seriesQuantiles(sv: DataFrame, ps: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame =
    sv.groupBy(col("series")).agg(
      pApprox(col("value"), ps.head).as(s"p${(ps.head * 100).toInt}"),
      ps.tail.map(p => pApprox(col("value"), p).as(s"p${(p * 100).toInt}")): _*)

  // ---- at-rest HLL sketch rollup ---------------------------------------
  //
  // The Druid/DataSketches pattern the t-digest rollup (q_ts_tdigest)
  // applies to quantiles, here for NDV: store one serialized HLL sketch
  // per rollup cell next to the counts, answer any later distinct-count
  // question (any day range, any series subset) by MERGING sketch blobs —
  // no raw-point rescan, and unions are exact-union (no inclusion-
  // exclusion error stacking). Spark 4 ships Apache DataSketches HLL as
  // hll_sketch_agg / hll_union_agg / hll_sketch_estimate; these helpers
  // just fix the graft rollup-cell schema around them.

  /** Build rollup cells: one serialized HLL sketch of `of` per
    * (keys..., cell). Write this frame partitioned however the rollup
    * tier partitions (day, typically) — each cell is a few KB regardless
    * of cardinality.
    */
  def hllCells(df: DataFrame, of: Column, keys: Seq[Column], lgK: Int = 12): DataFrame =
    df.groupBy(keys: _*).agg(
      hll_sketch_agg(of, lit(lgK)).as("hll"),
      count(lit(1)).as("n_rows"))

  /** Merge stored cells back to an NDV estimate per `keys` — the
    * query-time half: scans sketch blobs only.
    */
  def hllMergeNdv(cells: DataFrame, keys: Seq[Column]): DataFrame =
    cells.groupBy(keys: _*).agg(
      hll_sketch_estimate(hll_union_agg(col("hll"), lit(false))).as("ndv_est"),
      sum(col("n_rows")).as("n_rows"))
}
