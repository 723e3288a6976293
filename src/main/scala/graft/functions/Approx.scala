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
}
