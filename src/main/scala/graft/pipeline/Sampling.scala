package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent on partitioning (same seed, different
  * split → different rows), which breaks reproducibility across cluster
  * sizes and re-runs. These samplers decide per-ROW from a portable
  * md5-derived hash of (salt, key), so the selected set is a pure function
  * of the data — identical on 1 executor or 1000, and reproducible by any
  * SQL engine for auditing.
  *
  * All narrow (per-row filter, no shuffle); at 100 TB the sample decision
  * rides the scan.
  */
object Sampling {

  /** Uniform hash in [0, 1e6): md5-based, mirrors TextAnalysis.hash60. */
  def hashUnit(key: Column, salt: String): Column =
    TextAnalysis.hash60(concat(lit(salt), lit(":"), key.cast("string"))) % 1000000L

  /** Deterministic Bernoulli sample: keep iff hash(salt, key) < rate.
    * Changing `salt` draws an independent sample; the same (salt, key)
    * always decides the same way (stable across re-runs and repartitions).
    */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double, salt: String): DataFrame =
    df.filter(hashUnit(col(keyCol), salt) < math.round(rate * 1e6))

  /** Stratified sample: per-stratum rates (e.g. upsample rare languages,
    * downsample boilerplate-heavy domains), default rate for strata not
    * listed. One narrow filter — the stratum column must already exist
    * (join/derive it upstream).
    */
  def stratified(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(math.round(defaultRate * 1e6)): Column) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(math.round(r * 1e6))).otherwise(acc)
    }
    df.filter(hashUnit(col(keyCol), salt) < rate)
  }
}
