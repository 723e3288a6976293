package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift statistics between corpus slices — the monitor a
  * training-data pipeline runs when a new crawl/source lands: has the
  * length/score/quality distribution moved against the baseline?
  *
  * Kolmogorov–Smirnov here; PSI (binned, log-ratio) lives in the
  * time-series gate surface (`q_ts_psi`). KS needs no binning — it works
  * on the exact ECDFs — so it is the right statistic for discrete or
  * already-quantized values; for continuous values at 100 TB, pre-bin
  * first (the PSI shape) so the distinct-value frame stays bounded.
  */
object Drift {

  /** Two-sample KS statistic of `valCol`'s distribution for every group
    * vs the `baseline` group: (grp, n_base, n_grp, ks).
    *
    * Shape: one (group, value) count aggregate (partial+final — the only
    * pass over the data), then ECDFs via a group-partitioned running sum
    * over the DISTINCT-value frame and a max-of-abs-diff aggregate. The
    * baseline's counts are replicated per compared group through a
    * broadcast cross join of the group dimension (|groups| rows) — no
    * data-sized shuffle ever carries more than the distinct-value frame.
    */
  def ksTest(df: DataFrame, grpCol: String, valCol: String, baseline: String): DataFrame = {
    val base = df.select(col(grpCol).as("g"), col(valCol).cast("double").as("v"))
    // fail loudly on a misspelled/absent baseline — otherwise tb = 0
    // silently nulls every group's ks (one metadata-sized limit(1) probe)
    require(!base.filter(col("g") === baseline).isEmpty,
      s"ksTest: baseline group '$baseline' has no rows in $grpCol")
    val others = base.filter(col("g") =!= baseline)
    val pairsDim = others.select(col("g").as("pair")).distinct()
    val taggedAll = others.select(col("g").as("pair"), lit(0L).as("is_base"), col("v"))
      .unionAll(base.filter(col("g") === baseline)
        .crossJoin(broadcast(pairsDim))
        .select(col("pair"), lit(1L).as("is_base"), col("v")))
    val pv = taggedAll.groupBy(col("pair"), col("v"))
      .agg(sum(when(col("is_base") === 1L, 1L).otherwise(0L)).as("nb"),
        sum(when(col("is_base") === 0L, 1L).otherwise(0L)).as("nx"))
    val w = Window.partitionBy(col("pair")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = pv
      .withColumn("cb", sum(col("nb")).over(w))
      .withColumn("cx", sum(col("nx")).over(w))
    val tot = pv.groupBy(col("pair")).agg(sum(col("nb")).as("tb"), sum(col("nx")).as("tx"))
    cum.join(tot, "pair")
      .groupBy(col("pair"))
      .agg(
        max(col("tb")).as("n_base"),
        max(col("tx")).as("n_grp"),
        (floor(max(abs(col("cb") / col("tb") - col("cx") / col("tx"))) * 1e4 + 0.5) / 1e4)
          .as("ks"))
      .withColumnRenamed("pair", "grp")
  }
}
