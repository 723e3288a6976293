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

  /** Winsorized per-group statistics: clamp `valCol` to its group's
    * [pLo, pHi] exact interpolated percentiles and report the robust
    * mean next to the raw one — the outlier-proof screen for quality
    * scores and length stats (one boilerplate page of 10^6 chars drags
    * a raw mean; the winsorized mean it cannot).
    *
    * Determinism: the cutoffs are engine-order-dependent float stats —
    * pre-rounded 1e-6 BEFORE clamping (the SAX stance), so the clamped
    * values, clamp counts, and means replay bit-for-bit in any engine.
    *
    * Shape: two aggregates over one shuffle key — the percentile pass
    * (exact, per-group sort: right for group-sized slices; swap in
    * percentile_approx for the one-pass sketch at 100 TB) and the
    * clamped-stats pass, joined group-to-group (groups are
    * dimension-sized; AQE broadcasts the cutoff frame).
    */
  def winsorize(df: DataFrame, grpCol: String, valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentile band [$pLo, $pHi]")
    val v = col(valCol).cast("double")
    val r6 = (c: org.apache.spark.sql.Column) => floor(c * 1e6 + 0.5) / 1e6
    val cuts = df.groupBy(col(grpCol))
      .agg(r6(percentile(v, lit(pLo))).as("__lo"), r6(percentile(v, lit(pHi))).as("__hi"))
    df.join(cuts, grpCol)
      .withColumn("__w", least(greatest(v, col("__lo")), col("__hi")))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"),
        first(col("__lo")).as("p_lo"), first(col("__hi")).as("p_hi"),
        sum(when(v < col("__lo"), 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when(v > col("__hi"), 1L).otherwise(0L)).as("n_clamped_hi"),
        (floor(avg(v) * 1e4 + 0.5) / 1e4).as("raw_mean"),
        (floor(avg(col("__w")) * 1e4 + 0.5) / 1e4).as("winsorized_mean"))
  }
}
