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
    // one array-fraction percentile: two separate aggs would each buffer
    // a full copy of the group's values (the q_dq_histogram lesson)
    val cuts = df.groupBy(col(grpCol))
      .agg(percentile(v, array(lit(pLo), lit(pHi))).as("__q"))
      .select(col(grpCol), r6(element_at(col("__q"), 1)).as("__lo"),
        r6(element_at(col("__q"), 2)).as("__hi"))
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

  /** Shared-support histogram counts for every group vs the `baseline`
    * group: (pair, bin, nb, nx, tb, tx) over a DENSE `bins`-row spine
    * per pair, plus the common bin `width` on every row.
    *
    * The bin grid is global (min/max over the WHOLE frame, fixed-width)
    * so every pair's histogram lives on the same support — the
    * precondition for any distribution distance. min/max are
    * order-independent (exact), and the bin assignment
    * `least(bins-1, floor((v-lo)/width))` is the same IEEE expression in
    * any engine, so the counts replay bit-for-bit.
    *
    * Shape: one (pair, bin) count aggregate is the only pass over the
    * data (baseline rows are replicated per compared group through a
    * broadcast cross join of the group dimension, exactly as [[ksTest]]);
    * the dense spine and totals are |groups| x bins rows — metadata.
    */
  private def pairedBinCounts(df: DataFrame, grpCol: String, valCol: String,
      baseline: String, bins: Int): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val base = df.select(col(grpCol).as("g"), col(valCol).cast("double").as("v"))
    require(!base.filter(col("g") === baseline).isEmpty,
      s"baseline group '$baseline' has no rows in $grpCol")
    val bounds = base.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val others = base.filter(col("g") =!= baseline)
    val pairsDim = others.select(col("g").as("pair")).distinct()
    val tagged = others.select(col("g").as("pair"), lit(0L).as("is_base"), col("v"))
      .unionAll(base.filter(col("g") === baseline)
        .crossJoin(broadcast(pairsDim))
        .select(col("pair"), lit(1L).as("is_base"), col("v")))
    // degenerate single-point column (hi == lo): bin width is 0 and the
    // floor() goes NaN -> null -> every count silently lands in a null
    // bin outside the dense spine. All mass sits at one value, so bin 0
    // is the exact answer (W1/JSD correctly read 0 for identical groups).
    val binned = tagged.crossJoin(broadcast(bounds))
      .select(col("pair"), col("is_base"),
        when(col("hi") <= col("lo"), lit(0L))
          .otherwise(least(lit(bins - 1L), floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / bins)).cast("long"))).as("bin"))
      .groupBy(col("pair"), col("bin"))
      .agg(sum(when(col("is_base") === 1L, 1L).otherwise(0L)).as("nb"),
        sum(when(col("is_base") === 0L, 1L).otherwise(0L)).as("nx"))
    // dense spine: a gap bin still carries CDF mass for W1, so absent
    // (pair, bin) rows must exist with zero counts
    val spine = pairsDim.select(col("pair"), explode(sequence(lit(0L), lit(bins - 1L))).as("bin"))
    val dense = spine.join(binned, Seq("pair", "bin"), "left")
      .select(col("pair"), col("bin"),
        coalesce(col("nb"), lit(0L)).as("nb"), coalesce(col("nx"), lit(0L)).as("nx"))
    val tot = dense.groupBy(col("pair")).agg(sum(col("nb")).as("tb"), sum(col("nx")).as("tx"))
    dense.join(tot, "pair")
      .crossJoin(broadcast(bounds))
      .withColumn("width", (col("hi") - col("lo")) / bins)
      .drop("lo", "hi")
  }

  /** 1-D Wasserstein-1 (earth mover's) distance of `valCol`'s
    * distribution for every group vs the `baseline` group, on a shared
    * `bins`-cell fixed-width grid: (grp, n_base, n_grp, w1).
    *
    * W1 = width * sum_b |CDF_base(b) - CDF_grp(b)|. The sum is computed
    * as the EXACT integer sum(|cb*tx - cx*tb|) over the dense spine —
    * cumulative counts times totals stay < 2^53 at any gate SF — so the
    * only float ops are one multiply and one divide at the end, the same
    * expression in every engine (a defensive 1e-6 round on top). Unlike
    * KS (sup-norm), W1 sees HOW FAR mass moved, not just the largest ECDF
    * gap — the right alarm for a length/quality distribution that shifts
    * gradually under a new crawl source.
    *
    * Scale: one count pass over the data; everything after runs on
    * |groups| x bins rows.
    */
  def wasserstein1(df: DataFrame, grpCol: String, valCol: String,
      baseline: String, bins: Int = 20): DataFrame = {
    val dense = pairedBinCounts(df, grpCol, valCol, baseline, bins)
    val w = Window.partitionBy(col("pair")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("cb", sum(col("nb")).over(w))
      .withColumn("cx", sum(col("nx")).over(w))
      .groupBy(col("pair"))
      .agg(max(col("tb")).as("n_base"), max(col("tx")).as("n_grp"),
        (floor(sum(abs(col("cb") * col("tx") - col("cx") * col("tb"))) * first(col("width")) /
          (max(col("tb")) * max(col("tx"))) * 1e6 + 0.5) / 1e6).as("w1"))
      .withColumnRenamed("pair", "grp")
  }

  /** Jensen–Shannon divergence (base 2, in [0, 1]) of `valCol`'s
    * distribution for every group vs the `baseline` group on the shared
    * grid: (grp, n_base, n_grp, jsd).
    *
    * JSD = 0.5*KL(P||M) + 0.5*KL(Q||M), M = (P+Q)/2 — symmetric and
    * finite even on disjoint supports (where KL and PSI blow up), so it
    * needs no epsilon smoothing: a zero cell contributes exactly 0 from
    * its side. Determinism follows the q_ts_psi precedent: <= `bins` log
    * terms, final 1e-4 round (ULP-level ln() differences between engines
    * sit ten orders below the grid).
    */
  def jsDivergence(df: DataFrame, grpCol: String, valCol: String,
      baseline: String, bins: Int = 20): DataFrame = {
    val dense = pairedBinCounts(df, grpCol, valCol, baseline, bins)
    val p = col("nb") / col("tb")
    val q = col("nx") / col("tx")
    val m = (p + q) / 2.0
    val term =
      when(col("nb") > 0L, p * log(p / m)).otherwise(lit(0.0)) * 0.5 +
      when(col("nx") > 0L, q * log(q / m)).otherwise(lit(0.0)) * 0.5
    dense.groupBy(col("pair"))
      .agg(max(col("tb")).as("n_base"), max(col("tx")).as("n_grp"),
        (floor(sum(term) / math.log(2.0) * 1e4 + 0.5) / 1e4).as("jsd"))
      .withColumnRenamed("pair", "grp")
  }
}
