package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-bucket linear trend — the Prometheus `deriv` / `predict_linear`
  * analytics pair (simple least-squares over each (keys, bucket) group),
  * a beyond-reference addition on the TS surface like z-score/M4.
  *
  * Scale shape (100 TB): ONE partial+final hash aggregate carrying five
  * running sums (n, Σx, Σy, Σxy, Σx²) per group — O(1) state, no window,
  * no sort; the prediction composes from the same sums in the projection.
  *
  * Numerics: x is the BUCKET-RELATIVE time offset, not the epoch second —
  * at epoch magnitudes (t ~ 1.7e9, t² ~ 3e18) the n·Σx² − (Σx)²
  * denominator loses every significant bit to cancellation (the same
  * failure mode the z-score's partition-min shift dodges). The shift is
  * the group key itself, so any SQL engine replays it exactly. NULL
  * slope/prediction when the denominator is 0 (single point, or all
  * points at one timestamp).
  */
object Trend {

  /** `(keys…, bucket_start, n, slope_hr, pred)` per non-empty bucket:
    * slope_hr = least-squares slope × 3600 (value units per hour — the
    * value-scale number, stable to round), pred = the regression line
    * evaluated at bucket-relative offset `bucket + horizon` (the
    * predict_linear contract: extrapolate `horizon` past bucket end).
    * Null values are skipped. Rounding left to the caller.
    */
  def linearTrend(df: DataFrame, bucket: Long, horizon: Long,
      keys: Seq[String] = Seq("series"), timeCol: String = "time"): DataFrame = {
    val t = col(timeCol).cast("long")
    val withX = df
      .filter(col("value").isNotNull)
      .withColumn("__b", t - pmod(t, lit(bucket)))
      .withColumn("__x", (t - col("__b")).cast("double"))
    val agg = withX.groupBy(keys.map(col) :+ col("__b").as("bucket_start"): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("sx"),
        sum(col("value")).as("sy"),
        sum(col("__x") * col("value")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"))
    val n = col("n").cast("double")
    val den = n * col("sxx") - col("sx") * col("sx")
    val slope = (n * col("sxy") - col("sx") * col("sy")) / den
    val intercept = (col("sy") - slope * col("sx")) / n
    val defined = den > 0
    agg.select(keys.map(col) ++ Seq(
      col("bucket_start"),
      col("n"),
      when(defined, slope * 3600).as("slope_hr"),
      when(defined, intercept + slope * (bucket + horizon).toDouble).as("pred")): _*)
  }

  /** Pearson correlation of two aligned columns per key group — the
    * "do these two metrics move together" cross-series operator (the
    * reference cannot relate two series at all; this composes with any
    * bucketed alignment join upstream).
    *
    * Same scale shape as [[linearTrend]]: ONE partial+final hash
    * aggregate of six running sums, O(1) state, no window. Computed from
    * EXPLICIT moments rather than Spark's `corr` so a replaying engine
    * folds the identical arithmetic (corr's internal co-moment update
    * order is engine-specific; n·Σxy − ΣxΣy from shared sums is not).
    * Callers should pre-round x/y (the aligned averages) so both engines
    * sum identical inputs. NULL when either variance is 0 or n < 2.
    */
  def pearson(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val agg = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    val n = col("n").cast("double")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    val cov = n * col("sxy") - col("sx") * col("sy")
    agg.select(keys.map(col) ++ Seq(
      col("n"),
      when(col("n") >= 2 && vx > 0 && vy > 0, cov / sqrt(vx * vy)).as("corr")): _*)
  }

  /** Cross-correlation function per key group: [[pearson]] of
    * (x at bucket b, y at bucket b + lag·step) for EVERY lag in
    * [−maxLag, maxLag] — the lead/lag detector ("purchases trail clicks
    * by how many buckets?": the argmax lag of the returned curve). Input
    * is the ALIGNED bucketed frame (one row per (keys, bucket) carrying
    * both x and y, nulls where a side is absent — same shape [[pearson]]
    * takes); output one row per (keys…, lag) with (n, corr).
    *
    * Scale shape: the y side explodes to its 2·maxLag+1 shifted copies
    * (a small query literal), one equi-join on (keys, bucket) pulls the
    * pairs — x unique per (keys, bucket), no blowup — and the moment
    * aggregate keyed by (keys, lag) folds O(1) state per lag. No window,
    * no per-key series materialization; the same pre-rounding discipline
    * as [[pearson]] applies to x/y.
    */
  def crossCorrelation(df: DataFrame, keys: Seq[String], bucketCol: String,
      xCol: String, yCol: String, step: Long, maxLag: Int): DataFrame = {
    require(step > 0 && maxLag >= 0, "cross-correlation needs a positive step")
    val kc = keys.map(col)
    val x = df.select(kc ++ Seq(col(bucketCol).cast("long").as("__b"),
        col(xCol).as("__x")): _*)
      .filter(col("__x").isNotNull)
    val y = df.select(kc ++ Seq(col(bucketCol).cast("long").as("__yb"),
        col(yCol).as("__y")): _*)
      .filter(col("__y").isNotNull)
      // LONG lags: DuckDB's generate_series is BIGINT, and an INT column
      // here would schema-mismatch the oracle compare.
      .withColumn("lag", explode(sequence(lit(-maxLag.toLong), lit(maxLag.toLong))))
      .withColumn("__b", col("__yb") - col("lag") * step)
    pearson(
      x.join(y, keys :+ "__b").withColumnRenamed("__x", "x").withColumnRenamed("__y", "y"),
      keys :+ "lag", "x", "y")
  }

  /** CUSUM changepoint scan per key group: the running sum of deviations
    * from the group mean, S_i = Σ_{j≤i} (v_j − μ), peaks in magnitude at
    * the point where the level shifts — the classic offline CUSUM
    * statistic (Page's test applied as a one-shot scan). Returns one row
    * per group: the argmax position, the peak |S| (in value units,
    * rounded to 1e-4), and whether it exceeds `threshold`.
    *
    * Determinism discipline: the statistic is computed in EXACT integer
    * arithmetic — `valueCol` (already quantized at 1/`scale` by the
    * caller) lifts to integer units v·scale, and the mean never appears
    * as a rounded double: n·S_i = n·Σ_{j≤i}v − i·Σv is a pure-integer
    * identity, so the argmax ranks on an exact BIGINT with `orderCol` as
    * the tie-break. (A rounded-μ formulation is NOT replayable: a 1e-4
    * straddle in μ amplifies to i·Δμ in S_i — observed as a 1.2e-3
    * cross-engine drift at i=12.) Only the final report divides back to
    * value units, one identical double op on identical integers.
    *
    * Scale shape (same stance as [[SeriesWindows]]): the running-sum
    * window and the rank partition by the full key set — for the
    * (series, day) gate that is range/step rows per group, never
    * whole-series state; the group totals joining back are one row per
    * group (metadata-sized, AQE broadcasts them).
    */
  def cusum(df: DataFrame, keys: Seq[String], orderCol: String,
      valueCol: String, threshold: Double, scale: Double = 1e4): DataFrame = {
    val kc = keys.map(col)
    val lifted = df.withColumn("__vi",
      floor(col(valueCol) * scale + 0.5).cast("long"))
    val tot = lifted.groupBy(kc: _*)
      .agg(sum(col("__vi")).as("__tot"), count(lit(1)).as("__n"))
    val wSum = Window.partitionBy(kc: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRank = Window.partitionBy(kc: _*)
      .orderBy(col("__ns").desc, col(orderCol))
    lifted.join(tot, keys)
      .withColumn("__i", row_number().over(
        Window.partitionBy(kc: _*).orderBy(col(orderCol))).cast("long"))
      .withColumn("__cum", sum(col("__vi")).over(wSum))
      .withColumn("__ns", abs(col("__n") * col("__cum") - col("__i") * col("__tot")))
      .withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") === 1)
      .select(kc ++ Seq(
        col(orderCol).as("cp_" + orderCol),
        (floor(col("__ns").cast("double") / (col("__n").cast("double") * scale) * 1e4
          + 0.5) / 1e4).as("cusum_max"),
        (col("__ns").cast("double") >
          lit(threshold) * col("__n").cast("double") * scale).cast("int")
          .as("flagged")): _*)
  }

  /** Seasonal-naive decomposition: each bucket's value splits into the
    * key's seasonal profile — the mean of all buckets sharing its slot
    * `(bucket mod period) / step` (e.g. hour-of-day over a week) — plus a
    * residual, the de-seasonalized series anomaly detectors should score
    * instead of the raw value. One hash aggregate for the profile
    * (period/step slots per key — metadata-sized, AQE broadcasts the
    * join-back), no window, no per-key state.
    *
    * `viCol` is the value in integer 1/`scale` units (the lifted rounded
    * rollup): the profile mean is then an exact-integer sum divided once
    * at the end, so value, seasonal, and residual are bit-identical on
    * any replaying engine (same discipline as [[cusum]]).
    *
    * Output: (keys…, bucketCol, value, seasonal, resid), the latter three
    * in value units rounded to 1e-4.
    */
  def seasonalNaive(df: DataFrame, keys: Seq[String], bucketCol: String,
      viCol: String, period: Long, step: Long,
      scale: Double = 1e4): DataFrame = {
    require(period > 0 && step > 0 && period % step == 0,
      "period must be a positive multiple of step")
    val kc = keys.map(col)
    val slot = (pmod(col(bucketCol), lit(period)) / lit(step)).cast("long")
    val slotted = df.withColumn("__slot", slot)
    val prof = slotted.groupBy(kc :+ col("__slot"): _*)
      .agg(sum(col(viCol)).as("__ps"), count(lit(1)).as("__pn"))
    val seasonalRaw = col("__ps").cast("double") /
      (col("__pn").cast("double") * scale)
    val v = col(viCol).cast("double") / scale
    def r4(c: Column) = floor(c * 1e4 + 0.5) / 1e4
    slotted.join(prof, keys :+ "__slot")
      .select(kc ++ Seq(
        col(bucketCol),
        v.as("value"),
        r4(seasonalRaw).as("seasonal"),
        r4(v - seasonalRaw).as("resid")): _*)
  }

  /** Holt–Winters additive triple-exponential smoothing per key over the
    * `step`-bucket rollup: final (level, trend, one-step forecast =
    * l + b + s_next) after the classic recursion
    *   l_i = α(x_i − s_{i−m}) + (1−α)(l_{i−1} + b_{i−1})
    *   b_i = β(l_i − l_{i−1}) + (1−β)b_{i−1}
    *   s_i = γ(x_i − l_i) + (1−γ)s_{i−m}
    * seeded the standard way from the first two seasons (l₀ = season-1
    * mean, b₀ = (season-2 mean − season-1 mean)/m, s = season-1
    * deviations). Completes the smoothing ladder: [[graft.operators.SeriesWindows]]
    * ema (level) → holt (level+trend) → this (level+trend+seasonality).
    *
    * Scale + determinism (the Theil-Sen stance): the recursion runs over
    * the (keys, bucket) ROLLUP — per-key state is the bucket list
    * (span/step rows, e.g. 168 for a week of hours), never raw points,
    * and the bucket means are pre-rounded 1e-6 before folding so the
    * only engine-order-sensitive sums are pinned. The fold itself is a
    * single `aggregate` HOF over the sorted bucket array with an
    * (m+2)-double state [l, b, s₁..s_m] rotating per step — identical
    * left-to-right IEEE arithmetic on any replaying engine (list_reduce
    * replays it; 0.0-seeded and first-element-seeded folds agree because
    * 0.0 + x ≡ x). Seasonal index = ordinal position mod m over PRESENT
    * buckets in time order; run [[graft.operators.Fill]] first when
    * strict calendar alignment through gaps is required. Keys with fewer
    * than 2m buckets are dropped (seed undefined).
    */
  def holtWinters(df: DataFrame, keys: Seq[String], period: Int,
      step: Long, timeCol: String = "time", valueCol: String = "value",
      alpha: Double = 0.5, beta: Double = 0.25, gamma: Double = 0.25): DataFrame = {
    require(period >= 2, "seasonal period must be >= 2")
    require(step > 0, "step must be positive")
    val m = period
    val kc = keys.map(col)
    val t = col(timeCol).cast("long")
    val roll = df.filter(col(valueCol).isNotNull)
      .groupBy(kc :+ (t - pmod(t, lit(step))).as("__b"): _*)
      .agg((floor(avg(col(valueCol)) * 1e6 + 0.5) / 1e6).as("__x"))
    val xs = transform(
      array_sort(collect_list(struct(col("__b"), col("__x")))),
      s => s.getField("__x"))
    def mean(a: Column): Column =
      aggregate(a, lit(0.0), (acc, x) => acc + x) / m
    val grouped = roll.groupBy(kc: _*).agg(xs.as("__xs"))
      .filter(size(col("__xs")) >= 2 * m)
    val m1 = mean(slice(col("__xs"), 1, m))
    val m2 = mean(slice(col("__xs"), m + 1, m))
    val seed = concat(array(m1, (m2 - m1) / m),
      transform(slice(col("__xs"), 1, m), x => x - m1))
    val st = aggregate(
      slice(col("__xs"), lit(m + 1), size(col("__xs")) - m), seed,
      (acc, x) => {
        val l = element_at(acc, 1)
        val b = element_at(acc, 2)
        val sh = element_at(acc, 3)
        val l2 = lit(alpha) * (x - sh) + lit(1 - alpha) * (l + b)
        val b2 = lit(beta) * (l2 - l) + lit(1 - beta) * b
        val s2 = lit(gamma) * (x - l2) + lit(1 - gamma) * sh
        concat(array(l2, b2), slice(acc, 4, m - 1), array(s2))
      })
    grouped.withColumn("__st", st)
      .select(kc ++ Seq(
        size(col("__xs")).cast("long").as("n_buckets"),
        element_at(col("__st"), 1).as("level"),
        element_at(col("__st"), 2).as("trend"),
        (element_at(col("__st"), 1) + element_at(col("__st"), 2) +
          element_at(col("__st"), 3)).as("forecast")): _*)
  }

  /** Classical additive seasonal decomposition per key group:
    * value = trend + seasonal + remainder over a `step`-spaced bucket
    * frame with known `period` — the "is this a daily cycle or a real
    * shift?" separator (STL's non-iterated ancestor; Holt-Winters above
    * is its forecasting sibling).
    *
    *  - trend: centered moving average over ROWS (the standard 2×m MA
    *    when `period` is even — half-weight endpoints; plain m-MA when
    *    odd). Emitted only where the full window exists (interior rows).
    *    Row-based frames mean identical output on any engine even
    *    through bucket gaps; run [[graft.operators.Fill]] first when
    *    strict calendar alignment through gaps is required (the
    *    holtWinters stance).
    *  - seasonal: per-phase mean of the detrended series, centered to
    *    sum to zero across observed phases.
    *  - remainder: what's left — the anomaly channel.
    *
    * Determinism discipline: `valCol` lifts to integer 1e-4 units, so
    * the windowed trend sum and the per-phase detrended sums are EXACT
    * integer arithmetic at any parallelism (2m·1e4·(v−trend) is a pure
    * integer identity); each becomes a double through one division by a
    * constant. The only float fold is the m-term phase-mean, pinned to
    * phase order (Scala/Spark left fold ≡ DuckDB list_reduce over
    * list(s ORDER BY phase)). Outputs rounded 1e-4.
    *
    * Scale shape: two row windows + lag/lead on the bucket frame
    * (buckets ≪ points), one (keys, phase) aggregate (m rows per key), a
    * broadcast-sized join back. No pass ever touches raw points — the
    * caller's bucketing aggregate is the only data-sized work.
    */
  def decompose(df: DataFrame, keys: Seq[String], bucketCol: String,
      valCol: String, step: Long, period: Int): DataFrame = {
    require(period >= 2, "seasonal period must be >= 2")
    require(step > 0, "step must be positive")
    val kc = keys.map(col)
    val h = period / 2
    val even = period % 2 == 0
    val span = if (even) period + 1 else period
    val ow = Window.partitionBy(kc: _*).orderBy(col("__b"))
    val w = ow.rowsBetween(-h, h)
    val base = df.select(kc ++ Seq(col(bucketCol).cast("long").as("__b"),
      floor(col(valCol) * 1e4 + 0.5).cast("long").as("__v4")): _*)
    // __t2 = 2m·1e4·trend, exact integer
    val t2 =
      if (even) sum(col("__v4")).over(w) * 2 - lag(col("__v4"), h).over(ow) -
        lead(col("__v4"), h).over(ow)
      else sum(col("__v4")).over(w) * 2
    val det = base
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__t2", t2)
      .filter(col("__cnt") === span && col("__t2").isNotNull)
      .withColumn("__phase", pmod((col("__b") / step).cast("long"), lit(period.toLong)))
      .withColumn("__d", lit(2L * period) * col("__v4") - col("__t2"))
    val denom = 2L * period * 10000L
    val sp = det.groupBy(kc :+ col("__phase"): _*)
      .agg(sum(col("__d")).as("__T"), count(lit(1)).as("__C"))
      .withColumn("__s", col("__T") / (col("__C") * lit(denom)))
    val meanS = sp.groupBy(kc: _*)
      .agg((aggregate(array_sort(collect_list(struct(col("__phase"), col("__s")))),
        lit(0.0), (acc, x) => acc + x.getField("__s")) / count(lit(1))).as("__smean"))
    val r4 = (c: Column) => floor(c * 1e4 + 0.5) / 1e4
    det.join(sp.join(meanS, keys).select(kc ++ Seq(col("__phase"),
        (col("__s") - col("__smean")).as("__c")): _*), keys :+ "__phase")
      .select(kc ++ Seq(col("__b").as(bucketCol),
        (col("__v4") / lit(10000L)).as(valCol),
        r4(col("__t2") / lit(denom)).as("trend"),
        r4(col("__c")).as("seasonal"),
        r4(col("__v4") / lit(10000L) - col("__t2") / lit(denom) - col("__c"))
          .as("remainder")): _*)
  }
}
