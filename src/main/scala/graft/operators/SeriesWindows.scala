package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-series window primitives.
  *
  * A plain `Window.partitionBy(series_id).orderBy(time)` moves EVERY point
  * of a series into one task — and a single-series query (the common
  * sydraQL shape) makes that the whole scan. Each primitive here instead
  * runs the window inside (series_id, day) partitions and repairs the
  * cross-day boundary from a per-(series, day) aggregate — one row per
  * non-empty series-day, metadata-sized — broadcast-joined back. No
  * exchange carries more than one series-day of points to a single task.
  * (If the series×day frame ever outgrows broadcast size, drop the
  * `broadcast` hint and let AQE pick a shuffle join — semantics hold.)
  *
  * Tie behavior matches the single-window originals: ordering is by `time`
  * alone, so rows at equal timestamps resolve in partition order exactly
  * as Spark's window would (gate sources are tie-free where determinism
  * matters).
  */
object SeriesWindows {

  private val DayW = 86400L

  /** Exact floor division (not truncation): monotone day key with uniform
    * [d·W, (d+1)·W) intervals, needed for modular boundary arithmetic.
    * `t - pmod(t, w)` floors to the bucket start exactly; the quotient then
    * uses SQL `div` — true INTEGRAL division on two LONGs, exact for every
    * representable timestamp. (Column `/` is DOUBLE division: at ns-epoch
    * magnitudes ~1.7e18 the numerator alone loses bits as a double — r4
    * advice #2.) Shared with the compiler's ungrouped integral/irate
    * pre-pass.
    */
  private[graft] def dayKey(t: Column, w: Long): Column =
    call_function("div", t - pmod(t, lit(w)), lit(w))

  /** `lag(value, n)` over the whole series in time order. Within-day lag,
    * plus the previous non-empty days' last-n tail for each day's first n
    * rows. n is a small literal (grammar: `lag(v[, n])`).
    */
  def lagN(df: DataFrame, out: String, value: Column, n: Int,
      keys: Seq[String] = Seq("series_id"), timeCol: String = "time",
      bucket: Long = DayW): DataFrame = {
    val t = col(timeCol).cast("long")
    val d = s"${out}_d"
    val vc = s"${out}_v"
    val pt = s"${out}_pt"
    val base = df.withColumn(d, dayKey(t, bucket)).withColumn(vc, value)
    val v = col(vc)
    val kc = keys.map(col)
    val wDay = Window.partitionBy(kc :+ col(d): _*).orderBy(t)
    // slice with a negative start returns EMPTY when the array is shorter
    // than n — a day with < n points must keep its whole tail
    def lastN(arr: Column): Column =
      when(size(arr) > n, slice(arr, -n, n)).otherwise(arr)
    val tails = base.groupBy(kc :+ col(d): _*)
      .agg(lastN(sort_array(collect_list(struct(t.as("t"), v.as("v"))))).as(s"${out}_tl"))
    val prev = tails
      .withColumn(pt, lastN(flatten(collect_list(col(s"${out}_tl")).over(
        Window.partitionBy(kc: _*).orderBy(col(d))
          .rowsBetween(Window.unboundedPreceding, -1)))))
      .select((kc :+ col(d) :+ col(pt)): _*)
    val rn = row_number().over(wDay)
    val idx = size(col(pt)) - n + rn // history element for the day's r-th row
    base.join(broadcast(prev), keys :+ d, "left")
      .withColumn(out,
        when(rn > n, lag(v, n).over(wDay))
          .otherwise(when(idx >= 1, element_at(col(pt), idx).getField("v"))))
      .drop(d, vc, pt)
  }

  /** `lead(value, n)`: within-day lead, plus the following non-empty days'
    * first-n head for each day's last n rows.
    */
  def leadN(df: DataFrame, out: String, value: Column, n: Int,
      keys: Seq[String] = Seq("series_id"), timeCol: String = "time",
      bucket: Long = DayW): DataFrame = {
    val t = col(timeCol).cast("long")
    val d = s"${out}_d"
    val vc = s"${out}_v"
    val nh = s"${out}_nh"
    val base = df.withColumn(d, dayKey(t, bucket)).withColumn(vc, value)
    val v = col(vc)
    val kc = keys.map(col)
    val wDay = Window.partitionBy(kc :+ col(d): _*).orderBy(t)
    val heads = base.groupBy(kc :+ col(d): _*)
      .agg(slice(sort_array(collect_list(struct(t.as("t"), v.as("v")))), 1, n).as(s"${out}_hd"))
    val next = heads
      .withColumn(nh, slice(flatten(collect_list(col(s"${out}_hd")).over(
        Window.partitionBy(kc: _*).orderBy(col(d))
          .rowsBetween(1, Window.unboundedFollowing))), 1, n))
      .select((kc :+ col(d) :+ col(nh)): _*)
    val rn = row_number().over(wDay)
    val cnt = count(lit(1)).over(Window.partitionBy(kc :+ col(d): _*))
    val rnEnd = cnt - rn + 1 // rank from the day's end, same asc ordering
    val idx = (lit(n) - rnEnd + 1).cast("int") // count() is BIGINT; element_at wants INT
    base.join(broadcast(next), keys :+ d, "left")
      .withColumn(out,
        when(rnEnd > n, lead(v, n).over(wDay))
          .otherwise(when(idx <= size(col(nh)), element_at(col(nh), idx).getField("v"))))
      .drop(d, vc, nh)
  }

  /** `fill_forward(value)`: last non-null so far in time order. Within-day
    * running last, carried across days by a per-day last-non-null frame.
    */
  def fillForward(df: DataFrame, out: String, value: Column,
      keys: Seq[String] = Seq("series_id"), timeCol: String = "time",
      bucket: Long = DayW): DataFrame = {
    val t = col(timeCol).cast("long")
    val d = s"${out}_d"
    val vc = s"${out}_v"
    val pf = s"${out}_pf"
    val base = df.withColumn(d, dayKey(t, bucket)).withColumn(vc, value)
    val v = col(vc)
    val kc = keys.map(col)
    val local = last(v, ignoreNulls = true).over(
      Window.partitionBy(kc :+ col(d): _*).orderBy(t)
        .rowsBetween(Window.unboundedPreceding, 0))
    val perDay = base.groupBy(kc :+ col(d): _*)
      .agg(max_by(v, when(v.isNotNull, struct(t.as("t"), v.as("v")))).as(s"${out}_lv"))
    val carry = perDay
      .withColumn(pf, last(col(s"${out}_lv"), ignoreNulls = true).over(
        Window.partitionBy(kc: _*).orderBy(col(d))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select((kc :+ col(d) :+ col(pf)): _*)
    base.join(broadcast(carry), keys :+ d, "left")
      .withColumn(out, coalesce(local, col(pf)))
      .drop(d, vc, pf)
  }

  /** Shared RANGE-frame [-dur, 0] scaffolding: rows within `dur` of a
    * day's end are duplicated as ghosts into the next day so every real
    * row's frame is complete inside its own partition; ghosts are dropped
    * after the window. Bucket width grows to `dur` when dur > 1 day,
    * keeping the one-partition overlap invariant. THE single home of the
    * ghost/boundary invariant — every RANGE-frame operator must build on
    * it or silently diverge from the correction logic.
    */
  private def rangeFramed(df: DataFrame, out: String, value: Column, dur: Long,
      keys: Seq[String], timeCol: String, minBucket: Long,
      shifted: Boolean = false)(
      agg: (Column, org.apache.spark.sql.expressions.WindowSpec) => Column): DataFrame = {
    val t = col(timeCol).cast("long")
    val w = math.max(minBucket, dur)
    val d = s"${out}_d"
    val vc = s"${out}_v"
    val g = s"${out}_g"
    val base = df.withColumn(d, dayKey(t, w)).withColumn(vc, value)
      .withColumn(g, lit(false))
    val ghosts = base.filter(pmod(t, lit(w)) >= w - dur)
      .withColumn(d, col(d) + 1).withColumn(g, lit(true))
    val win = Window.partitionBy(keys.map(col) :+ col(d): _*).orderBy(t)
      .rangeBetween(-dur, 0)
    val u = base.unionByName(ghosts)
    // shifted: re-center the value by its (keys, day)-partition min (an
    // order-independent constant within every frame of the partition, so
    // a replaying engine folds the same numbers) before the frame agg —
    // what shift-invariant moments (z-score) need to dodge catastrophic
    // cancellation at |μ| ≫ σ. Same sort as `win`, one extra pass.
    val u2 =
      if (shifted)
        u.withColumn(vc,
          col(vc) - min(col(vc)).over(Window.partitionBy(keys.map(col) :+ col(d): _*)))
      else u
    u2.withColumn(out, agg(col(vc), win))
      .filter(!col(g))
      .drop(d, vc, g)
  }

  /** `moving_avg(value, dur)`: RANGE frame [-dur, 0] on time. */
  def movingAvg(df: DataFrame, out: String, value: Column, dur: Long,
      keys: Seq[String] = Seq("series_id"), timeCol: String = "time",
      minBucket: Long = DayW): DataFrame =
    rangeFramed(df, out, value, dur, keys, timeCol, minBucket)((v, win) =>
      avg(v).over(win))

  /** Rolling z-score over the RANGE frame [-dur, 0] on time — the
    * windowed anomaly signal (|z| above a threshold flags outliers
    * against the trailing window). Same ghost-row day-partition scheme
    * as [[movingAvg]]. The moments are EXPLICIT sequential sums
    * (Σx, Σx², n) with σ² = Σx²/n − μ² — not stddev_pop — so a replaying
    * engine can fold the identical arithmetic (Spark's Welford state and
    * DuckDB's segment-tree aggregation would each drift differently).
    * NULL when the frame's σ is 0 (constant window).
    *
    * Values are RE-CENTERED by the (keys, day)-partition min before the
    * moments (z is shift-invariant, so the result is mathematically
    * unchanged): on counter-like series (values ~1e8, window σ ~1) the
    * raw Σx²/n − μ² subtraction loses every significant bit and clamps
    * to σ = 0, silently swallowing real anomalies. After the shift the
    * magnitudes are the partition's own value spread. Remaining limit
    * (document-grade, not fixable by a constant shift): a single day
    * partition whose internal spread is ≳1e8× the window σ still
    * cancels.
    */
  def movingZScore(df: DataFrame, out: String, value: Column, dur: Long,
      keys: Seq[String] = Seq("series_id"), timeCol: String = "time",
      minBucket: Long = DayW): DataFrame =
    rangeFramed(df, out, value.cast("double"), dur, keys, timeCol, minBucket,
        shifted = true) { (v, win) =>
      val s1 = sum(v).over(win)
      val s2 = sum(v * v).over(win)
      val n = count(v).over(win)
      val mu = s1 / n
      val sig = sqrt(greatest((s2 / n) - (mu * mu), lit(0.0)))
      when(sig > 0, (v - mu) / sig)
    }

  /** Exact rolling quantile over the trailing `k` bucket slots of an
    * ALREADY BUCKETED frame (one row per (keys, bucket) — the rollup
    * aggregate upstream, the same post-rollup stance as [[graft.operators.Alerts]]):
    * for every present bucket, the interpolated `q`-quantile of the
    * values at buckets `{b, b−step, …, b−(k−1)·step}` that exist —
    * rolling median (q = 0.5) is the robust trend line dashboards and
    * data-quality monitors want where a moving AVERAGE chases outliers.
    *
    * An exact quantile has no distributive window form (Spark has no
    * `percentile(...) OVER`; a `collect_list` window would buffer whole
    * partitions), so this is a bounded SELF-JOIN instead: each target
    * bucket explodes to its k lookup slots, an equi-join on
    * (keys, slot) pulls the ≤ k contributing rows — the right side is
    * unique per (keys, bucket), so no blowup — and one hash aggregate
    * folds the exact quantile per target. Work is k× the post-rollup row
    * count with bounded group size k, shuffled on the same (keys, bucket)
    * family as the rollup itself; no window, no per-key state, k is a
    * small query literal. Partial leading windows use the buckets that
    * exist, exactly like a RANGE frame.
    */
  def rollingQuantile(df: DataFrame, out: String, keys: Seq[String],
      bucketCol: String, valueCol: String, step: Long, k: Int,
      q: Double): DataFrame = {
    require(step > 0 && k >= 1, "rolling quantile needs a positive window")
    require(q >= 0.0 && q <= 1.0, "quantile must be in [0, 1]")
    val kc = keys.map(col)
    val b = col(bucketCol)
    val lookups = df.select(kc :+ b.cast("long").as("__tb"): _*)
      .withColumn("__lb",
        explode(sequence(col("__tb") - (k - 1) * step, col("__tb"), lit(step))))
    val src = df.select(
      kc ++ Seq(b.cast("long").as("__lb"), col(valueCol).as("__v")): _*)
    lookups.join(src, keys :+ "__lb")
      .groupBy(kc :+ col("__tb").as(bucketCol): _*)
      .agg(percentile(col("__v"), lit(q)).as(out),
        count(lit(1)).as(s"${out}_n"))
  }

  /** Final `ema(alpha)` value per key combination (one row per key; ONE
    * row total when `keys` is empty), over each key's points in
    * (time, value) order.
    *
    * A per-group fold buffers the group's entire point array — unbounded
    * for an ungrouped query or a non-time group key (a tag group holds its
    * whole history). This path instead exploits that the recurrence
    * y_i = α·x_i + (1-α)·y_{i-1} is an affine map per point and affine
    * maps compose associatively:
    *   phase 1 — each (keys, day) partition folds its own sorted points
    *     into (a, b) with y_dayEnd = a·y_dayStart + b: two doubles of
    *     state per task, points never leave their day;
    *   phase 2 — the per-day pairs (one row per non-empty key-day,
    *     metadata-sized) compose in day order per key; the first day
    *     contributes its all-but-first fold seeded by its first value
    *     (y_1 = x_1 exactly, same seed as a sequential fold).
    * NULL values are skipped, matching the sequential fold's semantics.
    * `keys` must name existing columns of `df`.
    */
  def emaByKey(df: DataFrame, out: String, value: Column, alpha: Double,
      keys: Seq[String], timeCol: String = "time", bucket: Long = DayW): DataFrame = {
    val t = col(timeCol).cast("long")
    val al = lit(alpha)
    val na = lit(1.0 - alpha)
    val d = s"${out}_d"
    val kc = keys.map(col)
    val pts = sort_array(collect_list(when(value.isNotNull,
      struct(t.as("t"), value.cast("double").as("v")))))
    def fold(arr: Column): Column = aggregate(arr,
      struct(lit(1.0).as("a"), lit(0.0).as("b")),
      (acc, x) => struct(
        (na * acc.getField("a")).as("a"),
        (al * x.getField("v") + na * acc.getField("b")).as("b")))
    def restOf(arr: Column): Column =
      slice(arr, lit(2), greatest(size(arr) - 1, lit(0)))
    val perDay = df
      .groupBy(kc :+ dayKey(t, bucket).as(d): _*)
      .agg(pts.as("__pts"))
      .filter(size(col("__pts")) >= 1) // a day of all-NULL values contributes nothing
      .select(kc ++ Seq(
        col(d),
        element_at(col("__pts"), 1).getField("v").as("fv"),
        fold(col("__pts")).as("all"),
        fold(restOf(col("__pts"))).as("rst")): _*)
    val ds = sort_array(collect_list(struct(col(d).as("d"),
      col("fv"), col("all"), col("rst"))))
    perDay.groupBy(kc: _*).agg(ds.as("__ds")).select(kc :+
      when(size(col("__ds")) >= 1,
        aggregate(
          restOf(col("__ds")),
          struct(
            element_at(col("__ds"), 1).getField("fv").as("fv"),
            element_at(col("__ds"), 1).getField("rst").getField("a").as("a"),
            element_at(col("__ds"), 1).getField("rst").getField("b").as("b")),
          (acc, x) => struct(
            acc.getField("fv").as("fv"),
            (x.getField("all").getField("a") * acc.getField("a")).as("a"),
            (x.getField("all").getField("a") * acc.getField("b")
              + x.getField("all").getField("b")).as("b")),
          acc => acc.getField("a") * acc.getField("fv") + acc.getField("b")))
        .as(out): _*)
  }

  /** [[emaByKey]] with no keys: one row for the whole frame. */
  def emaGlobal(df: DataFrame, out: String, value: Column, alpha: Double,
      timeCol: String = "time", bucket: Long = DayW): DataFrame =
    emaByKey(df, out, value, alpha, Nil, timeCol, bucket)

  /** Final Holt linear (double-exponential) smoothing state per key:
    * `(keys…, level, trend, forecast)` after folding each key's points in
    * (time, value) order — level + trend extraction with a one-step
    * forecast `level + trend`. Classic recurrence
    *   l_i = α·x_i + (1−α)(l_{i−1} + b_{i−1})
    *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}
    * seeded l₁ = x₁, b₁ = x₂ − x₁; NULLs skipped; NULL outputs with
    * fewer than 2 points.
    *
    * [[emaByKey]]'s scale architecture lifted from scalars to the 2×2
    * affine group: per point the state v = (l, b) maps to M·v + x·d with
    * CONSTANT M = [[1−α, 1−α], [−αβ, 1−αβ]], d = (α, αβ), and affine
    * maps compose associatively — each (keys, day) partition folds its
    * own sorted points into one (A, c) pair (SIX doubles of state per
    * task), the per-day pairs compose in day order (one row per
    * non-empty key-day, metadata-sized), and the two-point seed applies
    * at the end. The seed pair may straddle a day boundary (a one-point
    * first day), so the day-composition is a three-state machine: empty →
    * holding x₁ → seeded. Points never leave their day; no per-group
    * point buffer at any scale.
    */
  def holtByKey(df: DataFrame, value: Column, alpha: Double, beta: Double,
      keys: Seq[String], timeCol: String = "time", bucket: Long = DayW): DataFrame = {
    val t = col(timeCol).cast("long")
    val (m11, m12) = (lit(1.0 - alpha), lit(1.0 - alpha))
    val (m21, m22) = (lit(-(alpha * beta)), lit(1.0 - alpha * beta))
    val (d1, d2) = (lit(alpha), lit(alpha * beta))
    val d = "__hd"
    val kc = keys.map(col)
    val pts = sort_array(collect_list(when(value.isNotNull,
      struct(t.as("t"), value.cast("double").as("v")))))
    val identity = struct(lit(1.0).as("a11"), lit(0.0).as("a12"),
      lit(0.0).as("a21"), lit(1.0).as("a22"), lit(0.0).as("c1"), lit(0.0).as("c2"))
    // left-composition of the constant per-point map onto the running
    // (A, c): A ← M·A, c ← M·c + x·d — every product in a fixed order
    def fold(arr: Column): Column = aggregate(arr, identity,
      (acc, x) => struct(
        (m11 * acc.getField("a11") + m12 * acc.getField("a21")).as("a11"),
        (m11 * acc.getField("a12") + m12 * acc.getField("a22")).as("a12"),
        (m21 * acc.getField("a11") + m22 * acc.getField("a21")).as("a21"),
        (m21 * acc.getField("a12") + m22 * acc.getField("a22")).as("a22"),
        (m11 * acc.getField("c1") + m12 * acc.getField("c2") + d1 * x.getField("v")).as("c1"),
        (m21 * acc.getField("c1") + m22 * acc.getField("c2") + d2 * x.getField("v")).as("c2")))
    def restOf(arr: Column): Column =
      slice(arr, lit(2), greatest(size(arr) - 1, lit(0)))
    def appL(m: Column, l: Column, b: Column): Column =
      m.getField("a11") * l + m.getField("a12") * b + m.getField("c1")
    def appB(m: Column, l: Column, b: Column): Column =
      m.getField("a21") * l + m.getField("a22") * b + m.getField("c2")
    val perDay = df
      .groupBy(kc :+ dayKey(t, bucket).as(d): _*)
      .agg(pts.as("__pts"))
      .filter(size(col("__pts")) >= 1)
      .select(kc ++ Seq(
        col(d),
        size(col("__pts")).as("n"),
        element_at(col("__pts"), 1).getField("v").as("fv"),
        when(size(col("__pts")) >= 2,
          element_at(col("__pts"), 2).getField("v")).as("sv"),
        fold(col("__pts")).as("all"),
        fold(restOf(col("__pts"))).as("rst")): _*)
    val ds = sort_array(collect_list(struct(col(d).as("d"),
      col("n"), col("fv"), col("sv"), col("all"), col("rst"))))
    def state(mode: Column, x1: Column, l: Column, b: Column) =
      struct(mode.as("mode"), x1.as("x1"), l.as("l"), b.as("b"))
    perDay.groupBy(kc: _*).agg(ds.as("__ds")).select(kc ++ {
      val acc = aggregate(col("__ds"),
        state(lit(0), lit(0.0), lit(0.0), lit(0.0)),
        (acc, y) => {
          val l0 = y.getField("fv")
          val b0 = y.getField("sv") - y.getField("fv")
          val l1 = acc.getField("x1")
          val b1 = y.getField("fv") - acc.getField("x1")
          when(acc.getField("mode") === 0 && y.getField("n") === 1,
            state(lit(1), y.getField("fv"), lit(0.0), lit(0.0)))
          .when(acc.getField("mode") === 0,
            state(lit(2), lit(0.0),
              appL(y.getField("rst"), l0, b0), appB(y.getField("rst"), l0, b0)))
          .when(acc.getField("mode") === 1,
            state(lit(2), lit(0.0),
              appL(y.getField("all"), l1, b1), appB(y.getField("all"), l1, b1)))
          .otherwise(
            state(lit(2), lit(0.0),
              appL(y.getField("all"), acc.getField("l"), acc.getField("b")),
              appB(y.getField("all"), acc.getField("l"), acc.getField("b"))))
        })
      val fin = when(acc.getField("mode") === 2,
        struct(acc.getField("l").as("l"), acc.getField("b").as("b")))
      Seq(fin.getField("l").as("level"), fin.getField("b").as("trend"),
        (fin.getField("l") + fin.getField("b")).as("forecast"))
    }: _*)
  }

  /** PromQL `*_over_time` family — min/max/sum/count/avg/stddev/first/last
    * over the trailing `dur` seconds — computed in ONE window pass over an
    * ALREADY BUCKETED frame (one row per (keys, bucket); the same
    * post-rollup stance as [[rollingQuantile]] and [[graft.operators.Alerts]]:
    * a series' post-rollup bucket count is dashboard-sized, so partitioning
    * by the keys alone is bounded — the raw-point RANGE operators above keep
    * the day-partitioned ghost layout instead).
    *
    * All eight aggregates share a single RANGE frame [-dur, 0], so Spark
    * evaluates them in one WindowExec over one sort — not eight. `stddev`
    * is sample stddev, NULL (not NaN) for singleton frames on both this and
    * the DuckDB side; `first`/`last` are deterministic because the bucketed
    * input has unique bucket keys per partition.
    */
  def overTime(df: DataFrame, keys: Seq[String], bucketCol: String,
      valueCol: String, dur: Long): DataFrame = {
    require(dur > 0, "over_time needs a positive trailing duration")
    val win = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(bucketCol).cast("long"))
      .rangeBetween(-dur, 0)
    val v = col(valueCol).cast("double")
    val n = count(v).over(win)
    df
      .withColumn("min_ot", min(v).over(win))
      .withColumn("max_ot", max(v).over(win))
      .withColumn("sum_ot", sum(v).over(win))
      .withColumn("n_ot", n)
      .withColumn("avg_ot", avg(v).over(win))
      .withColumn("sd_ot", when(n > 1, stddev_samp(v).over(win)))
      .withColumn("first_ot", first(v).over(win))
      .withColumn("last_ot", last(v).over(win))
  }
}
