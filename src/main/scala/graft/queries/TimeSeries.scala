package graft.queries

import graft.core.{Functions => F, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operator surface over the `events` table mapped to the
  * reference's series model (SURVEY.md §1.1, §2): range scans with time
  * bounds, time_bucket grouping, tag grouping, first/last, percentile,
  * regex selectors, last-wins dedup (compaction semantics), lag/lead and
  * moving windows.
  *
  * Oracle mirror: the series view is re-declared in each oracle as a WITH
  * clause over the same parquet (`epoch_ns(ts) // 1000000000` == Spark's
  * integer `ts / 1e9` on LONG nanos).
  *
  * Scale notes: scans filter on `time` (parquet row-group pruning; on the
  * storage layer's hour-partitioned table this is partition pruning);
  * window functions partition by series — the natural shuffle key;
  * aggregations are partial+final.
  */
object TimeSeries {

  // Canonical query window: [2024-01-03, 2024-01-10) UTC.
  val T0 = 1704067200L + 2 * 86400
  val T1 = 1704067200L + 9 * 86400

  /** Deterministic per-user event cap for CEP pattern matching
    * (q_ev_pattern): first N events by (time, event_id). Part of the
    * gated semantics — the oracle replays the same cap.
    */
  val PatternCap = 1000

  /** events + epoch-second `time` + series columns (ns ts kept for
    * deterministic intra-second ordering).
    */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      col("event_type").as("series"),
      (col("user_id") % 8).cast("string").as("tag_user"),
      col("ts").as("ts_ns"),
      (col("ts") / lit(1000000000L)).cast("long").as("time"),
      col("value"))

  /** Exact per-series quantile windows + exact p50 for the sketch
    * error-bound gates (q_ts_percentile_approx / q_ts_tdigest) — ONE
    * array-fraction percentile aggregate: per-fraction aggregates each
    * buffer their own copy of the group's values (the q_dq_histogram
    * lesson; this frame previously held 7 copies).
    */
  private def sketchBounds(sv: DataFrame): DataFrame =
    sv.groupBy(col("series"))
      .agg(percentile(col("value"), array(lit(0.45), lit(0.55), lit(0.90),
          lit(1.0), lit(0.94), lit(0.5))).as("__q"),
        count(lit(1)).as("n"))
      .select(col("series"),
        element_at(col("__q"), 1).as("lo50"), element_at(col("__q"), 2).as("hi50"),
        element_at(col("__q"), 3).as("lo95"), element_at(col("__q"), 4).as("hi95"),
        element_at(col("__q"), 5).as("lo99"), element_at(col("__q"), 4).as("hi99"),
        (floor(element_at(col("__q"), 6) * 1e4 + 0.5) / 1e4).as("p50_exact"),
        col("n"))

  private val svSql =
    """WITH sv AS (
      |  SELECT event_id, event_type AS series,
      |         CAST(user_id % 8 AS VARCHAR) AS tag_user,
      |         epoch_ns(ts) AS ts_ns,
      |         epoch_ns(ts) // 1000000000 AS time,
      |         value
      |  FROM events
      |)""".stripMargin

  def qs: Seq[Q] = Seq(

    // select time, value from click where time >= T0 and time < T1
    Q("q_ts_scan_range",
      (s, dir) =>
        ev(s, dir).filter(col("series") === "click" && col("time") >= T0 && col("time") < T1)
          .select(col("time"), col("value"))
          .orderBy(col("time"), col("value")),
      Some(s"""$svSql
              |SELECT time, value FROM sv
              |WHERE series = 'click' AND time >= $T0 AND time < $T1
              |ORDER BY time, value""".stripMargin)),

    // group by time_bucket(3600, time) per series
    Q("q_ts_bucket_agg",
      (s, dir) =>
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg(
            (floor((avg(col("value"))) * 1e4 + 0.5) / 1e4).as("avg_value"),
            (floor((sum(col("value"))) * 1e4 + 0.5) / 1e4).as("sum_value"),
            count(col("value")).as("n"),
            (floor((min(col("value"))) * 1e4 + 0.5) / 1e4).as("min_value"),
            (floor((max(col("value"))) * 1e4 + 0.5) / 1e4).as("max_value"))
          .orderBy(col("series"), col("bucket")),
      Some(s"""$svSql
              |SELECT series,
              |       CAST(floor(time / 3600.0) AS BIGINT) * 3600 AS bucket,
              |       floor((avg(value)) * 1e4 + 0.5) / 1e4 AS avg_value,
              |       floor((sum(value)) * 1e4 + 0.5) / 1e4 AS sum_value,
              |       count(value) AS n,
              |       floor((min(value)) * 1e4 + 0.5) / 1e4 AS min_value,
              |       floor((max(value)) * 1e4 + 0.5) / 1e4 AS max_value
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series, bucket
              |ORDER BY series, bucket""".stripMargin),
      bench = true),

    // group by tag (tag.user identifiers ride in WHERE/GROUP BY — SURVEY §2.1)
    Q("q_ts_group_tag",
      (s, dir) =>
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), col("tag_user"))
          .agg((floor((avg(col("value"))) * 1e4 + 0.5) / 1e4).as("avg_value"), count(lit(1)).as("n"))
          .orderBy(col("series"), col("tag_user")),
      Some(s"""$svSql
              |SELECT series, tag_user, floor((avg(value)) * 1e4 + 0.5) / 1e4 AS avg_value, count(*) AS n
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series, tag_user ORDER BY series, tag_user""".stripMargin)),

    // first/last per (series, day): time-ordered aggregates
    // (/root/reference/src/sydra/query/functions.zig:239-252; design doc
    // fixes first/last = earliest/latest by time). Ordered by ns ts, which
    // is unique in the data, so the result is deterministic.
    Q("q_ts_first_last",
      (s, dir) =>
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(86400), col("time")).as("day"))
          .agg(
            (floor((min_by(col("value"), col("ts_ns"))) * 1e4 + 0.5) / 1e4).as("first_value"),
            (floor((max_by(col("value"), col("ts_ns"))) * 1e4 + 0.5) / 1e4).as("last_value"),
            (floor((max(col("value")) - min(col("value"))) * 1e4 + 0.5) / 1e4).as("spread"))
          .orderBy(col("series"), col("day")),
      Some(s"""$svSql
              |SELECT series, CAST(floor(time / 86400.0) AS BIGINT) * 86400 AS day,
              |       floor((arg_min(value, ts_ns)) * 1e4 + 0.5) / 1e4 AS first_value,
              |       floor((arg_max(value, ts_ns)) * 1e4 + 0.5) / 1e4 AS last_value,
              |       floor((max(value) - min(value)) * 1e4 + 0.5) / 1e4 AS spread
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series, day ORDER BY series, day""".stripMargin)),

    // exact interpolated percentile (functions.zig:253-262; exact, not
    // approx, for oracle parity — percentile_approx is the 100 TB path).
    // ONE array-fraction aggregate: per-fraction percentile aggs each
    // buffer their own copy of the group's values (the q_dq_histogram
    // lesson — 3 copies here for no reason)
    Q("q_ts_percentile",
      (s, dir) =>
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"))
          .agg(transform(
            percentile(col("value"), array(lit(0.5), lit(0.95), lit(0.99))),
            x => floor(x * 1e4 + 0.5) / 1e4).as("__p"))
          .select(col("series"), element_at(col("__p"), 1).as("p50"),
            element_at(col("__p"), 2).as("p95"), element_at(col("__p"), 3).as("p99"))
          .orderBy(col("series")),
      Some(s"""$svSql
              |SELECT series,
              |       floor((quantile_cont(value, 0.5)) * 1e4 + 0.5) / 1e4 AS p50,
              |       floor((quantile_cont(value, 0.95)) * 1e4 + 0.5) / 1e4 AS p95,
              |       floor((quantile_cont(value, 0.99)) * 1e4 + 0.5) / 1e4 AS p99
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series ORDER BY series""".stripMargin)),

    // sketch-based percentiles (the 100 TB path: bounded mergeable state
    // vs the exact form's per-group sort). No oracle — sketch algorithms
    // differ across engines; accuracy vs exact is test-asserted
    // (FunctionsSpec), so this records as a rows-only check by design.
    // Sketch percentiles, gated on the ERROR-BOUND CONTRACT (r11 — this
    // was rows-only): the sketch VALUES are engine-specific, but the
    // claim "each approx quantile lies within the exact p±0.05 value
    // window" is oracle-checkable — the oracle computes the exact
    // percentiles (the q_ts_percentile machinery) and expects every
    // bound flag TRUE. The window is ±0.05 (not the sketch's 1e-4 rank
    // guarantee) because the sketch returns an ELEMENT while percentile()
    // interpolates — at a tiny group (sf0.001: n≈40) a sub-rank window
    // excludes the exact element itself. Exact p50 rides the hash so the
    // row content is data-derived, not constant.
    Q("q_ts_percentile_approx",
      // (bound frame shared with q_ts_tdigest via sketchBounds below)
      (s, dir) => {
        val sv = Tables.seriesView(s, dir).filter(col("time") >= T0 && col("time") < T1)
        val a = graft.functions.Approx.seriesQuantiles(sv)
        a.join(sketchBounds(sv), "series").select(col("series"), col("n"), col("p50_exact"),
            (col("p50") >= col("lo50") && col("p50") <= col("hi50")).as("p50_ok"),
            (col("p95") >= col("lo95") && col("p95") <= col("hi95")).as("p95_ok"),
            (col("p99") >= col("lo99") && col("p99") <= col("hi99")).as("p99_ok"))
          .orderBy(col("series"))
      },
      Some(s"""$svSql
              |SELECT series, count(*) AS n,
              |       floor((quantile_cont(value, 0.5)) * 1e4 + 0.5) / 1e4 AS p50_exact,
              |       true AS p50_ok, true AS p95_ok, true AS p99_ok
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series ORDER BY series""".stripMargin)),

    // t-digest rollup quantiles (graft.functions.TDigest — the custom
    // mergeable sketch): one digest per (series, day) cell, day digests
    // MERGED per series (tdigest_merge_agg), quantiles extracted from the
    // merged sketch. This is the at-rest rollup composition a 100 TB
    // quantile tier runs — store a few-KB digest per rollup cell, answer
    // any later quantile by merging cells, never rescanning raw points.
    // Same error-bound contract gate as q_ts_percentile_approx: sketch
    // values are order-dependent, but "each approx quantile lies within
    // the exact ±0.05-quantile window" is oracle-checkable, and exact p50
    // rides the hash so row content is data-derived.
    Q("q_ts_tdigest",
      (s, dir) => {
        val sv = Tables.seriesView(s, dir).filter(col("time") >= T0 && col("time") < T1)
        val cells = sv
          .groupBy(col("series"),
            (col("time") - pmod(col("time"), lit(86400L))).as("day"))
          .agg(graft.functions.TDigest.agg(col("value")).as("td"))
        val merged = cells.groupBy(col("series"))
          .agg(graft.functions.TDigest.mergeAgg(col("td")).as("td"))
          .select(col("series"),
            graft.functions.TDigest.quantileOf(col("td"), 0.5).as("p50"),
            graft.functions.TDigest.quantileOf(col("td"), 0.95).as("p95"),
            graft.functions.TDigest.quantileOf(col("td"), 0.99).as("p99"))
        merged.join(sketchBounds(sv), "series").select(col("series"), col("n"), col("p50_exact"),
            (col("p50") >= col("lo50") && col("p50") <= col("hi50")).as("p50_ok"),
            (col("p95") >= col("lo95") && col("p95") <= col("hi95")).as("p95_ok"),
            (col("p99") >= col("lo99") && col("p99") <= col("hi99")).as("p99_ok"))
          .orderBy(col("series"))
      },
      Some(s"""$svSql
              |SELECT series, count(*) AS n,
              |       floor((quantile_cont(value, 0.5)) * 1e4 + 0.5) / 1e4 AS p50_exact,
              |       true AS p50_ok, true AS p95_ok, true AS p99_ok
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series ORDER BY series""".stripMargin),
      benchExtra = true),

    // regex selector: series =~ 'cl.*k|err.*' (declared surface —
    // parser.zig:408-424 parses =~/!~; exec never ran it; we run it)
    Q("q_ts_regex",
      (s, dir) =>
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .filter(col("series").rlike("^(cl.*k|err.*)$"))
          .groupBy(col("series")).agg(count(lit(1)).as("n"))
          .orderBy(col("series")),
      Some(s"""$svSql
              |SELECT series, count(*) AS n FROM sv
              |WHERE time >= $T0 AND time < $T1
              |  AND regexp_matches(series, '^(cl.*k|err.*)$$')
              |GROUP BY series ORDER BY series""".stripMargin)),

    // compaction semantics: dedup (series, minute-bucket) keeping the
    // latest point — /root/reference/src/sydra/storage/compact.zig:36-50
    // (last wins), expressed as max_by over the unique ns timestamp.
    Q("q_ts_compact_dedup",
      (s, dir) =>
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(60), col("time")).as("t60"))
          .agg((floor((max_by(col("value"), col("ts_ns"))) * 1e4 + 0.5) / 1e4).as("value"),
            count(lit(1)).as("n_raw"))
          .orderBy(col("series"), col("t60")),
      Some(s"""$svSql
              |SELECT series, CAST(floor(time / 60.0) AS BIGINT) * 60 AS t60,
              |       floor((arg_max(value, ts_ns)) * 1e4 + 0.5) / 1e4 AS value, count(*) AS n_raw
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series, t60 ORDER BY series, t60""".stripMargin)),

    // tag-find set algebra (http.zig:832-912): AND = all tags match,
    // OR = any; result = matching distinct series keys.
    Q("q_ts_tag_find_and",
      (s, dir) =>
        ev(s, dir).select(col("series"), col("tag_user")).distinct()
          .filter(col("tag_user") === "3" && col("series").isin("click", "view"))
          .orderBy(col("series"), col("tag_user")),
      Some(s"""$svSql
              |SELECT DISTINCT series, tag_user FROM sv
              |WHERE tag_user = '3' AND series IN ('click', 'view')
              |ORDER BY series, tag_user""".stripMargin)),

    Q("q_ts_tag_find_or",
      (s, dir) =>
        ev(s, dir).select(col("series"), col("tag_user")).distinct()
          .filter(col("tag_user") === "3" || col("series") === "error")
          .orderBy(col("series"), col("tag_user")),
      Some(s"""$svSql
              |SELECT DISTINCT series, tag_user FROM sv
              |WHERE tag_user = '3' OR series = 'error'
              |ORDER BY series, tag_user""".stripMargin)),

    // null handling + sort order: NULLs first under ASC
    // (operator.zig compareValuesForSort: null < any)
    Q("q_ts_sort_nulls",
      (s, dir) =>
        ev(s, dir).filter(col("series") === "error" && col("time") >= T0 && col("time") < T0 + 86400)
          .select(col("event_id"), when(col("value") < 1.0, lit(null)).otherwise(col("value")).as("v"))
          .orderBy(col("v").asc_nulls_first, col("event_id"))
          .limit(200),
      Some(s"""$svSql
              |SELECT event_id, CASE WHEN value < 1.0 THEN NULL ELSE value END AS v
              |FROM sv WHERE series = 'error' AND time >= $T0 AND time < ${T0 + 86400}
              |ORDER BY v ASC NULLS FIRST, event_id
              |LIMIT 200""".stripMargin)),

    // lag/lead per series ordered by (unique) ns time — SURVEY §2.7 —
    // through the day-partitioned SeriesWindows pre-pass (a plain
    // partitionBy(series) would put each whole series in one task)
    Q("q_ts_lag_lead",
      (s, dir) => {
        val nsDay = 86400L * 1000000000L
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T0 + 2 * 86400)
        val withW = graft.operators.SeriesWindows.leadN(
          graft.operators.SeriesWindows.lagN(base, "__pv", col("value"), 1,
            keys = Seq("series"), timeCol = "ts_ns", bucket = nsDay),
          "__nv", col("value"), 1, keys = Seq("series"), timeCol = "ts_ns", bucket = nsDay)
        withW.select(col("event_id"), col("series"), col("time"), col("value"),
            (floor((col("__pv")) * 1e4 + 0.5) / 1e4).as("prev_value"),
            (floor((col("__nv")) * 1e4 + 0.5) / 1e4).as("next_value"))
          .orderBy(col("series"), col("event_id"))
      },
      Some(s"""$svSql
              |SELECT event_id, series, time, value,
              |       floor((lag(value, 1) OVER (PARTITION BY series ORDER BY ts_ns)) * 1e4 + 0.5) / 1e4 AS prev_value,
              |       floor((lead(value, 1) OVER (PARTITION BY series ORDER BY ts_ns)) * 1e4 + 0.5) / 1e4 AS next_value
              |FROM sv WHERE time >= $T0 AND time < ${T0 + 2 * 86400}
              |ORDER BY series, event_id""".stripMargin)),

    // moving_avg(value, 600s) — RANGE frame over epoch seconds
    // (functions.zig:373-382)
    Q("q_ts_moving_avg",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T0 + 2 * 86400)
        graft.operators.SeriesWindows.movingAvg(base, "__ma", col("value"), 600,
            keys = Seq("series"), timeCol = "time")
          .select(col("event_id"), col("series"), col("time"),
            (floor((col("__ma")) * 1e4 + 0.5) / 1e4).as("mavg"))
          .orderBy(col("series"), col("event_id"))
      },
      // Oracle folds each frame's list linearly (matching Spark's fresh
      // per-frame accumulation); DuckDB's native windowed avg() uses
      // segment-tree aggregation whose different summation tree drifts
      // ~1e-9 on long partitions — enough to straddle rounding boundaries.
      Some(s"""$svSql
              |SELECT event_id, series, time,
              |       floor((list_reduce(list(value) OVER w, (x, y) -> x + y)
              |              / count(value) OVER w) * 1e4 + 0.5) / 1e4 AS mavg
              |FROM sv WHERE time >= $T0 AND time < ${T0 + 2 * 86400}
              |WINDOW w AS (PARTITION BY series ORDER BY time
              |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
              |ORDER BY series, event_id""".stripMargin)),

    // Rolling z-score anomaly detection: |z| >= 1.5 against the trailing
    // 1 h window, via the ghost-row day-partitioned machinery. Both
    // sides fold the identical explicit moments (Σx, Σx², n; σ² = Σx²/n −
    // μ²) — Spark's Welford stddev and DuckDB's segment-tree avg would
    // each drift differently across rounding boundaries. Values are
    // re-centered by the (series, day)-partition min first (z is
    // shift-invariant; dodges catastrophic cancellation on counter-like
    // magnitudes) — the oracle's `sh` CTE replays the exact partition
    // membership, ghosts included.
    Q("q_ts_zscore",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T0 + 2 * 86400)
        graft.operators.SeriesWindows.movingZScore(base, "__z", col("value"), 3600,
            keys = Seq("series"), timeCol = "time")
          .withColumn("z", floor((col("__z")) * 1e4 + 0.5) / 1e4)
          .filter(abs(col("z")) >= 1.5)
          .select(col("event_id"), col("series"), col("time"), col("z"))
          .orderBy(col("series"), col("event_id"))
      },
      Some(s"""$svSql,
              |f AS (SELECT * FROM sv WHERE time >= $T0 AND time < ${T0 + 2 * 86400}),
              |sh AS (
              |  SELECT series, d, min(value) AS c FROM (
              |    SELECT series, value, CAST(floor(time / 86400.0) AS BIGINT) AS d FROM f
              |    UNION ALL
              |    SELECT series, value, CAST(floor(time / 86400.0) AS BIGINT) + 1 AS d
              |    FROM f WHERE time % 86400 >= 86400 - 3600
              |  ) GROUP BY series, d
              |),
              |g AS (
              |  SELECT f.*, sh.c FROM f JOIN sh ON sh.series = f.series
              |    AND sh.d = CAST(floor(f.time / 86400.0) AS BIGINT)
              |),
              |zs AS (
              |  SELECT event_id, series, time, value, c,
              |         list_reduce([x - c for x in (list(value) OVER w)], (x, y) -> x + y) AS s1,
              |         list_reduce([(x - c) * (x - c) for x in (list(value) OVER w)], (x, y) -> x + y) AS s2,
              |         count(value) OVER w AS n
              |  FROM g
              |  WINDOW w AS (PARTITION BY series ORDER BY time
              |               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
              |), z AS (
              |  SELECT event_id, series, time,
              |         CASE WHEN sqrt(greatest((s2 / n) - ((s1 / n) * (s1 / n)), 0)) > 0
              |              THEN floor((((value - c) - (s1 / n)) / sqrt(greatest((s2 / n) - ((s1 / n) * (s1 / n)), 0))) * 1e4 + 0.5) / 1e4
              |         END AS z
              |  FROM zs
              |)
              |SELECT event_id, series, time, z FROM z WHERE abs(z) >= 1.5
              |ORDER BY series, event_id""".stripMargin)),

    // Counter `increase` with reset correction (monitoring-standard
    // semantics: a counter reset's negative delta contributes 0, so the
    // per-day increase is the sum of POSITIVE consecutive deltas). Lag
    // rides the day-partitioned SeriesWindows pre-pass on the UNIQUE ns
    // timestamp (tie-free order); day attribution of a cross-day delta
    // follows the later point, exactly as the oracle's global lag.
    Q("q_ts_increase",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
        val lagged = graft.operators.SeriesWindows.lagN(base, "__pv", col("value"), 1,
          keys = Seq("series"), timeCol = "ts_ns", bucket = 86400L * 1000000000L)
        lagged
          .groupBy(col("series"), F.timeBucket(lit(86400), col("time")).as("day"))
          .agg((floor((sum(when(col("value") > col("__pv"),
              col("value") - col("__pv")).otherwise(0.0))) * 1e4 + 0.5) / 1e4).as("inc"))
          .orderBy("series", "day")
      },
      Some(s"""$svSql, lg AS (
              |  SELECT series, time, value,
              |         lag(value) OVER (PARTITION BY series ORDER BY ts_ns) AS pv
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |)
              |SELECT series, CAST(floor(time / 86400.0) AS BIGINT) * 86400 AS day,
              |       floor((sum(CASE WHEN value > pv THEN value - pv ELSE 0 END)) * 1e4 + 0.5) / 1e4 AS inc
              |FROM lg GROUP BY series, day ORDER BY series, day""".stripMargin)),

    // Robust anomaly stats: per-(series, day) median + MAD (median
    // absolute deviation) — the outlier-resistant twin of the z-score's
    // (μ, σ), immune to the heavy tails that wreck moment-based
    // thresholds. Two exact-percentile aggregates (per-day groups, never
    // whole-series state); the day medians joining back are one row per
    // (series, day) — metadata-sized, AQE broadcasts them.
    Q("q_ts_mad",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .withColumn("day", F.timeBucket(lit(86400), col("time")))
        val med = base.groupBy(col("series"), col("day"))
          .agg(percentile(col("value"), lit(0.5)).as("med"))
        base.join(med, Seq("series", "day"))
          .groupBy(col("series"), col("day"))
          .agg(
            (floor(first(col("med")) * 1e4 + 0.5) / 1e4).as("med"),
            (floor(percentile(abs(col("value") - col("med")), lit(0.5)) * 1e4 + 0.5) / 1e4)
              .as("mad"))
          .orderBy("series", "day")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, CAST(floor(time / 86400.0) AS BIGINT) * 86400 AS day, value
              |      FROM sv WHERE time >= $T0 AND time < $T1),
              |m AS (SELECT series, day, quantile_cont(value, 0.5) AS med
              |      FROM b GROUP BY 1, 2)
              |SELECT series, day,
              |       floor(any_value(med) * 1e4 + 0.5) / 1e4 AS med,
              |       floor(quantile_cont(abs(value - med), 0.5) * 1e4 + 0.5) / 1e4 AS mad
              |FROM b JOIN m USING (series, day)
              |GROUP BY series, day ORDER BY series, day""".stripMargin)),

    // CUSUM changepoint scan per (series, day) over hourly rounded
    // averages: peak |running sum of deviations from the day mean| and
    // its hour. The statistic is exact-integer (n·S_i = n·Σ_{j≤i}v −
    // i·Σv in 1e-4 units) so both engines rank identical BIGINTs — a
    // rounded-mean formulation drifts cross-engine (see Trend.cusum).
    Q("q_ts_cusum",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
          .withColumn("day", F.timeBucket(lit(86400), col("bucket")))
        graft.operators.Trend.cusum(b, Seq("series", "day"), "bucket", "v",
            threshold = 50.0)
          .orderBy("series", "day")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, time - time % 3600 AS bucket,
              |             (time - time % 3600) - (time - time % 3600) % 86400 AS day,
              |             CAST(floor(avg(value) * 1e4 + 0.5) AS BIGINT) AS vi
              |      FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2, 3),
              |t AS (SELECT series, day, CAST(sum(vi) AS BIGINT) AS tot,
              |             count(*) AS n
              |      FROM b GROUP BY 1, 2),
              |c AS (SELECT b.series, b.day, b.bucket, t.n,
              |             abs(t.n * CAST(sum(b.vi) OVER (
              |               PARTITION BY b.series, b.day ORDER BY b.bucket
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              |               - CAST(row_number() OVER (
              |                   PARTITION BY b.series, b.day ORDER BY b.bucket) AS BIGINT)
              |                 * t.tot) AS ns
              |      FROM b JOIN t USING (series, day)),
              |r AS (SELECT series, day, bucket AS cp_bucket,
              |             floor(CAST(ns AS DOUBLE) / (CAST(n AS DOUBLE) * 1e4) * 1e4
              |               + 0.5) / 1e4 AS cusum_max,
              |             CAST(CAST(ns AS DOUBLE) > 50.0 * CAST(n AS DOUBLE) * 1e4 AS INT)
              |               AS flagged,
              |             row_number() OVER (PARTITION BY series, day
              |                                ORDER BY ns DESC, bucket) AS rn
              |      FROM c)
              |SELECT series, day, cp_bucket, cusum_max, flagged
              |FROM r WHERE rn = 1 ORDER BY series, day""".stripMargin),
      benchExtra = true),

    // Seasonal-naive decomposition per series: hour-of-day profile over
    // the 7-day window + de-seasonalized residual, exact-integer profile
    // means (same replay discipline as q_ts_cusum). Top-20 |resid| rows
    // keep the gate output bounded; rank on the ROUNDED residual.
    Q("q_ts_seasonal",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg(floor(avg(col("value")) * 1e4 + 0.5).cast("long").as("vi"))
        graft.operators.Trend.seasonalNaive(b, Seq("series"), "bucket", "vi",
            period = 86400L, step = 3600L)
          .withColumn("__ar", floor(abs(col("resid")) * 1e4 + 0.5) / 1e4)
          .orderBy(col("__ar").desc, col("series"), col("bucket"))
          .limit(20)
          .select("series", "bucket", "value", "seasonal", "resid")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, time - time % 3600 AS bucket,
              |             CAST(floor(avg(value) * 1e4 + 0.5) AS BIGINT) AS vi
              |      FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2),
              |p AS (SELECT series, (bucket % 86400) // 3600 AS slot,
              |             CAST(sum(vi) AS BIGINT) AS ps, count(*) AS pn
              |      FROM b GROUP BY 1, 2),
              |d AS (SELECT b.series, b.bucket,
              |             CAST(b.vi AS DOUBLE) / 1e4 AS value,
              |             floor(CAST(p.ps AS DOUBLE) / (CAST(p.pn AS DOUBLE) * 1e4) * 1e4
              |               + 0.5) / 1e4 AS seasonal,
              |             floor((CAST(b.vi AS DOUBLE) / 1e4
              |               - CAST(p.ps AS DOUBLE) / (CAST(p.pn AS DOUBLE) * 1e4)) * 1e4
              |               + 0.5) / 1e4 AS resid
              |      FROM b JOIN p ON b.series = p.series
              |                   AND (b.bucket % 86400) // 3600 = p.slot)
              |SELECT series, bucket, value, seasonal, resid FROM d
              |ORDER BY floor(abs(resid) * 1e4 + 0.5) / 1e4 DESC, series, bucket
              |LIMIT 20""".stripMargin),
      benchExtra = true),

    // Prometheus resets + changes per (series, day): counter-reset count
    // (value drops below its predecessor) and value-change count, on the
    // same day-partitioned tie-free lag pre-pass as q_ts_increase — one
    // window pre-pass, one hash aggregate, O(1) group state.
    Q("q_ts_resets",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
        val lagged = graft.operators.SeriesWindows.lagN(base, "__pv", col("value"), 1,
          keys = Seq("series"), timeCol = "ts_ns", bucket = 86400L * 1000000000L)
        lagged
          .groupBy(col("series"), F.timeBucket(lit(86400), col("time")).as("day"))
          .agg(
            sum(when(col("value") < col("__pv"), 1L).otherwise(0L)).as("resets"),
            sum(when(col("value") =!= col("__pv"), 1L).otherwise(0L)).as("changes"))
          .orderBy("series", "day")
      },
      Some(s"""$svSql, lg AS (
              |  SELECT series, time, value,
              |         lag(value) OVER (PARTITION BY series ORDER BY ts_ns) AS pv
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |)
              |SELECT series, CAST(floor(time / 86400.0) AS BIGINT) * 86400 AS day,
              |       CAST(sum(CASE WHEN value < pv THEN 1 ELSE 0 END) AS BIGINT) AS resets,
              |       CAST(sum(CASE WHEN value != pv THEN 1 ELSE 0 END) AS BIGINT) AS changes
              |FROM lg GROUP BY series, day ORDER BY series, day""".stripMargin)),

    // Prometheus deriv + predict_linear in one bucketed aggregate: per
    // (series, day) least-squares slope (per-hour units) and the linear
    // extrapolation 1 h past day end. Five running sums, O(1) group
    // state; x is the DAY-RELATIVE offset — epoch-scale x² sums would
    // cancel catastrophically (the z-score lesson applied at design
    // time). The oracle replays the identical shifted sums.
    Q("q_ts_deriv",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
        graft.operators.Trend.linearTrend(base, 86400L, 3600L, keys = Seq("series"))
          .select(col("series"), col("bucket_start"), col("n"),
            (floor(col("slope_hr") * 1e4 + 0.5) / 1e4).as("slope_hr"),
            (floor(col("pred") * 1e4 + 0.5) / 1e4).as("pred"))
          .orderBy("series", "bucket_start")
      },
      Some(s"""$svSql, b AS (
              |  SELECT series, time - (time % 86400) AS bucket_start,
              |         CAST(time % 86400 AS DOUBLE) AS x, value
              |  FROM sv WHERE time >= $T0 AND time < $T1 AND value IS NOT NULL
              |), s AS (
              |  SELECT series, bucket_start, count(*) AS n, sum(x) AS sx,
              |         sum(value) AS sy, sum(x * value) AS sxy, sum(x * x) AS sxx
              |  FROM b GROUP BY 1, 2
              |)
              |SELECT series, bucket_start, n,
              |       CASE WHEN n * sxx - sx * sx > 0
              |            THEN floor((((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 3600) * 1e4 + 0.5) / 1e4
              |       END AS slope_hr,
              |       CASE WHEN n * sxx - sx * sx > 0
              |            THEN floor((((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)
              |                        + ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 90000.0) * 1e4 + 0.5) / 1e4
              |       END AS pred
              |FROM s ORDER BY series, bucket_start""".stripMargin),
      benchExtra = true),

    // Holt linear (double-exponential) smoothing: final level + trend +
    // one-step forecast per series — ema's two-phase day-partitioned
    // architecture lifted to the 2×2 affine group (six doubles of task
    // state; the two-point seed may straddle a day boundary). Dyadic
    // α = 0.5, β = 0.25 keep cross-engine drift far under the 1e-4
    // rounding; the oracle replays the sequential recurrence.
    Q("q_ts_holt",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
        graft.operators.SeriesWindows.holtByKey(base, col("value"), 0.5, 0.25, Seq("series"))
          .select(col("series"),
            (floor(col("level") * 1e4 + 0.5) / 1e4).as("level"),
            (floor(col("trend") * 1e4 + 0.5) / 1e4).as("trend"),
            (floor(col("forecast") * 1e4 + 0.5) / 1e4).as("forecast"))
          .orderBy("series")
      },
      Some(s"""$svSql, p AS (
              |  SELECT series, list(value ORDER BY time, value) AS vs
              |  FROM sv WHERE time >= $T0 AND time < $T1 AND value IS NOT NULL
              |  GROUP BY 1
              |), h AS (
              |  -- state as DOUBLE[2] [l, b], NOT a struct: DuckDB 1.0's
              |  -- list_reduce mutates multi-field struct accumulators
              |  -- between field evaluations (probed; list state folds clean)
              |  SELECT series, len(vs) AS n,
              |         list_reduce(
              |           list_prepend([vs[2], vs[2] - vs[1]], [[x, 0.0] for x in vs[3:]]),
              |           (acc, e) -> [0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
              |                        0.25 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
              |                        + 0.75 * acc[2]]) AS st
              |  FROM p WHERE len(vs) >= 2
              |)
              |SELECT series,
              |       floor(st[1] * 1e4 + 0.5) / 1e4 AS level,
              |       floor(st[2] * 1e4 + 0.5) / 1e4 AS trend,
              |       floor((st[1] + st[2]) * 1e4 + 0.5) / 1e4 AS forecast
              |FROM h ORDER BY series""".stripMargin),
      benchExtra = true),

    // Holt–Winters additive seasonal smoothing (r10) — the smoothing
    // ladder's top rung (ema → holt → holt-winters), run over the hourly
    // ROLLUP with a 12-bucket season (non-empty at every test SF): per-key state is the 168-bucket
    // list, the fold is one aggregate HOF with an (m+2)-double rotating
    // state, bucket means pre-rounded 1e-6 (the Theil-Sen stance). The
    // oracle replays seed + full recursion via list_reduce with the
    // state-prepended padding trick (list state; struct accumulators
    // mis-fold in DuckDB — see q_ts_holt).
    Q("q_ts_holt_winters",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
        graft.operators.Trend.holtWinters(base, Seq("series"), period = 12,
          step = 3600L)
          .select(col("series"), col("n_buckets"),
            (floor(col("level") * 1e4 + 0.5) / 1e4).as("level"),
            (floor(col("trend") * 1e4 + 0.5) / 1e4).as("trend"),
            (floor(col("forecast") * 1e4 + 0.5) / 1e4).as("forecast"))
          .orderBy("series")
      },
      Some {
        val L2 = "(0.5 * (e[1] - acc[3]) + 0.5 * (acc[1] + acc[2]))"
        s"""$svSql, roll AS (
           |  SELECT series, time - time % 3600 AS b,
           |         floor(avg(value) * 1e6 + 0.5) / 1e6 AS x
           |  FROM sv WHERE time >= $T0 AND time < $T1 AND value IS NOT NULL
           |  GROUP BY 1, 2
           |), p AS (
           |  SELECT series, list(x ORDER BY b) AS vs FROM roll GROUP BY 1
           |), g AS (
           |  SELECT series, vs, len(vs) AS n FROM p WHERE len(vs) >= 24
           |), sd AS (
           |  SELECT series, vs, n,
           |         list_reduce(vs[1:12], (a, e) -> a + e) / 12 AS m1,
           |         list_reduce(vs[13:24], (a, e) -> a + e) / 12 AS m2
           |  FROM g
           |), h AS (
           |  SELECT series, n,
           |         list_reduce(
           |           list_prepend(
           |             list_concat([m1, (m2 - m1) / 12.0], [x - m1 for x in vs[1:12]]),
           |             [list_concat([x], [0.0 for i in range(13)]) for x in vs[13:]]),
           |           (acc, e) -> list_concat(
           |             [$L2, 0.25 * ($L2 - acc[1]) + 0.75 * acc[2]],
           |             list_concat(acc[4:14],
           |               [0.25 * (e[1] - $L2) + 0.75 * acc[3]]))) AS st
           |  FROM sd
           |)
           |SELECT series, n AS n_buckets,
           |       floor(st[1] * 1e4 + 0.5) / 1e4 AS level,
           |       floor(st[2] * 1e4 + 0.5) / 1e4 AS trend,
           |       floor((st[1] + st[2] + st[3]) * 1e4 + 0.5) / 1e4 AS forecast
           |FROM h ORDER BY series""".stripMargin
      },
      benchExtra = true),

    // Per-(series, day) value histogram over fixed bins (the
    // Prometheus-histogram analytics shape: distribution summaries that
    // aggregate mergeably at any scale — integer counts, one hash
    // aggregate, bins clamped to [0, nbins)).
    Q("q_ts_histogram",
      (s, dir) => {
        val nbins = 10
        val w = 50.0
        val bin = least(greatest(floor(col("value") / w), lit(0.0)), lit((nbins - 1).toDouble))
          .cast("long")
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(86400), col("time")).as("day"), bin.as("bin"))
          .agg(count(lit(1)).as("n"))
          .orderBy("series", "day", "bin")
      },
      Some(s"""$svSql
              |SELECT series, CAST(floor(time / 86400.0) AS BIGINT) * 86400 AS day,
              |       CAST(least(greatest(floor(value / 50.0), 0), 9) AS BIGINT) AS bin,
              |       count(*) AS n
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series, day, bin ORDER BY series, day, bin""".stripMargin)),

    // histogram_quantile composition: p90 interpolated linearly inside
    // the bucket from the histogram's MERGEABLE counts — the scale story
    // for quantiles over arbitrary groupings (the per-group window runs
    // over ≤ nbins rows, never the points). Same arithmetic both sides.
    Q("q_ts_histogram_quantile",
      (s, dir) => {
        val w = 50.0
        val bin = least(greatest(floor(col("value") / w), lit(0.0)), lit(9.0)).cast("long")
        val h = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(86400), col("time")).as("day"), bin.as("bin"))
          .agg(count(lit(1)).as("n"))
        val wOrd = Window.partitionBy("series", "day").orderBy("bin")
        val wAll = Window.partitionBy("series", "day")
        val c = h.withColumn("cum", sum("n").over(wOrd))
          .withColumn("total", sum("n").over(wAll))
        val rank = lit(0.9) * col("total")
        c.filter((col("cum") - col("n")) < rank && col("cum") >= rank)
          .select(col("series"), col("day"),
            (floor((col("bin") * w + lit(w) * ((rank - (col("cum") - col("n"))) / col("n"))) * 1e4 + 0.5) / 1e4)
              .as("p90"))
          .orderBy("series", "day")
      },
      Some(s"""$svSql, h AS (
              |  SELECT series, CAST(floor(time / 86400.0) AS BIGINT) * 86400 AS day,
              |         CAST(least(greatest(floor(value / 50.0), 0), 9) AS BIGINT) AS bin,
              |         count(*) AS n
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY series, day, bin
              |), c AS (
              |  SELECT series, day, bin, n,
              |         sum(n) OVER (PARTITION BY series, day ORDER BY bin) AS cum,
              |         sum(n) OVER (PARTITION BY series, day) AS total
              |  FROM h
              |)
              |SELECT series, day,
              |       floor((bin * 50.0 + 50.0 * ((0.9 * total - (cum - n)) / n)) * 1e4 + 0.5) / 1e4 AS p90
              |FROM c WHERE (cum - n) < 0.9 * total AND cum >= 0.9 * total
              |ORDER BY series, day""".stripMargin)),

    // M4 downsampling: per (series, hour) the earliest/latest/min/max
    // points — the lossless-for-rendering dashboard reduction, one hash
    // aggregate, ≤ 4 rows per bucket. Ties lexicographic on both sides.
    Q("q_ts_m4",
      (s, dir) => graft.operators.Downsample.m4(
          ev(s, dir).filter(col("time") >= T0 && col("time") < T0 + 2 * 86400),
          step = 3600, keys = Seq("series"))
        .orderBy("series", "bucket", "time", "value"),
      Some(s"""$svSql, p AS (
              |  SELECT series, time - (time % 3600) AS bucket, time, value,
              |         row_number() OVER (PARTITION BY series, time - (time % 3600) ORDER BY time, value) AS ra,
              |         row_number() OVER (PARTITION BY series, time - (time % 3600) ORDER BY time DESC, value DESC) AS rd,
              |         row_number() OVER (PARTITION BY series, time - (time % 3600) ORDER BY value, time) AS va,
              |         row_number() OVER (PARTITION BY series, time - (time % 3600) ORDER BY value DESC, time DESC) AS vd
              |  FROM sv WHERE time >= $T0 AND time < ${T0 + 2 * 86400}
              |)
              |SELECT DISTINCT series, bucket, time, value FROM p
              |WHERE ra = 1 OR rd = 1 OR va = 1 OR vd = 1
              |ORDER BY series, bucket, time, value""".stripMargin)),

    // LTTB perceptual downsampling (parallel bucket-anchor variant): one
    // max-triangle-area point per (series, 3h bucket) against the
    // neighbor buckets' first-point anchors; edge buckets not emitted
    // (compose with M4 for boundaries). Exact arithmetic on original
    // doubles — no averaged anchors — so the oracle replays it bit-for-bit.
    Q("q_ts_lttb",
      (s, dir) => graft.operators.Downsample.lttb(
          ev(s, dir).filter(col("time") >= T0 && col("time") < T1),
          step = 10800, keys = Seq("series"), tieCols = Seq("event_id"))
        .orderBy("series", "bucket"),
      Some(s"""$svSql,
              |p AS (SELECT series, time - (time % 10800) AS bucket, time, value, event_id
              |      FROM sv WHERE time >= $T0 AND time < $T1),
              |a AS (SELECT series, bucket, time AS at, value AS av,
              |        row_number() OVER (PARTITION BY series, bucket
              |                           ORDER BY time, event_id) AS rn
              |      FROM p),
              |a1 AS (SELECT series, bucket, at, av FROM a WHERE rn = 1),
              |tri AS (SELECT series, bucket,
              |          lag(at) OVER w AS pt, lag(av) OVER w AS pv,
              |          lead(at) OVER w AS nt, lead(av) OVER w AS nv
              |        FROM a1 WINDOW w AS (PARTITION BY series ORDER BY bucket)),
              |cand AS (
              |  SELECT p.series, p.bucket, p.time, p.value, p.event_id,
              |         abs((pt - nt) * (value - pv) - (pt - time) * (nv - pv)) AS area
              |  FROM p JOIN tri ON p.series = tri.series AND p.bucket = tri.bucket
              |  WHERE pt IS NOT NULL AND nt IS NOT NULL),
              |sel AS (SELECT *, row_number() OVER (PARTITION BY series, bucket
              |                                     ORDER BY area DESC, time, event_id) AS rn
              |        FROM cand)
              |SELECT series, bucket, time, value,
              |       floor(area * 1e4 + 0.5) / 1e4 AS area
              |FROM sel WHERE rn = 1 ORDER BY series, bucket""".stripMargin),
      benchExtra = true),

    // As-of join: each click picks up the latest same-tag purchase at or
    // before it. Right side pre-aggregated to unique (tag_user, time) —
    // max(value), no fp arithmetic, so no rounding needed anywhere.
    // Oracle replays with DuckDB's native ASOF LEFT JOIN.
    Q("q_ts_asof",
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("series") === "click" && col("time") >= T0 && col("time") < T1)
          .select("event_id", "tag_user", "time", "value")
        val purchases = e.filter(col("series") === "purchase")
          .groupBy("tag_user", "time").agg(max(col("value")).as("p_value"))
        graft.operators.AsofJoin.backward(clicks, purchases,
            keys = Seq("tag_user"), timeCol = "time",
            rightCols = Seq("p_value"), matchedTimeCol = "p_time")
          .orderBy("tag_user", "time", "event_id")
      },
      Some(s"""$svSql,
              |l AS (SELECT event_id, tag_user, time, value FROM sv
              |      WHERE series = 'click' AND time >= $T0 AND time < $T1),
              |r AS (SELECT tag_user, time, max(value) AS p_value FROM sv
              |      WHERE series = 'purchase' GROUP BY tag_user, time)
              |SELECT l.tag_user, l.time, l.event_id, l.value, r.time AS p_time, r.p_value
              |FROM l ASOF LEFT JOIN r ON l.tag_user = r.tag_user AND l.time >= r.time
              |ORDER BY l.tag_user, l.time, l.event_id""".stripMargin),
      benchExtra = true),

    // Tolerance variant: a match older than 6h is nulled (row kept).
    // DuckDB replays as a CASE over the unbounded ASOF result.
    Q("q_ts_asof_tol",
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("series") === "click" && col("time") >= T0 && col("time") < T1)
          .select("event_id", "tag_user", "time", "value")
        val purchases = e.filter(col("series") === "purchase")
          .groupBy("tag_user", "time").agg(max(col("value")).as("p_value"))
        graft.operators.AsofJoin.backward(clicks, purchases,
            keys = Seq("tag_user"), timeCol = "time",
            rightCols = Seq("p_value"), matchedTimeCol = "p_time",
            tolerance = Some(21600L))
          .orderBy("tag_user", "time", "event_id")
      },
      Some(s"""$svSql,
              |l AS (SELECT event_id, tag_user, time, value FROM sv
              |      WHERE series = 'click' AND time >= $T0 AND time < $T1),
              |r AS (SELECT tag_user, time, max(value) AS p_value FROM sv
              |      WHERE series = 'purchase' GROUP BY tag_user, time),
              |j AS (SELECT l.tag_user, l.time, l.event_id, l.value, r.time AS rt, r.p_value AS rv
              |      FROM l ASOF LEFT JOIN r ON l.tag_user = r.tag_user AND l.time >= r.time)
              |SELECT tag_user, time, event_id, value,
              |       CASE WHEN time - rt <= 21600 THEN rt END AS p_time,
              |       CASE WHEN time - rt <= 21600 THEN rv END AS p_value
              |FROM j ORDER BY tag_user, time, event_id""".stripMargin)),

    // Forward variant: earliest purchase AT OR AFTER each click (the
    // "next fill after the order" direction), via the negated-time
    // reduction to the backward scan. DuckDB replays natively with
    // `l.time <= r.time`.
    Q("q_ts_asof_fwd",
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("series") === "click" && col("time") >= T0 && col("time") < T1)
          .select("event_id", "tag_user", "time", "value")
        val purchases = e.filter(col("series") === "purchase")
          .groupBy("tag_user", "time").agg(max(col("value")).as("p_value"))
        graft.operators.AsofJoin.forward(clicks, purchases,
            keys = Seq("tag_user"), timeCol = "time",
            rightCols = Seq("p_value"), matchedTimeCol = "p_time")
          .orderBy("tag_user", "time", "event_id")
      },
      Some(s"""$svSql,
              |l AS (SELECT event_id, tag_user, time, value FROM sv
              |      WHERE series = 'click' AND time >= $T0 AND time < $T1),
              |r AS (SELECT tag_user, time, max(value) AS p_value FROM sv
              |      WHERE series = 'purchase' GROUP BY tag_user, time)
              |SELECT l.tag_user, l.time, l.event_id, l.value, r.time AS p_time, r.p_value
              |FROM l ASOF LEFT JOIN r ON l.tag_user = r.tag_user AND l.time <= r.time
              |ORDER BY l.tag_user, l.time, l.event_id""".stripMargin),
      benchExtra = true),

    // Cross-series correlation: click vs purchase hourly averages per
    // tag over the window, Pearson from explicit moments (the reference
    // cannot relate two series at all). The aligned averages are rounded
    // to 1e4 BEFORE the moment pass so both engines sum identical inputs;
    // the final corr rounds to 1e4 as usual.
    Q("q_ts_corr",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("tag_user"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg(
            (floor(avg(when(col("series") === "click", col("value"))) * 1e4 + 0.5) / 1e4).as("x"),
            (floor(avg(when(col("series") === "purchase", col("value"))) * 1e4 + 0.5) / 1e4).as("y"))
        graft.operators.Trend.pearson(b, Seq("tag_user"), "x", "y")
          .select(col("tag_user"), col("n"),
            (floor(col("corr") * 1e4 + 0.5) / 1e4).as("corr"))
          .orderBy("tag_user")
      },
      Some(s"""$svSql,
              |b AS (
              |  SELECT tag_user, CAST(floor(time / 3600.0) AS BIGINT) * 3600 AS bucket,
              |         floor(avg(CASE WHEN series = 'click' THEN value END) * 1e4 + 0.5) / 1e4 AS x,
              |         floor(avg(CASE WHEN series = 'purchase' THEN value END) * 1e4 + 0.5) / 1e4 AS y
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY tag_user, bucket
              |),
              |m AS (
              |  SELECT tag_user, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
              |         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              |  FROM b WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY tag_user
              |)
              |SELECT tag_user, n,
              |       floor(CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
              |                  THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
              |             END * 1e4 + 0.5) / 1e4 AS corr
              |FROM m ORDER BY tag_user""".stripMargin),
      benchExtra = true),

    // Cross-correlation function: q_ts_corr's click/purchase pair at
    // EVERY lag in ±2 hours — the lead/lag detector (argmax lag of the
    // curve). Same pre-rounded averages, same explicit-moment corr; the
    // oracle replays the lag expansion with a generate_series cross join.
    Q("q_ts_xcorr",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("tag_user"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg(
            (floor(avg(when(col("series") === "click", col("value"))) * 1e4 + 0.5) / 1e4).as("x"),
            (floor(avg(when(col("series") === "purchase", col("value"))) * 1e4 + 0.5) / 1e4).as("y"))
        graft.operators.Trend.crossCorrelation(b, Seq("tag_user"), "bucket",
            "x", "y", 3600L, maxLag = 2)
          .select(col("tag_user"), col("lag"), col("n"),
            (floor(col("corr") * 1e4 + 0.5) / 1e4).as("corr"))
          .orderBy("tag_user", "lag")
      },
      Some(s"""$svSql,
              |b AS (
              |  SELECT tag_user, CAST(floor(time / 3600.0) AS BIGINT) * 3600 AS bucket,
              |         floor(avg(CASE WHEN series = 'click' THEN value END) * 1e4 + 0.5) / 1e4 AS x,
              |         floor(avg(CASE WHEN series = 'purchase' THEN value END) * 1e4 + 0.5) / 1e4 AS y
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY tag_user, bucket
              |),
              |lags AS (SELECT unnest(generate_series(-2, 2)) AS lag),
              |p AS (
              |  SELECT bx.tag_user, l.lag, bx.x, by.y
              |  FROM b bx JOIN lags l ON true
              |  JOIN b by ON by.tag_user = bx.tag_user
              |           AND by.bucket = bx.bucket + l.lag * 3600
              |  WHERE bx.x IS NOT NULL AND by.y IS NOT NULL
              |),
              |m AS (
              |  SELECT tag_user, lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
              |         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              |  FROM p GROUP BY 1, 2
              |)
              |SELECT tag_user, lag, n,
              |       floor(CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
              |                  THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
              |             END * 1e4 + 0.5) / 1e4 AS corr
              |FROM m ORDER BY tag_user, lag""".stripMargin),
      benchExtra = true),

    // Autocorrelation function: each series' hourly means against their
    // OWN past at lags 0..4 — seasonality/persistence detection (the
    // ACF spike at lag 24 is how a daily cycle announces itself). Pure
    // composition: crossCorrelation with x = y restricted to non-negative
    // lags; the bucket-sized frame carries the lag self-equi-join, so
    // cost is buckets × lags regardless of raw point count.
    Q("q_ts_acf",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("x"))
        graft.operators.Trend.crossCorrelation(b, Seq("series"), "bucket",
            "x", "x", 3600L, maxLag = 4)
          .filter(col("lag") >= 0L)
          .select(col("series"), col("lag"), col("n"),
            (floor(col("corr") * 1e4 + 0.5) / 1e4).as("acf"))
          .orderBy("series", "lag")
      },
      Some(s"""$svSql,
              |b AS (
              |  SELECT series, CAST(floor(time / 3600.0) AS BIGINT) * 3600 AS bucket,
              |         floor(avg(value) * 1e4 + 0.5) / 1e4 AS x
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY series, bucket
              |),
              |lags AS (SELECT unnest(generate_series(-4, 4)) AS lag),
              |p AS (
              |  SELECT bx.series, l.lag, bx.x, by.x AS y
              |  FROM b bx JOIN lags l ON true
              |  JOIN b by ON by.series = bx.series
              |           AND by.bucket = bx.bucket + l.lag * 3600
              |),
              |m AS (
              |  SELECT series, lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
              |         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              |  FROM p GROUP BY 1, 2
              |)
              |SELECT series, lag, n,
              |       floor(CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
              |                  THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
              |             END * 1e4 + 0.5) / 1e4 AS acf
              |FROM m WHERE lag >= 0 ORDER BY series, lag""".stripMargin)),

    // Ljung-Box whiteness test per series: Q = n(n+2)·Σ_{k=1..6}
    // r_k²/(n−k) over the rounded lag-k autocorrelations of the hourly
    // means (the pairwise-Pearson ACF variant of q_ts_acf — documented,
    // replayed identically by the oracle), flagged against the χ²(6)
    // 5% critical value 12.592. The "is anything left to model?"
    // companion to decompose/Holt-Winters: Q small → residual series is
    // indistinguishable from white noise.
    Q("q_ts_ljung_box",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("x"))
        val acf = graft.operators.Trend.crossCorrelation(b, Seq("series"), "bucket",
            "x", "x", 3600L, maxLag = 6)
          .filter(col("lag") >= 1L && col("corr").isNotNull)
          .select(col("series"), col("lag"),
            (floor(col("corr") * 1e4 + 0.5) / 1e4).as("r"))
        val nb = b.groupBy(col("series")).agg(count(lit(1)).as("n"))
        acf.join(nb, "series")
          .groupBy(col("series"))
          .agg(max(col("n")).as("n"),
            (floor(max(col("n")) * (max(col("n")) + 2) *
              sum(col("r") * col("r") / (col("n") - col("lag"))) * 1e4 + 0.5) / 1e4)
              .as("q_stat"))
          .withColumn("white_noise", col("q_stat") < 12.592)
          .orderBy(col("series"))
      },
      Some(s"""$svSql,
              |b AS (
              |  SELECT series, CAST(floor(time / 3600.0) AS BIGINT) * 3600 AS bucket,
              |         floor(avg(value) * 1e4 + 0.5) / 1e4 AS x
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY series, bucket
              |),
              |lags AS (SELECT unnest(generate_series(1, 6)) AS lag),
              |p AS (
              |  SELECT bx.series, l.lag, bx.x, by.x AS y
              |  FROM b bx JOIN lags l ON true
              |  JOIN b by ON by.series = bx.series
              |           AND by.bucket = bx.bucket + l.lag * 3600
              |),
              |m AS (
              |  SELECT series, lag, count(*) AS cnt, sum(x) AS sx, sum(y) AS sy,
              |         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              |  FROM p GROUP BY 1, 2
              |),
              |acf AS (
              |  SELECT series, lag,
              |         floor((cnt*sxy - sx*sy) / sqrt((cnt*sxx - sx*sx) * (cnt*syy - sy*sy))
              |               * 1e4 + 0.5) / 1e4 AS r
              |  FROM m
              |  WHERE cnt >= 2 AND cnt*sxx - sx*sx > 0 AND cnt*syy - sy*sy > 0
              |),
              |nb AS (SELECT series, count(*) AS n FROM b GROUP BY 1)
              |SELECT acf.series, CAST(max(n) AS BIGINT) AS n,
              |       floor(max(n) * (max(n) + 2) *
              |             sum(r * r / (n - lag)) * 1e4 + 0.5) / 1e4 AS q_stat,
              |       floor(max(n) * (max(n) + 2) *
              |             sum(r * r / (n - lag)) * 1e4 + 0.5) / 1e4 < 12.592 AS white_noise
              |FROM acf JOIN nb ON acf.series = nb.series
              |GROUP BY 1 ORDER BY acf.series""".stripMargin)),

    // Classical additive seasonal decomposition of the hourly series
    // means, period 24: value = trend (2×24 centered MA) + seasonal
    // (centered phase means) + remainder. Integer-exact except the
    // pinned-fold 24-term phase mean (Trend.decompose scaladoc).
    Q("q_ts_decompose",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
        graft.operators.Trend.decompose(b, Seq("series"), "bucket", "v",
            step = 3600L, period = 24)
          .orderBy("series", "bucket")
      },
      Some(s"""$svSql,
              |b AS (
              |  SELECT series, CAST(floor(time / 3600.0) AS BIGINT) * 3600 AS bucket,
              |         CAST(floor(avg(value) * 1e4 + 0.5) AS BIGINT) AS v4
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY series, bucket
              |),
              |t AS (
              |  SELECT series, bucket, v4, count(*) OVER w AS cnt,
              |         2 * sum(v4) OVER w - lag(v4, 12) OVER ow
              |           - lead(v4, 12) OVER ow AS t2
              |  FROM b
              |  WINDOW ow AS (PARTITION BY series ORDER BY bucket),
              |         w AS (PARTITION BY series ORDER BY bucket
              |               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
              |),
              |det AS (
              |  SELECT series, bucket, v4, t2,
              |         ((bucket // 3600) % 24 + 24) % 24 AS phase,
              |         48 * v4 - t2 AS d
              |  FROM t WHERE cnt = 25 AND t2 IS NOT NULL
              |),
              |sps AS (
              |  SELECT series, phase,
              |         sum(d) / (count(*) * 480000) AS sv
              |  FROM det GROUP BY 1, 2
              |),
              |mn AS (
              |  SELECT series,
              |         list_reduce(list(sv ORDER BY phase), (x, y) -> x + y)
              |           / count(*) AS smean
              |  FROM sps GROUP BY 1
              |),
              |cs AS (SELECT sps.series, phase, sv - smean AS c
              |       FROM sps JOIN mn ON sps.series = mn.series)
              |SELECT det.series, bucket, v4 / 10000 AS v,
              |       floor(t2 / 480000 * 1e4 + 0.5) / 1e4 AS trend,
              |       floor(c * 1e4 + 0.5) / 1e4 AS seasonal,
              |       floor((v4 / 10000 - t2 / 480000 - c) * 1e4 + 0.5) / 1e4 AS remainder
              |FROM det JOIN cs ON det.series = cs.series AND det.phase = cs.phase
              |ORDER BY det.series, bucket""".stripMargin)),

    // Alert expressions (the reference's language-goal item): hourly avg
    // above 50 for >= 3 consecutive hours per series — firing episodes
    // via the integer gaps-and-islands identity, condition on rounded
    // averages so both engines make identical boolean calls.
    Q("q_ts_alert",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
        graft.operators.Alerts.firing(b, Seq("series"), "bucket", 3600L,
            col("v") > 50.0, forBuckets = 3)
          .orderBy("series", "episode_start")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, time - time % 3600 AS bucket,
              |             floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |      FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2),
              |t AS (SELECT series, bucket,
              |             row_number() OVER (PARTITION BY series ORDER BY bucket) AS rn
              |      FROM b WHERE v > 50.0),
              |i AS (SELECT series, bucket - rn * 3600 AS island,
              |             min(bucket) AS episode_start, max(bucket) AS episode_end,
              |             count(*) AS n_buckets
              |      FROM t GROUP BY 1, 2)
              |SELECT series, episode_start + 2 * 3600 AS fired_at,
              |       episode_start, episode_end, n_buckets
              |FROM i WHERE n_buckets >= 3
              |ORDER BY series, episode_start""".stripMargin),
      benchExtra = true),

    // Gap detection (Prometheus absent() family): per (series, day),
    // how many hourly buckets lack above-threshold data and the longest
    // consecutive such run — "time-above-threshold coverage". Present
    // set = buckets with rounded avg > 50 (same deterministic condition
    // as q_ts_alert); all-integer gap arithmetic.
    Q("q_ts_gaps",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
          .filter(col("v") > 50.0)
        graft.operators.Alerts.gaps(b, Seq("series"), "bucket", 3600L, 86400L)
          .orderBy("series", "window_start")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, time - time % 3600 AS bucket,
              |             floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |      FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2),
              |p AS (SELECT series, bucket, bucket - bucket % 86400 AS window_start
              |      FROM b WHERE v > 50.0),
              |lg AS (SELECT series, window_start, bucket,
              |              coalesce(lag(bucket) OVER (
              |                PARTITION BY series, window_start ORDER BY bucket),
              |                window_start - 3600) AS prev
              |       FROM p)
              |SELECT series, window_start, count(*) AS n_present,
              |       24 - count(*) AS n_missing,
              |       CAST(greatest(max((bucket - prev) / 3600 - 1),
              |                     23 - max((bucket - window_start) / 3600)) AS BIGINT)
              |         AS longest_gap
              |FROM lg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      benchExtra = true),

    // Full-absence gap detection (r7 verdict #3): same rollup+condition
    // shape as q_ts_gaps but with a rarer condition (avg > 80) over a
    // dense (series × day) spine from the raw table's key universe — a
    // (series, day) with NO above-threshold bucket at all now reports
    // (0, 24, 24) instead of vanishing. Oracle replays the spine with
    // generate_series.
    Q("q_ts_gaps_absent",
      (s, dir) => {
        val e = ev(s, dir)
        val b = e.filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
          .filter(col("v") > 80.0)
        graft.operators.Alerts.gapsWithSpine(b, e.select("series"),
            Seq("series"), "bucket", 3600L, 86400L, T0, T1)
          .orderBy("series", "window_start")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, time - time % 3600 AS bucket,
              |             floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |      FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2),
              |p AS (SELECT series, bucket, bucket - bucket % 86400 AS window_start
              |      FROM b WHERE v > 80.0),
              |lg AS (SELECT series, window_start, bucket,
              |              coalesce(lag(bucket) OVER (
              |                PARTITION BY series, window_start ORDER BY bucket),
              |                window_start - 3600) AS prev
              |       FROM p),
              |g AS (SELECT series, window_start, count(*) AS n_present,
              |             24 - count(*) AS n_missing,
              |             CAST(greatest(max((bucket - prev) / 3600 - 1),
              |                           23 - max((bucket - window_start) / 3600)) AS BIGINT)
              |               AS longest_gap
              |      FROM lg GROUP BY 1, 2),
              |ks AS (SELECT DISTINCT series FROM sv),
              |spine AS (SELECT series, unnest(generate_series($T0, ${T1 - 86400}, 86400)) AS window_start
              |          FROM ks)
              |SELECT s.series, s.window_start,
              |       coalesce(g.n_present, 0) AS n_present,
              |       coalesce(g.n_missing, 24) AS n_missing,
              |       coalesce(g.longest_gap, 24) AS longest_gap
              |FROM spine s LEFT JOIN g
              |  ON s.series = g.series AND s.window_start = g.window_start
              |ORDER BY 1, 2""".stripMargin),
      benchExtra = true),

    // Rolling exact median over the trailing 5 hourly buckets — the
    // robust trend line (a moving AVERAGE chases outliers; the median
    // doesn't). No quantile window in Spark → bounded k-slot self-join
    // (SeriesWindows.rollingQuantile); the oracle replays it as a RANGE
    // frame quantile_cont window.
    Q("q_ts_rolling_median",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
        graft.operators.SeriesWindows.rollingQuantile(b, "med", Seq("series"),
            "bucket", "v", 3600L, 5, 0.5)
          .withColumn("med", floor(col("med") * 1e4 + 0.5) / 1e4)
          .orderBy("series", "bucket")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, time - time % 3600 AS bucket,
              |             floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |      FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2)
              |SELECT series, bucket,
              |       floor(quantile_cont(v, 0.5) OVER w * 1e4 + 0.5) / 1e4 AS med,
              |       count(*) OVER w AS med_n
              |FROM b
              |WINDOW w AS (PARTITION BY series ORDER BY bucket
              |             RANGE BETWEEN 14400 PRECEDING AND CURRENT ROW)
              |ORDER BY series, bucket""".stripMargin),
      benchExtra = true),

    // PromQL *_over_time pack: min/max/sum/count/avg/stddev/first/last over
    // the trailing 4 h, per series, all eight sharing ONE RANGE frame (one
    // WindowExec, one sort) over the hourly rollup. stddev is sample
    // stddev, NULL for singleton frames on both engines.
    Q("q_ts_over_time",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), F.timeBucket(lit(3600), col("time")).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
        graft.operators.SeriesWindows.overTime(b, Seq("series"), "bucket", "v", 14400L)
          .select(col("series"), col("bucket"),
            (floor(col("min_ot") * 1e4 + 0.5) / 1e4).as("min_ot"),
            (floor(col("max_ot") * 1e4 + 0.5) / 1e4).as("max_ot"),
            (floor(col("sum_ot") * 1e4 + 0.5) / 1e4).as("sum_ot"),
            col("n_ot"),
            (floor(col("avg_ot") * 1e4 + 0.5) / 1e4).as("avg_ot"),
            (floor(col("sd_ot") * 1e4 + 0.5) / 1e4).as("sd_ot"),
            (floor(col("first_ot") * 1e4 + 0.5) / 1e4).as("first_ot"),
            (floor(col("last_ot") * 1e4 + 0.5) / 1e4).as("last_ot"))
          .orderBy("series", "bucket")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, time - time % 3600 AS bucket,
              |             floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |      FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2)
              |SELECT series, bucket,
              |       floor(min(v) OVER w * 1e4 + 0.5) / 1e4 AS min_ot,
              |       floor(max(v) OVER w * 1e4 + 0.5) / 1e4 AS max_ot,
              |       floor(sum(v) OVER w * 1e4 + 0.5) / 1e4 AS sum_ot,
              |       count(v) OVER w AS n_ot,
              |       floor(avg(v) OVER w * 1e4 + 0.5) / 1e4 AS avg_ot,
              |       floor(CASE WHEN count(v) OVER w > 1
              |                  THEN stddev_samp(v) OVER w END * 1e4 + 0.5) / 1e4 AS sd_ot,
              |       floor(first_value(v) OVER w * 1e4 + 0.5) / 1e4 AS first_ot,
              |       floor(last_value(v) OVER w * 1e4 + 0.5) / 1e4 AS last_ot
              |FROM b
              |WINDOW w AS (PARTITION BY series ORDER BY bucket
              |             RANGE BETWEEN 14400 PRECEDING AND CURRENT ROW)
              |ORDER BY series, bucket""".stripMargin),
      benchExtra = true),

    // SAX symbolization: hourly PAA, per-day z-normalized 4-symbol words
    // (N(0,1) quartile breakpoints). Pre-rounded means (1e-4) and z
    // (1e-6) keep the discretization engine-portable.
    Q("q_ts_sax",
      (s, dir) => {
        val base = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
        graft.operators.Downsample.sax(base, 3600L, 86400L)
          .orderBy("series", "frame")
      },
      Some(s"""$svSql,
              |b AS (SELECT series, time - time % 86400 AS frame,
              |             time - time % 3600 AS bucket,
              |             floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |      FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2, 3),
              |zs AS (SELECT series, frame, bucket,
              |       floor((CASE WHEN stddev_pop(v) OVER w > 0
              |                   THEN (v - avg(v) OVER w) / stddev_pop(v) OVER w
              |                   ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS z
              |       FROM b WINDOW w AS (PARTITION BY series, frame)),
              |sy AS (SELECT series, frame, bucket,
              |       CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0 THEN 'b'
              |            WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym FROM zs)
              |SELECT series, frame, string_agg(sym, '' ORDER BY bucket) AS sax,
              |       count(*) AS n_buckets
              |FROM sy GROUP BY 1, 2 ORDER BY series, frame""".stripMargin)),

    // ALIGN JOIN (the reference backlog's "join on time"): click and
    // purchase aligned to a 1800 s grid per tag with forward-fill on
    // both sides; the spine spans the union of both series' ranges.
    Q("q_ts_align_join",
      (s, dir) => {
        val e = ev(s, dir).filter(col("time") >= T0 && col("time") < T0 + 2 * 86400)
        graft.operators.AlignJoin.aligned(
            e.filter(col("series") === "click"),
            e.filter(col("series") === "purchase"),
            keys = Seq("tag_user"), timeCol = "time", valueCol = "value",
            step = 1800L, policy = graft.sydraql.Ast.FillPrevious)
          .select(col("tag_user"), col("bucket"),
            (floor(col("l_value") * 1e4 + 0.5) / 1e4).as("l_value"),
            (floor(col("r_value") * 1e4 + 0.5) / 1e4).as("r_value"))
          .orderBy("tag_user", "bucket")
      },
      Some(s"""$svSql,
              |la AS (SELECT tag_user, time - time % 1800 AS bucket, avg(value) AS lv
              |       FROM sv WHERE series = 'click' AND time >= $T0 AND time < ${T0 + 2 * 86400}
              |       GROUP BY 1, 2),
              |ra AS (SELECT tag_user, time - time % 1800 AS bucket, avg(value) AS rv
              |       FROM sv WHERE series = 'purchase' AND time >= $T0 AND time < ${T0 + 2 * 86400}
              |       GROUP BY 1, 2),
              |m AS (SELECT coalesce(la.tag_user, ra.tag_user) AS tag_user,
              |             coalesce(la.bucket, ra.bucket) AS bucket, lv, rv
              |      FROM la FULL JOIN ra ON la.tag_user = ra.tag_user AND la.bucket = ra.bucket),
              |bounds AS (SELECT tag_user, min(bucket) AS lo, max(bucket) AS hi FROM m GROUP BY 1),
              |spine AS (SELECT tag_user, unnest(generate_series(lo, hi, 1800)) AS bucket FROM bounds)
              |SELECT s.tag_user, s.bucket,
              |       floor((last_value(m.lv IGNORE NULLS) OVER
              |              (PARTITION BY s.tag_user ORDER BY s.bucket
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1e4 + 0.5) / 1e4 AS l_value,
              |       floor((last_value(m.rv IGNORE NULLS) OVER
              |              (PARTITION BY s.tag_user ORDER BY s.bucket
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1e4 + 0.5) / 1e4 AS r_value
              |FROM spine s LEFT JOIN m ON s.tag_user = m.tag_user AND s.bucket = m.bucket
              |ORDER BY s.tag_user, s.bucket""".stripMargin),
      benchExtra = true),

    // Range join: clicks inside the 90-minute window opened by each
    // same-tag purchase, aggregated per window. The oracle's inequality
    // join replays what the bucket-exploded equi-join computes.
    Q("q_ts_range_join",
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("series") === "click" && col("time") >= T0 && col("time") < T1)
          .select("tag_user", "time", "value")
        val windows = e.filter(col("series") === "purchase")
          .groupBy(col("tag_user"), col("time").as("w_start"))
          .agg(count(lit(1)).as("__n")).drop("__n")
          .withColumn("w_end", col("w_start") + 5400L)
        graft.operators.RangeJoin.pointInInterval(clicks, windows,
            keys = Seq("tag_user"), timeCol = "time",
            startCol = "w_start", endCol = "w_end", bucket = 1800L)
          .groupBy(col("tag_user"), col("w_start"))
          .agg(
            count(lit(1)).as("n_clicks"),
            max(col("value")).as("max_click"),
            (floor(sum(col("value")) * 1e4 + 0.5) / 1e4).as("sum_click"))
          .orderBy("tag_user", "w_start")
      },
      Some(s"""$svSql,
              |l AS (SELECT tag_user, time, value FROM sv
              |      WHERE series = 'click' AND time >= $T0 AND time < $T1),
              |w AS (SELECT DISTINCT tag_user, time AS w_start FROM sv WHERE series = 'purchase')
              |SELECT w.tag_user, w.w_start, count(*) AS n_clicks,
              |       max(l.value) AS max_click,
              |       floor(sum(l.value) * 1e4 + 0.5) / 1e4 AS sum_click
              |FROM w JOIN l ON l.tag_user = w.tag_user
              |              AND l.time >= w.w_start AND l.time < w.w_start + 5400
              |GROUP BY w.tag_user, w.w_start
              |ORDER BY w.tag_user, w.w_start""".stripMargin),
      benchExtra = true),

    // PromQL topk(): the k highest-valued series per evaluation bucket
    // (here by hourly avg). Scale shape: one partial+final hash aggregate
    // to the (series × bucket) rollup — metadata-sized next to the raw
    // scan — then a window row_number partitioned BY BUCKET over that
    // rollup, so the sort is per-bucket over n_series rows, never a global
    // sort of raw points. Ties break on series name: deterministic on both
    // engines.
    Q("q_ts_topk_series",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rolled = ev(s, dir)
          .filter(col("time") >= T0 && col("time") < T0 + 2 * 86400)
          .groupBy(col("series"), (col("time") - pmod(col("time"), lit(3600L))).as("bucket"))
          .agg(avg(col("value")).as("__avg"))
        val w = Window.partitionBy(col("bucket"))
          .orderBy(col("__avg").desc, col("series"))
        rolled
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 2)
          .select(col("bucket"), col("rnk"), col("series"),
            (floor(col("__avg") * 1e4 + 0.5) / 1e4).as("avg_value"))
          .orderBy(col("bucket"), col("rnk"))
      },
      Some(s"""$svSql,
              |r AS (
              |  SELECT series, time - (time % 3600) AS bucket, avg(value) AS a
              |  FROM sv WHERE time >= $T0 AND time < ${T0 + 2 * 86400}
              |  GROUP BY 1, 2
              |),
              |rk AS (
              |  SELECT bucket, series, a,
              |         CAST(row_number() OVER (PARTITION BY bucket
              |              ORDER BY a DESC, series) AS BIGINT) AS rnk
              |  FROM r
              |)
              |SELECT bucket, rnk, series,
              |       floor(a * 1e4 + 0.5) / 1e4 AS avg_value
              |FROM rk WHERE rnk <= 2
              |ORDER BY bucket, rnk""".stripMargin)),

    // Tukey-fence outlier detection: hourly bucket averages outside
    // [q1 − 1.5·IQR, q3 + 1.5·IQR] of their series' distribution. The
    // quartiles are one exact-percentile aggregate per series
    // (series-count rows, broadcast back), so the raw rollup is scanned
    // once and nothing sorts it globally; DuckDB's quantile_cont uses
    // the same linear interpolation as Spark's percentile.
    Q("q_ts_iqr",
      (s, dir) => {
        val rolled = ev(s, dir)
          .filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"),
            (col("time") - pmod(col("time"), lit(3600L))).as("bucket"))
          .agg(avg(col("value")).as("v"))
        val fences = rolled.groupBy("series").agg(
          percentile(col("v"), lit(0.25)).as("q1"),
          percentile(col("v"), lit(0.75)).as("q3"))
        rolled.join(broadcast(fences), "series")
          .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
          .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
          .filter(col("v") < col("lo") || col("v") > col("hi"))
          .select(col("series"), col("bucket"),
            (floor(col("v") * 1e4 + 0.5) / 1e4).as("v"),
            when(col("v") < col("lo"), "low").otherwise("high").as("side"))
          .orderBy("series", "bucket")
      },
      Some(s"""$svSql,
              |r AS (
              |  SELECT series, time - (time % 3600) AS bucket, avg(value) AS v
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY 1, 2
              |),
              |f AS (
              |  SELECT series, quantile_cont(v, 0.25) AS q1,
              |         quantile_cont(v, 0.75) AS q3
              |  FROM r GROUP BY series
              |)
              |SELECT r.series, r.bucket,
              |       floor(r.v * 1e4 + 0.5) / 1e4 AS v,
              |       CASE WHEN r.v < q1 - 1.5 * (q3 - q1) THEN 'low'
              |            ELSE 'high' END AS side
              |FROM r JOIN f ON r.series = f.series
              |WHERE r.v < q1 - 1.5 * (q3 - q1) OR r.v > q3 + 1.5 * (q3 - q1)
              |ORDER BY r.series, r.bucket""".stripMargin)),

    // PromQL `offset` modifier: each hourly bucket against the same
    // series' bucket 24 h earlier (day-over-day delta and ratio). The
    // self-join is on the rollup (series-count × buckets rows), keyed by
    // (series, bucket) — both sides shuffle once on the same key; raw
    // points never join. Inner semantics: buckets with no 24 h-ago twin
    // drop (PromQL's offset returns nothing there too).
    Q("q_ts_offset",
      (s, dir) => {
        val rolled = ev(s, dir)
          .filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"),
            (col("time") - pmod(col("time"), lit(3600L))).as("bucket"))
          .agg(avg(col("value")).as("v"))
        val prev = rolled.select(col("series"),
          (col("bucket") + 86400L).as("bucket"), col("v").as("v_prev"))
        rolled.join(prev, Seq("series", "bucket"))
          .select(col("series"), col("bucket"),
            (floor(col("v") * 1e4 + 0.5) / 1e4).as("v"),
            (floor(col("v_prev") * 1e4 + 0.5) / 1e4).as("v_prev"),
            (floor((col("v") - col("v_prev")) * 1e4 + 0.5) / 1e4).as("delta_1d"),
            (floor(when(col("v_prev") =!= 0, col("v") / col("v_prev")) * 1e4 + 0.5) / 1e4).as("ratio_1d"))
          .orderBy("series", "bucket")
      },
      Some(s"""$svSql,
              |r AS (
              |  SELECT series, time - (time % 3600) AS bucket, avg(value) AS v
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY 1, 2
              |)
              |SELECT a.series, a.bucket,
              |       floor(a.v * 1e4 + 0.5) / 1e4 AS v,
              |       floor(b.v * 1e4 + 0.5) / 1e4 AS v_prev,
              |       floor((a.v - b.v) * 1e4 + 0.5) / 1e4 AS delta_1d,
              |       floor((CASE WHEN b.v <> 0 THEN a.v / b.v END) * 1e4 + 0.5) / 1e4 AS ratio_1d
              |FROM r a JOIN r b ON a.series = b.series AND a.bucket = b.bucket + 86400
              |ORDER BY a.series, a.bucket""".stripMargin)),

    // Exact distinct cardinality per (series, day): "how many distinct
    // users touched each series each day". Spark plans COUNT(DISTINCT x)
    // via Expand + two-level aggregate — the distinct de-dup happens
    // partially map-side, so raw points never converge on one task. (The
    // 100 TB serving path for dashboards is approx_count_distinct / an HLL
    // sketch column; exact is the gate-able twin and the backfill job.)
    Q("q_ts_ndv",
      (s, dir) =>
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"),
            (col("time") - pmod(col("time"), lit(86400L))).as("day"))
          .agg(
            count_distinct(col("tag_user")).as("n_users"),
            count(lit(1)).as("n_points"))
          .orderBy(col("series"), col("day")),
      Some(s"""$svSql
              |SELECT series, time - (time % 86400) AS day,
              |       count(DISTINCT tag_user) AS n_users,
              |       count(*) AS n_points
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY 1, 2
              |ORDER BY series, day""".stripMargin)),

    // Sketch twin of q_ts_ndv — the 100 TB dashboard-serving path:
    // approx_count_distinct (HLL++, rsd 5%) per (series, day). Bounded
    // mergeable state instead of the exact form's Expand + two-level
    // distinct aggregate, so a day's NDV rollup is one narrow pass and
    // sketches merge across segments/partitions. No oracle — sketch
    // algorithms differ across engines (same contract as
    // q_ts_percentile_approx); accuracy vs the exact twin is spec-pinned
    // in CoreSpec.
    // HLL++ NDV, gated on the ERROR-BOUND CONTRACT (r11 — was rows-only):
    // sketch estimates are engine-specific, but |approx − exact| ≤
    // max(1, 0.15·exact) (3× the default 5% rsd) is the checkable claim;
    // exact per-group NDV and point counts ride the hash.
    Q("q_ts_ndv_approx",
      (s, dir) =>
        ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"),
            (col("time") - pmod(col("time"), lit(86400L))).as("day"))
          .agg(
            approx_count_distinct(col("tag_user")).as("__a"),
            countDistinct(col("tag_user")).as("n_users"),
            count(lit(1)).as("n_points"))
          .select(col("series"), col("day"), col("n_users"), col("n_points"),
            (abs(col("__a") - col("n_users")).cast("double") <=
              greatest(lit(1.0), col("n_users") * 0.15)).as("ndv_ok"))
          .orderBy(col("series"), col("day")),
      Some(s"""$svSql
              |SELECT series, CAST(floor(time / 86400.0) AS BIGINT) * 86400 AS day,
              |       count(DISTINCT tag_user) AS n_users, count(*) AS n_points,
              |       true AS ndv_ok
              |FROM sv WHERE time >= $T0 AND time < $T1
              |GROUP BY series, day ORDER BY series, day""".stripMargin)),

    // Rolling trailing-3-day p95 per (series, day) from per-day t-digest
    // CELLS (operators.SketchWindows.rollingQuantiles): each day cell
    // explodes to its 3 trailing window offsets and merges by equi-join
    // key (series, target_day) — the temporal stencil analog of the
    // grid-DBSCAN 9-neighbor join; no range join, no raw-point rescan
    // per window. Error-bound contract (p95 within the exact
    // [q0.90, q1.0] window); exact rolling p95 and row counts ride the
    // hash. Leading-edge windows are partial by contract (n_days < 3).
    Q("q_ts_rolling_p95",
      (s, dir) => {
        val sv = Tables.seriesView(s, dir)
          .filter(col("time") >= T0 && col("time") < T1)
          .withColumn("day", col("time") - pmod(col("time"), lit(86400L)))
        val cells = sv.groupBy(col("series"), col("day"))
          .agg(graft.functions.TDigest.agg(col("value")).as("td"))
        val rolled = graft.operators.SketchWindows.rollingQuantiles(cells, 3)
        val bounds = sv
          .withColumn("__off", explode(array(lit(0L), lit(86400L), lit(172800L))))
          .withColumn("target_day", col("day") + col("__off"))
          .groupBy(col("series"), col("target_day"))
          .agg(count(lit(1)).as("n"),
            percentile(col("value"), lit(0.90)).as("lo"),
            percentile(col("value"), lit(1.0)).as("hi"),
            (floor((percentile(col("value"), lit(0.95))) * 1e4 + 0.5) / 1e4).as("p95_exact"))
        rolled.join(bounds, Seq("series", "target_day"))
          .select(col("series"), col("target_day"), col("n_days"), col("n"),
            col("p95_exact"),
            (col("p95") >= col("lo") && col("p95") <= col("hi")).as("p95_ok"))
          .orderBy(col("series"), col("target_day"))
      },
      Some(s"""$svSql, svr AS (
              |  SELECT series, time - (time % 86400) AS day, value
              |  FROM sv WHERE time >= $T0 AND time < $T1),
              |days AS (SELECT DISTINCT series, day FROM svr),
              |nd AS (SELECT a.series, a.day AS target_day,
              |              CAST(count(*) AS BIGINT) AS n_days
              |       FROM days a JOIN days b ON a.series = b.series
              |         AND b.day BETWEEN a.day - 172800 AND a.day
              |       GROUP BY 1, 2),
              |w AS (SELECT d.series, d.day AS target_day, s.value
              |      FROM days d JOIN svr s ON s.series = d.series
              |        AND s.day BETWEEN d.day - 172800 AND d.day)
              |SELECT w.series, w.target_day, n_days,
              |       CAST(count(*) AS BIGINT) AS n,
              |       floor((quantile_cont(value, 0.95)) * 1e4 + 0.5) / 1e4 AS p95_exact,
              |       true AS p95_ok
              |FROM w JOIN nd ON w.series = nd.series AND w.target_day = nd.target_day
              |GROUP BY 1, 2, 3
              |ORDER BY 1, 2""".stripMargin),
      benchExtra = true),

    // Rolling trailing-3-day distinct users per (series, day) from the
    // SAME per-day HLL cells q_ts_hll_rollup stores — the sliding-window
    // read path of the sketch tier: each window is a merge of ≤3 KB-sized
    // blobs, never a raw re-count. Same stencil equi-join as
    // q_ts_rolling_p95; exact NDV and row counts ride the hash.
    Q("q_ts_rolling_ndv",
      (s, dir) => {
        val e = Tables.events(s, dir).select(
          col("event_type").as("series"), col("user_id"),
          (col("ts") / lit(1000000000L)).cast("long").as("time"))
          .filter(col("time") >= T0 && col("time") < T1)
          .withColumn("day", col("time") - pmod(col("time"), lit(86400L)))
        val cells = graft.functions.Approx.hllCells(
          e, col("user_id"), Seq(col("series"), col("day")))
        val rolled = graft.operators.SketchWindows.rollingNdv(cells, 3)
        val exact = e
          .withColumn("__off", explode(array(lit(0L), lit(86400L), lit(172800L))))
          .withColumn("target_day", col("day") + col("__off"))
          .groupBy(col("series"), col("target_day"))
          .agg(countDistinct(col("user_id")).as("n_users"))
        rolled.join(exact, Seq("series", "target_day"))
          .select(col("series"), col("target_day"), col("n_days"),
            col("n_rows"), col("n_users"),
            (abs(col("ndv_est") - col("n_users")) <=
              greatest(lit(1.0), col("n_users") * 0.10)).as("ndv_ok"))
          .orderBy(col("series"), col("target_day"))
      },
      Some(s"""WITH ev AS (
              |  SELECT event_type AS series, user_id,
              |         epoch_ns(ts) // 1000000000 -
              |           (epoch_ns(ts) // 1000000000) % 86400 AS day
              |  FROM events
              |  WHERE epoch_ns(ts) // 1000000000 >= $T0
              |    AND epoch_ns(ts) // 1000000000 < $T1),
              |days AS (SELECT DISTINCT series, day FROM ev),
              |nd AS (SELECT a.series, a.day AS target_day,
              |              CAST(count(*) AS BIGINT) AS n_days
              |       FROM days a JOIN days b ON a.series = b.series
              |         AND b.day BETWEEN a.day - 172800 AND a.day
              |       GROUP BY 1, 2),
              |w AS (SELECT d.series, d.day AS target_day, e.user_id
              |      FROM days d JOIN ev e ON e.series = d.series
              |        AND e.day BETWEEN d.day - 172800 AND d.day)
              |SELECT w.series, w.target_day, n_days,
              |       CAST(count(*) AS BIGINT) AS n_rows,
              |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              |       true AS ndv_ok
              |FROM w JOIN nd ON w.series = nd.series AND w.target_day = nd.target_day
              |GROUP BY 1, 2, 3
              |ORDER BY 1, 2""".stripMargin),
      benchExtra = true),

    // At-rest HLL sketch rollup (Approx.hllCells/hllMergeNdv — DataSketches
    // HLL via Spark's hll_sketch_agg family): build one serialized sketch
    // per (series, day) cell over RAW user_id (full cardinality, not the
    // 8-way tag), WRITE the cells to parquet, read the blobs back and
    // union per series for the whole-range NDV. The composition under
    // test is store → merge — the piece q_ts_ndv_approx (one-shot HLL++)
    // doesn't cover, and the reason a 100 TB NDV dashboard reads KB-sized
    // sketch blobs instead of rescanning points. Error-bound contract
    // (lgK=12 ⇒ rse≈1.6%; 10% leaves >5σ): exact NDV and point counts
    // ride the hash.
    Q("q_ts_hll_rollup",
      (s, dir) => {
        val e = Tables.events(s, dir).select(
          col("event_type").as("series"), col("user_id"),
          (col("ts") / lit(1000000000L)).cast("long").as("time"))
          .filter(col("time") >= T0 && col("time") < T1)
        val cells = graft.functions.Approx.hllCells(
          e, col("user_id"),
          Seq(col("series"), (col("time") - pmod(col("time"), lit(86400L))).as("day")))
        val path = s"target/gate-tmp/hllroll-${dir.replace('/', '_')}/cells"
        cells.write.mode("overwrite").parquet(path)
        val merged = graft.functions.Approx.hllMergeNdv(
          s.read.parquet(path), Seq(col("series")))
        val exact = e.groupBy(col("series")).agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_points"))
        merged.join(exact, "series")
          .select(col("series"), col("n_users"), col("n_points"),
            (col("n_rows") === col("n_points")).as("rows_ok"),
            (abs(col("ndv_est") - col("n_users")) <=
              greatest(lit(1.0), col("n_users") * 0.10)).as("ndv_ok"))
          .orderBy(col("series"))
      },
      Some(s"""SELECT event_type AS series,
              |       count(DISTINCT user_id) AS n_users,
              |       count(*) AS n_points,
              |       true AS rows_ok, true AS ndv_ok
              |FROM events
              |WHERE epoch_ns(ts) // 1000000000 >= $T0
              |  AND epoch_ns(ts) // 1000000000 < $T1
              |GROUP BY event_type ORDER BY series""".stripMargin),
      benchExtra = true),

    // Theta-sketch set algebra (graft.functions.ThetaSketch — custom
    // TypedImperativeAggregate over DataSketches theta): per-series
    // distinct-user sketches, then pairwise INTERSECTION / UNION /
    // A-NOT-B estimates across all series pairs — the set operations the
    // HLL tier cannot express ("users who did BOTH signup and purchase"
    // from stored KB blobs, no distinct-join over raw rows). The pair
    // frame is series-cardinality (tiny); the only fact-sized work is
    // one sketch aggregate. Error-bound contract: |est − exact| ≤
    // max(1, 0.15·exact) per op (theta runs EXACT below 2^lgK distinct);
    // exact per-pair counts ride the hash.
    Q("q_ts_theta_pairs",
      (s, dir) => {
        val e = Tables.events(s, dir).select(
          col("event_type").as("series"), col("user_id"),
          (col("ts") / lit(1000000000L)).cast("long").as("time"))
          .filter(col("time") >= T0 && col("time") < T1)
          .select(col("series"), col("user_id"))
        val sk = e.groupBy(col("series")).agg(
          graft.functions.ThetaSketch.agg(col("user_id")).as("sk"),
          countDistinct(col("user_id")).as("n"))
        val a = sk.select(col("series").as("series_a"), col("sk").as("ska"),
          col("n").as("n_a"))
        val b = sk.select(col("series").as("series_b"), col("sk").as("skb"),
          col("n").as("n_b"))
        val ua = e.distinct()
        val exact = ua.as("x").join(ua.as("y"),
            col("x.user_id") === col("y.user_id") &&
              col("x.series") < col("y.series"))
          .groupBy(col("x.series").as("series_a"), col("y.series").as("series_b"))
          .agg(count(lit(1)).as("n_both"))
        val tol = (est: org.apache.spark.sql.Column, ex: org.apache.spark.sql.Column) =>
          abs(est - ex) <= greatest(lit(1.0), ex * 0.15)
        a.join(b, col("series_a") < col("series_b"))
          .join(exact, Seq("series_a", "series_b"))
          .select(col("series_a"), col("series_b"), col("n_a"), col("n_b"),
            col("n_both"),
            (col("n_a") + col("n_b") - col("n_both")).as("n_any"),
            tol(graft.functions.ThetaSketch.intersectEstimate(col("ska"), col("skb")),
              col("n_both")).as("both_ok"),
            tol(graft.functions.ThetaSketch.unionEstimate(col("ska"), col("skb")),
              col("n_a") + col("n_b") - col("n_both")).as("any_ok"),
            tol(graft.functions.ThetaSketch.aNotBEstimate(col("ska"), col("skb")),
              col("n_a") - col("n_both")).as("not_ok"))
          .orderBy(col("series_a"), col("series_b"))
      },
      Some(s"""WITH ua AS (
              |  SELECT DISTINCT event_type AS series, user_id FROM events
              |  WHERE epoch_ns(ts) // 1000000000 >= $T0
              |    AND epoch_ns(ts) // 1000000000 < $T1),
              |cnt AS (SELECT series, CAST(count(*) AS BIGINT) AS n FROM ua GROUP BY 1),
              |p AS (SELECT x.series AS sa, y.series AS sb,
              |             CAST(count(*) AS BIGINT) AS n_both
              |      FROM ua x JOIN ua y
              |        ON x.user_id = y.user_id AND x.series < y.series
              |      GROUP BY 1, 2)
              |SELECT sa AS series_a, sb AS series_b, ca.n AS n_a, cb.n AS n_b,
              |       n_both, ca.n + cb.n - n_both AS n_any,
              |       true AS both_ok, true AS any_ok, true AS not_ok
              |FROM p JOIN cnt ca ON sa = ca.series JOIN cnt cb ON sb = cb.series
              |ORDER BY 1, 2""".stripMargin),
      benchExtra = true),

    // ---- event analytics: funnel ----------------------------------------
    //
    // Ordered 3-step funnel signup → click → purchase per user: t1 = first
    // signup, t2 = first click at-or-after t1, t3 = first purchase
    // at-or-after t2. Three chained partial+final MIN aggregates, each over
    // the events PRE-FILTERED to one step's type, joined on user_id — the
    // scalable funnel shape (no per-user event buffering, no window over
    // a whole user history; each step's frame is user-dimension-sized and
    // co-partitions on user_id with the next step's aggregate).
    Q("q_ev_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("ts") >= col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("ts") >= col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
          .select(col("user_id"),
            (col("t1") / 1000000000L).cast("long").as("t1s"),
            (col("t2") / 1000000000L).cast("long").as("t2s"),
            (col("t3") / 1000000000L).cast("long").as("t3s"),
            (lit(1L) + col("t2").isNotNull.cast("long")
              + col("t3").isNotNull.cast("long")).as("stage"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tn FROM events),
             |s1 AS (SELECT user_id, min(tn) AS t1 FROM e
             |       WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(tn) AS t2 FROM e JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND tn >= t1 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(tn) AS t3 FROM e JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND tn >= t2 GROUP BY 1)
             |SELECT s1.user_id,
             |       t1 // 1000000000 AS t1s,
             |       t2 // 1000000000 AS t2s,
             |       t3 // 1000000000 AS t3s,
             |       1 + CAST(t2 IS NOT NULL AS BIGINT)
             |         + CAST(t3 IS NOT NULL AS BIGINT) AS stage
             |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // ---- event analytics: cohort retention ------------------------------
    //
    // Cohort = first-seen day per user; retention cell (cohort_day, k) =
    // distinct users from that cohort active k days later (k ≤ 7), with
    // the day-0 cohort size alongside for the rate. One distinct
    // (user, day) pass, one MIN per user, one equi-join on user_id — every
    // frame after the distinct is user-dimension-sized.
    Q("q_ev_retention",
      (s, dir) => {
        // distinct (user, active-day) then first day per user
        val days = Tables.events(s, dir)
          .select(col("user_id"),
            ((col("ts") / 1000000000L).cast("long") / 86400L).cast("long").as("day"))
          .distinct()
        val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cday"))
        val cells = days.join(cohort, "user_id")
          .filter(col("day") - col("cday") <= 7)
          .groupBy(col("cday"), (col("day") - col("cday")).as("k"))
          .agg(count(lit(1)).as("n_users"))
        val sizes = cohort.groupBy(col("cday")).agg(count(lit(1)).as("cohort_n"))
        cells.join(sizes, "cday")
          .select(col("cday"), col("k"), col("n_users"), col("cohort_n"),
            (floor(col("n_users") / col("cohort_n") * 1e4 + 0.5) / 1e4).as("rate"))
          .orderBy(col("cday"), col("k"))
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id,
             |         (epoch_ns(ts) // 1000000000) // 86400 AS day
             |  FROM events),
             |cohort AS (SELECT user_id, min(day) AS cday FROM days GROUP BY 1),
             |cells AS (
             |  SELECT cday, day - cday AS k, count(*) AS n_users
             |  FROM days JOIN cohort USING (user_id)
             |  WHERE day - cday <= 7 GROUP BY 1, 2),
             |sizes AS (SELECT cday, count(*) AS cohort_n FROM cohort GROUP BY 1)
             |SELECT cday, k, n_users, cohort_n,
             |       floor(n_users / cohort_n * 1e4 + 0.5) / 1e4 AS rate
             |FROM cells JOIN sizes USING (cday)
             |ORDER BY cday, k""".stripMargin)),

    // ---- salted join (skew mitigation) ----------------------------------
    //
    // events joined to a per-event-type dimension through the 8-way
    // salted layout — the oracle is the PLAIN join (salting must be
    // output-invariant). The dim here derives from events itself so the
    // gate needs no extra fixture.
    Q("q_join_salted",
      (s, dir) => {
        val e = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
        val dim = e.select(col("series")).distinct()
          .withColumn("weight", length(col("series")).cast("double"))
        graft.operators.SaltedJoin.join(e, dim, "series", col("event_id"), 8)
          .groupBy(col("series"))
          .agg(
            (floor(sum(col("value") * col("weight")) * 1e4 + 0.5) / 1e4).as("wsum"),
            count(lit(1)).as("n"))
          .orderBy("series")
      },
      Some(s"""$svSql,
              |d AS (SELECT DISTINCT series, CAST(len(series) AS DOUBLE) AS weight
              |      FROM sv WHERE time >= $T0 AND time < $T1)
              |SELECT sv.series AS series,
              |       floor(sum(value * weight) * 1e4 + 0.5) / 1e4 AS wsum,
              |       count(*) AS n
              |FROM sv JOIN d ON sv.series = d.series
              |WHERE time >= $T0 AND time < $T1
              |GROUP BY 1 ORDER BY sv.series""".stripMargin)),

    // ---- adaptive join (measured strategy pre-flight, r12) --------------
    //
    // Same fact/dim shape as q_join_salted, routed through
    // AdaptiveJoin.join: the dim is distinct-series-sized at every SF, so
    // the pre-flight measures it under the broadcast threshold and plans
    // the broadcast branch — the decision must be output-invariant, which
    // is why this gate shares the PLAIN-join oracle. PlanSpec pins the
    // other two branches (skewed fixture → salted layout, big-right
    // fixture → plain) from fixtures the gate tables can't express.
    Q("q_join_adaptive",
      (s, dir) => {
        val e = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
        val dim = e.select(col("series")).distinct()
          .withColumn("weight", length(col("series")).cast("double"))
        graft.operators.AdaptiveJoin.join(e, dim, Seq("series"),
            spread = col("event_id"))
          .groupBy(col("series"))
          .agg(
            (floor(sum(col("value") * col("weight")) * 1e4 + 0.5) / 1e4).as("wsum"),
            count(lit(1)).as("n"))
          .orderBy("series")
      },
      Some(s"""$svSql,
              |d AS (SELECT DISTINCT series, CAST(len(series) AS DOUBLE) AS weight
              |      FROM sv WHERE time >= $T0 AND time < $T1)
              |SELECT sv.series AS series,
              |       floor(sum(value * weight) * 1e4 + 0.5) / 1e4 AS wsum,
              |       count(*) AS n
              |FROM sv JOIN d ON sv.series = d.series
              |WHERE time >= $T0 AND time < $T1
              |GROUP BY 1 ORDER BY sv.series""".stripMargin),
      benchExtra = true),

    // ---- SCD2 intervals (gaps-and-islands) ------------------------------
    //
    // Type-2 effective-dated history per user: runs of consecutive
    // identical event_type collapse to [eff_from, eff_to) intervals,
    // eff_to = the next run's start (NULL while current). One user-keyed
    // window pass (user histories are bounded — the sessionize stance)
    // plus a per-run aggregate.
    Q("q_ev_scd2",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"),
          col("event_type"), (col("ts") / 1000000000L).cast("long").as("tsec"),
          col("event_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
        val runs = e
          .withColumn("__chg",
            when(lag(col("event_type"), 1).over(w).isNull ||
              lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
              .otherwise(0L))
          .withColumn("__grp", sum(col("__chg")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val iv = runs.groupBy(col("user_id"), col("__grp"))
          .agg(first(col("event_type")).as("event_type"),
            min(col("tsec")).as("eff_from"),
            count(lit(1)).as("n_events"))
        val w2 = Window.partitionBy(col("user_id")).orderBy(col("__grp"))
        iv.withColumn("eff_to", lead(col("eff_from"), 1).over(w2))
          .select("user_id", "event_type", "eff_from", "eff_to", "n_events")
          .orderBy("user_id", "eff_from")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         epoch_ns(ts) // 1000000000 AS tsec, event_id
             |  FROM events),
             |r AS (
             |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
             |                   OR lag(event_type) OVER w <> event_type
             |                 THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
             |g AS (
             |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY tsec, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS grp
             |  FROM r),
             |iv AS (
             |  SELECT user_id, grp, first(event_type ORDER BY tsec, event_id) AS event_type,
             |         min(tsec) AS eff_from, count(*) AS n_events
             |  FROM g GROUP BY 1, 2)
             |SELECT user_id, event_type, eff_from,
             |       lead(eff_from) OVER (PARTITION BY user_id ORDER BY grp) AS eff_to,
             |       n_events
             |FROM iv ORDER BY user_id, eff_from""".stripMargin)),

    // ---- JSON property extraction ---------------------------------------
    //
    // events.props is a JSON string column. Two extraction paths must
    // agree: get_json_object (the ad-hoc path probe) and from_json with
    // an explicit schema (the 100 TB path — one parse to a typed struct,
    // codegen'd downstream; an implicit schema-inference pass over
    // petabytes is never acceptable). n_mismatch pins their agreement
    // inside the gate itself.
    Q("q_ev_json",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val e = Tables.events(s, dir)
        val kPath = get_json_object(col("props"), "$.k").cast("long")
        val kTyped = from_json(col("props"),
          StructType(Seq(StructField("k", LongType)))).getField("k")
        e.select(col("event_type"), kPath.as("kp"), kTyped.as("kt"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            (floor(avg(col("kt")) * 1e4 + 0.5) / 1e4).as("avg_k"),
            max(col("kt")).as("max_k"),
            sum(when(col("kp") =!= col("kt") ||
              col("kp").isNull =!= col("kt").isNull, 1L).otherwise(0L)).as("n_mismatch"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |       floor(avg(CAST(props->>'k' AS BIGINT)) * 1e4 + 0.5) / 1e4 AS avg_k,
             |       max(CAST(props->>'k' AS BIGINT)) AS max_k,
             |       CAST(0 AS BIGINT) AS n_mismatch
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ---- calendar decomposition -----------------------------------------
    //
    // dow×hour activity heatmap (the classic ops dashboard): calendar
    // functions under the pinned UTC session zone. Spark's dayofweek is
    // 1=Sunday; DuckDB's is 0=Sunday — normalized to 0=Sunday here, the
    // kind of off-by-one that must live in the gate, not in user code.
    Q("q_ev_time_parts",
      (s, dir) => {
        val t = timestamp_seconds((col("ts") / 1000000000L).cast("long"))
        Tables.events(s, dir)
          .select(year(t).cast("long").as("y"), month(t).cast("long").as("m"),
            (dayofweek(t) - 1).cast("long").as("dow"),
            hour(t).cast("long").as("hr"), col("value"))
          .groupBy("y", "m", "dow", "hr")
          .agg(count(lit(1)).as("n"),
            (floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("avg_value"))
          .orderBy("y", "m", "dow", "hr")
      },
      Some("""WITH e AS (
             |  SELECT to_timestamp(epoch_ns(ts) // 1000000000) AT TIME ZONE 'UTC' AS t,
             |         value
             |  FROM events)
             |SELECT CAST(year(t) AS BIGINT) AS y, CAST(month(t) AS BIGINT) AS m,
             |       CAST(dayofweek(t) AS BIGINT) AS dow,
             |       CAST(hour(t) AS BIGINT) AS hr,
             |       count(*) AS n,
             |       floor(avg(value) * 1e4 + 0.5) / 1e4 AS avg_value
             |FROM e GROUP BY 1, 2, 3, 4 ORDER BY y, m, dow, hr""".stripMargin)),

    // ---- event path analysis: Markov transition matrix -------------------
    //
    // (src → dst) next-event transition counts and probabilities per user
    // stream: one user-keyed window pass (lead) — user histories are
    // bounded, the sessionize stance — then a channel²-sized aggregate.
    // The per-src probability is a second tiny aggregate joined back, NOT
    // a window over the transition frame (the frame is small, but the
    // shape generalizes: partial+final count, broadcast-sized divisor).
    Q("q_ev_transitions",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"),
          col("event_type"), (col("ts") / 1000000000L).cast("long").as("tsec"),
          col("event_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
        val pairs = e.withColumn("dst", lead(col("event_type"), 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy(col("event_type").as("src"), col("dst"))
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy(col("src")).agg(sum(col("n")).as("tot"))
        pairs.join(totals, "src")
          .select(col("src"), col("dst"), col("n"),
            (floor(col("n") / col("tot") * 1e4 + 0.5) / 1e4).as("p"))
          .orderBy(col("src"), col("dst"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         epoch_ns(ts) // 1000000000 AS tsec, event_id
             |  FROM events),
             |pairs AS (
             |  SELECT event_type AS src,
             |         lead(event_type) OVER (PARTITION BY user_id
             |                                ORDER BY tsec, event_id) AS dst
             |  FROM e),
             |cnt AS (SELECT src, dst, count(*) AS n FROM pairs
             |        WHERE dst IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT src, sum(n) AS tot FROM cnt GROUP BY 1)
             |SELECT src, dst, n, floor(n / tot * 1e4 + 0.5) / 1e4 AS p
             |FROM cnt JOIN tot USING (src) ORDER BY src, dst""".stripMargin),
      benchExtra = true),

    // ---- conversion attribution: first-touch vs last-touch ---------------
    //
    // For each purchase, credit (a) the user's first event ever
    // (first-touch) and (b) the most recent preceding non-purchase event
    // (last-touch). Both are one user-keyed window pass; the union+sum at
    // the end keeps a single channel-sized frame instead of a full outer
    // join of two aggregates. last_value(... IGNORE NULLS) over
    // [-inf, -1] is the carry-forward trick fill_forward already uses.
    Q("q_ev_attribution",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"),
          col("event_type"), (col("ts") / 1000000000L).cast("long").as("tsec"),
          col("event_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
        val conv = e
          .withColumn("first_ch", first(col("event_type")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("last_ch", last(
            when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .filter(col("event_type") === "purchase")
        val credits = conv.select(col("first_ch").as("channel"),
            lit(1L).as("nf"), lit(0L).as("nl"))
          .unionAll(conv.filter(col("last_ch").isNotNull)
            .select(col("last_ch").as("channel"), lit(0L).as("nf"), lit(1L).as("nl")))
        credits.groupBy(col("channel"))
          .agg(sum(col("nf")).as("n_first"), sum(col("nl")).as("n_last"))
          .orderBy(col("channel"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         epoch_ns(ts) // 1000000000 AS tsec, event_id
             |  FROM events),
             |conv AS (
             |  SELECT first_value(event_type) OVER w AS first_ch,
             |         last_value(CASE WHEN event_type <> 'purchase'
             |                         THEN event_type END IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY tsec, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |           AS last_ch,
             |         event_type
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |p AS (SELECT * FROM conv WHERE event_type = 'purchase'),
             |credits AS (
             |  SELECT first_ch AS channel, 1 AS nf, 0 AS nl FROM p
             |  UNION ALL
             |  SELECT last_ch, 0, 1 FROM p WHERE last_ch IS NOT NULL)
             |SELECT channel, CAST(sum(nf) AS BIGINT) AS n_first,
             |       CAST(sum(nl) AS BIGINT) AS n_last
             |FROM credits GROUP BY 1 ORDER BY channel""".stripMargin),
      benchExtra = true),

    // ---- distribution entropy per series-day -----------------------------
    //
    // Shannon entropy (bits) of the 10-bin value histogram per (series,
    // day) — the flatness probe (low entropy = values collapsing to few
    // levels, a sensor-failure signature). Same per-series bounds + bin
    // shape as q_ts_psi; one (series, day, bin) partial+final count, a
    // day-sized aggregate after.
    Q("q_ts_entropy",
      (s, dir) => {
        val e = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .select(col("series"), (col("time") / 86400L).cast("long").as("day"), col("value"))
        val bounds = e.groupBy("series")
          .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        e.join(broadcast(bounds), "series")
          .select(col("series"), col("day"),
            least(lit(9L), floor((col("value") - col("lo")) /
              ((col("hi") - col("lo")) / 10.0)).cast("long")).as("bin"))
          .groupBy("series", "day", "bin").agg(count(lit(1)).as("n"))
          .groupBy("series", "day")
          .agg(sum(col("n")).as("total"),
            sum(col("n") * log(2.0, col("n"))).as("nlogn"))
          .select(col("series"), col("day"), col("total").as("n_points"),
            (floor((log(2.0, col("total")) - col("nlogn") / col("total"))
              * 1e4 + 0.5) / 1e4).as("entropy"))
          .orderBy("series", "day")
      },
      Some(s"""$svSql,
              |e AS (SELECT series, time // 86400 AS day, value FROM sv
              |      WHERE time >= $T0 AND time < $T1),
              |bounds AS (SELECT series, min(value) AS lo, max(value) AS hi
              |           FROM e GROUP BY 1),
              |binned AS (
              |  SELECT e.series, day,
              |         least(9, CAST(floor((value - lo) / ((hi - lo) / 10.0)) AS BIGINT)) AS bin,
              |         count(*) AS n
              |  FROM e JOIN bounds ON e.series = bounds.series
              |  GROUP BY 1, 2, 3)
              |SELECT series, day, CAST(sum(n) AS BIGINT) AS n_points,
              |       floor((log2(sum(n)) - sum(n * log2(n)) / sum(n)) * 1e4 + 0.5) / 1e4 AS entropy
              |FROM binned GROUP BY 1, 2 ORDER BY series, day""".stripMargin),
      benchExtra = true),

    // ---- time-to-convert percentiles ------------------------------------
    //
    // Distribution of signup→purchase latency per user (the funnel's
    // t3−t1), summarized as exact p50/p90 + mean — the "how long does
    // conversion take" product metric. Reuses the funnel's chained
    // min-at-or-after aggregates; the percentile runs on the converted-
    // users frame (user-dimension-sized).
    Q("q_ev_time_to_convert",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            (col("ts") / 1000000000L).cast("long").as("tsec"))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("tsec")).as("t1"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s1, "user_id").filter(col("tsec") >= col("t1"))
          .groupBy("user_id").agg(min(col("tsec")).as("t3"))
        s1.join(s3, "user_id")
          .select((col("t3") - col("t1")).as("latency"))
          .agg(count(lit(1)).as("n_converted"),
            (floor(percentile(col("latency"), lit(0.5)) * 1e4 + 0.5) / 1e4).as("p50"),
            (floor(percentile(col("latency"), lit(0.9)) * 1e4 + 0.5) / 1e4).as("p90"),
            (floor(avg(col("latency")) * 1e4 + 0.5) / 1e4).as("mean_s"))
      },
      Some("""WITH e AS (SELECT user_id, event_type,
             |                  epoch_ns(ts) // 1000000000 AS tsec FROM events),
             |s1 AS (SELECT user_id, min(tsec) AS t1 FROM e
             |       WHERE event_type = 'signup' GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(tsec) AS t3 FROM e JOIN s1 USING (user_id)
             |       WHERE event_type = 'purchase' AND tsec >= t1 GROUP BY 1),
             |lat AS (SELECT t3 - t1 AS latency FROM s1 JOIN s3 USING (user_id))
             |SELECT count(*) AS n_converted,
             |       floor(quantile_cont(latency, 0.5) * 1e4 + 0.5) / 1e4 AS p50,
             |       floor(quantile_cont(latency, 0.9) * 1e4 + 0.5) / 1e4 AS p90,
             |       floor(avg(latency) * 1e4 + 0.5) / 1e4 AS mean_s
             |FROM lat""".stripMargin),
      benchExtra = true),

    // ---- forecast backtest (model selection) -----------------------------
    //
    // Walk-forward evaluation of three baseline forecasters per series —
    // train on days 1–5 of the canonical window, score MAPE on day 6's
    // hourly buckets: mean (train average), last (final train bucket),
    // seasonal-naive (same hour yesterday). The winner column is the
    // model-selection output a forecasting pipeline keys on. Every model
    // here is closed-form, so the oracle replays the whole backtest; the
    // recurrence models (Holt) keep their own gates. Shape: one bucket
    // rollup, series-sized model frames, one holdout join per model.
    Q("q_ts_backtest",
      (s, dir) => {
        val split = T0 + 5 * 86400L
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T0 + 6 * 86400L)
          .groupBy(col("series"),
            (col("time") - pmod(col("time"), lit(3600L))).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
        val train = b.filter(col("bucket") < split)
        val hold = b.filter(col("bucket") >= split)
        val mMean = train.groupBy("series")
          .agg((floor(avg(col("v")) * 1e6 + 0.5) / 1e6).as("f_mean"))
        val mLast = train.groupBy("series")
          .agg(max_by(col("v"), col("bucket")).as("f_last"))
        val seas = b.select(col("series"), (col("bucket") + 86400L).as("bucket"),
          col("v").as("f_seas"))
        val err = hold
          .join(broadcast(mMean), "series")
          .join(broadcast(mLast), "series")
          .join(seas, Seq("series", "bucket"))
          .filter(col("v") =!= 0.0)
          .groupBy("series")
          .agg(count(lit(1)).as("n_hold"),
            (floor(avg(abs(col("f_mean") - col("v")) / abs(col("v"))) * 1e4 + 0.5) / 1e4).as("mape_mean"),
            (floor(avg(abs(col("f_last") - col("v")) / abs(col("v"))) * 1e4 + 0.5) / 1e4).as("mape_last"),
            (floor(avg(abs(col("f_seas") - col("v")) / abs(col("v"))) * 1e4 + 0.5) / 1e4).as("mape_seasonal"))
        err.withColumn("winner",
            when(col("mape_seasonal") <= col("mape_last") &&
              col("mape_seasonal") <= col("mape_mean"), lit("seasonal"))
              .when(col("mape_last") <= col("mape_mean"), lit("last"))
              .otherwise(lit("mean")))
          .orderBy("series")
      },
      Some(s"""$svSql,
              |b AS (
              |  SELECT series, time - (time % 3600) AS bucket,
              |         floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |  FROM sv WHERE time >= $T0 AND time < ${T0 + 6 * 86400L}
              |  GROUP BY 1, 2),
              |train AS (SELECT * FROM b WHERE bucket < ${T0 + 5 * 86400L}),
              |hold AS (SELECT * FROM b WHERE bucket >= ${T0 + 5 * 86400L}),
              |mm AS (SELECT series, floor(avg(v) * 1e6 + 0.5) / 1e6 AS f_mean
              |       FROM train GROUP BY 1),
              |ml AS (SELECT series, arg_max(v, bucket) AS f_last FROM train GROUP BY 1),
              |se AS (SELECT series, bucket + 86400 AS bucket, v AS f_seas FROM b),
              |err AS (
              |  SELECT hold.series, count(*) AS n_hold,
              |         floor(avg(abs(f_mean - v) / abs(v)) * 1e4 + 0.5) / 1e4 AS mape_mean,
              |         floor(avg(abs(f_last - v) / abs(v)) * 1e4 + 0.5) / 1e4 AS mape_last,
              |         floor(avg(abs(f_seas - v) / abs(v)) * 1e4 + 0.5) / 1e4 AS mape_seasonal
              |  FROM hold
              |  JOIN mm ON hold.series = mm.series
              |  JOIN ml ON hold.series = ml.series
              |  JOIN se ON hold.series = se.series AND hold.bucket = se.bucket
              |  WHERE v <> 0.0 GROUP BY 1)
              |SELECT series, n_hold, mape_mean, mape_last, mape_seasonal,
              |       CASE WHEN mape_seasonal <= mape_last
              |              AND mape_seasonal <= mape_mean THEN 'seasonal'
              |            WHEN mape_last <= mape_mean THEN 'last'
              |            ELSE 'mean' END AS winner
              |FROM err ORDER BY series""".stripMargin),
      benchExtra = true),

    // ---- ensemble anomaly vote -------------------------------------------
    //
    // Majority vote of three detectors over hourly bucket averages per
    // series: global z-score (|z| ≥ 2.5, population σ), Tukey fences
    // (1.5×IQR on exact quartiles), and MAD-z (≥ 3, 1.4826 scale). A
    // point is anomalous when ≥ 2 detectors agree — the ensemble screen
    // that kills single-detector false positives. Stats frames are
    // series-sized broadcasts; the vote rides the bucket rollup.
    Q("q_ts_anomaly_vote",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"),
            (col("time") - pmod(col("time"), lit(3600L))).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
        val stats = b.groupBy("series").agg(
          avg(col("v")).as("mu"), stddev_pop(col("v")).as("sd"),
          percentile(col("v"), lit(0.25)).as("q1"),
          percentile(col("v"), lit(0.75)).as("q3"),
          percentile(col("v"), lit(0.5)).as("med"))
        val mad = b.join(broadcast(stats.select(col("series"), col("med"))), "series")
          .groupBy("series")
          .agg(percentile(abs(col("v") - col("med")), lit(0.5)).as("mad"))
        val scored = b.join(broadcast(stats), "series").join(broadcast(mad), "series")
          .withColumn("z_flag",
            (abs(col("v") - col("mu")) / col("sd") >= 2.5).cast("long"))
          .withColumn("tukey_flag",
            (col("v") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
              col("v") > col("q3") + lit(1.5) * (col("q3") - col("q1"))).cast("long"))
          .withColumn("mad_flag",
            (abs(col("v") - col("med")) / (lit(1.4826) * col("mad")) >= 3.0).cast("long"))
          .withColumn("votes", col("z_flag") + col("tukey_flag") + col("mad_flag"))
        scored.filter(col("votes") >= 1)
          .select(col("series"), col("bucket"), col("v"),
            col("z_flag"), col("tukey_flag"), col("mad_flag"), col("votes"),
            (col("votes") >= 2).as("anomaly"))
          .orderBy("series", "bucket")
      },
      Some(s"""$svSql,
              |b AS (
              |  SELECT series, time - (time % 3600) AS bucket,
              |         floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |  FROM sv WHERE time >= $T0 AND time < $T1 GROUP BY 1, 2),
              |st AS (
              |  SELECT series, avg(v) AS mu, stddev_pop(v) AS sd,
              |         quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3,
              |         quantile_cont(v, 0.5) AS med
              |  FROM b GROUP BY 1),
              |md AS (
              |  SELECT b.series, quantile_cont(abs(v - med), 0.5) AS mad
              |  FROM b JOIN st ON b.series = st.series GROUP BY 1),
              |scored AS (
              |  SELECT b.series, bucket, v,
              |         CAST(abs(v - mu) / sd >= 2.5 AS BIGINT) AS z_flag,
              |         CAST(v < q1 - 1.5 * (q3 - q1)
              |              OR v > q3 + 1.5 * (q3 - q1) AS BIGINT) AS tukey_flag,
              |         CAST(abs(v - med) / (1.4826 * mad) >= 3.0 AS BIGINT) AS mad_flag
              |  FROM b JOIN st ON b.series = st.series JOIN md ON b.series = md.series)
              |SELECT series, bucket, v, z_flag, tukey_flag, mad_flag,
              |       z_flag + tukey_flag + mad_flag AS votes,
              |       z_flag + tukey_flag + mad_flag >= 2 AS anomaly
              |FROM scored WHERE z_flag + tukey_flag + mad_flag >= 1
              |ORDER BY series, bucket""".stripMargin),
      benchExtra = true),

    // ---- cohort LTV curve ------------------------------------------------
    //
    // Cumulative value per (cohort day, days-since-signup) — the revenue
    // triangle behind lifetime-value projection: cohort = first-seen day,
    // cell (cday, k) = Σ value from that cohort within k days, cumulative
    // over k, per-user normalized. Same frames as q_ev_retention (one
    // user-MIN, one equi-join), plus a cohort-keyed running sum over the
    // ≤8-cell-per-cohort rollup.
    Q("q_ev_cohort_ltv",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"), col("value"),
          (((col("ts") / 1000000000L).cast("long")) / 86400L).cast("long").as("day"))
        val cohort = e.groupBy("user_id").agg(min(col("day")).as("cday"))
        val sizes = cohort.groupBy("cday").agg(count(lit(1)).as("n_users"))
        val cells = e.join(cohort, "user_id")
          .filter(col("day") - col("cday") <= 7)
          .groupBy(col("cday"), (col("day") - col("cday")).as("k"))
          .agg((floor(sum(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
        val w = Window.partitionBy(col("cday")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells.withColumn("cum_v", floor(sum(col("v")).over(w) * 1e4 + 0.5) / 1e4)
          .join(broadcast(sizes), "cday")
          .select(col("cday"), col("k"), col("v"), col("cum_v"), col("n_users"),
            (floor(col("cum_v") / col("n_users") * 1e4 + 0.5) / 1e4).as("ltv_per_user"))
          .orderBy("cday", "k")
      },
      Some("""WITH e AS (
             |  SELECT user_id, value,
             |         (epoch_ns(ts) // 1000000000) // 86400 AS day
             |  FROM events),
             |cohort AS (SELECT user_id, min(day) AS cday FROM e GROUP BY 1),
             |sizes AS (SELECT cday, count(*) AS n_users FROM cohort GROUP BY 1),
             |cells AS (
             |  SELECT cday, day - cday AS k,
             |         floor(sum(value) * 1e4 + 0.5) / 1e4 AS v
             |  FROM e JOIN cohort USING (user_id)
             |  WHERE day - cday <= 7 GROUP BY 1, 2),
             |cum AS (
             |  SELECT *, floor(sum(v) OVER (PARTITION BY cday ORDER BY k
             |                               ROWS UNBOUNDED PRECEDING) * 1e4 + 0.5) / 1e4 AS cum_v
             |  FROM cells)
             |SELECT cday, k, v, cum_v, n_users,
             |       floor(cum_v / n_users * 1e4 + 0.5) / 1e4 AS ltv_per_user
             |FROM cum JOIN sizes USING (cday)
             |ORDER BY cday, k""".stripMargin),
      benchExtra = true),

    // ---- block-jackknife standard error ----------------------------------
    //
    // Delete-one-DAY jackknife of each series' mean over the canonical
    // window: leave-one-block-out means from per-day (sum, n) partials —
    // uncertainty quantification that respects within-day autocorrelation
    // (iid-row formulas understate the SE of correlated series). Per-day
    // sums are pre-rounded 1e-6 (engine sum-order; the whiten stance);
    // everything after is arithmetic over ~7 values per series. One
    // (series, day) partial+final pass — the only data-sized work.
    Q("q_ts_jackknife",
      (s, dir) => {
        val d = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"), (col("time") / 86400L).cast("long").as("day"))
          .agg((floor(sum(col("value")) * 1e6 + 0.5) / 1e6).as("sd"),
            count(lit(1)).as("nd"))
        val tot = d.groupBy("series")
          .agg(sum(col("sd")).as("st"), sum(col("nd")).as("nt"),
            count(lit(1)).as("k"))
        d.join(tot, "series")
          .select(col("series"), col("k"),
            (col("st") / col("nt")).as("mean_full"),
            ((col("st") - col("sd")) / (col("nt") - col("nd"))).as("mean_i"))
          .withColumn("avg_mi",
            avg(col("mean_i")).over(Window.partitionBy(col("series"))))
          .groupBy("series")
          .agg(max(col("k")).as("n_blocks"),
            (floor(max(col("mean_full")) * 1e6 + 0.5) / 1e6).as("mean"),
            (floor(sqrt((max(col("k")) - lit(1.0)) / max(col("k"))
              * sum(pow(col("mean_i") - col("avg_mi"), 2)))
              * 1e6 + 0.5) / 1e6).as("se_jack"))
          .orderBy("series")
      },
      Some(s"""$svSql,
              |d AS (
              |  SELECT series, time // 86400 AS day,
              |         floor(sum(value) * 1e6 + 0.5) / 1e6 AS sd,
              |         count(*) AS nd
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY 1, 2),
              |tot AS (SELECT series, sum(sd) AS st, sum(nd) AS nt, count(*) AS k
              |        FROM d GROUP BY 1),
              |m AS (
              |  SELECT d.series, k, st / nt AS mean_full,
              |         (st - sd) / (nt - nd) AS mean_i
              |  FROM d JOIN tot ON d.series = tot.series)
              |SELECT series, CAST(max(k) AS BIGINT) AS n_blocks,
              |       floor(max(mean_full) * 1e6 + 0.5) / 1e6 AS mean,
              |       floor(sqrt((max(k) - 1.0) / max(k)
              |           * sum(pow(mean_i - avg_mi, 2))) * 1e6 + 0.5) / 1e6 AS se_jack
              |FROM (SELECT *, avg(mean_i) OVER (PARTITION BY series) AS avg_mi FROM m)
              |GROUP BY series ORDER BY series""".stripMargin),
      benchExtra = true),

    // ---- SLA / downtime rollup -------------------------------------------
    //
    // Per series over the canonical window: dark time = Σ(gap − 600s)
    // over inter-point gaps exceeding the 10-minute heartbeat, longest
    // gap, and uptime%. One series-keyed lag pass over points, then a
    // series-sized rollup — the ops SLA report the alerting gates
    // (q_ts_gaps/absent) feed.
    Q("q_ts_sla",
      (s, dir) => {
        val w = Window.partitionBy(col("series")).orderBy(col("time"), col("event_id"))
        val pts = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .withColumn("gap", col("time") - lag(col("time"), 1).over(w))
        pts.groupBy("series")
          .agg(count(lit(1)).as("n_points"),
            sum(when(col("gap") > 600L, col("gap") - 600L).otherwise(0L)).as("downtime_s"),
            max(col("gap")).as("max_gap_s"))
          .select(col("series"), col("n_points"), col("downtime_s"), col("max_gap_s"),
            (floor((lit(1.0) - col("downtime_s") / (T1 - T0).toDouble) * 1e6 + 0.5) / 1e6)
              .as("uptime"))
          .orderBy("series")
      },
      Some(s"""$svSql,
              |g AS (
              |  SELECT series,
              |         time - lag(time) OVER (PARTITION BY series
              |                                ORDER BY time, event_id) AS gap
              |  FROM sv WHERE time >= $T0 AND time < $T1)
              |SELECT series, count(*) AS n_points,
              |       CAST(sum(CASE WHEN gap > 600 THEN gap - 600 ELSE 0 END) AS BIGINT) AS downtime_s,
              |       max(gap) AS max_gap_s,
              |       floor((1.0 - sum(CASE WHEN gap > 600 THEN gap - 600 ELSE 0 END)
              |              / ${(T1 - T0).toDouble}) * 1e6 + 0.5) / 1e6 AS uptime
              |FROM g GROUP BY 1 ORDER BY series""".stripMargin),
      benchExtra = true),

    // ---- engagement: DAU / WAU / MAU + stickiness ------------------------
    //
    // Per day of the canonical window: distinct active users that day
    // (DAU), over the trailing 7 days (WAU), over the trailing 28 days
    // (MAU — window-clipped here), and DAU/WAU stickiness. Exact distinct
    // counts via one (user, day) dedup pass then per-day COUNT(DISTINCT)
    // over a bounded trailing join — the windowed-NDV shape; at 100 TB
    // swap the trailing joins for merged HLL sketches (q_ts_ndv_approx's
    // path) when exactness isn't required.
    Q("q_ev_active_users",
      (s, dir) => {
        val days = Tables.events(s, dir)
          .select(col("user_id"),
            (((col("ts") / 1000000000L).cast("long")) / 86400L).cast("long").as("day"))
          .distinct()
        val spine = days.select(col("day")).distinct()
        val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = spine.as("s").join(days.as("d"),
            col("d.day") <= col("s.day") && col("d.day") > col("s.day") - 7)
          .groupBy(col("s.day").as("day"))
          .agg(countDistinct(col("user_id")).as("wau"))
        val mau = spine.as("s").join(days.as("d"),
            col("d.day") <= col("s.day") && col("d.day") > col("s.day") - 28)
          .groupBy(col("s.day").as("day"))
          .agg(countDistinct(col("user_id")).as("mau"))
        dau.join(wau, "day").join(mau, "day")
          .select(col("day"), col("dau"), col("wau"), col("mau"),
            (floor(col("dau") / col("wau") * 1e4 + 0.5) / 1e4).as("stickiness"))
          .orderBy("day")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id,
             |         (epoch_ns(ts) // 1000000000) // 86400 AS day
             |  FROM events),
             |spine AS (SELECT DISTINCT day FROM days),
             |dau AS (SELECT day, count(*) AS dau FROM days GROUP BY 1),
             |wau AS (SELECT s.day, count(DISTINCT user_id) AS wau
             |        FROM spine s JOIN days d
             |          ON d.day <= s.day AND d.day > s.day - 7 GROUP BY 1),
             |mau AS (SELECT s.day, count(DISTINCT user_id) AS mau
             |        FROM spine s JOIN days d
             |          ON d.day <= s.day AND d.day > s.day - 28 GROUP BY 1)
             |SELECT day, dau, wau, mau,
             |       floor(dau * 1.0 / wau * 1e4 + 0.5) / 1e4 AS stickiness
             |FROM dau JOIN wau USING (day) JOIN mau USING (day)
             |ORDER BY day""".stripMargin),
      benchExtra = true),

    // ---- CEP-lite row-pattern matching -----------------------------------
    //
    // MATCH_RECOGNIZE / Flink-CEP's common case as a regex over each
    // user's event-type sequence: encode the ordered history as an
    // initial-letter string (s=signup c=click e=error v=view p=purchase)
    // and count non-overlapping matches of the pattern
    // `s[cv]*p` (signup → any browsing → purchase).
    //
    // Per-user state is BOUNDED deterministically (r9 verdict #5): a
    // row_number pre-pass keeps each user's FIRST `PatternCap` events
    // (ordered by time, event_id) before any per-group collect, so a bot
    // account with an unbounded history contributes at most a
    // PatternCap-char string to the aggregate — the window pre-pass
    // itself is sort-based (spillable), never an in-memory group. The
    // oracle replays the IDENTICAL cap, so truncation is part of the
    // gated semantics, not a divergence; at the test SFs no user reaches
    // the cap and outputs equal the uncapped form.
    Q("q_ev_pattern",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"),
          substring(col("event_type"), 1, 1).as("i"),
          (col("ts") / 1000000000L).cast("long").as("tsec"), col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tsec"), col("event_id"))
        e.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= PatternCap)
          .groupBy("user_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("tsec"), col("event_id"), col("i")))),
            x => x.getField("i")), "").as("seq"))
          .select(col("user_id"), col("seq"),
            size(regexp_extract_all(col("seq"), lit("s[cv]*p"), lit(0)))
              .cast("long").as("n_matches"))
          .withColumn("matched", col("n_matches") > 0)
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, substr(event_type, 1, 1) AS i,
             |         epoch_ns(ts) // 1000000000 AS tsec, event_id
             |  FROM events
             |  QUALIFY row_number() OVER (PARTITION BY user_id
             |                             ORDER BY tsec, event_id) <= $PatternCap),
             |sq AS (
             |  SELECT user_id,
             |         string_agg(i, '' ORDER BY tsec, event_id) AS seq
             |  FROM e GROUP BY 1)
             |SELECT user_id, seq,
             |       CAST(len(regexp_extract_all(seq, 's[cv]*p')) AS BIGINT) AS n_matches,
             |       len(regexp_extract_all(seq, 's[cv]*p')) > 0 AS matched
             |FROM sq ORDER BY user_id""".stripMargin),
      benchExtra = true),

    // ---- RFM segmentation ------------------------------------------------
    //
    // Recency/frequency/monetary quintile scoring per user over the
    // canonical window — the classic customer-value segmentation. One
    // user-keyed aggregate then three ntile windows over the USER frame
    // (not the events); ties break on user_id so the quintile edges are
    // deterministic under shuffle reordering. Segment = r·100 + f·10 + m.
    Q("q_ev_rfm",
      (s, dir) => {
        val u = Tables.events(s, dir)
          .select(col("user_id"), (col("ts") / 1000000000L).cast("long").as("tsec"),
            col("value"))
          .filter(col("tsec") >= T0 && col("tsec") < T1)
          .groupBy(col("user_id"))
          .agg((lit(T1) - max(col("tsec"))).as("recency"),
            count(lit(1)).as("frequency"),
            (floor(sum(col("value")) * 1e4 + 0.5) / 1e4).as("monetary"))
        val rW = Window.orderBy(col("recency"), col("user_id"))
        val fW = Window.orderBy(col("frequency").desc, col("user_id"))
        val mW = Window.orderBy(col("monetary").desc, col("user_id"))
        u.withColumn("r_score", ntile(5).over(rW).cast("long"))
          .withColumn("f_score", ntile(5).over(fW).cast("long"))
          .withColumn("m_score", ntile(5).over(mW).cast("long"))
          .withColumn("segment",
            col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH u AS (
              |  SELECT user_id,
              |         $T1 - max(epoch_ns(ts) // 1000000000) AS recency,
              |         count(*) AS frequency,
              |         floor(sum(value) * 1e4 + 0.5) / 1e4 AS monetary
              |  FROM events
              |  WHERE epoch_ns(ts) // 1000000000 >= $T0
              |    AND epoch_ns(ts) // 1000000000 < $T1
              |  GROUP BY 1)
              |SELECT user_id, recency, frequency, monetary,
              |       CAST(ntile(5) OVER (ORDER BY recency, user_id) AS BIGINT) AS r_score,
              |       CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score,
              |       CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_score,
              |       CAST(ntile(5) OVER (ORDER BY recency, user_id) AS BIGINT) * 100
              |         + CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) * 10
              |         + CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS segment
              |FROM u ORDER BY user_id""".stripMargin),
      benchExtra = true),

    // ---- SCD2 / CDC dimension history (operator route) -------------------
    //
    // Type-2 slowly-changing-dimension history from the event log (the
    // dbt-snapshot pattern): per user, collapse consecutive observations
    // of the same event_type into episodes with valid_from/valid_to/
    // version/is_current. One hash shuffle on the key; both window
    // passes share the (user, time) sort. Null-safe attribute compare.
    // Complements q_ev_scd2 (inline gaps-and-islands run intervals with
    // per-run event counts): THIS gate exercises the reusable
    // operators.Scd2 operator — versioned episodes, is_current flag —
    // the dimension q_ev_scd2_lookup and streaming twins #23/#24 build on.
    Q("q_ev_scd2_hist",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"),
          col("event_type"), (col("ts") / 1000000000L).cast("long").as("tsec"),
          col("event_id"))
        graft.operators.Scd2.history(e, Seq("user_id"), "tsec",
            Seq("event_type"), Seq("event_id"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         epoch_ns(ts) // 1000000000 AS tsec, event_id
             |  FROM events),
             |m AS (
             |  SELECT user_id, event_type, tsec, event_id,
             |         lag(event_type) OVER w IS DISTINCT FROM event_type AS chg,
             |         row_number() OVER w AS rn
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
             |ep AS (SELECT * FROM m WHERE chg OR rn = 1)
             |SELECT user_id, event_type, tsec AS valid_from,
             |       lead(tsec) OVER w2 AS valid_to,
             |       CAST(row_number() OVER w2 AS INTEGER) AS version,
             |       lead(tsec) OVER w2 IS NULL AS is_current
             |FROM ep WINDOW w2 AS (PARTITION BY user_id ORDER BY tsec, event_id)
             |ORDER BY user_id, version""".stripMargin),
      benchExtra = true),

    // ---- SCD2 point-in-time lookup ---------------------------------------
    //
    // The canonical USE of an SCD2 dimension: enrich facts with the
    // attribute value AS OF the fact's event time. Dimension = the SCD2
    // history of each user's last NON-purchase activity state; facts =
    // purchases. Composition of two shipped operators — Scd2.history
    // into AsofJoin.backward (episodes partition each key's timeline,
    // so backward-as-of on valid_from ≡ the between(valid_from,
    // valid_to) interval join, WITHOUT the inequality-join blowup: one
    // key shuffle + linear scan). Same-second observations are
    // collapsed to the last by event_id first — the as-of contract
    // wants right rows unique per (key, time).
    Q("q_ev_scd2_lookup",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"),
          col("event_type"), (col("ts") / 1000000000L).cast("long").as("tsec"),
          col("event_id"), col("value"))
        val wDedup = Window.partitionBy(col("user_id"), col("tsec"))
          .orderBy(col("event_id").desc)
        val ne = e.filter(col("event_type") =!= "purchase")
          .withColumn("__rn", row_number().over(wDedup))
          .filter(col("__rn") === 1).drop("__rn", "value")
        val dim = graft.operators.Scd2.history(ne, Seq("user_id"), "tsec",
            Seq("event_type"), Seq("event_id"))
          .select(col("user_id"), col("valid_from").as("tsec"),
            col("event_type").as("state"), col("version"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("tsec"), col("event_id"), col("value"))
        graft.operators.AsofJoin.backward(purchases, dim, Seq("user_id"),
            "tsec", Seq("state", "version"), matchedTimeCol = "state_since")
          .orderBy(col("user_id"), col("tsec"), col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         epoch_ns(ts) // 1000000000 AS tsec, event_id, value
             |  FROM events),
             |ne AS (
             |  SELECT user_id, event_type, tsec, event_id FROM e
             |  WHERE event_type <> 'purchase'
             |  QUALIFY row_number() OVER (PARTITION BY user_id, tsec ORDER BY event_id DESC) = 1),
             |m AS (
             |  SELECT user_id, event_type, tsec, event_id,
             |         lag(event_type) OVER w IS DISTINCT FROM event_type AS chg,
             |         row_number() OVER w AS rn
             |  FROM ne WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
             |ep AS (
             |  SELECT user_id, event_type AS state, tsec AS valid_from,
             |         CAST(row_number() OVER w2 AS INTEGER) AS version
             |  FROM m WHERE chg OR rn = 1
             |  WINDOW w2 AS (PARTITION BY user_id ORDER BY tsec, event_id)),
             |p AS (SELECT user_id, tsec, event_id, value FROM e
             |      WHERE event_type = 'purchase')
             |SELECT p.user_id, p.tsec, p.event_id, p.value,
             |       ep.valid_from AS state_since, ep.state, ep.version
             |FROM p ASOF LEFT JOIN ep
             |  ON p.user_id = ep.user_id AND p.tsec >= ep.valid_from
             |ORDER BY p.user_id, p.tsec, p.event_id""".stripMargin),
      benchExtra = true),

    // ---- Theil–Sen robust trend slope ------------------------------------
    //
    // Median of pairwise slopes between hourly bucket averages per series
    // — the outlier-robust alternative to least-squares `deriv`. Bucket
    // averages are pre-rounded (1e-4, the SAX determinism stance) so the
    // pair slopes are bit-identical across engines. The pair join is per
    // series over the BUCKET frame (168 hours → ~14k pairs) — bounded by
    // the rollup, never by raw points; at 100 TB the bucket rollup is the
    // only data-sized pass.
    Q("q_ts_theil_sen",
      (s, dir) => {
        val b = ev(s, dir).filter(col("time") >= T0 && col("time") < T1)
          .groupBy(col("series"),
            (col("time") - pmod(col("time"), lit(3600L))).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
        val a = b.select(col("series"), col("bucket").as("t1"), col("v").as("v1"))
        val c = b.select(col("series"), col("bucket").as("t2"), col("v").as("v2"))
        a.join(c, Seq("series")).filter(col("t2") > col("t1"))
          .select(col("series"),
            ((col("v2") - col("v1")) / (col("t2") - col("t1"))).as("slope"))
          .groupBy(col("series"))
          .agg(count(lit(1)).as("n_pairs"),
            (floor(median(col("slope")) * 1e10 + 0.5) / 1e10).as("ts_slope"))
          .orderBy(col("series"))
      },
      Some(s"""$svSql,
              |b AS (
              |  SELECT series, time - (time % 3600) AS bucket,
              |         floor(avg(value) * 1e4 + 0.5) / 1e4 AS v
              |  FROM sv WHERE time >= $T0 AND time < $T1
              |  GROUP BY 1, 2),
              |p AS (
              |  SELECT a.series, (c.v - a.v) / (c.bucket - a.bucket) AS slope
              |  FROM b a JOIN b c ON a.series = c.series AND c.bucket > a.bucket)
              |SELECT series, count(*) AS n_pairs,
              |       floor(median(slope) * 1e10 + 0.5) / 1e10 AS ts_slope
              |FROM p GROUP BY 1 ORDER BY series""".stripMargin),
      benchExtra = true),

    // ---- distribution drift: PSI between two days ------------------------
    //
    // Population Stability Index of per-series value distributions, day 3
    // vs day 8 of the canonical window, over 10 equal-width bins spanning
    // the two days' combined [min, max]. ε-smoothed (ε=1e-4) so empty
    // bins don't blow up the log. Shape: one partial+final (series, day,
    // bin) count — the drift monitor you'd run per-partition at 100 TB;
    // nothing is ever wider than series × 10 bins.
    Q("q_ts_psi",
      (s, dir) => {
        val dayA = T0
        val dayB = T0 + 5 * 86400L
        val e = ev(s, dir)
          .filter((col("time") >= dayA && col("time") < dayA + 86400L) ||
            (col("time") >= dayB && col("time") < dayB + 86400L))
          .select(col("series"),
            when(col("time") < dayA + 86400L, lit("a")).otherwise(lit("b")).as("half"),
            col("value"))
        val bounds = e.groupBy(col("series"))
          .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        val binned = e.join(bounds, "series")
          .select(col("series"), col("half"),
            least(lit(9L), floor((col("value") - col("lo")) /
              ((col("hi") - col("lo")) / 10.0)).cast("long")).as("bin"))
          .groupBy(col("series"), col("half"), col("bin"))
          .agg(count(lit(1)).as("n"))
        val tot = binned.groupBy(col("series"), col("half")).agg(sum(col("n")).as("tot"))
        val frac = binned.join(tot, Seq("series", "half"))
          .select(col("series"), col("bin"),
            when(col("half") === "a", col("n") / col("tot")).otherwise(lit(0.0)).as("pa"),
            when(col("half") === "b", col("n") / col("tot")).otherwise(lit(0.0)).as("pb"))
          .groupBy(col("series"), col("bin"))
          .agg(sum(col("pa")).as("pa"), sum(col("pb")).as("pb"))
        frac.select(col("series"),
            ((col("pa") + 1e-4 - (col("pb") + 1e-4)) *
              log((col("pa") + 1e-4) / (col("pb") + 1e-4))).as("term"))
          .groupBy(col("series"))
          .agg((floor(sum(col("term")) * 1e4 + 0.5) / 1e4).as("psi"))
          .orderBy(col("series"))
      },
      Some(s"""$svSql,
              |e AS (
              |  SELECT series,
              |         CASE WHEN time < ${T0 + 86400L} THEN 'a' ELSE 'b' END AS half,
              |         value
              |  FROM sv
              |  WHERE (time >= $T0 AND time < ${T0 + 86400L})
              |     OR (time >= ${T0 + 5 * 86400L} AND time < ${T0 + 6 * 86400L})),
              |bounds AS (SELECT series, min(value) AS lo, max(value) AS hi
              |           FROM e GROUP BY 1),
              |binned AS (
              |  SELECT e.series, half,
              |         least(9, CAST(floor((value - lo) / ((hi - lo) / 10.0)) AS BIGINT)) AS bin,
              |         count(*) AS n
              |  FROM e JOIN bounds ON e.series = bounds.series
              |  GROUP BY 1, 2, 3),
              |tot AS (SELECT series, half, sum(n) AS tot FROM binned GROUP BY 1, 2),
              |frac AS (
              |  SELECT series, bin,
              |         sum(CASE WHEN half = 'a' THEN n / tot ELSE 0 END) AS pa,
              |         sum(CASE WHEN half = 'b' THEN n / tot ELSE 0 END) AS pb
              |  FROM binned JOIN tot USING (series, half)
              |  GROUP BY 1, 2)
              |SELECT series,
              |       floor(sum((pa + 1e-4 - (pb + 1e-4)) * ln((pa + 1e-4) / (pb + 1e-4))) * 1e4 + 0.5) / 1e4 AS psi
              |FROM frac GROUP BY 1 ORDER BY series""".stripMargin),
      benchExtra = true)
  )
}
