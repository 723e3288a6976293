package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Alert-expression evaluation — the last unbuilt item of the reference's
  * own language goals (`docs/docs/development/sydraql-backlog.md:24`:
  * "... and alert expressions"; `:42` "alert predicates"), Prometheus
  * `for`-clause semantics: an alert FIRES when its condition holds on
  * every consecutive evaluation tick for at least `forBuckets` ticks, and
  * the firing episode extends until the first tick the condition fails.
  *
  * Input is the BUCKETED series (one row per (keys, bucket) — the rollup
  * aggregate upstream); a missing bucket (gap in the rollup, or one
  * nulled by the condition) breaks the run, exactly as an absent
  * evaluation does in Prometheus. Episodes come from the gaps-and-islands
  * identity: among condition-true ticks ordered by bucket,
  * `bucket − row_number · step` is constant precisely on maximal
  * consecutive runs — pure integer arithmetic, replayable anywhere.
  *
  * Scale shape: the window and the episode aggregate partition by the
  * alert keys over POST-ROLLUP cardinality (range/step rows per series,
  * not raw points — the same stance as [[Fill]]); condition evaluation
  * itself is a narrow filter. Evaluate the condition on ROUNDED values
  * so a replaying engine makes identical boolean calls.
  */
object Alerts {

  /** Gap detection — the Prometheus `absent()` family as a one-shot
    * scan: for every key group and `period`-aligned window, how many of
    * the `period/step` expected buckets have NO data, and the longest
    * consecutive missing run (the worst outage). Pure integer
    * arithmetic: present buckets sort ascending, a gap's length is
    * `(next − prev)/step − 1`, and the window edges count as virtual
    * present buckets so leading/trailing absence is measured too.
    *
    * Scale shape: one aggregate to the per-(key, window) bucket list is
    * wrong at raw-point scale — instead the input is the ALREADY
    * BUCKETED frame (one row per present bucket, range/step rows per
    * group), a lag window partitioned by (keys, window) gives each
    * present bucket its predecessor, and one hash aggregate folds
    * gap lengths — the same post-rollup stance as [[firing]].
    *
    * A window with NO present bucket at all produces no row (there is
    * nothing to anchor it to); full-absence detection is [[gapsWithSpine]],
    * which composes this with a (keys × window) spine join.
    *
    * Duplicate (keys, bucket) rows are deduped defensively before the
    * lag scan: without it a duplicate bucket inflates `n_present`
    * (negative `n_missing`, understated `longest_gap`) with no error.
    * The dedup is one extra exchange on the POST-ROLLUP frame
    * (range/step rows per group — metadata-sized next to the raw scan),
    * and a clean rollup upstream makes it a no-op.
    */
  def gaps(df: DataFrame, keys: Seq[String], bucketCol: String, step: Long,
      period: Long): DataFrame = {
    require(step > 0 && period > 0 && period % step == 0,
      "period must be a positive multiple of step")
    val slots = period / step
    val kc = keys.map(col)
    val b = col(bucketCol)
    val win = (b - pmod(b, lit(period))).as("window_start")
    val w = Window.partitionBy(kc :+ col("window_start"): _*).orderBy(b)
    val lagged = df.select(kc ++ Seq(b.as(bucketCol), win): _*)
      .distinct()
      .withColumn("__prev",
        coalesce(lag(b, 1).over(w), col("window_start") - step))
      .withColumn("__gap", (b - col("__prev")) / step - 1)
    lagged.groupBy(kc :+ col("window_start"): _*)
      .agg(
        count(lit(1)).as("n_present"),
        (lit(slots) - count(lit(1))).as("n_missing"),
        greatest(max(col("__gap")),
          // trailing gap: from the last present bucket to the window end
          lit(slots - 1) - max((b - col("window_start")) / step))
          .cast("long").as("longest_gap"))
  }

  /** Full-absence gap detection: [[gaps]] joined onto a dense
    * (keys × window) spine so a series that goes COMPLETELY dark inside
    * a window — the Prometheus `absent()` case proper — still reports,
    * as `(n_present 0, n_missing slots, longest_gap slots)`.
    *
    * The key universe comes from `keysDf` (e.g. the tag index or the
    * raw table's distinct series), NOT from `df`: a series with zero
    * present buckets anywhere in the range never appears in the bucketed
    * frame at all, so no self-derived spine can resurrect it.
    *
    * Scale shape: the spine is |keys| × (range/period) rows — generated
    * by `sequence`/`explode` per key row, never collected. The left join
    * back is an equi-join on (keys, window_start); the gaps side is
    * post-rollup-sized and AQE broadcasts whichever side is actually
    * small. `rangeStart` must be period-aligned (the [[gaps]] windows
    * are epoch-aligned via `bucket − bucket mod period`; a misaligned
    * spine would join nothing and report everything absent).
    */
  def gapsWithSpine(df: DataFrame, keysDf: DataFrame, keys: Seq[String],
      bucketCol: String, step: Long, period: Long,
      rangeStart: Long, rangeEnd: Long): DataFrame = {
    require(rangeStart % period == 0,
      "rangeStart must be period-aligned to match gaps()'s epoch-aligned windows")
    require(rangeEnd > rangeStart, "empty evaluation range")
    val slots = period / step
    val kc = keys.map(col)
    val lastWin = rangeStart + ((rangeEnd - rangeStart - 1) / period) * period
    val spine = keysDf.select(kc: _*).distinct()
      .withColumn("window_start",
        explode(sequence(lit(rangeStart), lit(lastWin), lit(period))))
    spine.join(gaps(df, keys, bucketCol, step, period), keys :+ "window_start", "left")
      .select(kc ++ Seq(col("window_start"),
        coalesce(col("n_present"), lit(0L)).as("n_present"),
        coalesce(col("n_missing"), lit(slots)).as("n_missing"),
        coalesce(col("longest_gap"), lit(slots)).as("longest_gap")): _*)
  }

  /** Firing episodes: `(keys…, fired_at, episode_start, episode_end,
    * n_buckets)` — one row per maximal run of ≥ `forBuckets` consecutive
    * condition-true buckets; `fired_at` is the tick the `for` duration
    * was first met (start + (forBuckets − 1)·step).
    */
  def firing(df: DataFrame, keys: Seq[String], bucketCol: String, step: Long,
      cond: Column, forBuckets: Int): DataFrame = {
    require(step > 0, "alert evaluation needs a positive bucket step")
    require(forBuckets >= 1, "forBuckets must be >= 1")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col(bucketCol))
    df.filter(cond)
      .withColumn("__i", col(bucketCol) - row_number().over(w).cast("long") * step)
      .groupBy(kc :+ col("__i"): _*)
      .agg(min(col(bucketCol)).as("episode_start"),
        max(col(bucketCol)).as("episode_end"),
        count(lit(1)).as("n_buckets"))
      .filter(col("n_buckets") >= forBuckets)
      .select(kc ++ Seq(
        (col("episode_start") + (forBuckets - 1) * step).as("fired_at"),
        col("episode_start"), col("episode_end"), col("n_buckets")): _*)
  }
}
