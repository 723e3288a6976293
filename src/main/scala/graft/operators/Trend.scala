package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
