package graft.operators

import graft.sydraql.Ast.{FillConst, FillPolicy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALIGN JOIN — the reference's own backlog item for "joins on time"
  * (`docs/docs/development/sydraql-backlog.md:92-96`: "align two series by
  * time bucket (nearest/forward-fill); constraints: same step/zone"),
  * executed here: both series roll up to a common `step` bucket grid
  * (avg), merge onto the dense per-key spine, and gaps on EITHER side
  * fill per the sydraQL fill policy (previous / linear / null) — so every
  * output row has both series' values on the same clock tick, the shape
  * cross-series math (ratio, spread, [[Trend.pearson]]) needs.
  *
  * Pure composition of gated pieces: the bucket rollup (one partial+final
  * aggregate per side), a full-outer equi-join on (keys, bucket), and
  * [[Fill]]'s dense-spine machinery (sequence+explode spine, two window
  * passes partitioned by the keys — no single-partition window unless
  * keyless, where post-aggregation cardinality is one row per bucket).
  * The spine spans the UNION of both sides' observed ranges per key —
  * a series missing at a grid edge fills per policy (leading gaps NULL
  * under `previous`, edge gaps NULL under `linear` — no extrapolation).
  */
object AlignJoin {

  /** `(keys…, bucket, leftName, rightName)` per grid tick. */
  def aligned(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, valueCol: String, step: Long, policy: FillPolicy,
      leftName: String = "l_value", rightName: String = "r_value"): DataFrame = {
    require(step > 0, "align requires a positive step")
    require(!policy.isInstanceOf[FillConst],
      "fill(<const>) is a per-query concern (the compiler pre-computes the " +
        "constant); align supports null/previous/linear")
    def rollup(df: DataFrame, out: String) = {
      val t = col(timeCol).cast("long")
      df.groupBy(keys.map(col) :+ (t - pmod(t, lit(step))).as("bucket"): _*)
        .agg(avg(col(valueCol)).as(out))
    }
    val merged = rollup(left, leftName)
      .join(rollup(right, rightName), keys :+ "bucket", "full")
    Fill(merged, "bucket", keys, step, policy, Seq(leftName, rightName))
  }
}
