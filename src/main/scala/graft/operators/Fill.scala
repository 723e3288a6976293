package graft.operators

import graft.sydraql.Ast._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap filling for bucketed aggregations — the `fill(previous | linear |
  * null | <const>)` clause (`/root/reference/src/sydra/query/parser.zig:
  * 280-320`, design semantics `docs/docs/concepts/sydraql-design.md:77-81,
  * 138`: applied post-aggregation per group-by bucket). The reference
  * declares but never executes fill; semantics here:
  *
  *  - the bucket spine is the dense `[min, max]` range of observed buckets
  *    per group, stepped by the time_bucket step;
  *  - `null`: missing buckets appear with NULL values;
  *  - `<const>`: missing buckets take the constant;
  *  - `previous`: last non-null value carries forward (leading gaps NULL);
  *  - `linear`: interpolate between surrounding non-null points (edge gaps
  *    NULL — no extrapolation).
  *
  * Scale: the spine is generated per group key (`sequence` + `explode` —
  * distributed, no driver loop); fills are two window passes partitioned by
  * the group keys, so the shuffle key matches the aggregation that produced
  * the input. A global (keyless) fill windows over a single partition, which
  * is fine because post-aggregation cardinality is one row per bucket.
  */
object Fill {

  def apply(
      df: DataFrame,
      bucketCol: String,
      keyCols: Seq[String],
      step: Long,
      policy: FillPolicy,
      valueCols: Seq[String]): DataFrame = {

    require(step > 0, "fill requires a positive time_bucket step")
    val keys = keyCols.map(col)

    // Dense spine: per-key [min,max] bucket range, exploded.
    val bounds = if (keyCols.nonEmpty) {
      df.groupBy(keys: _*)
        .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    } else {
      df.agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    }
    val spine = bounds
      .filter(col("__lo").isNotNull)
      .select((keys :+ explode(sequence(col("__lo"), col("__hi"), lit(step))).as(bucketCol)): _*)

    val joined = spine.join(df, keyCols :+ bucketCol, "left")

    val w = (if (keyCols.nonEmpty) Window.partitionBy(keys: _*) else Window.partitionBy(lit(1)))
      .orderBy(col(bucketCol))

    def filled(vc: String): Column = policy match {
      case FillNull => col(vc)
      case FillConst(_) =>
        // caller pre-computes the constant into fillConstant
        col(vc)
      case FillPrevious =>
        coalesce(col(vc), last(col(vc), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      case FillLinear =>
        val pv = last(col(vc), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
        val pb = last(when(col(vc).isNotNull, col(bucketCol)), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
        val nv = first(col(vc), ignoreNulls = true)
          .over(w.rowsBetween(1, Window.unboundedFollowing))
        val nb = first(when(col(vc).isNotNull, col(bucketCol)), ignoreNulls = true)
          .over(w.rowsBetween(1, Window.unboundedFollowing))
        when(col(vc).isNotNull, col(vc))
          .when(pv.isNotNull && nv.isNotNull,
            pv + (nv - pv) * (col(bucketCol) - pb) / (nb - pb))
    }

    val result = policy match {
      case FillConst(_) => joined // handled via fillConstant below
      case _ =>
        valueCols.foldLeft(joined)((d, vc) => d.withColumn(vc, filled(vc)))
    }
    result
  }

  /** Constant-fill variant: `const` is an already-compiled literal Column. */
  def applyConst(
      df: DataFrame,
      bucketCol: String,
      keyCols: Seq[String],
      step: Long,
      const: Column,
      valueCols: Seq[String]): DataFrame = {
    val base = apply(df, bucketCol, keyCols, step, FillNull, valueCols)
    valueCols.foldLeft(base)((d, vc) => d.withColumn(vc, coalesce(col(vc), const)))
  }
}
