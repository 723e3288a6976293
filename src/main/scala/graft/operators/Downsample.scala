package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-time series downsampling for rendering/export. */
object Downsample {

  /** M4 downsampling: per (keys, bucket) the four extreme points —
    * earliest, latest, min-value, max-value — which exactly reproduce a
    * pixel column's min/max envelope when buckets map to pixels (the
    * standard dashboard reduction). Ties are lexicographic: first/last
    * by (t, v), min/max by (v, t).
    *
    * Scale shape: ONE partial+final hash aggregate on (keys, bucket) —
    * O(1) state per group, ≤ 4 output rows per bucket regardless of
    * input density; no window, no sort of the raw points.
    */
  def m4(df: DataFrame, step: Long, keys: Seq[String] = Seq("series"),
      timeCol: String = "time", valueCol: String = "value"): DataFrame = {
    val t = col(timeCol).cast("long")
    val v = col(valueCol).cast("double")
    val kc = keys.map(col)
    val tv = struct(t.as("t"), v.as("v"))
    val vt = struct(v.as("v"), t.as("t"))
    df.groupBy(kc :+ (t - pmod(t, lit(step))).as("bucket"): _*)
      .agg(
        min(tv).as("__first"), max(tv).as("__last"),
        min(vt).as("__vmin"), max(vt).as("__vmax"))
      .select(kc ++ Seq(col("bucket"), explode(array_distinct(array(
        col("__first"),
        col("__last"),
        struct(col("__vmin.t").as("t"), col("__vmin.v").as("v")),
        struct(col("__vmax.t").as("t"), col("__vmax.v").as("v"))))).as("__p")): _*)
      .select(kc ++ Seq(col("bucket"),
        col("__p.t").as(timeCol), col("__p.v").as(valueCol)): _*)
  }
}
