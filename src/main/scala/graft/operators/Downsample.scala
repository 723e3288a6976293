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

  /** LTTB-style perceptual downsampling (Steinarsson's
    * largest-triangle-three-buckets), parallel bucket-anchor variant: one
    * representative point per (keys, bucket) — the point maximizing the
    * triangle area against the NEIGHBOR BUCKETS' anchor points. Canonical
    * LTTB anchors on the previously *selected* point, a sequential
    * dependency that cannot fan out; this variant anchors on each
    * neighbor bucket's first point (exact values, no averaged anchors),
    * which keeps the selection embarrassingly parallel AND bit-exact
    * across engines — an averaged anchor would carry engine-specific
    * float-summation order into the argmax. Edge buckets (no neighbor on
    * one side) are not emitted; compose with [[m4]]'s first/last when the
    * boundary points matter.
    *
    * Ties (equal area) break on (time, tie-break cols) ascending, so the
    * result is deterministic under shuffle reordering.
    *
    * Shape: one bounded per-bucket window (anchor pick), one
    * bucket-frame lag/lead window, one equi-join of points to their
    * bucket's anchor triple, one per-bucket argmax window — every shuffle
    * keyed on (keys, bucket) or (keys); nothing whole-series, no
    * all-pairs.
    */
  def lttb(df: DataFrame, step: Long, keys: Seq[String] = Seq("series"),
      timeCol: String = "time", valueCol: String = "value",
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kc = keys.map(col)
    val t = col(timeCol).cast("long")
    val ties = tieCols.map(col)
    val pts = df.select(kc ++ Seq((t - pmod(t, lit(step))).as("bucket"),
      t.as("__t"), col(valueCol).cast("double").as("__v")) ++ ties: _*)
    val wIn = Window.partitionBy(kc :+ col("bucket"): _*)
      .orderBy(col("__t") +: ties: _*)
    val anchors = pts.withColumn("__rn", row_number().over(wIn))
      .filter(col("__rn") === 1)
      .select(kc ++ Seq(col("bucket"), col("__t").as("at"), col("__v").as("av")): _*)
    val wB = Window.partitionBy(kc: _*).orderBy(col("bucket"))
    val tri = anchors
      .withColumn("pt", lag(col("at"), 1).over(wB))
      .withColumn("pv", lag(col("av"), 1).over(wB))
      .withColumn("nt", lead(col("at"), 1).over(wB))
      .withColumn("nv", lead(col("av"), 1).over(wB))
      .filter(col("pt").isNotNull && col("nt").isNotNull)
      .select(kc ++ Seq(col("bucket"), col("pt"), col("pv"), col("nt"), col("nv")): _*)
    val cand = pts.join(tri, keys :+ "bucket")
      .withColumn("__area", abs(
        (col("pt") - col("nt")) * (col("__v") - col("pv")) -
          (col("pt") - col("__t")) * (col("nv") - col("pv"))))
    val wSel = Window.partitionBy(kc :+ col("bucket"): _*)
      .orderBy(col("__area").desc +: col("__t") +: ties: _*)
    cand.withColumn("__rn", row_number().over(wSel)).filter(col("__rn") === 1)
      .select(kc ++ Seq(col("bucket"), col("__t").as(timeCol),
        col("__v").as(valueCol),
        (floor(col("__area") * 1e4 + 0.5) / 1e4).as("area")): _*)
  }

  /** SAX symbolization (Lin et al.): per (keys, frame of `frameSecs`),
    * PAA over `step`-second buckets → per-frame z-normalization → a
    * 4-symbol word over the N(0,1) quartile breakpoints
    * (−0.6745, 0, 0.6745) — the standard discretized representation for
    * motif/novelty search and cheap series similarity at archive scale.
    *
    * Determinism across engines: the bucket mean is pre-rounded (1e-4)
    * and the z-score rounded (1e-6) BEFORE symbol assignment, so a
    * replaying engine with last-ulp float differences maps to the same
    * word. Frames with zero variance emit all-'b' (z defined 0). Missing
    * buckets are skipped (the word is over present buckets in time
    * order).
    *
    * Shape: one partial+final bucket aggregate, one bounded window per
    * frame (≤ frameSecs/step rows), one sorted-collect per frame row —
    * every shuffle on the (keys, frame) family; nothing whole-series.
    */
  def sax(df: DataFrame, step: Long, frameSecs: Long,
      keys: Seq[String] = Seq("series"), timeCol: String = "time",
      valueCol: String = "value"): DataFrame = {
    require(step > 0 && frameSecs % step == 0,
      "sax frame must be a multiple of the bucket step")
    val kc = keys.map(col)
    val t = col(timeCol).cast("long")
    val b = df
      .groupBy(kc ++ Seq(
        (t - pmod(t, lit(frameSecs))).as("frame"),
        (t - pmod(t, lit(step))).as("bucket")): _*)
      .agg((floor(avg(col(valueCol)) * 1e4 + 0.5) / 1e4).as("__v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(kc :+ col("frame"): _*)
    val mu = avg(col("__v")).over(w)
    val sd = stddev_pop(col("__v")).over(w)
    val z = floor(when(sd > 0, (col("__v") - mu) / sd).otherwise(lit(0.0))
      * 1e6 + 0.5) / 1e6
    val sym = when(z < -0.6745, lit("a"))
      .when(z < 0.0, lit("b"))
      .when(z < 0.6745, lit("c"))
      .otherwise(lit("d"))
    b.withColumn("__s", struct(col("bucket"), sym.as("sym")))
      .groupBy(kc :+ col("frame"): _*)
      .agg(
        concat_ws("", transform(array_sort(collect_list(col("__s"))),
          x => x.getField("sym"))).as("sax"),
        count(lit(1)).as("n_buckets"))
  }
}
