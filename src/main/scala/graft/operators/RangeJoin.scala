package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair every point with every same-key
  * interval containing it (`start <= time < end`) — the "events inside
  * maintenance windows / sessions / campaigns" shape. Beyond-reference
  * surface (the reference has no joins at all — SURVEY.md §2.5).
  *
  * NOT a theta-join: `p.time >= i.start AND p.time < i.end` as a raw join
  * condition degenerates to a per-key cross product (Spark plans it as
  * BroadcastNestedLoopJoin — O(n·m) comparisons, unusable at scale).
  * Instead intervals explode to the time buckets they cover
  * (`sequence(floor(start/b), floor((end-1)/b))` — exact integral floors),
  * points carry their single bucket, and an EQUI-join on (key, bucket)
  * plus the residual containment filter yields each matching pair exactly
  * once (a point lives in exactly one bucket) — hash join, no dedup pass.
  *
  * Candidate work is Σ_bucket |points_b| × |intervals covering b|: pick
  * `bucket` near the typical interval length so an interval explodes to
  * ~2 rows; AQE's skew split handles hot buckets. Zero-length or inverted
  * intervals (`end <= start`) match nothing by construction.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` containing them. Both sides
    * keep their payload columns (caller renames collisions beforehand);
    * `startCol`/`endCol` are epoch seconds, `endCol` exclusive.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      timeCol: String, startCol: String, endCol: String,
      bucket: Long = 3600L): DataFrame = {
    val kc = keys.map(col)
    val t = col(timeCol).cast("long")
    val p = points.withColumn("__b", SeriesWindows.dayKey(t, bucket))
    val i = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__b", explode(sequence(
        SeriesWindows.dayKey(col(startCol).cast("long"), bucket),
        SeriesWindows.dayKey(col(endCol).cast("long") - 1, bucket))))
    p.join(i, keys :+ "__b")
      .filter(t >= col(startCol) && t < col(endCol))
      .drop("__b")
  }
}
