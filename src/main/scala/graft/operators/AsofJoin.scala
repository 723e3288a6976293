package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: attach to every left row the LATEST right row with
  * `right.time <= left.time` on the same key (the classic "price at trade
  * time" / "last config before event" lookup; the reference's engine has no
  * join at all — SURVEY.md §2.5 — so this is beyond-reference surface,
  * matching DuckDB's native `ASOF LEFT JOIN` semantics including the
  * time-equality match).
  *
  * NOT an inequality join: a naive `l.time >= r.time` theta-join is a
  * per-key cross product (O(n·m) per key — unusable at 100 TB). Instead
  * both sides union into one stream, tagged, and a single ascending scan
  * per key resolves every left row via `last(right_payload, ignoreNulls)`
  * — one shuffle on the key, linear work, no candidate blowup.
  *
  * Scale shape (same discipline as [[SeriesWindows]]): the scan window
  * partitions by (key, day-bucket) so a single hot key never lands one
  * task; the cross-day carry — the latest right payload from EARLIER days
  * — is repaired from a per-(key, day) aggregate (one row per non-empty
  * key-day, metadata-sized) joined back; AQE broadcasts it when it is
  * actually small and degrades to a shuffle join when key-cardinality ×
  * days outgrows broadcast size. Right rows are expected
  * unique per (key, time) — pre-aggregate if not (`max(payload)` ties are
  * otherwise partition-order dependent).
  *
  * `tolerance`: a match older than `left.time - tolerance` is nulled out
  * (row kept — LEFT join semantics), DuckDB-replayable as a CASE over the
  * unbounded ASOF result.
  */
object AsofJoin {

  private val DayW = 86400L

  /** Left-join `left` to the latest `right` row per `keys` at or before
    * `left.timeCol`. Right payload columns `rightCols` arrive under their
    * own names (caller renames collisions beforehand); the matched right
    * timestamp arrives as `matchedTimeCol` (null when no match / out of
    * tolerance).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightCols: Seq[String], matchedTimeCol: String = "r_time",
      tolerance: Option[Long] = None, bucket: Long = DayW): DataFrame = {
    val t = col(timeCol).cast("long")
    val kc = keys.map(col)
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == timeCol)

    // One struct carries the right row through the scan: time first, so
    // struct MAX (used for the per-day carry) orders by time.
    val rStruct = struct((col(timeCol).cast("long").as("__rt")) +: rightCols.map(col): _*)
    val rTagged = right.select(kc ++ Seq(t.as(timeCol), rStruct.as("__r")): _*)
    val rType = rTagged.schema("__r").dataType.asInstanceOf[StructType]

    val lTagged = left.select(
      kc ++ Seq(t.as(timeCol)) ++ leftPayload.map(col) :+ lit(null).cast(rType).as("__r"): _*)
    val unioned = lTagged.withColumn("__src", lit(1)).unionByName(
      rTagged.withColumn("__src", lit(0)), allowMissingColumns = true)
      .withColumn("__d", SeriesWindows.dayKey(t, bucket))

    // Within-day resolve: right rows (__src 0) sort before left rows at an
    // equal timestamp, so the time-equality match is included, exactly as
    // the oracle's `l.time >= r.time`.
    val wDay = Window.partitionBy(kc :+ col("__d"): _*)
      .orderBy(t, col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val resolved = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(wDay))

    // Cross-day carry: latest right struct of each (key, day), then the
    // running latest over STRICTLY EARLIER days — evaluated at EVERY day
    // present on either side (a left day with no right rows anywhere still
    // needs the carry from older days). One row per non-empty key-day, so
    // usually tiny — but NOT hinted: high-cardinality keys over long time
    // ranges (100k+ series × years of days) outgrow the driver, and a hard
    // broadcast() would fail the job instead of degrading. AQE broadcasts
    // at runtime when the carry is actually small and falls back to a
    // shuffle join on the same (keys, __d) the resolve already shuffled on
    // when it isn't.
    val wCarry = Window.partitionBy(kc: _*).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dayAgg = rTagged.withColumn("__d", SeriesWindows.dayKey(t, bucket))
      .groupBy(kc :+ col("__d"): _*).agg(max(col("__r")).as("__rday"))
    val leftDays = lTagged.withColumn("__d", SeriesWindows.dayKey(t, bucket))
      .select(kc :+ col("__d"): _*).distinct()
    val carry = leftDays.join(dayAgg, keys :+ "__d", "full")
      .withColumn("__carry", last(col("__rday"), ignoreNulls = true).over(wCarry))
      .select(kc ++ Seq(col("__d"), col("__carry")): _*)

    val joined = resolved.filter(col("__src") === 1)
      .join(carry, keys :+ "__d", "left")
      .withColumn("__m", coalesce(col("__m"), col("__carry")))
    val bounded = tolerance match {
      case Some(tol) => joined.withColumn("__m",
        when(t - col("__m")("__rt") <= tol, col("__m")))
      case None => joined
    }
    bounded.select(
      kc ++ Seq(t.as(timeCol)) ++ leftPayload.map(col) ++
        Seq(col("__m")("__rt").as(matchedTimeCol)) ++
        rightCols.map(c => col("__m")(c).as(c)): _*)
  }

  /** Forward as-of join: the EARLIEST right row with `right.time >=
    * left.time` per key (the "next fill after the order" / "first event
    * after the deploy" lookup), DuckDB `ASOF LEFT JOIN ... ON l.time <=
    * r.time` semantics including the time-equality match.
    *
    * Pure reduction to [[backward]] on the negated time axis: with
    * t ↦ −t, "latest right ≤ left" becomes "earliest right ≥ left", the
    * equal-timestamp match is preserved (right still sorts before left at
    * an equal negated time), and the tolerance bound `(−l) − (−r) ≤ tol`
    * is exactly the forward `r − l ≤ tol`. Same one-shuffle linear scan,
    * same per-(key, day) carry machinery, zero duplicated logic.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightCols: Seq[String], matchedTimeCol: String = "r_time",
      tolerance: Option[Long] = None, bucket: Long = DayW): DataFrame = {
    val neg = (df: DataFrame) =>
      df.withColumn(timeCol, -col(timeCol).cast("long"))
    backward(neg(left), neg(right), keys, timeCol, rightCols,
        matchedTimeCol, tolerance, bucket)
      .withColumn(timeCol, -col(timeCol))
      .withColumn(matchedTimeCol, -col(matchedTimeCol))
  }
}
