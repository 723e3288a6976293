package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event log: consecutive events of the
  * same key belong to one session while the inter-event gap is STRICTLY
  * under `gapSecs`; a gap >= `gapSecs` starts a new session — exactly the
  * boundary Spark's `session_window` uses for point events (an event's
  * window is [t, t+gap), so the next event merges iff it lands inside),
  * spelled as windows so the result is deterministic and
  * oracle-mirrorable.
  *
  * Scale shape: both windows partition on the key (user), so the work is
  * one hash shuffle on user_id and per-user sorted scans — no global
  * ordering anywhere. Skewed power-users stay one partition each; gap
  * logic is O(events-per-user).
  */
object Sessionize {

  /** One row per (key, session): start/end epoch secs, event count, value
    * sum. `session_idx` is 0-based per key in time order.
    */
  def sessions(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      gapSecs: Long): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(col(timeCol), col(valueCol))
    val newSession =
      when(col(timeCol) - lag(col(timeCol), 1).over(byTime) >= gapSecs, 1)
        .otherwise(0)
    events
      .select(col(keyCol), col(timeCol), col(valueCol))
      .withColumn("__brk", newSession)
      .withColumn("session_idx",
        sum(col("__brk")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
  }
}
