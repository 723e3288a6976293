package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history from an append-only change
  * log — the dbt-snapshot / CDC-merge pattern: given per-key observations
  * over time, emit one row per STATE EPISODE with `valid_from` /
  * `valid_to` / `version` / `is_current`, collapsing consecutive
  * observations whose tracked attributes did not change.
  *
  * Shape at 100 TB: ONE hash shuffle on the key — both window passes
  * (the lag that detects changes, the lead that closes intervals) share
  * the same (key, order) window spec, so Catalyst plans a single
  * Exchange + Sort and runs the passes back-to-back in one stage.
  * Output is bounded by the number of actual state changes, and per-key
  * history is user-history-sized (the sessionize stance) — no key ever
  * needs more than its own partition-local sorted run.
  *
  * Determinism: `orderCols` must make the per-key order total (pass a
  * unique id as the last column) or same-timestamp flaps are
  * engine-ordered. NULL attribute values are compared null-safely
  * (NULL→NULL is "no change", NULL↔value is a change) — the `<=>`
  * semantics a CDC feed needs for nullable columns.
  */
object Scd2 {

  /** @param log      append-only observations, one row per (key, time)
    * @param keyCols  entity identity (the dimension's natural key)
    * @param tsCol    observation time column (any orderable type);
    *                 becomes valid_from
    * @param attrs    tracked attribute columns — a change in ANY opens a
    *                 new episode
    * @param orderCols extra tie-break columns appended after tsCol so
    *                 the per-key order is total
    */
  def history(log: DataFrame, keyCols: Seq[String], tsCol: String,
      attrs: Seq[String], orderCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val ord = (tsCol +: orderCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    // a row opens a new episode iff any tracked attr differs (null-safe)
    // from the previous observation of the same key
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val episodes = log
      .withColumn("__new", changed)
      .filter(col("__new"))
      .drop("__new")
    // intervals + versions over the collapsed frame: same partitioning,
    // one more local sort of the (much smaller) episode frame
    val we = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val out = keyCols.map(col) ++ attrs.map(col)
    episodes.select(
      out ++ Seq(
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(we).as("valid_to"),
        (row_number().over(we)).as("version"),
        lead(col(tsCol), 1).over(we).isNull.as("is_current")): _*)
  }
}
