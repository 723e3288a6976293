package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for two-dimensional scan pruning.
  *
  * The hour-partitioned [[SeriesStore]] layout prunes on TIME; a query
  * that also carries a selective second predicate (a user range, a series
  * bucket) still reads every row-group inside the surviving hours. Writing
  * the table sorted by the interleaved Z-value of BOTH columns makes every
  * parquet file/row-group cover a small rectangle of the (a, b) key space,
  * so each file's min/max stats are tight on BOTH columns and the scan's
  * pushed filters prune files on EITHER predicate — the standard
  * multi-dimensional clustering trade (each dimension's per-file span
  * widens from 1/files to ~1/√files, both dimensions prune).
  *
  * Everything is plain Column arithmetic inside whole-stage codegen: the
  * bit-spread is the classic shift-mask ladder, the only extra pass is the
  * one metadata-sized min/max aggregate that pins the normalization, and
  * the write is `repartitionByRange(zkey)` + in-partition sort — one range
  * shuffle, the same cost as any global sort-write.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i
    * (interleave-ready): the shift-mask ladder, all long arithmetic.
    */
  private def spread16(x: Column): Column = {
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(m1)
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(m2)
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(m3)
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(m4)
  }

  /** 32-bit Morton key from two 16-bit lane values (a even bits, b odd). */
  private[storage] def interleave(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Normalize a numeric column to the [0, 65535] lane given its global
    * (min, max); constant columns map to 0.
    */
  private def lane(c: Column, mn: Column, mx: Column): Column =
    when(mx > mn,
      ((c.cast("double") - mn) / (mx - mn) * 65535.0).cast("long"))
      .otherwise(lit(0L))

  /** Write `df` to `path` clustered by the Z-value of (`colA`, `colB`):
    * one min/max aggregate (broadcast as plan literals via crossJoin of a
    * one-row frame), range-partition + sort on the Morton key, parquet
    * write. `buckets` bounds the file count so per-file spans are
    * meaningful at any input size.
    */
  def write(df: DataFrame, path: String, colA: String, colB: String,
      buckets: Int = 16): Unit = {
    val bounds = df.agg(
      min(col(colA).cast("double")).as("__amn"),
      max(col(colA).cast("double")).as("__amx"),
      min(col(colB).cast("double")).as("__bmn"),
      max(col(colB).cast("double")).as("__bmx"))
    val z = interleave(
      lane(col(colA), col("__amn"), col("__amx")),
      lane(col(colB), col("__bmn"), col("__bmx")))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .repartitionByRange(buckets, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__amn", "__amx", "__bmn", "__bmx")
      .write.mode("overwrite").parquet(path)
  }
}
