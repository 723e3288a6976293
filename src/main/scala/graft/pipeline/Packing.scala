package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: documents are concatenated in
  * a deterministic order and chunked into fixed-size context windows; each
  * doc is annotated with its global token offset and the chunk range it
  * lands in (the standard concat-and-chunk batching used to build LM
  * training sequences).
  *
  * The global running offset is a prefix sum over a total order — the
  * naive Spark spelling (`Window.orderBy` with no partition) collapses to
  * ONE partition and dies at scale. [[prefixSum]] is the scale-safe
  * two-pass form: range-partition by the order key, per-partition window
  * for local sums (parallel), then per-partition totals — one tiny row per
  * partition — are cumulated and added back as base offsets. The offsets
  * are a pure function of the data (independent of partition count), so
  * results are identical on 1 executor or 1000.
  */
object Packing {

  /** Appends `offsetCol` = exclusive prefix sum of `valueCol` in ascending
    * `keyCol` order (keys must be unique — ties would make the order, and
    * thus the offsets, ambiguous).
    */
  def prefixSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      offsetCol: String,
      parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(n, col(keyCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin partition ids across the two passes
    // pass 1: per-partition totals — n rows, driver cumsum is O(partitions).
    // cast+coalesce: works for any integral valueCol and all-null partitions
    val totals = ranged.groupBy("__pid")
      .agg(coalesce(sum(col(valueCol)), lit(0L)).cast("long").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases: Seq[(Int, Long)] =
      totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2).init)
    // base offsets join back as a broadcast table — a when-chain literal
    // would codegen one branch per partition (pathological at 10k splits)
    val baseDf = spark.createDataFrame(bases).toDF("__pid", "__base")
    // pass 2: parallel per-partition running sum + broadcast base offset
    val w = Window.partitionBy("__pid").orderBy(keyCol)
    ranged
      .join(broadcast(baseDf), Seq("__pid"))
      .withColumn(offsetCol, sum(col(valueCol)).over(w) - col(valueCol) + col("__base"))
      .drop("__pid", "__base")
  }

  /** Chunk assignments for concat-and-chunk packing with `ctxLen`-token
    * windows: (doc_id, n_tokens, start_offset, first_chunk, last_chunk).
    * A doc spanning a chunk boundary appears in every chunk it touches.
    */
  def chunkAssignments(docs: DataFrame, ctxLen: Int): DataFrame = {
    val counted = TextAnalysis.spread(docs).select(
      col("doc_id"),
      regexp_count(col("text"), lit(TextAnalysis.TokenPattern)).cast("long").as("n_tokens"))
    prefixSum(counted, "doc_id", "n_tokens", "start_offset")
      .select(
        col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / ctxLen).cast("long").as("first_chunk"),
        floor((col("start_offset") + greatest(col("n_tokens"), lit(1L)) - 1L) / ctxLen)
          .cast("long").as("last_chunk"))
  }
}
