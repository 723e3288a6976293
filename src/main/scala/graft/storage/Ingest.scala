package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** NDJSON ingest — the reference's canonical input
  * (`POST /api/v1/ingest`, `/root/reference/src/sydra/http.zig:657-712`):
  * one JSON object per line `{series, ts, value? | fields?, tags?}`;
  * missing value → first numeric entry of `fields`, else 0.
  *
  * Batch and Structured Streaming share one normalization. The reference's
  * MPSC queue → writer thread → WAL → memtable → flush machinery
  * (`engine.zig:58-315`) dissolves into Spark's micro-batch engine:
  * durability = checkpointing, flush = foreachBatch append.
  */
object Ingest {

  val ndjsonSchema: StructType = StructType(Seq(
    StructField("series", StringType),
    StructField("ts", LongType),
    StructField("value", DoubleType),
    StructField("fields", MapType(StringType, DoubleType)),
    StructField("tags", MapType(StringType, StringType))))

  /** Normalize parsed NDJSON to store points (series, tags, time, value). */
  def normalize(raw: DataFrame): DataFrame =
    raw
      .filter(col("series").isNotNull && col("ts").isNotNull)
      .select(
        col("series"),
        coalesce(col("tags"), map().cast("map<string,string>")).as("tags"),
        col("ts").as("time"),
        coalesce(
          col("value"),
          // first numeric field in document order (http.zig:683-699)
          try_element_at(map_values(col("fields")), lit(1)),
          lit(0.0)).as("value"))

  /** Batch ingest of NDJSON files. */
  def batch(store: SeriesStore, path: String): Long = {
    val raw = store.spark.read.schema(ndjsonSchema).json(path)
    val pts = normalize(raw)
    store.append(pts)
    pts.count()
  }

  /** CSV ingest (`series,ts,value` header or headerless in that order) —
    * the reference's `sydra-csv` tool is an empty stub
    * (`cmd/sydra-csv/main.zig:1`); this is the working Spark version.
    */
  def csv(store: SeriesStore, path: String, header: Boolean = true): Long = {
    val raw = store.spark.read
      .option("header", header.toString)
      .schema("series STRING, ts LONG, value DOUBLE")
      .csv(path)
    val pts = raw
      .filter(col("series").isNotNull && col("ts").isNotNull)
      .select(col("series"), map().cast("map<string,string>").as("tags"),
        col("ts").as("time"), coalesce(col("value"), lit(0.0)).as("value"))
    store.append(pts)
    pts.count()
  }

  /** CLI stdin ingest (`sydradb ingest`, `server.zig:82-115`): NDJSON on
    * stdin, tags default empty.
    */
  def stdin(store: SeriesStore, in: java.io.InputStream = System.in): Long = {
    val tmp = java.nio.file.Files.createTempFile("graft-stdin", ".ndjson")
    java.nio.file.Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    try batch(store, tmp.toString)
    finally { java.nio.file.Files.delete(tmp); () }
  }

  /** Streaming ingest: watch a directory of NDJSON files, append to the
    * store per micro-batch. `Trigger.AvailableNow` drains and stops (used
    * by tests); pass a processing-time trigger for a long-lived job.
    *
    * Trigger sizing: each micro-batch pays a ~constant overhead (job
    * setup + one commit per touched hour partition — measured ≈4.9 s on
    * local[32], see BASELINE.md "ingest profile") before the ~1.2 s/1M-row
    * marginal cost, so throughput is set almost entirely by rows per
    * batch. Size the processing-time trigger so batches carry ≥1M points
    * (e.g. ≥30 s at ~30k points/s arrival); sub-second triggers spend
    * nearly all wall-clock on the constant. Latency floor = one trigger
    * interval + the constant; points are queryable after the batch's
    * append commits, matching the reference's flush-then-visible model.
    */
  def stream(
      store: SeriesStore,
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = store.spark.readStream.schema(ndjsonSchema).json(path)
    normalize(raw).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.append(batch)
      }
      .start()
  }
}
