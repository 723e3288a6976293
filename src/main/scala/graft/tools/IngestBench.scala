package graft.tools

import graft.SparkEntry
import graft.storage.SeriesStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest throughput benchmark mirroring the reference harness shape
  * (`tools/bench_alloc.zig`: 200k ops, 128 series default): synthesizes
  * points, appends through the full store path (series-id hashing, hour
  * bucketing, partitioned parquet write), reports ops/s.
  *
  * `sbt "runMain graft.tools.IngestBench [ops] [series]"`
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val ops = args.headOption.map(_.toLong).getOrElse(200000L)
    val nSeries = args.lift(1).map(_.toInt).getOrElse(128)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-bench").toString
    val store = new SeriesStore(spark, root)
    // one day of data spread over nSeries series, ~ops points
    val pts = spark.range(ops).select(
      concat(lit("bench.s"), (col("id") % nSeries).cast("string")).as("series"),
      map(lit("host"), (col("id") % 8).cast("string")).as("tags"),
      (lit(1704067200L) + (col("id") * 86400L / ops)).cast("long").as("time"),
      (col("id") % 1000).cast("double").as("value"))
    val t0 = System.nanoTime()
    store.append(pts)
    val secs = (System.nanoTime() - t0) / 1e9
    val n = store.scan().count()
    println(f"""{"metric":"ingest_ops_per_sec","value":${n / secs}%.0f,"ops":$n,"seconds":$secs%.2f,"series":$nSeries,"partitions":${store.partitions().size}}""")
    spark.stop()
  }
}
