package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      ev.printSchema()
      ev.selectExpr("ts", "CAST(ts / 1000000000 AS BIGINT) AS secs", "event_id").show(3, false)
      ev.selectExpr("conv(substring(md5('abc'),1,15),16,10)").show(1, false)
    } catch {
      case e: Throwable => println("READ FAILED: " + e)
    }
    spark.stop()
  }
}
