package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, 1.0), (60L, 2.0), (120L, 4.0), (300L, 10.0)).toDF("t", "v")
    val pts = sort_array(collect_list(when(col("v").isNotNull, struct(col("t").as("t"), col("v").as("v")))))
    val agg = df.agg(pts.as("pts"))
    agg.select(size(col("pts")).as("n"),
      slice(col("pts"), lit(2), greatest(size(col("pts")) - 1, lit(0))).as("sl")).show(false)
    agg.select(aggregate(
      slice(col("pts"), lit(2), greatest(size(col("pts")) - 1, lit(0))),
      element_at(col("pts"), 1).getField("v"),
      (acc, x) => lit(0.5) * x.getField("v") + lit(0.5) * acc).as("ema")).show(false)
    spark.stop()
  }
}
