package graft.tools

import graft.core.Tables
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val sh = TextAnalysis.shingleSets(docs, 3).cache()
    println(s"docs=${docs.count()} shingled=${sh.count()} t=${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    val prefixLen = (size(col("hs")) - ceil(lit(0.8) * size(col("hs"))).cast("int") + 1)
    val ex = sh.select(col("doc_id"), explode(slice(col("hs"), lit(1), prefixLen)).as("h"))
    println(s"prefix tokens=${ex.count()} t=${(System.nanoTime()-t1)/1e9}")
    val t2 = System.nanoTime()
    val cand = ex.as("a").join(ex.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct().cache()
    println(s"candidates=${cand.count()} t=${(System.nanoTime()-t2)/1e9}")
    spark.stop()
  }
}
