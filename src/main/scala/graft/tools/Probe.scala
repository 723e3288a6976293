package graft.tools

import graft.core.Tables
import graft.pipeline.{Dedup, TextAnalysis}
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
    println(s"shingled=${sh.count()} t=${(System.nanoTime()-t0)/1e9}")
    val t3 = System.nanoTime()
    val n = Dedup.ngramJaccardPairs(docs, 0.8).count()
    println(s"full ngram pairs=$n t=${(System.nanoTime()-t3)/1e9}")
    val t4 = System.nanoTime()
    val m = Dedup.minhashLshPairs(docs, 0.8).count()
    println(s"full minhash pairs=$m t=${(System.nanoTime()-t4)/1e9}")
    spark.stop()
  }
}
