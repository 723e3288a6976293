package graft.tools

import graft.storage.{Ingest, SeriesStore, SydraImport}
import graft.sydraql.{CompileOptions, Engine}
import org.apache.spark.sql.SparkSession

/** Scratch probe main — not part of the library surface. Currently: drive
  * the SYSEG2 export/import cycle end-to-end and query the imported store
  * through sydraQL.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("probe").toString
    val store = new SeriesStore(spark, s"$tmp/store")
    val nd = java.nio.file.Files.createTempDirectory("probe-nd")
    java.nio.file.Files.write(nd.resolve("in.ndjson"),
      (0 until 500).map(i => s"""{"series":"cpu.s${i % 4}","ts":${1000 + i * 7},"value":${i % 97 * 0.5},"tags":{"host":"h${i % 3}"}}""")
        .mkString("\n").getBytes)
    Ingest.batch(store, nd.toString)
    val n = SydraImport.exportDataDir(store, s"$tmp/export")
    println(s"exported $n points")
    val restored = new SeriesStore(spark, s"$tmp/restored")
    SydraImport.importDataDir(restored, s"$tmp/export")
    println(s"imported rows=${restored.scan().count()}")
    val q = Engine.executeOnStore(restored,
      "select time_bucket(600, time) as b, avg(value) as a, count() as n from cpu.s1 where time >= 0 group by time_bucket(600, time) order by b",
      CompileOptions(now = 5000L))
    q.df.show(5, false)
    // cross-check against the original store
    val orig = Engine.executeOnStore(store,
      "select time_bucket(600, time) as b, avg(value) as a, count() as n from cpu.s1 where time >= 0 group by time_bucket(600, time) order by b",
      CompileOptions(now = 5000L))
    val same = orig.df.collect().map(_.toString).toSeq
    // imported store has synthetic names; compare by series_id instead
    val idOrig = store.scan().filter(org.apache.spark.sql.functions.col("series") === "cpu.s1")
      .select("series_id").distinct().collect().map(_.getLong(0)).toSet
    val idBack = restored.scan().select("series_id").distinct().collect().map(_.getLong(0)).toSet
    println(s"orig cpu.s1 ids=$idOrig subset-of imported=${idOrig.subsetOf(idBack)} origRows=${same.length}")
    spark.stop()
  }
}
