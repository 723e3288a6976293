package graft.tools

import graft.api.HttpApi
import graft.storage.SeriesStore
import org.apache.spark.sql.SparkSession

/** Standalone server main: `sbt "runMain graft.tools.Serve <dataDir> <port>"`. */
object Serve {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/tmp/graft-data")
    val port = args.lift(1).map(_.toInt).getOrElse(8428)
    val spark = graft.SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val api = new HttpApi(new SeriesStore(spark, dataDir), token = sys.env.get("SYDRA_TOKEN"))
    val bound = api.start(port)
    println(s"[serve] listening on 127.0.0.1:$bound data=$dataDir")
    Thread.currentThread().join()
  }
}
