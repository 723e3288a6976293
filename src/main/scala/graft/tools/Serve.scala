package graft.tools

import graft.api.{HttpApi, PgWireServer}
import graft.storage.SeriesStore
import org.apache.spark.sql.SparkSession

/** Standalone server main: `sbt "runMain graft.tools.Serve <dataDir> <port> [pgPort]"`
  * — HTTP API plus the psql-compatible pgwire listener (default 6432, the
  * reference's port, `wire/server.zig:19`).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/tmp/graft-data")
    val port = args.lift(1).map(_.toInt).getOrElse(8428)
    val pgPort = args.lift(2).map(_.toInt).getOrElse(6432)
    val spark = graft.SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new SeriesStore(spark, dataDir)
    val api = new HttpApi(store, token = sys.env.get("SYDRA_TOKEN"))
    val bound = api.start(port)
    val pgBound = new PgWireServer(store).start(pgPort)
    println(s"[serve] listening on 127.0.0.1:$bound (pgwire $pgBound) data=$dataDir")
    Thread.currentThread().join()
  }
}
