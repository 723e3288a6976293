package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line `{"metric":...,"queries":{name:sec,...}}`.
  *
  * Each query is forced end-to-end with a `noop` write (materializes every
  * column, unlike `count()` which lets Catalyst prune the plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.benchQueries
    // JIT + parquet-footer warmup on a cheap query so timings measure the
    // engine, not first-run class loading.
    try SparkEntry.queries(names.head)(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    def time(qnames: Seq[String]): Seq[(String, Double)] = qnames.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def json(r: Seq[(String, Double)]): String =
      r.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")

    val results = time(names)
    val total = results.map(_._2).sum
    // registry-flagged pipeline ops, timed but kept OUT of "total"/
    // "queries" so the headline number stays comparable with the recorded
    // baseline set
    val extras = time(SparkEntry.benchExtraQueries)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${json(results)},"extra_queries":${json(extras)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
