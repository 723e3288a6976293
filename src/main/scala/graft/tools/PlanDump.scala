package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round helper: write `.explain("formatted")` output for named
  * gates to files (`runMain graft.tools.PlanDump <sfDir> <outDir> <suffix>
  * <q1> <q2> …`) — the judge checks plan claims against
  * `plans/r17/<query>_before.txt` / `..._after.txt`, so the dump must be the
  * real formatted plan of the exact registry query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, rest @ _*) = args.toSeq.toArray: @unchecked
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (n <- rest) {
      val df = graft.queries.Registry.byName(n).run(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
