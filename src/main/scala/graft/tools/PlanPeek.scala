package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev helper: print the executed physical plan of named gates
  * (`runMain graft.tools.PlanPeek <sfDir> <q1> <q2> …`).
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.toSeq.tail) {
      println(s"===== $n")
      println(graft.queries.Registry.byName(n).run(spark, args(0))
        .queryExecution.executedPlan.toString.take(5000))
    }
  }
}
