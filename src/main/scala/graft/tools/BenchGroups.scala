package graft.tools

/** Print the bench extras family compositions (the exact ≤12-query
  * child-JVM groups `graft.Bench` runs) — the bracket workflow replays
  * these compositions in fresh JVMs to record family-cold columns in
  * BASELINE.md. No Spark session needed.
  */
object BenchGroups {
  def main(args: Array[String]): Unit =
    graft.Bench.extraGroups(graft.SparkEntry.benchExtraQueries).foreach {
      case (fam, qs) => println(s"$fam\t${qs.mkString(",")}")
    }
}
