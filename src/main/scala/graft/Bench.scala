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
    // The bounded second-phase global ranks (Sampling.weightedSample /
    // capPerStratum, TextAnalysis.bm25TopK — inputs provably ≤
    // n×partitions / k rows; see SCALE.md "bounded global ranks") trip
    // WindowExec's blanket all-to-one warning on every plan build; at
    // bench/production volume that buries real signals, so demote that
    // one logger. A constant partition key cannot silence it instead:
    // EliminateWindowPartitions folds it away.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    val names = SparkEntry.benchQueries
    // JIT + parquet-footer warmup on a cheap query so timings measure the
    // engine, not first-run class loading.
    try SparkEntry.queries(names.head)(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    def time(qnames: Seq[String], isolate: Boolean = false): Seq[(String, Double)] = qnames.map { name =>
      if (isolate) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def json(r: Seq[(String, Double)]): String =
      r.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")

    // dev mode for per-op variance brackets: SPARK_GRAFT_BENCH_ONLY=a,b
    // [SPARK_GRAFT_BENCH_REPS=3] runs just those queries N times each and
    // prints all rep timings (rep 1 in a fresh JVM = cold; later = warm).
    // The driver's standard single-pass output path is untouched.
    sys.env.get("SPARK_GRAFT_BENCH_ONLY").foreach { csv =>
      val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
      val qs = csv.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      val unknown = qs.filterNot(SparkEntry.queries.contains)
      require(unknown.isEmpty, s"unknown bench queries: ${unknown.mkString(", ")}")
      val runs = (1 to reps).map(_ => time(qs))
      val byQ = qs.map { q =>
        "\"" + q + "\":[" + runs.map(_.toMap.apply(q)).map(t => f"$t%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      println(s"""{"metric":"reps","reps":$reps,"queries":$byQ,"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    val results = time(names)
    val total = results.map(_._2).sum
    // registry-flagged pipeline ops, timed but kept OUT of "total"/
    // "queries" so the headline number stays comparable with the recorded
    // baseline set. Extras run cache-ISOLATED (clean cache before each):
    // with 40+ extras, whatever ran earlier otherwise competes for
    // executor cache with cache-sensitive fits (the k-means family drifted
    // 0.95 → 6.57 s on ordering alone — r7 verdict #1/#6), producing false
    // `weak` candidates. Isolation makes each extra's single-run number
    // order-independent; compare against BASELINE.md's ONLY-mode cold
    // column, not the warm mins.
    val extras = time(SparkEntry.benchExtraQueries, isolate = true)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${json(results)},"extra_queries":${json(extras)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
