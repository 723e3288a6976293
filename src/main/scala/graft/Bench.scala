package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line `{"metric":...,"queries":{name:sec,...}}`.
  *
  * Each query is forced end-to-end with a `noop` write (materializes every
  * column, unlike `count()` which lets Catalyst prune the plan).
  *
  * Extras isolation (round-10 harness fix): the ~100 registry-flagged
  * extras used to run cache-isolated but in the SAME JVM as the headline
  * set, and three consecutive driver runs showed a different ANN subset
  * inflated 3–5× above its ONLY-mode bracket purely from accumulated JVM
  * pressure (heap churn + code-cache + shuffle-dir residue). Extras now run
  * in CHILD JVMs — one fresh JVM per ~12-query family, same classpath and
  * JVM flags as this process (we're forked by sbt, so `java.class.path` is
  * the real app classpath) — which makes every extra's number cold and
  * order-independent, directly comparable to BASELINE.md's ONLY-mode cold
  * column. If spawning fails (constrained environment) the harness falls
  * back to the old in-process cache-isolated pass and says so on stderr.
  *
  * Artifact durability: the full result JSON is written to
  * `target/bench_result.json` AND `BENCH_FULL.json` (repo root, committed
  * by the end-of-round sweep) — the driver's 2000-char stdout tail
  * truncated the r9 headline, so the file is now the artifact of record.
  * Stdout still carries the contract line, printed LAST so a tail capture
  * keeps the headline.
  */
object Bench {

  private def newSession(): SparkSession = {
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
    spark
  }

  private def time(spark: SparkSession, sfDir: String, qnames: Seq[String],
                   isolate: Boolean = false): Seq[(String, Double)] =
    qnames.map { name =>
      if (isolate) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }

  private def json(r: Seq[(String, Double)]): String =
    r.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")

  /** Split the extras into families: stable semantic key (the token after
    * `q_`), then ≤12-query chunks so no single child JVM re-accumulates
    * the pressure this design exists to avoid. Registry order preserved
    * within a family, so numbers stay comparable run-over-run.
    */
  private[graft] def extraGroups(extras: Seq[String]): Seq[(String, Seq[String])] = {
    val keyed = extras.groupBy(n => n.split("_").lift(1).getOrElse("misc"))
    keyed.toSeq.sortBy(_._1).flatMap { case (fam, qs) =>
      qs.grouped(12).zipWithIndex.map { case (chunk, i) =>
        (if (qs.size <= 12) fam else s"$fam$i") -> chunk
      }
    }
  }

  /** Re-create this JVM's flags for a child (we are sbt-forked, so the
    * input args are exactly build.sbt's javaOptions: add-opens + -Xmx).
    */
  private def childCommand(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq.filterNot(a =>
        a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")
  }

  /** Run one extras family in a fresh child JVM; returns timings, or None
    * if the child could not run (caller falls back in-process).
    */
  private def runGroupInChild(fam: String, qs: Seq[String]): Option[Seq[(String, Double)]] = {
    val outFile = java.nio.file.Files.createTempFile(s"bench_$fam", ".json")
    val logDir = new java.io.File("target/bench_logs")
    logDir.mkdirs()
    val log = new java.io.File(logDir, s"$fam.log")
    try {
      val pb = new ProcessBuilder(childCommand(): _*)
      pb.environment().put("SPARK_GRAFT_BENCH_GROUP", qs.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", outFile.toString)
      // child stdout/stderr -> per-family log; parent stdout stays clean
      // for the driver's capture.
      pb.redirectErrorStream(true)
      pb.redirectOutput(ProcessBuilder.Redirect.to(log))
      val p = pb.start()
      val done = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) { p.destroyForcibly(); System.err.println(s"[bench] child $fam timed out"); return None }
      if (p.exitValue() != 0) { System.err.println(s"[bench] child $fam rc=${p.exitValue()} (see $log)"); return None }
      val txt = new String(java.nio.file.Files.readAllBytes(outFile), "UTF-8")
      val pat = "\"([^\"]+)\":([0-9.]+)".r
      val m = pat.findAllMatchIn(txt).map(x => x.group(1) -> x.group(2).toDouble).toMap
      if (qs.forall(m.contains)) Some(qs.map(q => q -> m(q))) else {
        System.err.println(s"[bench] child $fam output incomplete (see $log)"); None
      }
    } catch {
      case e: Throwable => System.err.println(s"[bench] child $fam spawn failed: $e"); None
    } finally java.nio.file.Files.deleteIfExists(outFile)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---- child mode: time one extras family cold, write JSON, exit ----
    sys.env.get("SPARK_GRAFT_BENCH_GROUP").foreach { csv =>
      val out = sys.env("SPARK_GRAFT_BENCH_OUT")
      val qs = csv.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      val spark = newSession()
      // JIT + parquet-footer warmup on the cheap headline head so child
      // numbers measure the query, not first-run class loading (same
      // warmup ONLY-mode rep-1 cold runs get).
      try SparkEntry.queries(SparkEntry.benchQueries.head)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val r = time(spark, sfDir, qs, isolate = true)
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json(r).getBytes("UTF-8"))
      spark.stop()
      return
    }

    val spark = newSession()
    val names = SparkEntry.benchQueries
    // JIT + parquet-footer warmup on a cheap query so timings measure the
    // engine, not first-run class loading.
    try SparkEntry.queries(names.head)(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // dev mode for per-op variance brackets: SPARK_GRAFT_BENCH_ONLY=a,b
    // [SPARK_GRAFT_BENCH_REPS=3] runs just those queries N times each and
    // prints all rep timings (rep 1 in a fresh JVM = cold; later = warm).
    // The driver's standard single-pass output path is untouched.
    sys.env.get("SPARK_GRAFT_BENCH_ONLY").foreach { csv =>
      val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
      val qs = csv.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      val unknown = qs.filterNot(SparkEntry.queries.contains)
      require(unknown.isEmpty, s"unknown bench queries: ${unknown.mkString(", ")}")
      val runs = (1 to reps).map(_ => time(spark, sfDir, qs))
      val byQ = qs.map { q =>
        "\"" + q + "\":[" + runs.map(_.toMap.apply(q)).map(t => f"$t%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      println(s"""{"metric":"reps","reps":$reps,"queries":$byQ,"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    val results = time(spark, sfDir, names)
    val total = results.map(_._2).sum

    // registry-flagged pipeline ops, timed but kept OUT of "total"/
    // "queries" so the headline number stays comparable with the recorded
    // baseline set. Each family runs in a FRESH child JVM (scaladoc above);
    // SPARK_GRAFT_BENCH_NOCHILD=1 forces the legacy in-process pass.
    val noChild = sys.env.get("SPARK_GRAFT_BENCH_NOCHILD").contains("1")
    val groups = extraGroups(SparkEntry.benchExtraQueries)
    // ACTUAL per-family mode, recorded — the artifact must not claim
    // "child-jvm" for a family that silently fell back in-process (its
    // numbers would then be compared against the wrong bracket column)
    val famModes = scala.collection.mutable.LinkedHashMap[String, String]()
    val extras = groups.flatMap { case (fam, qs) =>
      val t0 = System.nanoTime()
      val viaChild = if (noChild) None else runGroupInChild(fam, qs)
      val r = viaChild.getOrElse {
        if (!noChild) System.err.println(s"[bench] $fam: in-process fallback")
        spark.catalog.clearCache()
        System.gc()
        time(spark, sfDir, qs, isolate = true)
      }
      famModes(fam) = if (viaChild.isDefined) "child-jvm" else "in-process"
      System.err.println(f"[bench] family $fam%-12s ${qs.size}%2d queries " +
        f"${r.map(_._2).sum}%7.2f s query-time, ${(System.nanoTime() - t0) / 1e9}%7.2f s wall" +
        (if (viaChild.isDefined) " (child JVM)" else " (in-process)"))
      r
    }
    val isolation = famModes.values.toSet.toList match {
      case one :: Nil => one
      case Nil => if (noChild) "in-process" else "child-jvm"
      case _ => "mixed"
    }
    val famJson = famModes.map { case (f, m) => "\"" + f + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")

    val fullJson =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${json(results)},"extra_queries":${json(extras)},"extras_isolation":"$isolation","extras_isolation_families":$famJson,"sf":"$sfDir"}"""
    // File of record (the driver's stdout tail truncated the r9 headline).
    new java.io.File("target").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_result.json"),
      fullJson.getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      fullJson.getBytes("UTF-8"))
    println(fullJson)
    // Compact headline LAST so any tail capture keeps it even when the
    // full line exceeds the capture window.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${json(results)},"sf":"$sfDir","full_result":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
