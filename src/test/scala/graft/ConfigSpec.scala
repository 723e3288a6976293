package graft

import graft.storage.{Config, Ingest, SeriesStore}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Config parser corpus (config.zig:35-105) + CLI command smoke tests. */
class ConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("toml subset: all reference keys, quoting, comments, ns overrides") {
    val cfg = Config.parse(
      """# sydradb.toml
        |data_dir = "/var/lib/sydra"
        |http_port = 9090
        |flush_interval_ms = 500
        |memtable_max_bytes = 1048576
        |retention_days = 30
        |fsync = "always"
        |mem_limit_bytes = 67108864
        |auth_token = "sekrit"
        |enable_influx = true
        |enable_prom = false
        |retention.cpu = 7
        |retention.tmp = 1
        |unknown_key = whatever
        |""".stripMargin)
    assert(cfg.dataDir === "/var/lib/sydra")
    assert(cfg.httpPort === 9090)
    assert(cfg.flushIntervalMs === 500)
    assert(cfg.memtableMaxBytes === 1048576L)
    assert(cfg.retentionDays === 30L)
    assert(cfg.fsync === "always")
    assert(cfg.memLimitBytes === 67108864L)
    assert(cfg.authToken === "sekrit")
    assert(cfg.enableInflux === true)
    assert(cfg.enableProm === false)
    assert(cfg.retentionNs === Map("cpu" -> 7L, "tmp" -> 1L))
  }

  test("ttlForSeries: namespace override else global (config.zig:96-105)") {
    val cfg = Config(retentionDays = 30, retentionNs = Map("cpu" -> 7L))
    assert(cfg.ttlForSeries("cpu.total") === 7L)
    assert(cfg.ttlForSeries("cpu") === 7L) // no dot → whole name is the ns
    assert(cfg.ttlForSeries("mem.used") === 30L)
    assert(Config.namespaceOf("a.b.c") === "a")
  }

  test("defaults match the reference when sydradb.toml is absent (server.zig:34-48)") {
    val cfg = Config.loadOrDefault("/nonexistent/sydradb.toml")
    assert(cfg === Config())
    assert(cfg.dataDir === "./data")
    assert(cfg.httpPort === 8080)
    assert(cfg.retentionDays === 0L)
  }

  test("cli: query prints id-scoped range; stats counts segments; snapshot/restore round-trip") {
    val root = Files.createTempDirectory("graft-cli").toString
    val store = new SeriesStore(spark, s"$root/data")
    val nd = Files.createTempDirectory("graft-cli-nd")
    Files.write(nd.resolve("in.ndjson"), Seq(
      """{"series":"m","ts":10,"value":1.5}""",
      """{"series":"m","ts":20,"value":2.5}""",
      """{"series":"other","ts":15,"value":9.0}""").mkString("\n").getBytes)
    Ingest.batch(store, nd.toString)
    val sid = store.scan().filter(org.apache.spark.sql.functions.col("series") === "m")
      .select("series_id").head().getLong(0)
    val cfg = Config(dataDir = s"$root/data")

    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.tools.Cli.run("query", Array(java.lang.Long.toUnsignedString(sid), "0", "100"), cfg, store)
    }
    assert(out.toString.trim.linesIterator.toSeq === Seq("10,1.5", "20,2.5"))

    val statsOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(statsOut)) {
      graft.tools.Cli.run("stats", Array.empty, cfg, store)
    }
    assert(statsOut.toString.linesIterator.next().matches("segments_total \\d+"))

    graft.tools.Cli.run("snapshot", Array(s"$root/snap"), cfg, store)
    val cfg2 = Config(dataDir = s"$root/data2")
    val store2 = new SeriesStore(spark, s"$root/data2")
    graft.tools.Cli.run("restore", Array(s"$root/snap"), cfg2, store2)
    assert(store2.scan().count() === 3)
  }

  test("bench families frozen: every extra has a pinned slot, insertions cannot shift existing pairs") {
    val extras = SparkEntry.benchExtraQueries
    // every flagged extra has a frozen (family, slot) — groups() would
    // throw otherwise, and a new benchExtra without a table row must fail
    // the suite here rather than at bench time
    extras.foreach(q => assert(BenchFamilies.slotOf.contains(q), s"$q missing from BenchFamilies.frozen"))
    intercept[IllegalArgumentException](BenchFamilies.groups(extras :+ "q_definitely_not_frozen"))
    // no family exceeds the child-JVM pressure cap
    BenchFamilies.frozen.foreach { case (fam, qs) =>
      assert(qs.size <= BenchFamilies.maxFamilySize, s"$fam oversize")
    }
    // slot assignment is a STATIC table: a query's (family, slot) is the
    // same no matter which other extras are flagged — i.e. inserting or
    // removing a gate can never shift an existing pair (the r11 failure
    // mode: registry-order slicing re-derived positions every run)
    val full = BenchFamilies.groups(extras)
    val without = BenchFamilies.groups(extras.filterNot(_ == "q_pl_modularity"))
    def pairs(gs: Seq[(String, Seq[String])]): Map[String, (String, Int)] =
      gs.flatMap { case (f, qs) => qs.map(q => q -> (f, BenchFamilies.slotOf(q)._2)) }.toMap
    val (pf, pw) = (pairs(full), pairs(without))
    pw.foreach { case (q, fs) => assert(pf(q) === fs, s"$q shifted when a gate was removed") }
    // within-family order follows frozen slots
    full.foreach { case (fam, qs) =>
      val slots = qs.map(BenchFamilies.slotOf(_)._2)
      assert(slots === slots.sorted, s"$fam members out of slot order")
      assert(qs.forall(BenchFamilies.slotOf(_)._1 == fam))
    }
    // the r12 freeze reproduces the exact r11 recorded composition for the
    // bracket-sensitive families (BASELINE.md family-cold tables) — pin a
    // few verbatim so an accidental table edit is loud
    val byFam = full.toMap
    assert(byFam("pl3") === Seq("q_pl_sessions", "q_pl_hard_negatives",
      "q_pl_semdedup", "q_pl_lm_bigram", "q_pl_rrf", "q_pl_pmi",
      "q_pl_triangles", "q_pl_modularity", "q_pl_ppr", "q_pl_centrality",
      "q_pl_centrality_banded", "q_pl_centrality_knn"))
    assert(byFam("dq").take(7) === Seq("q_dq_benford", "q_dq_suite",
      "q_dq_skew", "q_dq_join_estimate", "q_dq_histogram",
      "q_dq_wasserstein", "q_dq_jsd"))
    assert(byFam("tpch0").take(2) === Seq("q_tpch_q3", "q_tpch_q5"))
    // r15: the cell-serving/value-skip watch — pinned verbatim like pl3,
    // so a membership edit (which would stale the cells brackets) is loud
    assert(byFam("cells0") === Seq("q_sql_sketch_cells_tag",
      "q_sql_sketch_cells_tag_bucket", "q_sql_sketch_cells_ndv_bucket",
      "q_sql_sketch_cells_ndv_tag", "q_sql_value_skip",
      "q_sql_rollup_cells_basic", "q_sql_rollup_cells_bucket",
      "q_sql_rollup_cells_tag", "q_sql_rollup_cells_fl",
      "q_sql_rollup_cells_rate", "q_sql_sketch_cells_desc",
      "q_sql_rollup_cells_ragged"))
    assert(byFam("cells1") === Seq("q_sql_sketch_cells_ragged",
      "q_sql_rollup_cells_limit", "q_sql_rollup_cells_origin",
      "q_sql_rollup_cells_fill", "q_sql_rollup_cells_all",
      "q_sql_tag_skip", "q_sql_rollup_cells_tagfilter",
      "q_sql_tag_skip_or", "q_sql_rollup_edge_window"))
  }

  test("serve bench family frozen: shape names and order pinned (r16)") {
    // the per-round serving-latency readings (`serve_qps` in
    // BENCH_FULL.json) are bracketed per shape as `__serve_<name>` in
    // BRACKETS.json — comparable only while the shape set, order, and
    // their sydraQL stay fixed, so the composition is pinned like the
    // extras families above
    assert(graft.tools.ServeBench.shapeNames ===
      Seq("aligned", "ragged", "tag", "fleet", "origin", "tagfilter"))
  }

  test("rerun budget is severity-ordered and records its skipped tail (r17)") {
    // the r16 driver artifact capped the outlier-rerun pass at 20 in
    // REGISTRY order — the 35 worst-positioned outliers (including both
    // centrality gates that round was supposed to settle) vanished from
    // the discipline without a trace. The budget now sorts by
    // wall/bracket DESCENDING before the cap and RETURNS the tail for
    // the artifact's `reruns_skipped` list.
    val outliers = Seq(
      ("mild", 2.2, 1.0),     // 2.2x
      ("worst", 45.6, 6.5),   // 7.0x
      ("bad", 9.6, 1.0),      // 9.6x
      ("edge", 2.05, 1.0))    // 2.05x
    val (rerun, skipped) = Bench.rerunBudget(outliers, 2)
    assert(rerun.map(_._1) === Seq("bad", "worst"))
    assert(skipped.map(_._1) === Seq("mild", "edge"))
    // cap >= size: everything reruns, nothing skipped
    val (all, none) = Bench.rerunBudget(outliers, 10)
    assert(all.size === 4 && none.isEmpty)
  }

  test("run_quality classifies the r16 contended signature and a clean run (r17)") {
    // contended: 55/160 bracketed extras over 1.5x with flat GC, every
    // headline query 1.4-2.3x its committed bracket — the exact r16
    // driver-run signature a judge had to re-derive by hand
    val extrasContended =
      (1 to 55).map(_ => (2.0, 0.02, 1.0)) ++ (1 to 105).map(_ => (1.1, 0.02, 1.0))
    val headlineContended = Seq(1.4, 1.5, 1.6, 1.7, 1.8, 2.0, 2.1, 2.3, 1.45, 1.55, 1.9)
    val contended = Bench.runQuality(extrasContended, headlineContended)
    assert(contended.contains("\"verdict\":\"contended\""))
    assert(contended.contains("\"extras_over_1p5x\":55"))
    assert(contended.contains("\"gc_flat\":true"))
    // clean: the builder's same-HEAD signature — extras in-band, headline
    // at/under its committed medians
    val clean = Bench.runQuality(
      (1 to 160).map(_ => (1.0, 0.02, 1.0)),
      Seq(0.95, 1.0, 1.02, 0.9, 1.05, 0.98, 1.0, 0.97, 1.01, 0.93, 0.99))
    assert(clean.contains("\"verdict\":\"clean\""))
    // one signal only (extras hot, headline flat) must NOT claim a full
    // contention verdict — it reads "mixed": look at the rows
    val mixed = Bench.runQuality(extrasContended,
      Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    assert(mixed.contains("\"verdict\":\"mixed\""))
    // GC-heavy outliers (memory signature) are not "contended" either
    val gcHeavy = Bench.runQuality(
      (1 to 55).map(_ => (2.0, 0.8, 1.0)) ++ (1 to 105).map(_ => (1.1, 0.02, 1.0)),
      headlineContended)
    assert(!gcHeavy.contains("\"verdict\":\"contended\""))
  }
}
