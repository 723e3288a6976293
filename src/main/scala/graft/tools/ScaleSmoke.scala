package graft.tools

import graft.pipeline.{Dedup, IvfIndex, Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-headroom smoke: run the heavy operator families on `mult`×
  * the sf0.1 tables (id-remapped unions — measurement only; gates always
  * read the driver's parquet as-is) and report wall times. The point is
  * not the absolute numbers but the SHAPE: every op must complete with
  * the same plans that PlanSpec pins at gate scale, no OOM, no driver
  * collect growing with the input. nCells for the ANN self-join follows
  * the documented ~√n rule instead of the gate's fixed 8.
  *
  * `sbt "runMain graft.tools.ScaleSmoke [mult] [op,op,...]"` (default 10,
  * all ops; the filter lets a single family — e.g. `ann_self_join` at
  * 40× — run without paying for the rest).
  */
object ScaleSmoke {
  /** Deterministic ±-uniform 64-dim embeddings (no RNG — a hash of
    * (id, dim) picks each sign), sized n. Used where clone-amplification
    * would distort the measurement (identical clones collide totally in
    * any signature scheme).
    */
  private def synthEmb(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until 64).map(d =>
        when(pmod(col("id") * lit(2654435761L) + lit(d.toLong * 40503L), lit(9973L)) < 4986,
          lit(1.0)).otherwise(lit(-1.0))): _*).as("embedding"))

  /** CLUSTERED deterministic embeddings: n/`cluster` near-duplicate
    * clusters, each member ONE sign flip from its cluster center — the
    * clone-heavy regime where banded LSH buckets grow with cluster size
    * (members share every band not containing their flipped dim). With
    * bounded cluster size, Σ bucket² grows LINEARLY in n (cluster · n),
    * which is exactly the claim the r12 guard curve records.
    */
  private def synthClusteredEmb(spark: SparkSession, n: Long, cluster: Int): DataFrame = {
    val ctr = (col("id") / lit(cluster.toLong)).cast("long")
    val flipDim = pmod(col("id"), lit(64L)) // member's single flipped dim
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until 64).map { d =>
        // center signs from xxhash64, NOT the linear-congruential mix the
        // uniform frame uses: a linear hash makes cluster pairs at small
        // phase offsets share near-identical sign walks, silently merging
        // whole clusters into mega-buckets — measured 9× wall (207 s vs
        // ~25) and an 8 GiB-driver OOM before this fix. A clustered
        // fixture must have DISTINCT clusters or it measures the
        // adversarial case, not the clustered one.
        val base = when(pmod(xxhash64(ctr, lit(d)), lit(2L)) === 0, lit(1.0))
          .otherwise(lit(-1.0))
        when(flipDim === d && pmod(col("id"), lit(cluster.toLong)) =!= 0, base * -1.0)
          .otherwise(base)
      }: _*).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val only: Set[String] = args.drop(1).headOption
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def amplify(df: DataFrame, idCol: String): DataFrame =
      (0 until mult).map { i =>
        df.withColumn(idCol, col(idCol) + lit(i.toLong * 1000000000L))
      }.reduce(_ unionByName _)

    val docs = amplify(graft.core.Tables.documents(spark, sfDir), "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val emb = amplify(graft.core.Tables.embeddings(spark, sfDir), "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val nVec = emb.count()

    // noop write materializes EVERY column (count() would let Catalyst
    // prune the heavy expressions — the 1× gates hash full outputs)
    def timed(tag: String)(f: => DataFrame): Option[(String, Double)] =
      if (only.nonEmpty && !only.contains(tag)) None
      else {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        Some((tag, (System.nanoTime() - t0) / 1e9))
      }

    // variant with an UNTIMED setup stage (e.g. build an index the timed
    // part appends to/probes) — setup runs only when the op is selected
    def timedStaged(tag: String)(setup: => Unit)(f: => DataFrame): Option[(String, Double)] =
      if (only.nonEmpty && !only.contains(tag)) None
      else { setup; timed(tag)(f) }

    // events amplified along the TIME axis (copy i shifts by i × 14 days):
    // same 8 tag keys, mult× points AND mult× day-partitions — the growth
    // direction the day-partitioned join machinery must absorb (amplifying
    // ids instead would just widen the key space, the easy direction)
    var clusteredEmb: Option[DataFrame] = None
    lazy val ev = {
      val e0 = graft.core.Tables.events(spark, sfDir)
      (0 until mult).map { i =>
        e0.withColumn("ts", col("ts") + lit(i.toLong * 14L * 86400L * 1000000000L))
          .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
      }.reduce(_ unionByName _)
        .select(col("event_id"), col("event_type"),
          (col("user_id") % 8).cast("string").as("tag_user"),
          (col("ts") / lit(1000000000L)).cast("long").as("time"), col("value"))
    }
    lazy val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "tag_user", "time", "value")
    lazy val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("tag_user", "time").agg(max(col("value")).as("p_value"))

    val results = Seq(
      timed("asof_join")(graft.operators.AsofJoin.backward(
        clicks, purchases, keys = Seq("tag_user"), timeCol = "time",
        rightCols = Seq("p_value"))),
      // KEY-cardinality amplification (r7 verdict #2): 100k+ synthetic
      // series × 16 days — the regime where the per-(key, day) carry
      // frame (nKeys × days rows) outgrows broadcast size. With the hard
      // broadcast() hint this OOMed/pressured the driver; unhinted, AQE
      // measures the carry at runtime and degrades to a shuffle join on
      // the same (keys, __d) the resolve pass already shuffled on.
      timed("asof_join_keys") {
        val nKeys = 100000L * math.max(1, mult / 10)
        val days = 16L
        val l = spark.range(nKeys * days).select(
          (col("id") % nKeys).cast("string").as("k"),
          ((col("id") / nKeys) * 86400L + 50000L).as("time"),
          (col("id") % 1000).as("l_val"))
        val r = spark.range(nKeys * days).select(
          (col("id") % nKeys).cast("string").as("k"),
          ((col("id") / nKeys) * 86400L + 10L).as("time"),
          (col("id") % 777).cast("double").as("r_val"))
        graft.operators.AsofJoin.backward(l, r, keys = Seq("k"),
          timeCol = "time", rightCols = Seq("r_val"))
      },
      // KEY-skew amplification (r7 verdict stretch #8): one hot key
      // carries 90% of the mass — both operators' worst case, since
      // their shuffles key on (key, day/bucket). The day/bucket split
      // already caps what one task can receive (a hot KEY still spreads
      // across days); the residual hot (key, day) cells are what AQE's
      // skew-split has to keep bounded. Right side pre-aggregates to
      // per-(key, time) uniqueness, the operator's documented contract.
      timed("asof_join_skew") {
        val n = 2000000L * math.max(1, mult / 10)
        val span = 4L * 86400L
        def keyed(id: org.apache.spark.sql.Column) =
          when(id % 10 < 9, lit("hot"))
            .otherwise(concat(lit("k"), (id % 1000).cast("string")))
        val l = spark.range(n).select(
          keyed(col("id")).as("k"),
          pmod(col("id") * 2654435761L, lit(span)).as("time"),
          (col("id") % 1000).as("l_val"))
        val r = spark.range(n / 10).select(
            keyed(col("id")).as("k"),
            pmod(col("id") * 40503L, lit(span)).as("time"),
            (col("id") % 777).cast("double").as("r_val"))
          .groupBy("k", "time").agg(max(col("r_val")).as("r_val"))
        graft.operators.AsofJoin.backward(l, r, keys = Seq("k"),
          timeCol = "time", rightCols = Seq("r_val"))
      },
      timed("range_join_skew") {
        val n = 2000000L * math.max(1, mult / 10)
        val span = 4L * 86400L
        def keyed(id: org.apache.spark.sql.Column) =
          when(id % 10 < 9, lit("hot"))
            .otherwise(concat(lit("k"), (id % 1000).cast("string")))
        val p = spark.range(n).select(
          keyed(col("id")).as("k"),
          pmod(col("id") * 2654435761L, lit(span)).as("time"),
          (col("id") % 1000).as("p_val"))
        val iv = spark.range(n / 100).select(
          keyed(col("id")).as("k"),
          pmod(col("id") * 48271L, lit(span)).as("w_start"))
          .withColumn("w_end", col("w_start") + 5400L)
        graft.operators.RangeJoin.pointInInterval(p, iv, keys = Seq("k"),
          timeCol = "time", startCol = "w_start", endCol = "w_end",
          bucket = 1800L)
      },
      timed("range_join")(graft.operators.RangeJoin.pointInInterval(
        clicks, purchases.select(col("tag_user"), col("time").as("w_start"),
          (col("time") + 5400L).as("w_end")),
        keys = Seq("tag_user"), timeCol = "time",
        startCol = "w_start", endCol = "w_end", bucket = 1800L)),
      // the integer-statistic scans: mult× (series, day) groups of the
      // same per-group size — growth must stay linear in the group count
      timed("cusum")(graft.operators.Trend.cusum(
        ev.groupBy(col("event_type").as("series"),
            ((col("time") - pmod(col("time"), lit(3600L)))).as("bucket"))
          .agg((floor(avg(col("value")) * 1e4 + 0.5) / 1e4).as("v"))
          .withColumn("day", col("bucket") - pmod(col("bucket"), lit(86400L))),
        Seq("series", "day"), "bucket", "v", threshold = 50.0)),
      timed("seasonal")(graft.operators.Trend.seasonalNaive(
        ev.groupBy(col("event_type").as("series"),
            ((col("time") - pmod(col("time"), lit(3600L)))).as("bucket"))
          .agg(floor(avg(col("value")) * 1e4 + 0.5).cast("long").as("vi")),
        Seq("series"), "bucket", "vi", period = 86400L, step = 3600L)),
      timed("exact_dedup")(Dedup.exact(docs)),
      timed("span_dedup")(Dedup.spanDupStats(docs)),
      timed("minhash_lsh")(Dedup.minhashLshPairs(docs, 0.8)),
      timed("weighted_sample")(Sampling.weightedSample(
        docs.withColumn("wt", (col("doc_id") % 5 + 1).cast("double")),
        "doc_id", "wt", 1000, "smoke")),
      timed("bm25")(TextAnalysis.bm25TopK(
        docs, Seq("spark", "hash", "merge"), nDocs, 100)),
      // vocab prune caps the per-doc pair explode at topV² regardless of
      // corpus size — growth must be linear in the doc count
      timed("pmi")(TextAnalysis.pmiPairs(docs, nDocs, topV = 150, minPair = 5)),
      // PageRank iterations on a synthetic power-ish graph (10 out-edges
      // per node, hubs via modulo collisions) — the edge list is built
      // directly because edge GENERATION from similarity is the
      // separately-smoked pair op; this measures the iterate-join path,
      // which must stay linear in |E| per iteration
      timed("pagerank") {
        val nNodes = 100000L * math.max(1, mult / 10)
        val edges = spark.range(nNodes * 10).select(
          (col("id") % nNodes).as("src"),
          ((col("id") * 2654435761L) % nNodes).as("dst"))
        graft.pipeline.Graph.pageRank(
          edges, spark.range(nNodes).select(col("id")), nNodes, iters = 3)
      },
      // SemDeDup under the documented k ∝ n rule (target cluster size
      // ~250): within-cluster pairs stay ~n·250/2 — the curve must be
      // ~linear in n. A fixed k here would re-quadratize the pair join
      // (n²/k), which is exactly what the scaladoc warns against.
      timed("semdedup") {
        val k = math.max(8, (nVec / 250L).toInt)
        Dedup.semDedup(emb, k = k, iters = 2)
      },
      // candidate superset stays ≤ (k−1)×partitions regardless of corpus
      // size — the curve must be ~linear (two corpus passes)
      timed("heavy_hitters")(TextAnalysis.heavyHitters(docs, 100)),
      // NOTE: ×mult amplification clones documents, so every block grows
      // ×mult and the verified-pair OUTPUT grows ×mult² — inherent to
      // near-dup ops on a mostly-duplicate corpus (minhash_lsh above has
      // the same property); the smoke checks completion, not linearity
      timed("edit_dist")(Dedup.editDistancePairs(docs, 20, 80)),
      // index write on the amplified corpus side + probe of the batch
      // side — the corpus is shingled once into the at-rest index
      timed("incr_dedup") {
        val idx = java.nio.file.Files.createTempDirectory("graft-smoke-mh")
          .toString + "/i"
        Dedup.minhashIndexWrite(docs.filter(col("doc_id") % 1000000000L < 400), idx)
        Dedup.minhashIndexProbe(spark,
          docs.filter(col("doc_id") % 1000000000L >= 400), idx, 0.8)
      },
      // merge rounds run on the DISTINCT-WORD table (invariant under doc
      // cloning) — only the one corpus pass that builds word counts
      // scales with mult
      timed("bpe")(TextAnalysis.bpeTrain(docs, 6)),
      // the 64-merge depth the driver-loop bound note is about: exact =
      // 2 jobs/merge, batched = 2 jobs/ROUND — the r10 curve in SCALE.md
      timed("bpe64")(TextAnalysis.bpeTrain(docs, 64)),
      timed("bpe64_batched")(TextAnalysis.bpeTrainBatched(docs, 64, batch = 8)),
      // round-9 continuation: drift/decontam/embedding-stats families
      timed("ks_drift")(graft.pipeline.Drift.ksTest(docs, "lang", "n_chars", "en")),
      timed("decontam_bloom")(graft.pipeline.Decontam.contaminationBloom(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), threshold = 0.5)),
      timed("pca")(graft.pipeline.Projection.pcaTop(emb, "embedding", 64)),
      timed("dup_clusters")(Dedup.dupClusters(docs, Dedup.minhashLshPairs(docs, 0.8))),
      timed("dup_clusters_star")(Dedup.dupClustersStar(docs, Dedup.minhashLshPairs(docs, 0.8))),
      timed("whiten")(graft.pipeline.Projection.whiten(emb, "embedding")),
      // round-10 additions: cms/neyman are linear corpus passes with
      // bounded summaries (1024 cells / strata-sized caps); holt_winters
      // folds grow with the TIME-amplified bucket count per series;
      // grid cells grow in COUNT not resolution under clone-amplification
      timed("cms")(TextAnalysis.cmsEstimate(docs)),
      timed("neyman")(Sampling.neymanSample(
        docs.select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "lang", "n_chars", 200, "smk")),
      timed("holt_winters")(graft.operators.Trend.holtWinters(
        ev.filter(col("event_type") === "click")
          .select(col("event_type").as("series"), col("time"), col("value")),
        Seq("series"), period = 12, step = 3600L)),
      timed("grid_dbscan")(graft.pipeline.Clustering.gridDensityClusters(
        emb, eps = 0.15, minPts = 5)),
      // FINE resolution — the regime the r10 BNLJ adjacency was
      // quadratic in (occupied cells ≈ one per point at eps 0.005):
      // under the 9-stencil equi-joins cost stays ∝ occupied cells
      timed("grid_dbscan_fine")(graft.pipeline.Clustering.gridDensityClusters(
        emb, eps = 0.005, minPts = 2)),
      // corpus-scale triangle path: kNN edges from the Hamming signature
      // scan (the q_pl_centrality_knn edge build), THEN the oriented
      // wedge close — never the exact all-pairs edge set
      timed("triangles_knn") {
        val knn = graft.pipeline.Similarity.hammingTopK(emb, emb, 4, candMult = 4)
        val pairs = knn.select(
            least(col("q_id"), col("vec_id")).as("a"),
            greatest(col("q_id"), col("vec_id")).as("b"))
          .filter(col("a") =!= col("b")).distinct()
        graft.pipeline.Graph.triangles(pairs, emb.select(col("vec_id").as("id")))
      },
      // the banded alternative: LSH-bucketed candidate pairs feed the
      // same wedge close — linear-ish edge generation vs the kNN route's
      // n² (32×-lighter) signature compares; at 100 TB THIS is the
      // triangle path, the kNN route is the quality-controlled variant
      // for query-batch-sized frontiers
      timed("triangles_lsh") {
        val pairs = graft.pipeline.Similarity.cosinePairsLsh(emb, 0.45)
          .select(least(col("vec_a"), col("vec_b")).as("a"),
            greatest(col("vec_a"), col("vec_b")).as("b")).distinct()
        graft.pipeline.Graph.triangles(pairs, emb.select(col("vec_id").as("id")))
      },
      // containment inherits the span-dedup candidate property under
      // clone amplification (every block ×mult ⇒ candidate pairs ×mult²)
      // — completion is the claim; ppr rides the banded LSH edge set
      timed("containment")(Dedup.containmentPairs(docs, 0.7)),
      timed("ppr_lsh") {
        val pairs = graft.pipeline.Similarity.cosinePairsLsh(emb, 0.45)
        val edges = graft.pipeline.Graph.undirected(pairs, "vec_a", "vec_b")
        graft.pipeline.Graph.pageRankPersonalized(edges,
          emb.select(col("vec_id").as("id")),
          emb.filter(col("vec_id") % 1000000000L < 10).select(col("vec_id").as("id")),
          nSeeds = 10L * mult, iters = 3)
      },
      // kNN-graph construction shoot-out (r11): the chunked exact route is
      // ceil(n/limit) FULL corpus scans — Θ(n²/limit) — while the banded
      // route only pays for band collisions. Clone-amplified embeddings
      // would collide totally (identical sig per clone), so this smoke
      // builds a SYNTHETIC nVec-sized ±-uniform frame (worst case for
      // recall, fair for cost). Band width follows the documented
      // dim/bands ≳ log2(n) rule → 16-bit bands at this n.
      // fixture materialized first (localCheckpoint) like the clustered
      // curve below: real sizes for the join planner, no synthetic
      // projection re-inlined into every task binary
      timedStaged("knn_graph_banded") { clusteredEmb = Some(
        synthEmb(spark, nVec).localCheckpoint(true)) } {
        graft.pipeline.Similarity.knnGraphBanded(
          clusteredEmb.get, 4, bands = 4, candMult = 4)
      },
      // r12: the CLUSTERED (clone-amplified) curve with AUTO-SIZED bands
      // (bands = 0 → width from log2 n) and the bucket guard live —
      // n/200 near-dup clusters give cluster-sized band buckets (probe:
      // max 156, Σ bucket² 9.1e6 at n=20k), so candidate growth is
      // Σ bucket² ≈ 200·n: the curve must track the uniform banded
      // build's slope (linear-ish), nowhere near the exact route's
      // quadratic, and the guard must NOT trip. The fixture is
      // MATERIALIZED first (localCheckpoint): a real corpus is a parquet
      // scan, and without truncation the 64-expression synthetic
      // projection re-inlines into every task binary of the self-join
      // DAG (measured: task-deserialization OOM at 8 GiB).
      timedStaged("knn_graph_banded_clustered") { clusteredEmb = Some(
        synthClusteredEmb(spark, nVec, 200).localCheckpoint(true)) } {
        graft.pipeline.Similarity.knnGraphBanded(clusteredEmb.get, 4, candMult = 4)
      },
      timed("knn_graph_exact")(graft.pipeline.Similarity.hammingTopK(
        synthEmb(spark, nVec), synthEmb(spark, nVec), 4, candMult = 4)),
      timed("bm25_idx") {
        val idx = s"target/smoke-tmp/tix-$mult/i" // fixed path, no /tmp leak
        graft.pipeline.TextIndex.build(docs, idx)
        graft.pipeline.TextIndex.topK(spark, idx, Seq("spark", "hash", "merge"), 20)
      },
      // incremental append vs that full rebuild: the corpus (everything
      // but the first clone copy's doc_id < 40) is indexed UNTIMED; the
      // timed part appends a FIXED 40-doc batch + probes. Append cost =
      // batch tokenize + touched-bucket read/rewrite — must grow far
      // slower than bm25_idx above (which re-explodes the whole corpus);
      // 1024 buckets so a small batch's vocabulary leaves most partitions
      // untouched (the locality a 100 TB index would size for)
      timedStaged("bm25_idx_append") {
        graft.pipeline.TextIndex.build(
          docs.filter(col("doc_id") >= 40), s"target/smoke-tmp/tixa-$mult/i",
          nBuckets = 1024)
      } {
        val idx = s"target/smoke-tmp/tixa-$mult/i"
        graft.pipeline.TextIndex.append(spark, docs.filter(col("doc_id") < 40), idx)
        graft.pipeline.TextIndex.topK(spark, idx, Seq("spark", "hash", "merge"), 20)
      },
      // r11 continuation: modularity over the banded LSH edge set — the
      // same node-keyed equi-join profile as pagerank (edges ⋈ labels ×2
      // + label-sized aggregates); cost ∝ edges, never pairs
      timed("modularity") {
        val pairs = graft.pipeline.Similarity.cosinePairsLsh(emb, 0.45)
          .select(least(col("vec_a"), col("vec_b")).as("a"),
            greatest(col("vec_a"), col("vec_b")).as("b")).distinct()
        graft.pipeline.Graph.modularity(pairs,
          emb.select(col("vec_id").as("node"), (col("vec_id") % 97).as("label")))
      },
      // sketch-cell sliding windows: one raw pass builds the day cells,
      // then the 7-stencil explode works on the CELL frame (series×days —
      // mult× days under time-axis amplification, still ≪ points)
      timed("tdigest_rolling") {
        val sv = ev.select(col("event_type").as("series"), col("time"), col("value"))
          .withColumn("day", col("time") - pmod(col("time"), lit(86400L)))
        val cells = sv.groupBy(col("series"), col("day"))
          .agg(graft.functions.TDigest.agg(col("value")).as("td"))
        graft.operators.SketchWindows.rollingQuantiles(cells, 7)
      },
      // theta set algebra: the fact-sized work is ONE sketch aggregate;
      // the pair frame stays series² regardless of mult (user space
      // amplified so the sketches run in estimation mode)
      timed("theta_pairs") {
        val e0 = graft.core.Tables.events(spark, sfDir)
        val e = (0 until mult).map(i => e0.select(
            col("event_type").as("series"),
            (col("user_id") + lit(i.toLong * 1000000L)).as("uid")))
          .reduce(_ unionByName _)
        val sk = e.groupBy(col("series"))
          .agg(graft.functions.ThetaSketch.agg(col("uid")).as("sk"))
        val a = sk.select(col("series").as("sa"), col("sk").as("ska"))
        val b = sk.select(col("series").as("sb"), col("sk").as("skb"))
        a.join(b, col("sa") < col("sb")).select(col("sa"), col("sb"),
          graft.functions.ThetaSketch.intersectEstimate(col("ska"), col("skb")).as("est"))
      },
      // late r11: k-core peel over the banded-LSH edge set — cost =
      // rounds × (one degree aggregate + two anti-joins on edges);
      // per-round localCheckpoint keeps the plan flat, so growth must
      // track edges × rounds, not nest
      timed("kcore") {
        val pairs = graft.pipeline.Similarity.cosinePairsLsh(emb, 0.45)
          .select(least(col("vec_a"), col("vec_b")).as("a"),
            greatest(col("vec_a"), col("vec_b")).as("b")).distinct()
        graft.pipeline.Graph.kCore(pairs, k = 3, maxIters = 30)
      },
      // r12: FULL core decomposition over the same banded-LSH edge set —
      // one run replaces a k-sweep of peels; per round one edges⋈state
      // join + a node-partitioned rank window, state localCheckpointed,
      // so growth must track edges × rounds like the single peel
      timed("core_numbers") {
        val pairs = graft.pipeline.Similarity.cosinePairsLsh(emb, 0.45)
          .select(least(col("vec_a"), col("vec_b")).as("a"),
            greatest(col("vec_a"), col("vec_b")).as("b")).distinct()
        graft.pipeline.Graph.coreNumbers(pairs, maxIters = 30)
      },
      // r11 continuation: file-level data-skipping manifest. The store is
      // written UNTIMED (mult× events, time-axis amplified → mult× hour
      // partitions and files); skip_manifest times the one-pass build
      // (stats + bloom aggregates share the scan — must track the data
      // linearly), skip_probe times a (series, 12 h) probe against the
      // prebuilt manifest — the serving number, which must track the
      // FILE count, not the row count
      timedStaged("skip_manifest") {
        val root = s"target/smoke-tmp/skip-$mult"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true) // rerun-safe
        val store = new graft.storage.SeriesStore(spark, root)
        store.append(ev.select(col("event_type").as("series"),
          map(lit("user"), col("tag_user")).as("tags"),
          col("time"), col("value")))
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        graft.storage.SkipIndex.build(store, s"$root/manifest")
        graft.storage.SkipIndex.read(spark, s"$root/manifest")
      },
      timedStaged("skip_probe") {
        // self-sufficient when run with only=skip_probe: build store +
        // manifest if this mult hasn't materialized them yet
        val root = s"target/smoke-tmp/skip-$mult"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$root/manifest"))) {
          fs.delete(new org.apache.hadoop.fs.Path(root), true)
          val store = new graft.storage.SeriesStore(spark, root)
          store.append(ev.select(col("event_type").as("series"),
            map(lit("user"), col("tag_user")).as("tags"),
            col("time"), col("value")))
          graft.storage.SkipIndex.build(store, s"$root/manifest")
        }
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val t0 = graft.queries.TimeSeries.T0
        val sid = spark.range(1).select(graft.core.Functions.seriesId(
          lit("click"), map(lit("user"), lit("3"))).as("s")).head().getLong(0)
        graft.storage.SkipIndex.probeScan(
          store, s"$root/manifest", t0 + 6 * 3600, t0 + 18 * 3600, sid).df
      },
      // r13: the tag-keyed cell tier on the same mult×-day store. Build
      // is one partial-aggregated pass over the points (must track rows
      // linearly); serve is the engine's `GROUP BY tag.user` quantile
      // over the full amplified span — it reads series × days × 8 cells
      // (KB blobs), so its curve must track the CELL count (mult× days),
      // never the point count
      timedStaged("tag_cells_build") {
        val root = s"target/smoke-tmp/skip-$mult"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$root/segments"))) {
          val store = new graft.storage.SeriesStore(spark, root)
          store.append(ev.select(col("event_type").as("series"),
            map(lit("user"), col("tag_user")).as("tags"),
            col("time"), col("value")))
        }
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val dir = graft.storage.SketchCells.dirFor(store)
        graft.storage.SketchCells.build(store, dir, groupTags = Seq("user"))
        graft.storage.SketchCells.readTag(spark, dir, "user")
      },
      timedStaged("tag_cells_serve") {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val dir = graft.storage.SketchCells.dirFor(store)
        if (!graft.storage.SketchCells.exists(spark, dir)) {
          if (store.isEmpty)
            store.append(ev.select(col("event_type").as("series"),
              map(lit("user"), col("tag_user")).as("tags"),
              col("time"), col("value")))
          graft.storage.SketchCells.build(store, dir, groupTags = Seq("user"))
        }
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val t0 = graft.queries.TimeSeries.T0
        val span = (mult.toLong * 14L + 14L) * 86400L // covers every shifted copy
        graft.sydraql.Engine.executeOnStore(store,
          s"select tag.user as usr, percentile_approx(value, 0.95) as p95 " +
            s"from click where time >= ${t0 - 2 * 86400} and " +
            s"time < ${t0 - 2 * 86400 + span} group by tag.user order by usr",
          graft.sydraql.CompileOptions(now = 0L)).df
      },
      // r14: the engine's exact basic-agg serving over the same store —
      // "avg per user over the whole span" reads series × days × 8 cell
      // rows (KB partials), so the curve must track the CELL count
      // (mult× days), never the point count; pairs with tag_cells_serve
      timedStaged("rollup_cells_serve") {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val dir = graft.storage.SketchCells.dirFor(store)
        // rebuild when absent OR the cells predate the r14 basic
        // partials (a stale tier would silently fall through to raw and
        // time the wrong path)
        val stale = !graft.storage.SketchCells.exists(spark, dir) ||
          !spark.read.parquet(s"$dir/td").columns.contains("sum_v")
        if (stale) {
          if (store.isEmpty)
            store.append(ev.select(col("event_type").as("series"),
              map(lit("user"), col("tag_user")).as("tags"),
              col("time"), col("value")))
          graft.storage.SketchCells.build(store, dir, groupTags = Seq("user"))
        }
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val t0 = graft.queries.TimeSeries.T0
        val span = (mult.toLong * 14L + 14L) * 86400L
        graft.sydraql.Engine.executeOnStore(store,
          s"select tag.user as usr, avg(value) as av, count() as n, " +
            s"max(value) as mx from click where time >= ${t0 - 2 * 86400} and " +
            s"time < ${t0 - 2 * 86400 + span} group by tag.user order by usr",
          graft.sydraql.CompileOptions(now = 0L)).df
      },
      // r14: RAGGED-window hybrid serving on the same store — the span
      // starts 1 h late and ends 2 h early, so the engine reads every
      // interior day from cells plus TWO hour-pruned edge scans. The
      // curve must track the cell count like rollup_cells_serve (the
      // edges are a CONSTANT ≤2 hour-partitions of raw work at every
      // mult — the whole point of the hybrid)
      timedStaged("ragged_cells_serve") {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val dir = graft.storage.SketchCells.dirFor(store)
        val stale = !graft.storage.SketchCells.exists(spark, dir) ||
          !spark.read.parquet(s"$dir/td").columns.contains("sum_v")
        if (stale) {
          if (store.isEmpty)
            store.append(ev.select(col("event_type").as("series"),
              map(lit("user"), col("tag_user")).as("tags"),
              col("time"), col("value")))
          graft.storage.SketchCells.build(store, dir, groupTags = Seq("user"))
        }
        // the at-scale configuration carries a skip manifest, and the
        // hybrid's edge scans route through it (explicit edge-hour file
        // list — ONE metadata read). Without it each edge pays a full
        // segments-table listing at plan time: measured 2 × ~8 s on the
        // 3,360-hour 10× store, dwarfing the ≤45-hour edge read.
        if (!graft.storage.SkipIndex.exists(spark,
            graft.storage.SkipIndex.dirFor(store)))
          graft.storage.SkipIndex.build(store,
            graft.storage.SkipIndex.dirFor(store))
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val t0 = graft.queries.TimeSeries.T0
        val span = (mult.toLong * 14L + 14L) * 86400L
        graft.sydraql.Engine.executeOnStore(store,
          s"select avg(value) as av, count() as n, " +
            s"percentile_approx(value, 0.95) as p95 from click " +
            s"where time >= ${t0 - 2 * 86400 + 3600} and " +
            s"time < ${t0 - 2 * 86400 + span - 7200}",
          graft.sydraql.CompileOptions(now = 0L)).df
      },
      // r14: value-stat skip probe through the language on the prebuilt
      // manifest — threshold 400 keeps ~4% of hour files at 1× (p99.9 of
      // click values is ~339), so the served rows stay tiny and the
      // curve tracks the pruned FILE count + one manifest read, not the
      // row count
      timedStaged("value_skip_probe") {
        val root = s"target/smoke-tmp/skip-$mult"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$root/skipindex"))) {
          val store = new graft.storage.SeriesStore(spark, root)
          if (store.isEmpty)
            store.append(ev.select(col("event_type").as("series"),
              map(lit("user"), col("tag_user")).as("tags"),
              col("time"), col("value")))
          graft.storage.SkipIndex.build(store,
            graft.storage.SkipIndex.dirFor(store))
        }
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val t0 = graft.queries.TimeSeries.T0
        val span = (mult.toLong * 14L + 14L) * 86400L
        graft.sydraql.Engine.executeOnStore(store,
          s"select time, value from click where time >= ${t0 - 2 * 86400} " +
            s"and time < ${t0 - 2 * 86400 + span} and value >= 400 " +
            s"order by time, value",
          graft.sydraql.CompileOptions(now = 0L)).df
      },
      // r14: the batched engine DELETE on its own throwaway store (the
      // shared smoke store must stay byte-stable for the serve curves).
      // `value >= 300` hits ~30% of hour partitions at every mult, so
      // the affected-partition count grows linearly with the time-axis
      // amplification while the JOB count stays constant — the curve
      // must be ~linear in data (one counts pass + one survivors write),
      // with none of the old per-hour job-scheduling floor
      timedStaged("delete_bounded") {
        val root = s"target/smoke-tmp/del-$mult"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true) // rerun-safe
        val store = new graft.storage.SeriesStore(spark, root)
        store.append(ev.select(col("event_type").as("series"),
          map(lit("user"), col("tag_user")).as("tags"),
          col("time"), col("value")))
        graft.storage.SkipIndex.build(store,
          graft.storage.SkipIndex.dirFor(store))
      } {
        val root = s"target/smoke-tmp/del-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val report = graft.storage.Maintenance.deleteRowsBounded(store,
          col("value") >= 300, Some(0L), None)
        spark.range(report.rewrittenHours.length.toLong)
          .select(lit(report.deletedRows).as("deleted"))
      },
      // r15: NAME-selector probe through the language — `from click`
      // over a 12-hour window prunes on the manifest's name bloom like
      // a by_id probe (time ∧ name bits), so the curve must track the
      // PRUNED file count + one manifest read, never the store size.
      // A bloom-less manifest is migrated with an explicit full build —
      // since r16 `refresh` upgrades INCREMENTALLY (carried rows keep
      // NULL blooms = unprunable), which is right for steady-state but
      // would leave this curve measuring the unpruned fallback.
      timedStaged("name_skip_probe") {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        if (store.isEmpty)
          store.append(ev.select(col("event_type").as("series"),
            map(lit("user"), col("tag_user")).as("tags"),
            col("time"), col("value")))
        val mdir = graft.storage.SkipIndex.dirFor(store)
        if (!graft.storage.SkipIndex.exists(spark, mdir) ||
          !graft.storage.SkipIndex.hasNameBloom(spark, mdir))
          graft.storage.SkipIndex.build(store, mdir)
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val t0 = graft.queries.TimeSeries.T0
        graft.sydraql.Engine.executeOnStore(store,
          s"select time, value from click where time >= ${t0 + 6 * 3600} " +
            s"and time < ${t0 + 18 * 3600} order by time, value",
          graft.sydraql.CompileOptions(now = 0L)).df
      },
      // r16: TAG-equality probe — `from click where tag.user = '3'` over
      // the same 12-hour window composes the k=v tag bloom with the name
      // route. On this fixture every hour file carries all 8 user values
      // (one append), so the bloom prunes no FURTHER files here; what
      // the curve pins is the probe's added cost — 3 driver-local hash
      // positions + 3 element_at per manifest row — staying flat as the
      // manifest grows 10×/20×, plus the residual on the same pruned
      // read as the name probe. StorageSpec owns the file-count pins on
      // a per-tagset-file fixture.
      timedStaged("tag_skip_probe") {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        if (store.isEmpty)
          store.append(ev.select(col("event_type").as("series"),
            map(lit("user"), col("tag_user")).as("tags"),
            col("time"), col("value")))
        val mdir = graft.storage.SkipIndex.dirFor(store)
        if (!graft.storage.SkipIndex.exists(spark, mdir) ||
          !graft.storage.SkipIndex.hasTagBloom(spark, mdir))
          graft.storage.SkipIndex.build(store, mdir)
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val t0 = graft.queries.TimeSeries.T0
        graft.sydraql.Engine.executeOnStore(store,
          s"select time, value from click where time >= ${t0 + 6 * 3600} " +
            s"and time < ${t0 + 18 * 3600} and tag.user = '3' " +
            s"order by time, value",
          graft.sydraql.CompileOptions(now = 0L)).df
      },
      // r17: the OR'd multi-select twin — the union of two pair probes
      // must cost the same driver-local array filter as the single
      // equality (2× the hash positions, zero extra Spark work), so the
      // curve should sit on tag_skip_probe's within noise at every mult
      timedStaged("tag_skip_or_probe") {
        // same staging as tag_skip_probe (idempotent — a shared-run
        // store is reused, an `only=` solo run builds its own)
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        if (store.isEmpty)
          store.append(ev.select(col("event_type").as("series"),
            map(lit("user"), col("tag_user")).as("tags"),
            col("time"), col("value")))
        val mdir = graft.storage.SkipIndex.dirFor(store)
        if (!graft.storage.SkipIndex.exists(spark, mdir) ||
          !graft.storage.SkipIndex.hasTagBloom(spark, mdir))
          graft.storage.SkipIndex.build(store, mdir)
      } {
        val root = s"target/smoke-tmp/skip-$mult"
        val store = new graft.storage.SeriesStore(spark, root)
        val t0 = graft.queries.TimeSeries.T0
        graft.sydraql.Engine.executeOnStore(store,
          s"select time, value from click where time >= ${t0 + 6 * 3600} " +
            s"and time < ${t0 + 18 * 3600} and " +
            s"(tag.user = '3' or tag.user = '5') order by time, value",
          graft.sydraql.CompileOptions(now = 0L)).df
      },
      // r15: the STREAMING cell-maintenance twin (#30) at mult× ingest —
      // the batch-side serve/refresh curves exist, this records the
      // per-batch maintenance cost (td + tag tier + theta NDV + basic
      // partials per batch). Input staged as 8 files → 8 micro-batches
      // (maxFilesPerTrigger=1), so the number divides into per-batch
      // wall; each batch is mult×/8 of the point stream. Cost per batch
      // must track BATCH rows (fresh partials) + touched-day cell rows
      // (the partition-pruned merge), never the whole-store point count.
      timedStaged("stream_cells_maint") {
        val root = s"target/smoke-tmp/stream-$mult"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true) // rerun-safe
        // seed: a 1× slice appended + cells built WITH tag/ndv tiers, so
        // the stream maintains the full r14 tier surface per batch
        val seed = graft.core.Tables.events(spark, sfDir).select(
          col("event_type").as("series"),
          map(lit("user"), (col("user_id") % 8).cast("string")).as("tags"),
          (col("ts") / lit(1000000000L)).cast("long").as("time"), col("value"))
        val store = new graft.storage.SeriesStore(spark, s"$root/store")
        store.append(seed)
        graft.storage.SketchCells.build(store,
          graft.storage.SketchCells.dirFor(store),
          groupTags = Seq("user"), ndvTags = Seq("user"))
        // stage the mult× stream input as exactly 8 files = 8 batches
        ev.select(col("event_type").as("series"),
          graft.core.Functions.seriesId(col("event_type"),
            map(lit("user"), col("tag_user"))).as("series_id"),
          map(lit("user"), col("tag_user")).as("tags"),
          col("time"), col("value"))
          .repartition(8).write.parquet(s"$root/in")
      } {
        val root = s"target/smoke-tmp/stream-$mult"
        val store = new graft.storage.SeriesStore(spark, s"$root/store")
        val inSchema = spark.read.parquet(s"$root/in").schema
        val q = graft.streaming.StreamOps.tdigestCellMaintenance(
          spark.readStream.schema(inSchema)
            .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
          graft.storage.SketchCells.dirFor(store), s"$root/ckpt")
        q.awaitTermination()
        spark.read.parquet(
          s"${graft.storage.SketchCells.dirFor(store)}/td")
      },
      timed("ann_self_join") {
        // √n-rule cell count with FIXED nprobe — SCALE.md's sizing math
        // (candidates/query ≈ n·nprobe/nCells = √n·nprobe, total n^1.5).
        // Growing nprobe with nCells — what this smoke did before r7 —
        // probes a constant corpus FRACTION (n·(nCells/8)/nCells = n/8
        // candidates per query) and sends the self-join quadratic no
        // matter how cells scale; the measured 13.5→32→113 s at
        // 10→20→40× matched that n²/8 math exactly. Under fixed nprobe
        // the same points flatten to the documented n^1.5 curve.
        val nCells = math.max(8, math.sqrt(nVec.toDouble).toInt)
        val idx = java.nio.file.Files.createTempDirectory("graft-smoke-ivf").toString + "/i"
        val cs = IvfIndex.build(emb, idx, nCells = nCells, iters = 2)
        IvfIndex.topK(spark, idx, emb, 3, nprobe = math.min(nCells, 16),
          centroids = Some(cs), maxDriverBatch = 0)
      }).flatten
    val qjson = results.map { case (t, s) => f""""$t":$s%.1f""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_smoke","mult":$mult,"n_docs":$nDocs,"n_vectors":$nVec,"ops":$qjson}""")
    spark.stop()
  }
}
