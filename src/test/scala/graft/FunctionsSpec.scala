package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val d = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def n(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x))
    d / (n(a) * n(b))
  }

  test("codegen cosine_sim is bit-identical to the HOF composition") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id")).limit(500)
    val diff = pairs.select(
      (CosineSimilarity(col("a.v"), col("b.v")) - hofCosine(col("a.v"), col("b.v"))).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(diff === 0.0, "codegen and HOF paths must agree bit-for-bit")
  }

  test("null propagation: mismatched lengths and null elements → NULL") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("a", "b")
    val got = df.select(CosineSimilarity(col("a"), col("b")).as("c")).collect()
    assert(got(0).isNullAt(0))
    assert(math.abs(got(1).getDouble(0) - 11.0 / (math.sqrt(5) * math.sqrt(25))) < 1e-15)
  }

  test("registered as SQL function cosine_sim") {
    CosineSimilarity.register(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head().getDouble(0)
    assert(r === 1.0)
  }

  test("codegen minhash_sig is identical to the HOF composition") {
    import graft.functions.MinHashSignature
    val k = 32
    val (as, bs) = MinHashSignature.coefficients(k)
    val docs = graft.pipeline.TextAnalysis.shingleSets(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"), 3)
    val hof = array((0 until k).map { i =>
      array_min(transform(col("hs"), x => (lit(as(i)) * x + lit(bs(i))) % lit(MinHashSignature.P)))
    }: _*)
    val mismatches = docs
      .select(MinHashSignature(col("hs"), k).as("kernel"), hof.as("hof"))
      .filter(col("kernel") =!= col("hof"))
      .count()
    assert(mismatches === 0L, "kernel and HOF signatures must agree exactly")
    // empty array → MaxValue sentinels (fold identity), not null
    val empty = Seq(Seq.empty[Long]).toDF("hs")
      .select(MinHashSignature(col("hs"), 4).as("sig"))
      .head().getSeq[Long](0)
    assert(empty === Seq.fill(4)(Long.MaxValue))
  }

  test("codegen sorted_intersect_size equals size(array_intersect) on sorted inputs") {
    import graft.functions.SortedIntersectSize
    // real shingle frames — the exact shape the dedup verify stage feeds it
    val sh = graft.pipeline.TextAnalysis.shingleSets(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"), 3)
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id")).limit(2000)
      .select(col("a.hs").as("ha"), col("b.hs").as("hb"))
    val mism = pairs.filter(
      SortedIntersectSize(col("ha"), col("hb")) =!= size(array_intersect(col("ha"), col("hb"))))
      .count()
    assert(mism === 0L, "kernel must equal size(array_intersect) on shingle sets")
    // edge shapes: empties, duplicates, trailing nulls (array_sort order),
    // NULL arrays — semantics must match array_intersect exactly
    val edge = Seq(
      (Seq[java.lang.Long](), Seq[java.lang.Long]()),
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long]()),
      (Seq[java.lang.Long](1L, 1L, 2L, 5L), Seq[java.lang.Long](1L, 2L, 2L, 7L)),
      (Seq[java.lang.Long](1L, 2L, null), Seq[java.lang.Long](2L, null)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L, 3L)),
      (null, Seq[java.lang.Long](1L)))
      .toDF("ha", "hb")
    val got = edge.select(
      SortedIntersectSize(col("ha"), col("hb")).as("k"),
      size(array_intersect(col("ha"), col("hb"))).as("ref")).collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"row $i null disagreement")
      if (!r.isNullAt(0)) assert(r.getInt(0) === r.getInt(1), s"row $i count disagreement")
    }
  }

  test("token_counts kernel equals the regex composition") {
    import graft.functions.TokenCounts
    import graft.pipeline.TextAnalysis.TokenPattern
    // real corpus: both counts must match the regex forms on every doc
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val mism = docs.select(
      TokenCounts(col("text")).as("tc"),
      regexp_count(col("text"), lit(TokenPattern)).cast("long").as("rt"),
      length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("rn"),
      size(split(lower(col("text")), "\\s+")).cast("long").as("rw"))
      .filter(col("tc.n_tokens") =!= col("rt") || col("tc.n_nonws") =!= col("rn") ||
        col("tc.n_words") =!= col("rw"))
      .count()
    assert(mism === 0L, "kernel counts must equal the regex composition on the corpus")
    // adversarial shapes: Java \s is ASCII-only (U+00A0 NBSP is NOT ws and
    // counts as one [^...] token), a supplementary code point is ONE token,
    // vertical tab IS Java \s, runs/mixes/empties/all-ws
    val edge = Seq("", "   ", "\t\n\f\r", "a", "abc123", "abc 123",
      "a1b2", "..", "a..b", " ", "x y", "💡💡",
      "Ж ЖЖ", "tab\there", "trailing ", " leading", "a-b_c", "9 lives!",
      "a\u000Bb", "nb\u00A0sp", "mixedЖabc1 2").toDF("text")
    val bad = edge.select(
      col("text"),
      TokenCounts(col("text")).as("tc"),
      regexp_count(col("text"), lit(TokenPattern)).cast("long").as("rt"),
      length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("rn"),
      size(split(lower(col("text")), "\\s+")).cast("long").as("rw"))
      .filter(col("tc.n_tokens") =!= col("rt") || col("tc.n_nonws") =!= col("rn") ||
        col("tc.n_words") =!= col("rw"))
      .collect()
    assert(bad.isEmpty, s"kernel disagrees on: ${bad.map(_.getString(0)).mkString("|")}")
    // NULL text → NULL struct
    val n = Seq[String](null).toDF("text")
      .select(TokenCounts(col("text")).as("tc")).head()
    assert(n.isNullAt(0))
  }

  test("codegen simhash_sig is identical to the nested-HOF form") {
    import graft.functions.SimHashSignature
    def hofSimhash(hashes: org.apache.spark.sql.Column) = aggregate(
      sequence(lit(0), lit(59)), lit(0L),
      (acc, b) => {
        val votes = aggregate(hashes, lit(0),
          (vacc, h) => vacc + when(call_function("shiftright", h, b.cast("int")).bitwiseAND(1) === 1, 1).otherwise(-1))
        acc + when(votes > 0, pow(lit(2.0), b).cast("long")).otherwise(0L)
      })
    val hof = hofSimhash(col("__h"))
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("__w", graft.pipeline.TextAnalysis.words(col("text")))
      .withColumn("__h", transform(col("__w"), x => graft.pipeline.TextAnalysis.hash60(x)))
    val mismatches = docs
      .select(SimHashSignature(col("__h")).as("kernel"), hof.as("hof"))
      .filter(col("kernel") =!= col("hof"))
      .count()
    assert(mismatches === 0L, "kernel and HOF simhash must agree exactly")
    // empty array → 0 (no votes); null elements vote like h = 0
    val edge = Seq((Seq.empty[Long], 0), (Seq(3L, 3L), 1)).toDF("hs", "tag")
      .select(SimHashSignature(col("hs")).as("sig")).collect().map(_.getLong(0))
    assert(edge(0) === 0L)
    assert(edge(1) === 3L) // both words vote +1 on bits 0 and 1
    // NULL array → 0, same as the HOF's otherwise(0) over NULL votes — a
    // null-safe (<=>) check, since =!= is null-blind (r4 advice #1)
    val nulls = Seq((1, Some(Seq(3L))), (2, None)).toDF("id", "hs")
      .withColumn("hs", col("hs").cast("array<bigint>"))
      .select(SimHashSignature(col("hs")).as("kernel"), hofSimhash(col("hs")).as("hof"))
    assert(nulls.filter(!(col("kernel") <=> col("hof"))).count() === 0L)
    assert(nulls.collect().map(_.getLong(0)).toSeq === Seq(3L, 0L))
  }

  test("codegen kmeans_assign is bit-identical to the HOF struct-min form") {
    import graft.pipeline.Clustering
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // centroids from a real fit so distances hit genuine near-ties
    val cs = Clustering.fitCentroids(
      graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001"), 8, 2)
    val kernel = Clustering.assignment(cs)
    val hof = Clustering.assignmentHof(cs)
    val mismatches = emb.select(
        kernel.getField("c").as("kc"), hof.getField("c").as("hc"),
        kernel.getField("d").as("kd"), hof.getField("d").as("hd"))
      .filter(col("kc") =!= col("hc") || col("kd") =!= col("hd"))
      .count()
    assert(mismatches === 0L, "fused kernel and HOF assignment must agree bit-for-bit")
    // edge cases: a 2-dim match computes; NULL array, null element, and
    // dim mismatch (incl. empty) → NULL
    val edge = Seq(
      (1, Some(Seq[java.lang.Double](8.0, 8.0))),
      (2, None),
      (3, Some(Seq[java.lang.Double](1.0, null))),
      (4, Some(Seq[java.lang.Double](1.0))),
      (5, Some(Seq[java.lang.Double]())))
      .toDF("id", "v")
      .select(col("id"), Clustering.assignment(Array(Seq(0.0, 0.0), Seq(9.0, 9.0)), col("v").cast("array<double>")).as("a"))
      .orderBy("id").collect()
    assert(edge(0).getStruct(1).getDouble(0) === 2.0 && edge(0).getStruct(1).getInt(1) === 1)
    assert(edge(1).isNullAt(1) && edge(2).isNullAt(1) && edge(3).isNullAt(1) && edge(4).isNullAt(1))
  }

  test("approx percentile tracks exact within sketch tolerance") {
    val sv = graft.core.Tables.seriesView(spark, "/root/testdata/sf0.01")
    val exact = sv.groupBy("series").agg(percentile(col("value"), lit(0.95)).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = graft.functions.Approx.seriesQuantiles(sv, Seq(0.95))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (series, e) =>
      assert(math.abs(approx(series) - e) / math.max(e, 1e-9) < 0.05,
        s"$series: approx ${approx(series)} vs exact $e")
    }
  }

  test("approx distinct tracks exact within rsd") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.01")
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(graft.functions.Approx.distinctApprox(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"$approx vs $exact")
  }

  test("per-(series, day) approx NDV gate tracks its exact twin per group") {
    val sf = "/root/testdata/sf0.01"
    val exact = graft.queries.Registry.byName("q_ts_ndv").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val approx = graft.queries.Registry.byName("q_ts_ndv_approx").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // identical groups and identical exact point counts
    assert(approx.keySet === exact.keySet)
    assert(exact.nonEmpty)
    exact.foreach { case (key, (nUsers, nPoints)) =>
      val (nApprox, nPointsApprox) = approx(key)
      assert(nPointsApprox === nPoints, s"$key point counts must be exact")
      // HLL++ at the default 5% rsd; 15% leaves 2-sigma headroom on the
      // smallest groups (sparse-mode groups are exact anyway)
      assert(math.abs(nApprox - nUsers).toDouble / math.max(nUsers, 1L) < 0.15,
        s"$key: approx $nApprox vs exact $nUsers")
    }
  }

  test("codegen hash60 is bit-identical to the composed conv(substring(md5)) form") {
    import spark.implicits._
    val rnd = new scala.util.Random(8675309)
    val samples = Seq("", "a", "abc", "r3:42", "ws6:1000000",
      "unicode: ü β 漢字 🙂", "x" * 4096) ++
      (1 to 200).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString) ++
      (1 to 50).map(_ => rnd.nextLong().toString)
    val df = samples.toDF("s")
    val rows = df.select(
      graft.functions.Hash60(org.apache.spark.sql.functions.col("s")).as("fused"),
      graft.pipeline.TextAnalysis.hash60Hof(org.apache.spark.sql.functions.col("s")).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    // pin one known value (int(md5('abc')[0:15], 16)) so BOTH forms moving
    // together cannot mask a drift
    val abc = df.filter($"s" === "abc")
      .select(graft.functions.Hash60($"s")).as[Long].head()
    assert(abc === 648541476951500027L)
  }

  test("codegen path actually engages (no fallback exceptions at scale)") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    val s = emb.as("a").crossJoin(emb.as("b").limit(10))
      .select(CosineSimilarity(col("a.v"), col("b.v")).as("c"))
      .agg(sum("c")).head().getDouble(0)
    assert(!s.isNaN)
  }

  // ---- t-digest ---------------------------------------------------------

  private def exactQuantile(sorted: Array[Double], q: Double): Double = {
    // linear-interpolated type-7 quantile (what percentile()/quantile_cont use)
    val h = (sorted.length - 1) * q
    val lo = h.toInt
    if (lo + 1 >= sorted.length) sorted.last
    else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
  }

  test("t-digest quantiles track exact quantiles within rank-error bound") {
    val rnd = new scala.util.Random(4242)
    // mixed distribution: uniform + lognormal-ish tail
    val xs = Array.fill(50000)(
      if (rnd.nextBoolean()) rnd.nextDouble() * 100
      else math.exp(rnd.nextGaussian() * 2 + 2))
    val td = new graft.functions.TDigest(100.0)
    xs.foreach(td.add)
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999)) {
      val est = td.quantile(q)
      // rank error: the estimate's rank in the sorted data must be within
      // ~1.5% of the target rank (k1 at delta=100 guarantees far tighter
      // at the tails; this is the loose uniform bound)
      val rank = sorted.count(_ <= est).toDouble / sorted.length
      assert(math.abs(rank - q) < 0.015, s"q=$q est=$est rank=$rank")
    }
    // extremes are exact
    assert(td.quantile(0.0) === sorted.head)
    assert(td.quantile(1.0) === sorted.last)
  }

  test("t-digest merge of partitioned digests matches single-pass within bound") {
    val rnd = new scala.util.Random(777)
    val xs = Array.fill(40000)(rnd.nextGaussian() * 10 + 50)
    val parts = xs.grouped(5000).toSeq
    val merged = new graft.functions.TDigest(100.0)
    parts.foreach { p =>
      val t = new graft.functions.TDigest(100.0)
      p.foreach(t.add)
      // serialize round-trip each partial, as the shuffle does
      merged.merge(graft.functions.TDigest.deserialize(t.serialize()))
    }
    val sorted = xs.sorted
    for (q <- Seq(0.05, 0.5, 0.95, 0.99)) {
      val rank = sorted.count(_ <= merged.quantile(q)).toDouble / sorted.length
      assert(math.abs(rank - q) < 0.02, s"q=$q rank=$rank")
    }
  }

  test("t-digest DataFrame aggregate: build, at-rest merge, extract") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 20000).map(i => (i % 7, s"day${i % 3}", rnd.nextDouble() * 1000))
    val df = rows.toDF("g", "day", "v")
    // build one digest per (g, day), then merge days per g — the at-rest
    // rollup composition — and extract p50/p95
    val perCell = df.groupBy($"g", $"day")
      .agg(graft.functions.TDigest.agg($"v").as("td"))
    val perG = perCell.groupBy($"g")
      .agg(graft.functions.TDigest.mergeAgg($"td").as("td"))
      .select($"g",
        graft.functions.TDigest.quantileOf($"td", 0.5).as("p50"),
        graft.functions.TDigest.quantileOf($"td", 0.95).as("p95"))
    val exact = df.groupBy($"g").agg(
      percentile($"v", lit(0.5)).as("e50"),
      percentile($"v", lit(0.95)).as("e95"))
    val joined = perG.join(exact, "g").collect()
    assert(joined.length === 7)
    joined.foreach { r =>
      val (p50, p95) = (r.getAs[Double]("p50"), r.getAs[Double]("p95"))
      val (e50, e95) = (r.getAs[Double]("e50"), r.getAs[Double]("e95"))
      // values are uniform on [0,1000]: quantile error ≈ 1000 × rank error
      assert(math.abs(p50 - e50) < 30, s"g=${r.get(0)} p50=$p50 exact=$e50")
      assert(math.abs(p95 - e95) < 30, s"g=${r.get(0)} p95=$p95 exact=$e95")
    }
  }

  test("theta sketch: exact below 2^lgK, bounded error above, set algebra correct") {
    import spark.implicits._
    // exact mode: 3 groups with known overlaps, < 4096 distinct each
    val rows = (0 until 3).flatMap(g => (0 until 500).map(i => (g, (g * 250 + i).toLong)))
    val sk = rows.toDF("g", "v").groupBy($"g")
      .agg(graft.functions.ThetaSketch.agg($"v").as("sk"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("sk")).toMap
    def est(op: String, a: Int, b: Int): Double = {
      val df = Seq((sk(a), sk(b))).toDF("x", "y")
      val c = op match {
        case "and" => graft.functions.ThetaSketch.intersectEstimate($"x", $"y")
        case "or" => graft.functions.ThetaSketch.unionEstimate($"x", $"y")
        case "not" => graft.functions.ThetaSketch.aNotBEstimate($"x", $"y")
        case _ => graft.functions.ThetaSketch.estimate($"x")
      }
      df.select(c).head().getDouble(0)
    }
    // groups: g0=[0,500) g1=[250,750) g2=[500,1000): |0∩1|=250, |0∩2|=0
    assert(est("est", 0, 0) === 500.0)
    assert(est("and", 0, 1) === 250.0)
    assert(est("and", 0, 2) === 0.0)
    assert(est("or", 0, 1) === 750.0)
    assert(est("not", 1, 0) === 250.0)
  }

  test("theta sketch: scalar union sizes itself from the inputs — no lgK-12 downsampling") {
    import spark.implicits._
    // lgK=14 sketch over 60k distinct values retains ~16k entries; a
    // hardcoded lgK=12 union would downsample it to 4096 nominal entries
    // and CHANGE the estimate. Self-union must be an exact fixpoint.
    val sk = (0 until 60000).map(_.toLong).toDF("v")
      .agg(graft.functions.ThetaSketch.agg($"v", lgK = 14).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val df = Seq((sk, sk)).toDF("x", "y")
    val self = df.select(graft.functions.ThetaSketch.estimate($"x")).head().getDouble(0)
    val union = df.select(graft.functions.ThetaSketch.unionEstimate($"x", $"y"))
      .head().getDouble(0)
    assert(union === self, s"self-union $union must equal the sketch's own estimate $self")
  }

  test("theta sketch: at-rest cell union matches direct build within error bound") {
    import spark.implicits._
    // 60k distinct values (> 2^12 nominal entries -> estimation mode),
    // split across 6 'day' cells; union of stored blobs vs direct
    val rows = (0 until 60000).map(i => (i % 6, i.toLong))
    val cells = rows.toDF("day", "v").groupBy($"day")
      .agg(graft.functions.ThetaSketch.agg($"v").as("sk"))
    val merged = cells.agg(graft.functions.ThetaSketch.unionAgg($"sk").as("sk"))
      .select(graft.functions.ThetaSketch.estimate($"sk")).head().getDouble(0)
    assert(math.abs(merged - 60000) < 60000 * 0.05, s"union estimate $merged")
    val direct = rows.toDF("day", "v")
      .agg(graft.functions.ThetaSketch.agg($"v").as("sk"))
      .select(graft.functions.ThetaSketch.estimate($"sk")).head().getDouble(0)
    assert(math.abs(direct - 60000) < 60000 * 0.05, s"direct estimate $direct")
  }

  test("t-digest handles nulls, empty groups, and tiny groups") {
    import spark.implicits._
    val df = Seq((1, Some(5.0)), (1, None), (2, Some(1.0)), (2, Some(2.0)))
      .toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(graft.functions.TDigest.agg($"v").as("td"))
      .select($"g", graft.functions.TDigest.quantileOf($"td", 0.5).as("p50"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(1) === 5.0)            // single value → that value
    assert(out(2) >= 1.0 && out(2) <= 2.0)
    // all-null group yields null digest → null quantile
    val allNull = Seq((3, Option.empty[Double])).toDF("g", "v")
      .groupBy($"g").agg(graft.functions.TDigest.agg($"v").as("td"))
      .select(graft.functions.TDigest.quantileOf($"td", 0.5)).head()
    assert(allNull.isNullAt(0))
  }

  test("SkipIndex.localPositions are bit-identical to the Spark bloom-build expressions (r16)") {
    // THE parity pin for the driver-local probe kernel: the manifest's
    // blooms are built by `pmod(xxhash64(x, lit(k)), 1024)` inside the
    // one build pass; probes since r16 compute positions on the driver
    // (no per-probe Spark job — the Hash60 precedent). Any drift between
    // the two silently turns bloom pruning into wrong-row loss, so this
    // must hold bit-for-bit on longs (series ids) and strings (names,
    // k=v tag pairs) including empty and non-ASCII.
    def sparkPos(c: org.apache.spark.sql.Column): Seq[Int] =
      spark.range(1)
        .select((0 until 3).map(k => pmod(xxhash64(c, lit(k)), lit(1024L))): _*)
        .head().toSeq.map(_.asInstanceOf[Long].toInt)
    val rnd = new scala.util.Random(16)
    val ids = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue) ++
      Seq.fill(16)(rnd.nextLong())
    ids.foreach { id =>
      assert(graft.storage.SkipIndex.localPositions(id) === sparkPos(lit(id)),
        s"long probe drifted for $id")
    }
    val strs = Seq("", "cpu", "cpu.load", "host=a", "user=日本語", "a" * 100) ++
      Seq.fill(16)(rnd.alphanumeric.take(rnd.nextInt(24) + 1).mkString)
    strs.foreach { s =>
      assert(graft.storage.SkipIndex.localPositions(s) === sparkPos(lit(s)),
        s"string probe drifted for '$s'")
    }
  }
}
