package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding ANN — the FAISS-style memory
  * path for serving similarity search over corpora that cannot hold raw
  * vectors: dim floats per vector compress to m one-byte codes (one per
  * subvector block, each quantized by its own ksub-centroid codebook), and
  * queries rank candidates with an asymmetric-distance (ADC) lookup —
  * m table probes per candidate instead of a dim-element fold.
  *
  * Scale shape (100 TB): the fit touches only the bounded training frame
  * (m small k-means fits over slices of the persisted parsed vectors);
  * encoding is ONE narrow codegen pass (m fused KMeansAssign kernels per
  * row) whose output is m bytes/vector — the at-rest representation; ADC
  * serving broadcasts the per-query lookup tables (m×ksub doubles each)
  * and scans only codes, never raw vectors. No shuffle carries vectors.
  *
  * Deterministic by the same contract as [[Clustering]] (smallest-vec_id
  * seeds, left-to-right folds, 1e-4-rounded centroid updates, ties to the
  * lowest index), so a SQL engine can replay fit, encode, and ADC ranking
  * bit-for-bit.
  */
object Pq {

  /** Per-block codebooks: `books(j)(c)` is centroid c of subvector block j
    * (each block a dim/m slice). m sequential [[Clustering.fitCentroids]]
    * fits over slices of the persisted parsed frame.
    */
  def fit(emb: DataFrame, m: Int, ksub: Int, iters: Int): Array[Array[Seq[Double]]] = {
    // skip the fit-scoped persist when the caller already holds the input
    // cached (IvfIndex.buildPq's shared parsed corpus, r18)
    val preCached = emb.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val e =
      if (preCached) Clustering.parsed(emb)
      else Clustering.parsed(emb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dims = e.select(size(col("v"))).head(1)
      require(dims.nonEmpty, "PQ fit needs a non-empty corpus")
      val dim = dims(0).getInt(0)
      require(dim % m == 0, s"dim $dim must divide into $m blocks")
      val sub = dim / m
      (0 until m).toArray.map { j =>
        val block = e.select(col("vec_id"), slice(col("v"), j * sub + 1, sub).as("embedding"))
        Clustering.fitCentroids(block, ksub, iters)
      }
    } finally if (!preCached) { e.unpersist(blocking = false); () }
  }

  /** The m-code array expression for a (possibly residual) source vector
    * — block j's code is the fused-kernel argmin of the j-th slice over
    * codebook j. THE single definition of the code layout: every encode
    * path (in-memory ADC, the at-rest index, streaming appends) must go
    * through it or silently diverge.
    */
  private[pipeline] def codesFor(src: Column, books: Array[Array[Seq[Double]]]): Column = {
    val sub = books(0)(0).length
    array(books.zipWithIndex.map { case (cb, j) =>
      Clustering.assignment(cb, slice(src, j * sub + 1, sub)).getField("c")
    }: _*)
  }

  /** `(vec_id, codes ARRAY<INT>)` — one narrow pass; the at-rest form is
    * m small ints per vector.
    */
  def encode(emb: DataFrame, books: Array[Array[Seq[Double]]]): DataFrame =
    Clustering.parsed(emb).select(col("vec_id"), codesFor(col("v"), books).as("codes"))

  /** ADC top-k: for each query, the k nearest corpus vectors by
    * approximate squared L2 = Σ_j lut(j)(code_j), where each query's
    * lookup table holds its exact squared distance to every codebook
    * centroid (computed driver-side with the same left-to-right fold as
    * the assignment kernel — the query batch is bounded by contract, like
    * the brute-force path's broadcast). Ties break to the lowest vec_id.
    * Returns `(q_id, vec_id, rank, adc_dist)` with adc_dist 1e-4-rounded.
    */
  /** Per-row residual vector v − coarseCentroid(bucket) — elementwise
    * exact subtraction, so it is deterministic and replayable.
    */
  private[pipeline] def residualCol(v: Column, bucket: Column,
      cs: Array[Seq[Double]]): Column =
    zip_with(v, element_at(typedLit(cs.toSeq.map(_.toSeq)), bucket.cast("int") + 1),
      (x, c) => x - c)

  /** `(q_id, lut ARRAY<ARRAY<DOUBLE>>)` — each query's exact squared
    * distance to every codebook centroid, computed driver-side with the
    * same left-to-right fold as the assignment kernel (the query batch is
    * bounded by contract, like the brute-force path's broadcast).
    */
  /** One query's squared-distance LUT over every codebook centroid
    * (left-to-right fold, the assignment kernel's order).
    */
  private[pipeline] def lutFor(qv: Seq[Double],
      books: Array[Array[Seq[Double]]]): Seq[Seq[Double]] = {
    val sub = books(0)(0).length
    books.toSeq.zipWithIndex.map { case (cb, j) =>
      cb.toSeq.map { c =>
        var acc = 0.0
        var i = 0
        while (i < sub) { val d = qv(j * sub + i) - c(i); acc = acc + d * d; i += 1 }
        acc
      }
    }
  }

  /** In-Spark twin of [[lutFor]]: the squared-distance LUT as a column
    * expression over a (possibly residual) query vector — same block
    * slices, same left-to-right folds, same `(x−y)·(x−y)` per element, so
    * the distributed route is bit-identical to the driver route
    * (PipelineSpec pins it). This is what corpus-sized query batches use:
    * the LUT stays a narrow projection, nothing is collected.
    */
  private[pipeline] def lutCol(qv: Column, books: Array[Array[Seq[Double]]]): Column = {
    val sub = books(0)(0).length
    array(books.zipWithIndex.map { case (cb, j) =>
      array(cb.map { c =>
        aggregate(
          zip_with(slice(qv, j * sub + 1, sub), typedLit(c.toSeq), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
    }: _*)
  }

  /** In-Spark dot-product LUT (the cosine-ADC numerator table): block j ×
    * centroid c ↦ dot(q_j, c) with the driver builder's fold order.
    */
  private[pipeline] def dotLutCol(qv: Column, books: Array[Array[Seq[Double]]]): Column = {
    val sub = books(0)(0).length
    array(books.zipWithIndex.map { case (cb, j) =>
      array(cb.map { c =>
        aggregate(
          zip_with(slice(qv, j * sub + 1, sub), typedLit(c.toSeq), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
    }: _*)
  }

  /** ‖q‖ with the driver builder's left-to-right Σx² fold. */
  private[pipeline] def qNormCol(qv: Column): Column =
    sqrt(aggregate(zip_with(qv, qv, (x, y) => x * y), lit(0.0), (acc, x) => acc + x))

  /** `(q_id, lut)` for the ADC join. Bounded batches (the serving
    * contract) build the LUTs driver-side and broadcast them; larger
    * batches — corpus-as-queries semantic dedup — stay fully distributed
    * via [[lutCol]] with no hint (AQE picks the join).
    */
  private[pipeline] def lutFrame(queries: DataFrame, books: Array[Array[Seq[Double]]],
      maxDriverBatch: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    Similarity.boundedBatch(queries, Similarity.driverBatchLimit(spark, maxDriverBatch)) match {
      case Some(rows) =>
        broadcast(rows
          .map(r => (r.getLong(0), lutFor(r.getSeq[Double](1), books)))
          .toDF("q_id", "lut"))
      case None =>
        Clustering.parsed(queries)
          .select(col("vec_id").as("q_id"), lutCol(col("v"), books).as("lut"))
    }
  }

  /** ADC score: Σ_j lut(j)(code_j), left-to-right (init 0.0 + x₀ is
    * exact, so the order matches a plain left-assoc sum).
    */
  private[pipeline] def adcColumn(lut: Column, codes: Column): Column =
    aggregate(
      zip_with(lut, codes, (l, c) => element_at(l, c.cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** Shared ADC top-k tail: rank ≤ k by (adc asc, vec_id), 1e-4 rounding
    * on the reported distance. WindowGroupLimit prunes per-partition
    * before the q_id shuffle, as in [[Similarity]]'s cosine tail.
    */
  private[pipeline] def rankAdcTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("__adc"), col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
        (floor(col("__adc") * 1e4 + 0.5) / 1e4).as("adc_dist"))
  }

  def adcTopK(corpus: DataFrame, queries: DataFrame, books: Array[Array[Seq[Double]]],
      k: Int, maxDriverBatch: Int = -1): DataFrame =
    rankAdcTopK(
      encode(corpus, books)
        .crossJoin(lutFrame(queries, books, maxDriverBatch))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("__adc", adcColumn(col("lut"), col("codes"))),
      k)

  /** COSINE-metric ADC top-k — the same m-probe serving pattern aligned
    * with the cosine contract of the rest of the ANN family:
    * cos(q, x̂) = (Σ_j dot(q_j, c_{j,code_j})) / (‖q‖ · ‖x̂‖), and because
    * the blocks are disjoint coordinate subsets, ‖x̂‖² = Σ_j ‖c_{j,code_j}‖²
    * — so the reconstruction norm comes from a shared m×ksub norm table
    * and NOTHING beyond the m codes is read per candidate. Per-query
    * state: a dot LUT (m×ksub) and ‖q‖; both driver-computed with
    * left-to-right folds, broadcast with the query batch.
    * Output (q_id, vec_id, rank, cos round 1e-6), cos desc, ties to the
    * lowest vec_id — the [[Similarity]] ranking contract.
    */
  def adcCosineTopK(corpus: DataFrame, queries: DataFrame,
      books: Array[Array[Seq[Double]]], k: Int, maxDriverBatch: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sub = books(0)(0).length
    val n2: Seq[Seq[Double]] = books.toSeq.map(_.toSeq.map { c =>
      var acc = 0.0; var i = 0
      while (i < sub) { acc = acc + c(i) * c(i); i += 1 }
      acc
    })
    // bounded batch → driver LUTs + broadcast (serving); larger → the
    // distributed column twins, bit-identical folds (PipelineSpec)
    val q = Similarity.boundedBatch(queries,
        Similarity.driverBatchLimit(spark, maxDriverBatch)) match {
      case Some(rows) =>
        broadcast(rows.map { r =>
          val qv = r.getSeq[Double](1)
          val lut: Seq[Seq[Double]] = books.toSeq.zipWithIndex.map { case (cb, j) =>
            cb.toSeq.map { c =>
              var acc = 0.0; var i = 0
              while (i < sub) { acc = acc + qv(j * sub + i) * c(i); i += 1 }
              acc
            }
          }
          var qn = 0.0; var i = 0
          while (i < qv.length) { qn = qn + qv(i) * qv(i); i += 1 }
          (r.getLong(0), lut, math.sqrt(qn))
        }.toDF("q_id", "lut", "qnorm"))
      case None =>
        Clustering.parsed(queries).select(col("vec_id").as("q_id"),
          dotLutCol(col("v"), books).as("lut"), qNormCol(col("v")).as("qnorm"))
    }
    val num = adcColumn(col("lut"), col("codes"))
    val den2 = adcColumn(typedLit(n2), col("codes"))
    val scored = encode(corpus, books)
      .crossJoin(q)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", num / (col("qnorm") * sqrt(den2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
        (floor(col("cos") * 1e6 + 0.5) / 1e6).as("cos"))
  }

  // ---------------------------------------------------------------- OPQ

  /** `(vec_id, embedding = R·v)` — the OPQ-rotated frame. The rotation is
    * a PLAN-LITERAL matrix (the JL-projection stance): each output dim is
    * one zip_with product + left-to-right fold, so any SQL engine given
    * the same literal replays it bit-for-bit. Rotate once at encode time
    * and once per query — the serving path (codes + ADC) is unchanged.
    */
  def rotate(emb: DataFrame, r: Array[Array[Double]]): DataFrame =
    Clustering.parsed(emb).select(col("vec_id"),
      array(r.map(row =>
        aggregate(zip_with(col("v"), typedLit(row.toSeq), (x, y) => x * y),
          lit(0.0), (a, x) => a + x)): _*).as("embedding"))

  /** PQ reconstruction x̂ from codes: block j contributes codebook j's
    * assigned centroid — the decode half of [[codesFor]].
    */
  private def reconFor(codes: Column, books: Array[Array[Seq[Double]]]): Column =
    flatten(array(books.zipWithIndex.map { case (cb, j) =>
      element_at(typedLit(cb.toSeq.map(_.toSeq)),
        element_at(codes, j + 1).cast("int") + 1)
    }: _*))

  /** OPQ rotation training (Ge et al., CVPR 2013 — "Optimized Product
    * Quantization", the non-parametric alternation, public): repeat
    * `sweeps` times { fit PQ codebooks on R·x; reconstruct x̂ = q(R·x);
    * R ← argmin_{RᵀR=I} Σ‖R·x − x̂‖² } — the inner step is the orthogonal
    * Procrustes problem, solved by one dim×dim SVD on the driver
    * (maximize tr(R·M) with M = Σ x·x̂ᵀ → R = V·Uᵀ from M = U·S·Vᵀ).
    * OPQ redistributes correlated variance across the code blocks, which
    * is exactly the low-m weakness the pinned ADC recall curve documents.
    *
    * Scale shape: per sweep, one codebook fit (bounded, [[fit]]), one
    * narrow encode+reconstruct pass, and ONE dim-row aggregate for M
    * (posexplode to (dim-index, xi), dim sums per row — driver state is
    * dim² doubles, 32 KB at dim 64). The SVD is a dim×dim driver-side
    * solve (Breeze, bundled with Spark).
    *
    * The returned matrix is 1e-6-rounded (pre-round applied constants —
    * the SAX/μσ stance): training float order can differ per engine/run,
    * but everything downstream of the FROZEN rounded literal replays
    * exactly. Ship it as a recorded artifact (tools.OpqFit →
    * `OPQ_ROTATION.txt`), the checkpoint pattern a production rotation
    * uses anyway.
    */
  def fitOpq(emb: DataFrame, m: Int, ksub: Int, iters: Int,
      sweeps: Int = 2): Array[Array[Double]] = {
    require(sweeps >= 1, "OPQ needs at least one sweep")
    val e = Clustering.parsed(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dims = e.select(size(col("v"))).head(1)
      require(dims.nonEmpty, "OPQ fit needs a non-empty corpus")
      val dim = dims(0).getInt(0)
      var r: Array[Array[Double]] =
        Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
      for (_ <- 1 to sweeps) {
        val rot = e.select(col("vec_id"),
          array(r.map(row =>
            aggregate(zip_with(col("v"), typedLit(row.toSeq), (x, y) => x * y),
              lit(0.0), (a, x) => a + x)): _*).as("embedding"))
        val books = fit(rot, m, ksub, iters)
        val rec = rot.select(col("vec_id"),
            reconFor(codesFor(col("embedding"), books), books).as("y"))
          .join(e, "vec_id")
        // M = Σ x·x̂ᵀ: row i of M from the (i, x_i) explode — dim result rows
        val mRows = rec
          .select(posexplode(col("v")).as(Seq("i", "xi")), col("y"))
          .groupBy(col("i"))
          .agg(array((0 until dim).map(j =>
            sum(col("xi") * element_at(col("y"), j + 1))): _*).as("mr"))
          .collect().map(rw => rw.getInt(0) -> rw.getSeq[Double](1)).toMap
        val mMat = breeze.linalg.DenseMatrix.tabulate(dim, dim)((i, j) => mRows(i)(j))
        val s = breeze.linalg.svd(mMat)
        val next = s.Vt.t * s.U.t // R = V·Uᵀ maximizes tr(R·M)
        r = Array.tabulate(dim, dim)((i, j) =>
          math.floor(next(i, j) * 1e6 + 0.5) / 1e6)
      }
      r
    } finally e.unpersist(blocking = false)
  }

  /** Load a recorded rotation (one row per line, space-separated — the
    * `tools.OpqFit` artifact). Loud failure names the regeneration tool.
    */
  def loadRotation(path: String): Array[Array[Double]] = {
    val f = java.nio.file.Paths.get(path)
    require(java.nio.file.Files.exists(f),
      s"OPQ rotation artifact $path missing — regenerate with `runMain graft.tools.OpqFit`")
    val rows = scala.io.Source.fromFile(path.toString).getLines()
      .map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").map(_.toDouble).toArray).toArray
    require(rows.nonEmpty && rows.forall(_.length == rows.length),
      s"OPQ rotation artifact $path is not square (${rows.length} rows)")
    rows
  }
}
