package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed random projection (Johnson–Lindenstrauss with a ±1 matrix,
  * Achlioptas-style): reduce an embedding column to `outDim` dimensions
  * as `p_j = Σ_i v_i · sign(j, i)` — the cheap dimensionality-reduction
  * step before clustering / brute-force ANN when the full dimension is
  * the cost driver (dot products shrink by dim_in/dim_out; JL keeps
  * pairwise angles within ε for outDim = O(log n / ε²)).
  *
  * The sign matrix is DERIVED, not stored: sign(j, i) = parity of the
  * portable salted [[graft.functions.Hash60]] of `"salt:j:i"` — the
  * projection of a vector is a pure function of (salt, outDim), identical
  * on every executor, across restarts, and in any engine that can md5
  * (the DuckDB oracle rebuilds the matrix from the same digests). The
  * matrix is embedded in the plan as a literal (outDim × dim doubles —
  * metadata-sized), the arithmetic is codegen'd HOFs over the vector
  * column (zip_with · aggregate, left-to-right fold — the same order the
  * oracle's list_reduce uses, so sums match bit-for-bit), and the whole
  * projection is a narrow map: no shuffle, no UDF, scan-riding at 100 TB.
  */
object Projection {

  /** The ±1 sign for output row j, input coordinate i. */
  private[graft] def sign(salt: String, j: Int, i: Int): Double =
    if (graft.functions.Hash60.hash(s"$salt:$j:$i".getBytes("UTF-8")) % 2 == 0) 1.0 else -1.0

  /** The outDim × dim literal sign matrix. */
  private[graft] def signMatrix(salt: String, outDim: Int, dim: Int): Seq[Seq[Double]] =
    (0 until outDim).map(j => (0 until dim).map(i => sign(salt, j, i)))

  /** `vec` (array<float|double>, length `dim`) projected to
    * array<double> of length `outDim`.
    */
  def project(vec: Column, dim: Int, outDim: Int, salt: String): Column = {
    val m = signMatrix(salt, outDim, dim)
    val rows = array(m.map(r => array(r.map(lit): _*)): _*)
    transform(rows, row =>
      aggregate(zip_with(vec, row, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x))
  }

  /** The projected frame: `vecCol` replaced by its `outDim`-dimensional
    * projection (other columns pass through).
    */
  def reduce(df: DataFrame, vecCol: String, dim: Int, outDim: Int,
      salt: String): DataFrame =
    df.withColumn(vecCol, project(col(vecCol), dim, outDim, salt))

  /** Per-dimension standardization (whitening without rotation):
    * z_i = (v_i − μ_i) / σ_i over the corpus — the cheap embedding
    * pre-conditioner before cosine/quantization when dimensions have
    * wildly different scales.
    *
    * Shape: one posexplode + (dim)-sized partial+final aggregate for the
    * stats, then the transform rides the scan with the stats joined in as
    * a BROADCAST dim-frame (dim rows) — the data-sized pass never
    * shuffles. μ/σ are pre-rounded (1e-6) before application: the stats
    * come from a parallel float sum whose partition order is
    * engine-specific, and rounding pins the applied constants so a
    * replaying engine (or a re-run with different parallelism) whitens
    * identically — the SAX determinism stance. σ = 0 dims pass through
    * as z = 0.
    *
    * Output: the input frame with `vecCol` replaced by the standardized
    * array<double>.
    */
  def whiten(df: DataFrame, vecCol: String): DataFrame = {
    val stats = df.select(posexplode(col(vecCol)).as(Seq("__d", "__x")))
      .groupBy(col("__d"))
      .agg((floor(avg(col("__x")) * 1e6 + 0.5) / 1e6).as("__mu"),
        (floor(stddev_pop(col("__x")) * 1e6 + 0.5) / 1e6).as("__sd"))
      // dim-order restored by the sorted struct collect (collect_list
      // alone has no order contract)
      .agg(sort_array(collect_list(
        struct(col("__d"), col("__mu"), col("__sd")))).as("__st"))
      .select(transform(col("__st"), s => s.getField("__mu")).as("__mus"),
        transform(col("__st"), s => s.getField("__sd")).as("__sds"))
    df.crossJoin(broadcast(stats))
      .withColumn(vecCol,
        zip_with(col(vecCol),
          zip_with(col("__mus"), col("__sds"), (m, s) => struct(m.as("m"), s.as("s"))),
          (x, ms) => when(ms.getField("s") > 0,
            (x.cast("double") - ms.getField("m")) / ms.getField("s"))
            .otherwise(lit(0.0))))
      .drop("__mus", "__sds")
  }

  /** Top principal component of the embedding corpus by power iteration —
    * the variance-structure probe (is the embedding space collapsing to
    * few directions?) and the first step of PCA compression.
    *
    * Shape: the only data-sized pass is the covariance build — an n·d²
    * explode/self-join into a partial+final (i, j) average (at larger d,
    * swap for a treeAggregate Gram accumulation: same d² driver state,
    * one pass, no explode). Everything after runs on the d×d matrix:
    * d² ≈ metadata, collected to the driver exactly like k-means'
    * centroids, iterated there, result re-emitted as a literal frame.
    *
    * Cross-engine determinism (the k-means/BPE replay stance, with a
    * twist): μ is pre-rounded 1e-6 and covariance entries 1e-8 — but the
    * ITERATES are exact, not rounded. Rounding the iterates looks safer
    * and is actually worse: grid-aligned inputs (1e-8 cov × 1e-9 x) make
    * matvec sums land exactly ON .5 rounding boundaries, where engine
    * summation order flips the floor (observed 2/64 flips). Instead both
    * engines evaluate the SAME left-to-right fold (Scala `.sum` here,
    * `list_reduce` over j-ordered lists in the oracle), which makes every
    * iterate bit-identical with no rounding at all. Sign is
    * canonicalized (flip if Σx < 0: power iteration converges to ±v).
    *
    * Output: (i 1-based, loading round 1e-6, eigval round 1e-6 —
    * the Rayleigh quotient, repeated per row).
    */
  def pcaTop(df: DataFrame, vecCol: String, dim: Int, iters: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ex = df.select(col("vec_id"), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .select(col("vec_id"), (col("__p") + 1).as("i"), col("__x").cast("double").as("x"))
    val mu = ex.groupBy("i").agg((floor(avg(col("x")) * 1e6 + 0.5) / 1e6).as("mu"))
    val cov = ex.join(ex.select(col("vec_id"), col("i").as("j"), col("x").as("y")), "vec_id")
      .groupBy("i", "j").agg(avg(col("x") * col("y")).as("exy"))
      .join(broadcast(mu), "i")
      .join(broadcast(mu.select(col("i").as("j"), col("mu").as("muj"))), "j")
      .select(col("i"), col("j"),
        (floor((col("exy") - col("mu") * col("muj")) * 1e8 + 0.5) / 1e8).as("cv"))
    val c = Array.ofDim[Double](dim, dim)
    cov.select(col("i"), col("j"), col("cv")).collect() // d² rows — metadata-sized
      .foreach(r => c(r.getAs[Int]("i") - 1)(r.getAs[Int]("j") - 1) = r.getAs[Double]("cv"))
    // exact left-to-right folds — the oracle's list_reduce replays these
    // bit-for-bit (see determinism note above)
    def matvec(x: Array[Double]): Array[Double] =
      Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * x(j)).sum)
    var x = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val y = matvec(x)
      val nm = math.sqrt(y.map(v => v * v).sum)
      x = y.map(v => v / nm)
    }
    val cx = matvec(x)
    val eig = math.floor((0 until dim).map(i => x(i) * cx(i)).sum * 1e6 + 0.5) / 1e6
    val s = if (x.sum < 0) -1.0 else 1.0
    (1 to dim).map(i =>
        (i.toLong, math.floor(x(i - 1) * s * 1e6 + 0.5) / 1e6, eig))
      .toDF("i", "loading", "eigval")
  }
}
