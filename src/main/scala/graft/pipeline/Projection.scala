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
}
