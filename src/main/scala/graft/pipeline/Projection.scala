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
}
