package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a sparse (BM25) and a dense (embedding-ANN)
  * ranking of the same corpus — the standard RAG serving pattern, where
  * lexical and semantic rankers catch each other's misses.
  */
object Hybrid {

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009):
    * `score(d) = Σ_lists 1/(kConst + rank_list(d))`, summed over the
    * lists that retrieved `d` (absent → contributes 0). Rank-based, so
    * the two rankers' incomparable score scales never need calibrating —
    * which is also what makes it deterministic here: the fused score is
    * a rational of INTEGER ranks, identical in any engine; ties break by
    * doc_id.
    *
    * Input frames are top-N rankings: `sparse(doc_id, rank)`,
    * `dense(vec_id, rank)` with vec_id keyed like doc_id. Output:
    * (doc_id, rrf_rank, rrf round 6, r_sparse, r_dense) — null rank
    * marks a doc one ranker missed.
    *
    * Scale shape: both inputs are already top-N (tens to thousands of
    * rows — the expensive corpus-scale work happened inside the
    * rankers), so the full-outer join and the single global rank window
    * run on result-set-sized, not corpus-sized, frames.
    */
  def rrf(sparse: DataFrame, dense: DataFrame, kConst: Int = 60,
      topK: Int = 20): DataFrame = {
    val s = sparse.select(col("doc_id"), col("rank").as("r_sparse"))
    val d = dense.select(col("vec_id").as("doc_id"), col("rank").as("r_dense"))
    val fused = s.join(d, Seq("doc_id"), "full_outer")
      .withColumn("__rrf",
        coalesce(lit(1.0) / (lit(kConst.toDouble) + col("r_sparse").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kConst.toDouble) + col("r_dense").cast("double")), lit(0.0)))
    val w = Window.orderBy(col("__rrf").desc, col("doc_id"))
    fused.withColumn("rrf_rank", row_number().over(w).cast("long"))
      .filter(col("rrf_rank") <= topK)
      .select(col("doc_id"), col("rrf_rank"),
        (floor(col("__rrf") * 1e6 + 0.5) / 1e6).as("rrf"),
        col("r_sparse"), col("r_dense"))
  }
}
