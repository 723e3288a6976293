package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over data-derived graphs (e.g. the embedding
  * similarity graph): PageRank as iterated DataFrame joins — the
  * link-analysis data-valuation pass of a curation pipeline (rank
  * documents by how central they sit in the near-duplicate/topical
  * neighborhood structure; sample or weight by the score).
  */
object Graph {

  /** PageRank with damping `d` over directed `edges` (src, dst), ranks
    * over every node in `nodes` (id) — isolated nodes keep the teleport
    * mass (1−d)/N. Dangling mass is dropped (the usual simplification for
    * similarity graphs, where undirected construction means no danglers).
    *
    * Shape per iteration: one edges⋈rank equi-join + one partial+final
    * sum aggregate; `rank` and `deg` stay node-sized (≪ edges), so at
    * cluster scale both sides of the join shuffle on the same src key and
    * the rank frame is broadcast-able. The loop is unrolled in the plan —
    * at more than ~5 iterations persist/checkpoint the rank frame between
    * rounds to cut the growing lineage (documented, not needed at 3).
    *
    * `nNodes` is passed in (count the nodes frame once at the call site)
    * so the operator itself stays a pure plan.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, nNodes: Long,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && nNodes > 0, "pageRank needs iterations and nodes")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src")
    var rank = nodes.select(col("id"), lit(1.0 / nNodes).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(rank, col("src") === col("id"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in"))
      rank = nodes.select(col("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit((1 - damping) / nNodes) +
            lit(damping) * coalesce(col("in"), lit(0.0))).as("rank"))
    }
    rank
  }

  /** Undirected edge list (both directions) from one-sided pairs. */
  def undirected(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionAll(pairs.select(col(b).as("src"), col(a).as("dst")))

  /** Synchronous label-propagation community detection, DETERMINISTIC
    * variant: every node simultaneously adopts its neighbors' most
    * frequent label, ties broken by the smaller label; isolated nodes
    * keep their own. A FIXED iteration count (no convergence loop) keeps
    * the result a pure unrollable plan — the classic async/random-order
    * LPA is irreproducible by design, which disqualifies it from a
    * curation pipeline that must re-run identically.
    *
    * Shape per iteration: one edges⋈labels equi-join, one count
    * aggregate on (node, label), one per-node arg-max — all shuffles on
    * the node key, labels frame node-sized. Same lineage note as
    * [[pageRank]]: checkpoint past ~5 iterations.
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "labelPropagation needs iterations")
    import org.apache.spark.sql.expressions.Window
    var labels = nodes.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val counts = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src"), col("nl")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("c").desc, col("nl"))
      val picked = counts
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("src").as("id"), col("nl").as("picked"))
      labels = labels.join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("picked"), col("label")).as("label"))
    }
    labels
  }
}
