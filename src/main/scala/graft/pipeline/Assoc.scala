package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining (market-basket support / confidence / lift —
  * Agrawal & Srikant's Apriori setting, public): which item pairs
  * co-occur in the same basket more than independence predicts. The
  * curation use is co-occurrence structure discovery (tags, sources,
  * entities) and the retail use is the classic basket analysis; both
  * reduce to the same three numbers per ordered pair (a → b):
  * support = |baskets ∋ {a,b}|, confidence = support/|baskets ∋ a|,
  * lift = confidence / (|baskets ∋ b| / N).
  */
object Assoc {

  /** Top-`topK` rules by lift over `(basketCol, itemCol)` rows.
    *
    * Scale shape: the Apriori trick is the whole design — items below
    * `minSupport` are pruned BEFORE the pair self-join (infrequent items
    * dominate real vocabularies; joining them would square the tail), so
    * the join runs frequent-item baskets against themselves on the
    * basket key and the pair frame is support-pruned again before any
    * scoring. Every count is an exact integer; confidence/lift are
    * integer ratios/products (< 2⁵³) rounded 1e-6 — deterministic in any
    * engine. Output ranks by (lift desc, confidence desc, ant, cons)
    * through one TakeOrderedAndProject.
    *
    * Returns (ant, cons, support, confidence, lift) — BOTH directions of
    * each co-occurring pair (confidence is asymmetric).
    */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, topK: Int): DataFrame = {
    require(minSupport >= 1 && topK >= 1, "assoc rules need positive support/topK")
    // the distinct basket frame feeds the item supports, BOTH pair-join
    // sides and the lift base — materialize it once (eager
    // localCheckpoint) instead of re-running the upstream distinct 4×
    // (measured 6.5 → ~3 s family-cold at sf0.1; at 100 TB the upstream
    // is a join you never want to repeat)
    val b = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct().localCheckpoint(true)
    val n = b.select(col("bk")).distinct().count() // one scalar, the lift base
    val supp = b.groupBy(col("it")).agg(count(lit(1)).as("s"))
      .filter(col("s") >= minSupport)
    val fb0 = b.join(supp.select(col("it")), Seq("it")) // frequent items only
    // basket-WIDTH pre-flight (the dual of the item-frequency prune): the
    // pair self-join is Θ(w²) per basket in frequent items w, so a few
    // mega-baskets (a tag shared by every document, an inverted basket
    // scheme) quietly square inside themselves even after the tail prune.
    // One partial-aggregated count pass — trivial next to the join it
    // protects — fails LOUDLY past spark.graft.assoc.maxBasket, with
    // spark.graft.assoc.dropWideBaskets=true as the explicit opt-in to
    // drop them instead (a dropped basket loses all its pair counts; the
    // same guard idiom as knnGraphBanded's band buckets).
    val spark = baskets.sparkSession
    val capW = spark.conf.get("spark.graft.assoc.maxBasket", "10000").toLong
    val dropWide = spark.conf
      .get("spark.graft.assoc.dropWideBaskets", "false").toBoolean
    val widths = fb0.groupBy(col("bk")).count()
    val wide = widths.filter(col("count") > capW)
      .orderBy(col("count").desc).limit(5).collect()
    val fb = if (wide.isEmpty) fb0 else {
      val msg = wide.map(r => s"bk=${r.get(0)} width=${r.get(1)}").mkString("; ")
      if (!dropWide) throw new IllegalStateException(
        s"Assoc.rules: baskets over spark.graft.assoc.maxBasket=$capW frequent " +
          s"items ($msg) — the pair self-join would go quadratic inside them. " +
          "Raise minSupport, restructure the basket key, or opt in to " +
          "spark.graft.assoc.dropWideBaskets=true.")
      System.err.println(s"[assocRules] DROPPING over-wide baskets (> $capW " +
        s"frequent items): $msg — their pair counts are lost")
      fb0.join(broadcast(widths.filter(col("count") > capW).select(col("bk"))),
        Seq("bk"), "left_anti")
    }
    val pairs = fb.select(col("bk"), col("it").as("a"))
      .join(fb.select(col("bk"), col("it").as("b")), Seq("bk"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("sab"))
      .filter(col("sab") >= minSupport)
    val directed = pairs.select(col("a").as("ant"), col("b").as("cons"), col("sab"))
      .unionAll(pairs.select(col("b").as("ant"), col("a").as("cons"), col("sab")))
    val r6 = (c: org.apache.spark.sql.Column) => floor(c * 1e6 + 0.5) / 1e6
    directed
      .join(supp.select(col("it").as("ant"), col("s").as("sa")), Seq("ant"))
      .join(supp.select(col("it").as("cons"), col("s").as("sb")), Seq("cons"))
      .select(col("ant"), col("cons"), col("sab").as("support"),
        r6(col("sab").cast("double") / col("sa").cast("double")).as("confidence"),
        r6((col("sab") * lit(n)).cast("double") /
          (col("sa") * col("sb")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("confidence").desc, col("ant"), col("cons"))
      .limit(topK)
  }
}
