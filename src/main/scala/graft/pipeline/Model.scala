package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-in-the-loop curation: distill a hand-written quality RULE into a
  * trained classifier — the fastText/CCNet-style loop (heuristic labels →
  * classifier → corpus-wide scoring) every large-scale training-data
  * pipeline runs. The label is the Gopher-style screen the repo already
  * gates ([[TextAnalysis.qualityScore]] >= τ); the model is logistic
  * regression on the screen's four STANDARDIZED components, trained by
  * distributed batch gradient descent.
  *
  * Shape at 100 TB: feature standardization stats are ONE global
  * aggregate (8 doubles); the standardized feature frame is computed once
  * (narrow per-row expressions) and cached; each GD iteration is then ONE
  * partial+final global aggregate producing d+1 doubles (map-side
  * combined, no row shuffle, no UDFs — the sigmoid rides codegen `exp`).
  * Driver state is the (d+1)-vector of weights, so k iterations cost k
  * scan-aggregates over the cached features — the k-means pass structure
  * with far smaller driver state. Scoring is a stateless pass with the
  * weights as plan literals.
  *
  * Cross-engine determinism: μ/σ are pre-rounded 1e-6 before application
  * and each per-iteration gradient component is pre-rounded 1e-6 before
  * the weight update (the whiten/SAX stance — parallel float sums differ
  * across engines at ~1e-16; rounding pins the applied constants). The
  * features and every z = w·x fold are exact IEEE arithmetic replayed
  * left-to-right, so with pinned constants the final decision
  * (w·x >= 0 on the 1e-6-rounded weights) is bit-replayable. The oracle
  * unrolls the iterations as chained one-row weight CTEs (the BPE
  * pattern). σ = 0 components standardize to 0 (constant features —
  * e.g. a corpus with no punctuation — contribute nothing, exactly as
  * in [[Projection.whiten]]).
  */
object Model {

  /** The four components of [[TextAnalysis.qualityScore]], as named
    * columns (expression-identical to the screen, which is what makes
    * the distilled model's label consistent with the gated rule).
    */
  def qualityComponents: Seq[(String, Column)] = {
    val w = TextAnalysis.words(col("text"))
    val nWords = size(w).cast("double")
    val stopRatio = size(filter(w, x =>
      x.isin(TextAnalysis.Lexicons.flatMap(_._2).distinct.map(lit): _*))).cast("double") / nWords
    val punctRatio = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double") /
      length(col("text")).cast("double")
    val awl = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nWords
    Seq(
      "x_words" -> least(nWords / 100.0, lit(1.0)),
      "x_stop" -> least(stopRatio * 5.0, lit(1.0)),
      "x_punct" -> (lit(1.0) - least(punctRatio * 10.0, lit(1.0))),
      "x_awl" -> least(awl / 8.0, lit(1.0)))
  }

  /** The screen itself: the same association as qualityScore's select. */
  def qualityExpr: Column = {
    val c = qualityComponents.map(_._2)
    floor((c(0) * 0.3 + c(1) * 0.3 + c(2) * 0.2 + c(3) * 0.2) * 1e4 + 0.5) / 1e4
  }

  /** Batch-gradient-descent logistic regression of `label` (0/1 column)
    * on `features` (assumed standardized), bias included. Returns the
    * exact post-update weights: weights(0) = bias, weights(j) =
    * features(j-1). Rounding happens on each gradient, not the weights.
    * Loud failure on a non-finite gradient (diverging learning rate).
    */
  def logisticTrain(docs: DataFrame, features: Seq[(String, Column)],
      label: Column, iters: Int = 8, lr: Double = 4.0): Array[Double] = {
    require(iters >= 1 && features.nonEmpty, "need >= 1 iteration and >= 1 feature")
    val d = features.size + 1
    val feat = docs.select(
      (label.cast("double").as("y") +: lit(1.0).as("x0") +:
        features.zipWithIndex.map { case ((_, c), j) => c.as(s"x${j + 1}") }): _*)
      .cache()
    try {
      val n = feat.count() // exact; also materializes the cache
      require(n > 0, "empty corpus")
      var wts = Array.fill(d)(0.0)
      for (_ <- 1 to iters) {
        // z = w·x as an exact left-to-right fold over the d+1 literals
        val z = (0 until d).map(j => lit(wts(j)) * col(s"x$j")).reduce(_ + _)
        val sig = lit(1.0) / (lit(1.0) + exp(-z))
        val sums = feat.agg(
          (floor(sum(col("x0") * (sig - col("y"))) * 1e6 + 0.5) / 1e6).as("g0"),
          (1 until d).map(j =>
            (floor(sum(col(s"x$j") * (sig - col("y"))) * 1e6 + 0.5) / 1e6).as(s"g$j")): _*)
          .head()
        val g = (0 until d).map(j => sums.getAs[Double](s"g$j"))
        require(g.forall(v => !v.isNaN && !v.isInfinite),
          s"non-finite gradient ${g.mkString(",")} — lower the learning rate")
        wts = Array.tabulate(d)(j => wts(j) - lr * g(j) / n)
      }
      wts
    } finally { feat.unpersist(); () }
  }

  /** μ/σ-standardized quality components (μ/σ pre-rounded 1e-6; σ = 0 →
    * constant 0). Stats are one global aggregate collected as plan
    * literals — 8 doubles of driver state.
    */
  def standardizedQualityFeatures(docs: DataFrame): Seq[(String, Column)] = {
    val comps = qualityComponents
    val stats = docs.agg(
      (floor(avg(comps.head._2) * 1e6 + 0.5) / 1e6).as("mu0"),
      (comps.tail.zipWithIndex.flatMap { case ((_, c), i) =>
        Seq((floor(avg(c) * 1e6 + 0.5) / 1e6).as(s"mu${i + 1}"))
      } ++ comps.zipWithIndex.map { case ((_, c), i) =>
        (floor(stddev_pop(c) * 1e6 + 0.5) / 1e6).as(s"sd$i")
      }): _*).head()
    comps.zipWithIndex.map { case ((nm, c), i) =>
      val mu = stats.getAs[Double](s"mu$i")
      val sd = stats.getAs[Double](s"sd$i")
      nm -> (if (sd > 0) (c - lit(mu)) / lit(sd) else lit(0.0))
    }
  }

  /** Train the rule-distillation classifier (label = qualityScore >= τ on
    * the SAME corpus) and emit one row per weight with the corpus
    * confusion counts of the final decision boundary repeated on each row
    * (the pcaTop output shape): (j, feature, weight round 1e-6, tp, fp,
    * fn, tn). The decision uses the rounded weights, so the counts are
    * replayable.
    */
  def logisticQuality(docs: DataFrame, tau: Double = 0.55,
      iters: Int = 8, lr: Double = 4.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = standardizedQualityFeatures(docs)
    val label = qualityExpr >= tau
    val raw = logisticTrain(docs, feats, label, iters, lr)
    val wts = raw.map(v => math.floor(v * 1e6 + 0.5) / 1e6)
    val d = wts.length
    val z = (lit(wts(0)) +: (1 until d).map(j => lit(wts(j)) * feats(j - 1)._2)).reduce(_ + _)
    val pred = (z >= 0).cast("long")
    val y = label.cast("long")
    val conf = docs.agg(
      sum(pred * y).as("tp"),
      sum(pred * (lit(1L) - y)).as("fp"),
      sum((lit(1L) - pred) * y).as("fn"),
      sum((lit(1L) - pred) * (lit(1L) - y)).as("tn"))
    val names = "bias" +: feats.map(_._1)
    (0 until d).map(j => (j.toLong, names(j), wts(j)))
      .toDF("j", "feature", "weight")
      .crossJoin(broadcast(conf))
  }
}
