package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that overlap an
  * evaluation/benchmark set by shared word n-grams (the GPT-3/PaLM-style
  * published procedure — n-gram collision against held-out eval data).
  *
  * Shape for 100 TB: the benchmark side is small (eval suites are MBs) —
  * its distinct n-gram hashes are explicitly `broadcast()`; the corpus
  * side is narrow shingle passes + explode, a broadcast hash semi-join
  * (no shuffle of the corpus), and a final groupBy(doc_id) whose input is
  * only the *hit* rows — tiny next to the scan. No all-pairs anything.
  * The corpus shingle frame feeds the semi-join probe AND the per-doc
  * sizes through DIVERGENT exchanges (ReuseExchange can't dedup), so it
  * rides the corpus-cache policy ([[graft.core.Caches.corpus]]) — r18
  * re-measured the old "two linear passes beat a cache" trade and the
  * cache won solo-cold (decontam −17%, bloom variant −32% at sf0.1); at
  * multi-TB corpus scale set `spark.graft.corpusCacheLevel` accordingly
  * or DISK_ONLY.
  */
object Decontam {

  /** Per-doc overlap of word n-gram hash sets against `benchmark`:
    * (doc_id, n_shingles, n_overlap, contam_frac, contaminated).
    * Docs with no overlap are kept with n_overlap = 0 so the output is a
    * total annotation, not just the flagged subset.
    */
  def contamination(
      docs: DataFrame,
      benchmark: DataFrame,
      threshold: Double,
      n: Int = 3): DataFrame = {
    // cached for the same divergent-exchange reason as the bloom variant
    // (r18 measurement in OPTIMIZATION_r18.md §13)
    val corpusSh = graft.core.Caches.corpus(TextAnalysis.shingleSets(docs, n))
    val benchHashes = TextAnalysis.shingleSets(benchmark, n)
      .select(explode(col("hs")).as("h")).distinct()
    val hits = corpusSh.select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(benchHashes), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    corpusSh.select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(floor(coalesce(col("n_overlap"), lit(0L)).cast("double")
            / col("n_shingles").cast("double") * 1e4 + 0.5) / 1e4).as("contam_frac"))
      .withColumn("contaminated", col("contam_frac") >= threshold)
  }

  /** [[contamination]] with a bloom prefilter ahead of the exact verify
    * join — identical output (the bloom admits false positives only, and
    * every survivor is re-checked by the semi-join), cheaper movement when
    * the benchmark n-gram set outgrows a raw broadcast: the corpus side
    * probes ~9.6 bits/key of broadcast bloom bits inside whole-stage
    * codegen and only the surviving (hit + false-positive) shingles reach
    * the join. At fpp=1%, the verify join's input is ≈ the true hit set —
    * for a mostly-clean corpus that is orders of magnitude smaller than
    * the full exploded shingle stream.
    *
    * The benchmark side feeds THREE actions (distinct-count for sizing,
    * the sketch build, the verify join) — cached since r18; the three
    * passes re-ran the benchmark shingle kernel each time.
    */
  def contaminationBloom(
      docs: DataFrame,
      benchmark: DataFrame,
      threshold: Double,
      n: Int = 3,
      fpp: Double = 0.01): DataFrame = {
    // r18 measurement of the documented repeated-pass trade: the corpus
    // shingle kernel runs for the probe stream AND the per-doc sizes
    // (divergent exchanges — ReuseExchange can't dedup), and the
    // benchmark hashes run across THREE actions (count, bloom build,
    // verify join). Caching both measured faster warm at sf0.1
    // (see OPTIMIZATION_r18.md §13); levels via the corpus-cache policy.
    val corpusSh = graft.core.Caches.corpus(TextAnalysis.shingleSets(docs, n))
    val benchHashes = graft.core.Caches.corpus(
      TextAnalysis.shingleSets(benchmark, n)
        .select(explode(col("hs")).as("h")).distinct())
    val bits = graft.functions.Bloom.build(benchHashes, "h", benchHashes.count(), fpp)
    val hits = corpusSh.select(col("doc_id"), explode(col("hs")).as("h"))
      .filter(graft.functions.Bloom.mightContain(bits, col("h")))
      .join(broadcast(benchHashes), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    corpusSh.select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(floor(coalesce(col("n_overlap"), lit(0L)).cast("double")
            / col("n_shingles").cast("double") * 1e4 + 0.5) / 1e4).as("contam_frac"))
      .withColumn("contaminated", col("contam_frac") >= threshold)
  }
}
