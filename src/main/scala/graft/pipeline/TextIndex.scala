package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest inverted text index — [[IvfIndex]]'s analogue for lexical
  * retrieval: BM25 serving without touching the corpus.
  *
  * [[TextAnalysis.bm25TopK]] recomputes token statistics from the raw
  * documents on every call — correct as the gated ground truth, but at
  * 100 TB a retrieval tier cannot re-explode the corpus per query. The
  * index materializes the postings ONCE, term-bucket-partitioned
  * (`bucket = hash31(term) % nBuckets` — the IVF cell layout, so a probe
  * reads only the query terms' partitions via partition pruning,
  * PlanSpec-asserted), with the per-posting scoring context DENORMALIZED
  * in: each row carries (term, doc_id, tf, dl, df). That trades bytes at
  * rest for a probe with ZERO joins — score = f(posting row, broadcast
  * meta), one per-doc sum, the shared distributed top-k tail. `meta`
  * holds the two corpus scalars (n_docs, avgdl pre-rounded 1e-6 — the
  * same rounding the direct path applies before use).
  *
  * Freshness: the index reflects the corpus at build time; rebuild (or
  * partition-rewrite changed buckets, the continuousRollup pattern) on
  * append. Same-route determinism: probe scoring replays the direct
  * path's exact arithmetic, so `q_pl_bm25_idx` shares `q_pl_bm25`'s
  * oracle — index-backed and direct rankings are bit-equal.
  */
object TextIndex {

  /** One corpus pass each for doc lengths, tf, and df; postings join the
    * three (term- and doc-keyed shuffles) and land partitioned by term
    * bucket. All shapes partial+final; nothing collects.
    */
  def build(docs: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, "need at least one term bucket")
    val wl = docs.select(col("doc_id"),
      size(filter(TextAnalysis.words(col("text")), t => length(t) > 0))
        .cast("double").as("dl"))
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfx = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(dfx, "term").join(wl, "doc_id")
      .withColumn("bucket", pmod(TextAnalysis.hash31(col("term")), lit(nBuckets.toLong)))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$path/postings")
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(wl.agg((floor(avg(col("dl")) * 1e6 + 0.5) / 1e6).as("avgdl")))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** BM25 top-k from the at-rest index: the postings scan filters on the
    * query terms' bucket VALUES (computed through the same hash
    * expression on a |terms|-row local frame), so partition pruning
    * drops every other bucket before a byte is read; the term filter
    * then prunes within the bucket via parquet min/max. Scoring is the
    * direct path's formula verbatim on the denormalized row + the
    * 2-scalar broadcast meta.
    */
  def topK(spark: SparkSession, path: String, query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    require(query.nonEmpty, "empty query")
    val terms = query.map(_.toLowerCase).distinct
    val nBuckets = {
      // bucket domain from the layout itself (dir names), not a param the
      // caller could get wrong
      val dirs = new org.apache.hadoop.fs.Path(s"$path/postings")
      val fs = dirs.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(dirs).map(_.getPath.getName)
        .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toLong).max + 1
    }
    val buckets = terms.toDF("term")
      .select(pmod(TextAnalysis.hash31(col("term")), lit(nBuckets)).as("b"))
      .as[Long].collect().distinct.toSeq
    val meta = spark.read.parquet(s"$path/meta")
    val p = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isInCollection(buckets) && col("term").isin(terms: _*))
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))
    val scored = p.crossJoin(broadcast(meta))
      .groupBy("doc_id")
      .agg(sum(idf * col("tf") * (k1 + 1) / norm).as("__s"))
    val rounded = scored.withColumn("score", floor(col("__s") * 1e4 + 0.5) / 1e4)
    val top = rounded.orderBy(col("score").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("rank"), col("score"))
  }
}
