package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared-query smoke at AMPLIFIED scale (r18, the r17 verdict's "make
  * wins measurable" item): at sf0.1 the headline is overhead-bound — the
  * driver's own c8 vs c32 artifacts put every headline query at ratio ≈ 1,
  * i.e. nothing scales past 8 cores because the fixture is too small, not
  * because the code is serial. This tool writes a `mult`× amplified COPY
  * of the driver tables as parquet and times declared queries against it
  * with the bench's exact methodology (same builders, noop sink, cache
  * clear per query), so data-bound behavior is measurable:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleBench 10"
  *   SPARK_GRAFT_CPUS=8  sbt "runMain graft.tools.ScaleBench 10"
  *   → per-query walls; ratio(8c/32c) > 2 on the data-bound paths.
  *
  * Amplification keeps the workload's SHAPE linear in `mult`:
  *  - relational tables: every join key shifts by copy × 1e9 — disjoint
  *    parallel universes, so per-key join fan-outs are unchanged;
  *  - events: user_id shifts by copy × 8 (tag classes preserved), rows
  *    densify inside the same time window — the growth direction the
  *    bucketed aggregates must absorb;
  *  - documents: doc_id shifts; each copy's text goes through a per-copy
  *    letter rotation (translate), so WITHIN-copy near-dup structure is
  *    preserved while cross-copy shingle collisions — which would grow
  *    dup cliques quadratically in `mult` — are suppressed;
  *  - embeddings: vec_id shifts; each copy applies a per-copy
  *    deterministic sign pattern (norms preserved, cross-copy cosine
  *    decorrelated) so signature/banding schemes keep linear buckets.
  *
  * Measurement tooling ONLY: the amplified dir lives under target/ and is
  * rebuilt from the parquet inputs on every invocation — nothing is
  * reused across runs, and the bench/oracle contracts are untouched.
  * Scale-dependent session knobs ride `SPARK_GRAFT_CONF` (SparkEntry).
  */
object ScaleBench {

  private val OFF = 1000000000L

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val qs: Seq[String] = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(graft.SparkEntry.benchQueries ++ Seq(
        "q_pl_dup_clusters", "q_pl_communities", "q_pl_lm_bigram",
        "q_pl_lm_score", "q_pl_ppl_buckets", "q_pl_minhash_est",
        "q_pl_containment", "q_pl_span_dedup", "q_pl_curation_chain",
        "q_pl_leakage_split"))
    val unknown = qs.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ampDir = s"target/scalebench/x$mult"
    writeAmplified(spark, sfDir, ampDir, mult)

    // JIT/footer warmup, as Bench does
    try graft.SparkEntry.queries(graft.SparkEntry.benchQueries.head)(spark, ampDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val walls = qs.map { q =>
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(s"scalebench: $q")
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, ampDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[scalebench] $q failed: $e") }
      val w = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scalebench] $q%-28s $w%8.2f s")
      q -> w
    }
    val body = walls.map { case (q, w) => "\"" + q + f"\":$w%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scalebench","mult":$mult,"cpus":$cpus,""" +
      f""""total":${walls.map(_._2).sum}%.3f,"queries":$body,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** One amplified copy of every driver table under `out` (overwritten
    * per invocation).
    */
  def writeAmplified(spark: SparkSession, sfDir: String, out: String,
      mult: Int): Unit = {
    import graft.core.Tables
    def amp(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(i => f(df, i)).reduce(_ unionByName _)
    def shift(cols: String*): (DataFrame, Int) => DataFrame = (df, i) =>
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * OFF)))

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, i: Int) = s.drop(i % 26) + s.take(i % 26)

    val tables: Seq[(String, DataFrame)] = Seq(
      "lineitem" -> amp(Tables.lineitem(spark, sfDir),
        shift("l_orderkey", "l_partkey", "l_suppkey")),
      "orders" -> amp(Tables.orders(spark, sfDir), shift("o_orderkey", "o_custkey")),
      "customer" -> amp(Tables.customer(spark, sfDir), shift("c_custkey", "c_nationkey")),
      "supplier" -> amp(Tables.supplier(spark, sfDir), shift("s_suppkey", "s_nationkey")),
      "part" -> amp(Tables.part(spark, sfDir), shift("p_partkey")),
      "nation" -> amp(Tables.nation(spark, sfDir), shift("n_nationkey", "n_regionkey")),
      "region" -> amp(Tables.region(spark, sfDir), shift("r_regionkey")),
      // events: same window, mult× density; user_id + i*8 keeps the %8 tag
      // classes of every copy
      "events" -> amp(spark.read.parquet(s"$sfDir/events.parquet"), (df, i) =>
        df.withColumn("user_id", col("user_id") + lit(i.toLong * 8L))),
      "documents" -> amp(Tables.documents(spark, sfDir), (df, i) =>
        df.withColumn("doc_id", col("doc_id") + lit(i * OFF))
          .withColumn("text",
            if (i == 0) col("text")
            else translate(col("text"), alpha + alpha.toUpperCase,
              rot(alpha, i) + rot(alpha.toUpperCase, i)))),
      "embeddings" -> amp(Tables.embeddings(spark, sfDir), (df, i) =>
        df.withColumn("vec_id", col("vec_id") + lit(i * OFF))
          .withColumn("embedding",
            if (i == 0) col("embedding")
            else {
              val e = col("embedding")
              zip_with(e, sequence(lit(0), size(e) - 1), (x, d) =>
                when(pmod(xxhash64(lit(i), d), lit(2L)) === 0, x)
                  .otherwise(x * lit(-1)))
            })))
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
  }
}
