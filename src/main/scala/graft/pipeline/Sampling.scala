package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent on partitioning (same seed, different
  * split → different rows), which breaks reproducibility across cluster
  * sizes and re-runs. These samplers decide per-ROW from a portable
  * md5-derived hash of (salt, key), so the selected set is a pure function
  * of the data — identical on 1 executor or 1000, and reproducible by any
  * SQL engine for auditing.
  *
  * All narrow (per-row filter, no shuffle); at 100 TB the sample decision
  * rides the scan.
  */
object Sampling {

  /** Uniform hash in [0, 1e6): md5-based, mirrors TextAnalysis.hash60. */
  def hashUnit(key: Column, salt: String): Column =
    TextAnalysis.hash60(concat(lit(salt), lit(":"), key.cast("string"))) % 1000000L

  /** Deterministic Bernoulli sample: keep iff hash(salt, key) < rate.
    * Changing `salt` draws an independent sample; the same (salt, key)
    * always decides the same way (stable across re-runs and repartitions).
    */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double, salt: String): DataFrame =
    df.filter(hashUnit(col(keyCol), salt) < math.round(rate * 1e6))

  /** Deterministic dataset split (train/val/test): every row gets a
    * `split` label by which hash band its salted draw lands in — cuts at
    * the INTEGER thresholds round(cum_fraction · 1e6), so band membership
    * is an exact integer compare (no fp boundary anywhere) and any engine
    * replays it. Disjoint and exhaustive by construction (the last band
    * absorbs the remainder up to 1e6 — fractions must sum to ≤ 1); a
    * row's label never changes when the corpus grows, only when `salt`
    * does — the stability a long-lived eval holdout needs (no leakage of
    * held-out keys into train across re-runs). Narrow map, scan-riding.
    */
  def splitAssign(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], salt: String): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val sum = splits.map(_._2).sum
    require(sum <= 1.0 + 1e-9, s"split fractions sum to $sum > 1")
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => math.round(c * 1e6))
    val h = hashUnit(col(keyCol), salt)
    val last = lit(splits.last._1)
    val labeled = splits.init.zip(cuts).foldRight(last: Column) {
      case (((name, _), cut), rest) => when(h < cut, name).otherwise(rest)
    }
    df.withColumn("split", labeled)
  }

  /** Leakage-safe split: [[splitAssign]] keyed on the NEAR-DUP CLUSTER id
    * instead of the document id, so every member of a near-duplicate
    * group lands in the same band — the holdout guard a training corpus
    * needs (hashing doc_ids splits near-identical documents across
    * train/test, silently inflating eval scores). `clusters` is any
    * (doc_id, cluster_id) frame — [[Dedup.dupClusters]] /
    * [[Dedup.dupClustersStar]] at corpus scale. One doc-keyed equi-join
    * + the same integer hash-band compare; singleton docs are their own
    * cluster, so coverage is total.
    */
  def leakageSafeSplit(clusters: DataFrame,
      splits: Seq[(String, Double)], salt: String): DataFrame =
    splitAssign(clusters.select(col("doc_id"), col("cluster_id")),
      "cluster_id", splits, salt)

  /** Deterministic training-shard layout: the global corpus shuffle a
    * training run needs, WITHOUT a global sort. Every row gets
    * `shard` = hash60(salt:key) mod k and `shard_pos` = its rank within
    * the shard by (hash, key) — so reading shards 0..k-1 in pos order
    * replays one fixed pseudo-random permutation of the corpus,
    * identical on any cluster size and re-derivable by any engine.
    *
    * Scale shape: one hash shuffle on `shard` + a PER-SHARD local sort
    * (each shard is corpus/k rows in one task — pick k so that is
    * task-sized, e.g. 100 TB / 1 GB ≈ 100k shards, the WebDataset/
    * tfrecord sharding rule). No stage ever sees a global order.
    * Growing the corpus only appends new positions inside each shard —
    * it never relabels another row's shard (hash-stable, unlike
    * ntile/round-robin).
    */
  def shardAssign(df: DataFrame, keyCol: String, k: Int, salt: String): DataFrame = {
    require(k > 0, s"shard count must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val h = TextAnalysis.hash60(concat(lit(salt), lit(":"), col(keyCol).cast("string")))
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % k).cast("int"))
      .withColumn("shard_pos",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))) - 1)
      .drop("__h")
  }

  /** Stratified sample: per-stratum rates (e.g. upsample rare languages,
    * downsample boilerplate-heavy domains), default rate for strata not
    * listed. One narrow filter — the stratum column must already exist
    * (join/derive it upstream).
    */
  def stratified(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(math.round(defaultRate * 1e6)): Column) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(math.round(r * 1e6))).otherwise(acc)
    }
    df.filter(hashUnit(col(keyCol), salt) < rate)
  }

  /** Deterministic per-stratum cap: keep the `n` rows with the smallest
    * salted hashes in each stratum (a reproducible uniform draw) — the
    * standard per-domain document cap in web-corpus pipelines.
    *
    * Skew-proof at 100 TB: a hot stratum (one domain with billions of
    * docs) would serialize a naive per-stratum `row_number` onto one
    * reducer. Phase 1 ranks within (input partition, stratum) — the hot
    * stratum stays spread across partitions — and keeps at most `n` rows
    * per slice, so phase 2's true per-stratum rank sees at most
    * n × partitions rows per stratum, never the raw stratum.
    */
  /** Deterministic mixture rebalance toward target stratum weights using
    * DOWNSAMPLING ONLY (no duplication): with weights w_s the largest
    * achievable total preserving the mix is T = min_s n_s / w_s, so each
    * stratum keeps its k_s = min(n_s, ⌊w_s · T + 1e-9⌋) smallest salted
    * hashes (the epsilon absorbs the last-ulp of w_s·(n_s/w_s), letting
    * the binding stratum keep exactly n_s; weights need not be
    * normalized). Strata without a target weight are dropped. The keep
    * decision reuses [[capPerStratum]]'s skew-proof two-phase rank with a
    * per-stratum cap; counts/caps are stratum-cardinality-sized
    * (broadcast), and everything is replayable by any SQL engine.
    * This is the domain-mixture step of web-corpus curation (fixed
    * target proportions over sources/languages).
    */
  def rebalanceMixture(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      weights: Map[String, Double],
      salt: String,
      dropMissing: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // weights: Map[String, _] keys join against the stratum column — a
    // non-string column would CCE at the presence check below with no
    // hint at the cause; make the contract explicit instead of casting
    // (a silent cast could alias distinct strata, e.g. 1 vs "1 ")
    val st = df.schema(stratumCol).dataType
    require(st == org.apache.spark.sql.types.StringType,
      s"stratum column '$stratumCol' must be STRING (weights are keyed by " +
        s"string), got ${st.simpleString} — cast it before rebalancing")
    val wDf = weights.toSeq.toDF(stratumCol, "__w")
    val counted = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
      .join(wDf, stratumCol)
      .persist() // feeds the presence check, the min, and the caps — tiny
    // a weighted stratum with NO rows means the only mix-preserving total
    // is zero. Default: fail loudly rather than silently returning a
    // frame that violates the requested proportions (and rather than
    // NPE-ing on the empty min below when no weighted stratum exists at
    // all). `dropMissing = true` opts into shrinking the mix to the
    // surviving strata instead (upstream filters may empty a stratum).
    val present = counted.select(stratumCol).collect().map(_.getString(0)).toSet
    val missing = weights.keySet -- present
    require(dropMissing || missing.isEmpty,
      s"mixture strata have no rows: ${missing.toSeq.sorted.mkString(", ")} — " +
        "downsampling alone cannot reach the target mix; drop them from " +
        "`weights` or pass dropMissing = true")
    require(present.nonEmpty, "no weighted stratum has any rows")
    val t = counted.select(min(col("__n") / col("__w"))).head().getDouble(0)
    // collect the stratum-cardinality caps and rebuild a LOCAL frame: the
    // returned plan then embeds only the tiny literal caps, not the count
    // aggregate over df (which the caller may not have cached)
    val capsDf = counted.select(col(stratumCol),
      least(col("__n"), floor(col("__w") * t + 1e-9)).cast("long").as("__k"))
    val capsRows = capsDf.collect()
    counted.unpersist(blocking = false)
    val caps = spark.createDataFrame(
      java.util.Arrays.asList(capsRows: _*), capsDf.schema)
    keepSmallestHashes(df, keyCol, stratumCol, caps, salt)
  }

  /** The shared skew-proof keep: per stratum, the `__k` (a column of
    * `caps`) smallest salted hashes survive — per-partition prune first,
    * so no task ever ranks a full stratum; phase 2 ranks only the
    * ≤ k×partitions survivors.
    */
  private def keepSmallestHashes(df: DataFrame, keyCol: String,
      stratumCol: String, caps: DataFrame, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df.join(broadcast(caps), stratumCol)
      .withColumn("__h", hashUnit(col(keyCol), salt))
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(col("__pid"), col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    val global = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    hashed
      .withColumn("__lrn", row_number().over(local)).filter(col("__lrn") <= col("__k"))
      .withColumn("__rn", row_number().over(global)).filter(col("__rn") <= col("__k"))
      .drop("__h", "__pid", "__lrn", "__rn", "__k")
  }

  /** Deterministic temperature sampling (the multilingual-corpus
    * flattening step: downsample big sources toward the small ones,
    * XLM-R-style p_s ∝ n_s^α): each stratum keeps
    * `k_s = min(n_s, floor(n_min^(1-α) · n_s^α + 0.5))` of its smallest
    * salted hashes — the per-stratum keep rate `(n_s/n_min)^(α-1)`
    * normalized to the SMALLEST stratum, so the smallest source stays
    * intact and every other source lands between its own size (α = 1,
    * no-op) and the flat n_min share (α = 0, uniform mix).
    *
    * α = 0.5 makes the cap the geometric mean `sqrt(n_min · n_s)`:
    * products of counts are exact in a double and sqrt is IEEE
    * correctly-rounded, so the caps replay bit-identically in any SQL
    * engine — no cross-source fp sum anywhere (the reason the caps
    * normalize to n_min rather than Σ n_t^α: a 20-term double sum has
    * engine-order ulp drift, a single product does not). Non-dyadic α
    * goes through pow(), which is NOT correctly-rounded — a replaying
    * engine may drift a last-ulp across a .5 cap boundary; stick to
    * α ∈ {0, 0.5, 1} where exactness matters.
    *
    * Selection is the same two-phase skew-proof rank as
    * [[capPerStratum]]; the stratum→cap frame is stratum-cardinality-
    * sized (broadcast). Strata are independent — no budget
    * redistribution — so the output size is Σ k_s, monotone in α.
    */
  def temperatureSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      alpha: Double,
      salt: String): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    val spark = df.sparkSession
    val counted = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
    // sqrt (correctly-rounded) for the dyadic midpoint, pow otherwise
    def powc(c: Column, e: Double): Column =
      if (e == 0.5) sqrt(c) else if (e == 0.0) lit(1.0) else if (e == 1.0) c
      else pow(c, lit(e))
    val capsDf = counted
      .withColumn("__nmin", min(col("__n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(stratumCol),
        least(col("__n"),
          (if (alpha == 0.5)
            floor(sqrt((col("__nmin") * col("__n")).cast("double")) + 0.5)
          else
            floor(powc(col("__nmin").cast("double"), 1.0 - alpha) *
              powc(col("__n").cast("double"), alpha) + 0.5)).cast("long")).as("__k"))
    // collect and rebuild a LOCAL caps frame: the returned plan embeds
    // only the tiny literals, not a count aggregate over df (same reason
    // as rebalanceMixture)
    val capsRows = capsDf.collect()
    val caps = spark.createDataFrame(
      java.util.Arrays.asList(capsRows: _*), capsDf.schema)
    keepSmallestHashes(df, keyCol, stratumCol, caps, salt)
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-Res): keep the `n` rows with the largest u^(1/w), where
    * u ∈ (0,1) is the salted-hash draw ((hash + 0.5)/1e6 — never 0, so
    * pow is total) and w the row's weight — inclusion probability rises
    * with weight, and the selected set is a pure function of
    * (salt, key, weight): reproducible on any cluster size and
    * replayable by any SQL engine. Rows with NULL or non-positive
    * weights are dropped (their draw is undefined).
    *
    * Weight-magnitude bound: u^(1/w) compresses draw spacing by ~1/w, so
    * the 1e-9 key rounding keeps DISTINCT 1e-6-quantized draws distinct
    * only while w ≲ 100; beyond that, same-weight near-ties collapse into
    * one rounding bucket and the (key asc) tie-break decides inclusion —
    * still deterministic and cross-engine stable, but no longer exact
    * A-Res ordering among those ties. Rescale weights into ~[0.1, 100]
    * (inclusion probabilities are scale-free in A-Res) if exact ordering
    * at extreme weights matters.
    *
    * The importance-weighted downsampling primitive (quality-score-
    * weighted corpus thinning); same skew-proof two-phase top-n as
    * [[capPerStratum]] — per-partition prune first, so no single task
    * ever ranks the full frame.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      n: Int,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (hashUnit(col(keyCol), salt).cast("double") + 0.5) / 1e6
    // 1e-9-rounded A-Res key: cross-engine pow() last-ulp differences
    // cannot flip an inclusion boundary (rounded ties break by key);
    // the 1e6-quantized draw keeps distinct keys ≥ ~1e-7 apart, so the
    // rounding never merges genuinely different draws
    val hashed = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__ws",
        floor(pow(u, lit(1.0) / col(weightCol).cast("double")) * 1e9 + 0.5) / 1e9)
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(col("__pid")).orderBy(col("__ws").desc, col(keyCol))
    // empty partition spec is INTENTIONAL and bounded: the second phase
    // ranks only the ≤ n×partitions phase-1 survivors, so one task is the
    // right plan. WindowExec's all-to-one warning fires on it regardless
    // (a constant key would be stripped by EliminateWindowPartitions);
    // SCALE.md documents the pattern and the tools demote that logger.
    val global = Window.orderBy(col("__ws").desc, col(keyCol))
    hashed
      .withColumn("__lrn", row_number().over(local)).filter(col("__lrn") <= n)
      .withColumn("__rn", row_number().over(global)).filter(col("__rn") <= n)
      .drop("__ws", "__pid", "__lrn", "__rn")
  }

  def capPerStratum(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      n: Int,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df.withColumn("__h", hashUnit(col(keyCol), salt))
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(col("__pid"), col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    val global = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    hashed
      .withColumn("__lrn", row_number().over(local)).filter(col("__lrn") <= n)
      .withColumn("__rn", row_number().over(global)).filter(col("__rn") <= n)
      .drop("__h", "__pid", "__lrn", "__rn")
  }

  /** Neyman-allocation stratified sample (Neyman 1934): a total budget
    * `n` split across strata ∝ N_h·σ_h of `valueCol` — the
    * variance-optimal allocation for estimating the population mean from
    * a stratified draw (big AND internally-diverse strata get the
    * samples; small or homogeneous strata need few). Completes the
    * family: [[stratified]] takes fixed rates, [[capPerStratum]] fixed
    * caps, [[rebalanceMixture]] fixed proportions — Neyman computes the
    * caps FROM the data.
    *
    * Cross-engine determinism without rounding tricks: `valueCol` must
    * be integer-valued (doc lengths, token counts — the usual dispersion
    * proxies), so per-stratum Σx and Σx² are EXACT integer sums and
    * N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) is one correctly-rounded IEEE sqrt
    * of an exact integer — no float fold order anywhere. Weights
    * quantize to w_h = floor(N_h σ_h·1e3 + 0.5) (long), allocation is
    * pure integer arithmetic k_h = min(N_h, n·w_h div W), and the draw
    * is the same smallest-salted-hash keep as the rest of the family.
    * Requires Σx² ≲ 2^62/max(N_h) to stay in long range — fine for
    * per-document counts; pre-scale the value otherwise.
    *
    * Shape: one strata-sized aggregate (broadcast back), one ranked
    * keep. All-constant strata get w_h = 0 — sampled only via the
    * integer-division floor's remainder, i.e. effectively excluded, the
    * Neyman limit behavior (σ = 0 strata need 0 samples for the mean).
    */
  def neymanSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      valueCol: String,
      n: Int,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, "need a positive sample budget")
    val v = col(valueCol).cast("long")
    val stats = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s1"), sum(v * v).as("__s2"))
      .withColumn("__w",
        floor(sqrt((col("__n") * col("__s2") - col("__s1") * col("__s1"))
          .cast("double")) * 1e3 + 0.5).cast("long"))
    val total = stats.agg(sum(col("__w")).as("__wsum"))
    // every stratum constant ⇒ W = 0 ⇒ the allocation is undefined —
    // fail loudly (one strata-sized probe) instead of emitting nothing
    require(total.head().getLong(0) > 0,
      s"neymanSample: every '$stratumCol' stratum has zero variance in $valueCol")
    val caps = stats.crossJoin(broadcast(total))
      .withColumn("__k", least(col("__n"),
        expr(s"(CAST($n AS BIGINT) * __w) div __wsum")))
      .select(col(stratumCol), col("__k"))
    val hashed = df.join(broadcast(caps), stratumCol)
      .withColumn("__h", hashUnit(col(keyCol), salt))
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(col("__pid"), col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    val global = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    hashed
      .withColumn("__lrn", row_number().over(local)).filter(col("__lrn") <= col("__k"))
      .withColumn("__rn", row_number().over(global)).filter(col("__rn") <= col("__k"))
      .drop("__h", "__pid", "__lrn", "__rn", "__k")
  }
}
