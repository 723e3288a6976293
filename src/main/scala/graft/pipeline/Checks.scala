package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ-style contract
  * layer a production pipeline runs before training on a new snapshot):
  * completeness, uniqueness, value-range, and referential-integrity
  * checks, each reported as a fraction-in-[0,1] metric against a
  * threshold.
  *
  * Shape at 100 TB: every aggregate-expressible check against one table
  * runs in ONE shared scan — [[tableSuite]] fuses all its checks into a
  * single partial+final aggregate (the Deequ "analyzer fusion" idea), so
  * a 10-check contract costs one pass, not ten. `uniqueness` rides the
  * same aggregate as exact `count_distinct` (Spark plans the multi-
  * distinct Expand); referential integrity is the one check that needs a
  * second table — a LeftSemi count against the parent key (broadcast
  * when the parent is dimension-sized). Metrics are ratios of exact
  * counts pre-rounded 1e-6, so any engine replays pass/fail decisions
  * bit-for-bit.
  */
object Checks {

  /** One constraint over a single table: `expr` must evaluate to the
    * fraction-passing metric under a global aggregate. `streamable` =
    * the expression is legal inside a watermarked streaming aggregate
    * (distinct aggregates are not — uniqueness is batch-only; a
    * streaming pipeline dedups first and counts).
    */
  final case class Check(name: String, target: String, threshold: Double,
      expr: Column, streamable: Boolean = true)

  def completeness(column: String, threshold: Double = 1.0): Check =
    Check("completeness", column, threshold,
      avg(when(col(column).isNotNull, 1.0).otherwise(0.0)))

  def uniqueness(column: String, threshold: Double = 1.0): Check =
    Check("uniqueness", column, threshold,
      count_distinct(col(column)).cast("double") / count(lit(1)).cast("double"),
      streamable = false)

  def inRange(column: String, lo: Double, hi: Double, threshold: Double = 1.0): Check =
    Check("in_range", column, threshold,
      avg(when(col(column).isNotNull && col(column) >= lo && col(column) <= hi, 1.0)
        .otherwise(0.0)))

  /** The fused per-check aggregate columns (metrics pre-rounded 1e-6)
    * and the explode that turns the single aggregate row into one
    * result row per check — shared by the batch [[tableSuite]] and the
    * streaming twin (`StreamOps.checks`), so both surfaces compute the
    * identical metric expressions.
    */
  private[graft] def suiteAggs(checks: Seq[Check]): Seq[Column] =
    checks.zipWithIndex.map { case (c, i) =>
      (floor(c.expr * 1e6 + 0.5) / 1e6).as(s"__m$i")
    }

  private[graft] def suiteRows(table: String, checks: Seq[Check]): Column =
    explode(array(checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), lit(s"$table.${c.target}").as("target"),
        col(s"__m$i").as("metric"), lit(c.threshold).as("threshold"),
        (col(s"__m$i") >= c.threshold).as("pass"))
    }: _*))

  /** All checks against `df` in ONE aggregate pass; one result row per
    * check: (check, target, metric round 1e-6, threshold, pass).
    */
  def tableSuite(df: DataFrame, table: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val aggs = suiteAggs(checks)
    df.agg(aggs.head, aggs.tail: _*)
      .select(suiteRows(table, checks).as("__r"))
      .select(col("__r.check"), col("__r.target"), col("__r.metric"),
        col("__r.threshold"), col("__r.pass"))
  }

  /** Join-key skew diagnostic — the "will this join/groupBy fall over at
    * 100 TB" pre-flight: per-key counts → one summary row per analyzed
    * column with n_rows, n_keys, the heaviest key's share, the top-10
    * keys' share, and max/avg ratio (how many× the hottest reducer runs
    * vs uniform). top1_share near 1 says broadcast the OTHER side or
    * salt THIS key; max_avg_ratio ≫ 10 says AQE skew-join territory.
    *
    * Cost shape: one hash aggregate to the key-count frame (|keys| rows,
    * partial+final — never wider than the dedup'd key set), then a
    * TakeOrdered(10) and a scalar aggregate over counts. All metrics are
    * exact-count ratios pre-rounded 1e-6 — any engine replays them.
    * NULL keys count as one key (they hash to one reducer like any
    * other value — exactly the skew this check exists to surface).
    */
  def keySkew(df: DataFrame, table: String, column: String): DataFrame = {
    val counts = df.groupBy(col(column).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val top10 = counts.orderBy(col("__c").desc, col("__k").asc_nulls_first)
      .limit(10).agg(sum("__c").cast("double").as("__t10"))
    val r6 = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    counts
      .agg(sum("__c").cast("double").as("__n"),
        count(lit(1)).cast("double").as("__d"),
        max("__c").cast("double").as("__mx"))
      .crossJoin(broadcast(top10))
      .select(
        lit(s"$table.$column").as("target"),
        col("__n").cast("bigint").as("n_rows"),
        col("__d").cast("bigint").as("n_keys"),
        r6(col("__mx") / col("__n")).as("top1_share"),
        r6(least(col("__t10"), col("__n")) / col("__n")).as("top10_share"),
        r6(col("__mx") / (col("__n") / col("__d"))).as("max_avg_ratio"))
  }

  /** Referential integrity: fraction of child rows whose `childKey` has a
    * match in `parent.parentKey` (NULL keys count as violations — an FK
    * that permits NULL should filter first). LeftSemi count over the
    * child; same result row shape as [[tableSuite]].
    */
  def referential(child: DataFrame, childTable: String, childKey: String,
      parent: DataFrame, parentTable: String, parentKey: String,
      threshold: Double = 1.0): DataFrame = {
    val total = child.agg(count(lit(1)).cast("double").as("__n"))
    val matched = child
      .join(parent.select(col(parentKey)), col(childKey) === col(parentKey), "left_semi")
      .agg(count(lit(1)).cast("double").as("__k"))
    matched.crossJoin(broadcast(total))
      .select(
        lit("referential").as("check"),
        lit(s"$childTable.$childKey -> $parentTable.$parentKey").as("target"),
        (floor(col("__k") / col("__n") * 1e6 + 0.5) / 1e6).as("metric"),
        lit(threshold).as("threshold"),
        ((floor(col("__k") / col("__n") * 1e6 + 0.5) / 1e6) >= threshold).as("pass"))
  }

  /** Join-size pre-flight — the companion to [[keySkew]]: the EXACT
    * output cardinality of `left ⋈ right` on an equi-key, plus the share
    * the hottest key contributes, computed WITHOUT running the join on
    * the fact rows. Σ_k cnt_l(k)·cnt_r(k) over the two per-key count
    * frames (key-dimension-sized — the only shuffle is the two count
    * aggregates and their key-sized equi-join). At 100 TB this is the
    * difference between discovering a 10¹³-row blowup from a diagnostic
    * that cost two narrow scans and discovering it from a dead cluster;
    * top1_share > a few % is the "salt this join" signal
    * ([[graft.operators.SaltedJoin]] is the remedy this check gates).
    */
  /** Equi-depth histogram — the profiling primitive behind skew-aware
    * binning and drift baselines: interior boundaries are the exact
    * (i/bins)-percentiles (pre-rounded 1e-6 so any engine replays them),
    * a row's bin = COUNT of boundaries ≤ value (one codegen array
    * filter against the broadcast one-row boundary frame — no join, no
    * sort), then one count aggregate. Two passes over the column: the
    * percentile aggregate and the binning scan. Ties land in the upper
    * bin on both engines (≤ is the boundary comparison everywhere).
    * Repeated values make bins uneven by construction — that is the
    * diagnostic, not a defect.
    *
    * The boundaries come from ONE percentile aggregate taking the whole
    * fraction array — per-fraction aggregates would each buffer their
    * own copy of the column (bins-1 full copies in flight), which is the
    * difference between one sort's worth of memory and an OOM on a wide
    * profile at scale.
    */
  def histogram(df: DataFrame, table: String, column: String,
      bins: Int = 8): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val ps = (1 until bins).map(_.toDouble / bins)
    val bounds = df.agg(transform(
      percentile(col(column), array(ps.map(lit): _*)),
      x => floor(x * 1e6 + 0.5) / 1e6).as("__b"))
    df.select(col(column)).crossJoin(broadcast(bounds))
      .select(col("__b"),
        size(filter(col("__b"), b => b <= col(column))).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(first(col("__b")).as("__b"), count(lit(1)).as("n"))
      .select(lit(s"$table.$column").as("target"), col("bin"),
        when(col("bin") >= 1, element_at(col("__b"), col("bin").cast("int"))).as("lo"),
        col("n"))
  }

  /** [[histogram]] for a WHOLE profile: all `columns` in ONE percentile
    * aggregate (one buffer per column, side by side) and ONE binning
    * scan (the per-column (bin, count) pairs ride a single explode) —
    * profiling k columns costs the same two passes over STORAGE as
    * profiling one. Output rows are identical to unioning per-column
    * [[histogram]] calls (PipelineSpec pins it).
    *
    * When to use which: per-column [[histogram]] wins when scans are
    * CPU-bound (small/cached data — the explode's k× row amplification
    * costs more than the extra cheap passes; measured 3.5 vs 5.1 s at
    * the sf0.1 gate), this one wins when scans are storage-bound (the
    * 100 TB profile: k extra table reads dwarf any CPU).
    */
  def histogramMulti(df: DataFrame, table: String, columns: Seq[String],
      bins: Int = 8): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    require(columns.nonEmpty, "need at least one column")
    val ps = (1 until bins).map(_.toDouble / bins)
    val bounds = df.agg(
      transform(percentile(col(columns.head), array(ps.map(lit): _*)),
        x => floor(x * 1e6 + 0.5) / 1e6).as(s"__b_${columns.head}"),
      columns.tail.map(c =>
        transform(percentile(col(c), array(ps.map(lit): _*)),
          x => floor(x * 1e6 + 0.5) / 1e6).as(s"__b_$c")): _*)
    df.select(columns.map(col): _*).crossJoin(broadcast(bounds))
      .select(explode(array(columns.map(c => struct(
        lit(s"$table.$c").as("target"),
        col(s"__b_$c").as("__b"),
        size(filter(col(s"__b_$c"), b => b <= col(c))).cast("long").as("bin"))): _*))
        .as("__e"))
      .select(col("__e.target"), col("__e.__b"), col("__e.bin"))
      .groupBy(col("target"), col("bin"))
      .agg(first(col("__b")).as("__b"), count(lit(1)).as("n"))
      .select(col("target"), col("bin"),
        when(col("bin") >= 1, element_at(col("__b"), col("bin").cast("int"))).as("lo"),
        col("n"))
  }

  /** Robust per-group outlier screen (Iglewicz & Hoaglin's modified
    * z-score, NIST handbook — public): per group, median, MAD =
    * median(|x − med|), robust z = 0.6745·(x − med)/MAD, outlier at
    * |z| > `threshold` (3.5, the standard cut). Mean/σ screens break on
    * the exact heavy-tailed length/quality columns this is for — one
    * glitch batch of 10⁹-char rows drags σ until nothing flags; the
    * median/MAD pair has a 50% breakdown point.
    *
    * Shape: two grouped exact-percentile aggregates (group-keyed, one
    * value copy in flight each) + one flag pass with the group stats
    * joined back (group-cardinality frame — broadcastable). Integer
    * inputs make both medians exact (.0/.5), so the z comparison is the
    * same float expression from the same exact operands in any engine.
    * MAD = 0 (over half the group identical): z is undefined — the
    * documented fallback flags any x ≠ med.
    *
    * Output: (g, n, n_outliers, med, mad), deterministic.
    */
  def madOutliers(df: DataFrame, valCol: String, groupCol: String,
      threshold: Double = 3.5): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
    val med = base.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.5)).as("med"))
    val stats = base.join(med, "g")
      .select(col("g"), col("med"), abs(col("v") - col("med")).as("ad"))
      .groupBy(col("g"))
      .agg(first(col("med")).as("med"), percentile(col("ad"), lit(0.5)).as("mad"))
    val z = lit(0.6745) * (col("v") - col("med")) / col("mad")
    val isOut = when(col("mad") > 0, abs(z) > threshold)
      .otherwise(col("v") =!= col("med"))
    base.join(broadcast(stats), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
        first(col("med")).as("med"), first(col("mad")).as("mad"))
  }

  /** Mutual information (bits) between two categorical columns —
    * MI = Σ_{a,b} (n_ab/N)·log2(N·n_ab/(n_a·n_b)) — the feature-
    * relevance / redundancy number a curation pipeline reads before
    * stratifying on a dimension ("does source tell me anything lang
    * doesn't?"). One count pass over the data; everything after runs on
    * the |A|×|B| cell frame (bounded by contract — categoricals).
    *
    * Cross-engine determinism: every product/ratio is exact-integer in
    * doubles (counts < 2⁵³), each cell's contribution is pre-rounded to
    * 1e-9 (log2 ulps differ across libm implementations — the PMI/TFIDF
    * stance), and the final sum is an ORDERED left fold over the
    * (a, b)-sorted cells (`aggregate` over `sort_array(collect_list)` ≡
    * DuckDB `list_reduce(list(c ORDER BY a, b))` — the cross-engine
    * fold-order rule), rounded 1e-6.
    *
    * Output: one row (target, n_rows, n_cells, mi_bits).
    */
  def mutualInformation(df: DataFrame, colA: String, colB: String,
      label: String): DataFrame = {
    val cells = df.groupBy(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .agg(count(lit(1)).as("nab"))
    val na = cells.groupBy(col("a")).agg(sum(col("nab")).as("na"))
    val nb = cells.groupBy(col("b")).agg(sum(col("nab")).as("nb"))
    val tot = cells.agg(sum(col("nab")).as("n"))
    val contrib = cells.join(na, "a").join(nb, "b").crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n"),
        (floor((col("nab").cast("double") / col("n").cast("double")) *
          log(2.0, (col("nab") * col("n")).cast("double") /
            (col("na") * col("nb")).cast("double")) * 1e9 + 0.5) / 1e9).as("c"))
    contrib
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("c")))).as("cs"),
        first(col("n")).as("n"), count(lit(1)).as("n_cells"))
      .select(lit(label).as("target"),
        col("n").cast("bigint").as("n_rows"),
        col("n_cells"),
        (floor(aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("c")) * 1e6 + 0.5) / 1e6).as("mi_bits"))
  }

  def joinEstimate(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, label: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__cl"))
    val rc = right.groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cr"))
    val per = lc.join(rc, "__k")
      .select(col("__k"), (col("__cl") * col("__cr")).as("__out"))
    per.agg(sum(col("__out")).as("__total"),
        count(lit(1)).as("__keys"),
        max(col("__out")).as("__mx"))
      .select(lit(label).as("target"),
        col("__total").cast("bigint").as("est_rows"),
        col("__keys").cast("bigint").as("n_match_keys"),
        col("__mx").cast("bigint").as("top1_rows"),
        (floor(col("__mx") / col("__total").cast("double") * 1e6 + 0.5) / 1e6)
          .as("top1_share"))
  }
}
