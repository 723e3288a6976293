package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping manifest for a [[SeriesStore]] — the layer
  * between partition pruning and parquet row-group stats.
  *
  * The store's hour partitioning already turns time predicates into
  * directory pruning, and parquet footers carry per-row-group min/max.
  * But at 100 TB a selective probe ("series S, 6-hour window") still has
  * to LIST every surviving partition and open every file's footer before
  * it can skip anything — tens of thousands of round-trips on an object
  * store. This manifest is one metadata-sized parquet table, read once:
  *
  *   file, hour_bucket, min_time, max_time, min_value, max_value,
  *   n_rows, bloom ARRAY<LONG>(16)
  *
  * per data file, where `bloom` is a 1024-bit / 3-hash Bloom filter over
  * the file's distinct `series_id`s. A probe prunes the manifest frame
  * (time-range overlap + bloom membership), collects the surviving file
  * list (metadata-sized), and reads ONLY those files; exact residual
  * predicates run on what is read, so a bloom false positive costs one
  * extra file read, never a wrong row. The same role as Delta/Iceberg
  * file statistics + bloom column indexes, rebuilt store-native.
  *
  * Scale shape: the build is one pass over the data (two aggregates that
  * share the scan: per-file stats, and per-(file, distinct series)
  * bit-position OR); the manifest is O(files) rows. [[refresh]] keeps it
  * incremental after appends/compaction/retention: recompute the touched
  * hours from data, carry the rest forward from the old manifest, swap
  * crash-safely.
  *
  * Reference: file-stat pruning generalizes the segment store's
  * TimeBounds skip (`/root/reference/src/sydra/query/physical.zig:138-264`)
  * from partitions to individual files, and adds the series dimension the
  * reference's per-(series, hour) file naming gives it implicitly.
  */
object SkipIndex {

  private val Bits = 1024
  private val Words = Bits / 64
  private val Hashes = 3

  /** Bit positions of `id` (a series_id column) — k salted xxhash64s. */
  private def positions(id: org.apache.spark.sql.Column) =
    (0 until Hashes).map(k => pmod(xxhash64(id, lit(k)), lit(Bits.toLong)))

  /** Probe-side bit positions, computed ON THE DRIVER — bit-identical to
    * [[positions]] (FunctionsSpec pins parity on random inputs against
    * the Spark expression) via the same catalyst XXH64 kernel the
    * expression runs: `xxhash64(x, lit(k))` folds seed 42 through x then
    * the Int literal k. r15 ran a `spark.range(1)` projection per probe
    * to guarantee parity — one scheduler round-trip per query on the
    * highest-QPS path; a shared kernel gives parity without the job.
    */
  private[graft] def localPositions(id: Long): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (0 until Hashes).map { k =>
      Math.floorMod(XXH64.hashInt(k, XXH64.hashLong(id, 42L)), Bits.toLong).toInt
    }
  }

  /** [[localPositions]] for a string probe (series name, `k=v` tag pair). */
  private[graft] def localPositions(s: String): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    (0 until Hashes).map { k =>
      Math.floorMod(XXH64.hashInt(k, XXH64.hashUTF8String(utf8, 42L)),
        Bits.toLong).toInt
    }
  }

  /** Manifest-frame predicate "this file's bloom may contain every probed
    * bit position" over `bloomCol`. NULL-tolerant: a row carried forward
    * through an in-place manifest upgrade ([[refresh]]) has NULL for the
    * blooms its build predates — NULL means "cannot prune", the file is
    * read and the exact residual decides (the per-file fallback the
    * upgrade semantics rely on).
    */
  private def bloomMayContain(bloomCol: String, pos: Seq[Int]) =
    coalesce(
      pos.map { p =>
        (element_at(col(bloomCol), lit(p / 64 + 1))
          .bitwiseAND(lit(1L << (p % 64)))) =!= 0L
      }.reduce(_ && _),
      lit(true))

  /** Tag-equality pruning predicate over CNF groups (r16 conjuncts,
    * r17 OR-groups): `tags` is an AND of groups, each group an OR of
    * `k=v` pairs — a plain conjunct `tag.k = 'v'` is a singleton group,
    * a top-level disjunct that is PURELY tag equalities (`tag.host='a'
    * or tag.host='b'`, the dashboard multi-select) probes as the UNION
    * of its pair probes, which is superset-safe because the true WHERE
    * implies the disjunction. A file survives iff every group has at
    * least one probe-positive pair. A manifest predating the tag bloom
    * (no column) or a carried row (NULL) prunes nothing — superset
    * contract, the exact residual runs on what is read.
    */
  private def tagPred(m: DataFrame, tags: Seq[Seq[(String, String)]]) =
    if (tags.isEmpty || !m.columns.contains("bloom_tags")) lit(true)
    else tags.map { group =>
      group.map { case (k, v) =>
        bloomMayContain("bloom_tags", localPositions(s"$k=$v"))
      }.reduce(_ || _)
    }.reduce(_ && _)

  /** The exact row-level residual for the CNF tag groups — one shared
    * definition so every scan's residual semantics (null tag key →
    * false, like the compiler's try_element_at equality; an OR-group
    * keeps any row matching one of its pairs) stay identical.
    */
  private def tagResidual(tags: Seq[Seq[(String, String)]]) =
    tags.map { group =>
      group.map { case (k, v) => try_element_at(col("tags"), lit(k)) === v }
        .reduce(_ || _)
    }.foldLeft(lit(true))(_ && _)

  /** One manifest row, driver-resident (see [[cachedRows]]). Nullable
    * blooms mirror an in-place-upgraded manifest's carried rows; null
    * value stats mirror an all-null-value file.
    */
  private final case class ManifestRow(file: String, minTime: Long,
      maxTime: Long, vNull: Boolean, minValue: Double, maxValue: Double,
      bloom: Array[Long], bloomName: Array[Long], bloomTags: Array[Long])

  /** A manifest small enough to mirror on the driver is cached as rows
    * (~400 B each; the default 200k cap ≈ 80 MB) — beyond the cap the
    * Spark-side filter path stays.
    */
  private val MaxCachedRows =
    sys.env.getOrElse("SPARK_GRAFT_MANIFEST_CACHE_ROWS", "200000").toInt

  /** Driver-cached manifest rows (r16), keyed on the dir's refresh
    * generation via [[MetaCache]]. The manifest is metadata-sized BY
    * DESIGN (one row per data file, one parquet object), yet every
    * routed query was paying a Spark job — manifest scan + filter +
    * collect — just to learn the surviving file list, a fixed ~100 ms of
    * local job floor (and a scheduler round-trip per probe at cluster
    * QPS). With the rows driver-resident, survivor selection is a local
    * array filter: ZERO jobs on the probe path, the same driver-side
    * snapshot-cache tradeoff Delta and Iceberg make. Bounded by
    * [[MaxCachedRows]]: a beyond-cap manifest keeps the Spark path — the
    * per-query job is amortized at that file count, and the driver heap
    * is not the place for an unbounded metadata mirror.
    */
  private def cachedRows(spark: SparkSession,
      manifestDir: String): Option[Array[ManifestRow]] = {
    // resolved BEFORE entering the memo's compute: a cached() load that
    // itself calls cached() is a nested computeIfAbsent on one
    // ConcurrentHashMap — the JDK throws "Recursive update" when the two
    // keys share a bin. Sequential lookups are safe.
    val total = filesTotal(spark, manifestDir)
    MetaCache.cached(manifestDir, "rows") {
      if (total > MaxCachedRows)
        Option.empty[Array[ManifestRow]]
      else {
        val m = read(spark, manifestDir)
        def arrOr(c: String) =
          if (m.columns.contains(c)) col(c) else lit(null).cast("array<long>")
        val rows = m.select(col("file"), col("min_time"), col("max_time"),
          col("min_value"), col("max_value"), col("bloom"),
          arrOr("bloom_name"), arrOr("bloom_tags"))
          .collect().map { r =>
            def words(i: Int): Array[Long] =
              if (r.isNullAt(i)) null
              else r.getSeq[Long](i).toArray
            ManifestRow(r.getString(0), r.getLong(1), r.getLong(2),
              vNull = r.isNullAt(3),
              if (r.isNullAt(3)) 0d else r.getDouble(3),
              if (r.isNullAt(4)) 0d else r.getDouble(4),
              words(5), words(6), words(7))
          }
        Some(rows)
      }
    }
  }

  /** Surviving files + manifest total under time ∧ blooms ∧ value-stat
    * pruning — driver-local when the rows are cached ([[cachedRows]]),
    * else the Spark-side filter. Both paths implement the SAME
    * semantics: NULL blooms cannot prune (upgrade carry-forward), NULL
    * value stats fail a finite-bound value filter (an all-null file
    * cannot match a value residual), and every filter is a superset of
    * the exact residual run on what is read.
    */
  private def prune(store: SeriesStore, manifestDir: String,
      startTs: Long, endTs: Long,
      idPos: Option[Seq[Int]], namePos: Option[Seq[Int]],
      minValue: Double, maxValue: Double,
      tags: Seq[Seq[(String, String)]]): (Array[String], Int) = {
    val spark = store.spark
    val hasV = !minValue.isNegInfinity || !maxValue.isPosInfinity
    cachedRows(spark, manifestDir) match {
      case Some(rows) =>
        def bloomOk(arr: Array[Long], pos: Seq[Int]): Boolean =
          arr == null || pos.forall(p => (arr(p / 64) & (1L << (p % 64))) != 0L)
        val tagPos = tags.map(_.map { case (k, v) => localPositions(s"$k=$v") })
        val files = rows.filter { r =>
          r.minTime <= endTs && r.maxTime >= startTs &&
            idPos.forall(bloomOk(r.bloom, _)) &&
            namePos.forall(bloomOk(r.bloomName, _)) &&
            (!hasV || (!r.vNull && r.maxValue >= minValue && r.minValue <= maxValue)) &&
            tagPos.forall(_.exists(bloomOk(r.bloomTags, _)))
        }.map(_.file)
        (files, rows.length)
      case None =>
        val m = read(spark, manifestDir)
        // A pre-upgrade manifest may lack a bloom column entirely (vs a
        // carried row's NULL, which bloomMayContain already tolerates) —
        // a missing column prunes nothing, matching the driver path's
        // arrOr(null) semantics instead of throwing AnalysisException.
        def bloomGuard(c: String, pos: Option[Seq[Int]]) =
          pos.filter(_ => m.columns.contains(c))
            .map(bloomMayContain(c, _)).getOrElse(lit(true))
        val cond = col("min_time") <= endTs && col("max_time") >= startTs &&
          bloomGuard("bloom", idPos) &&
          bloomGuard("bloom_name", namePos) &&
          (if (hasV) col("max_value") >= minValue && col("min_value") <= maxValue
          else lit(true)) &&
          tagPred(m, tags)
        (m.filter(cond).select("file").collect().map(_.getString(0)),
          filesTotal(spark, manifestDir))
    }
  }

  /** One manifest row per data file of `scan` (which must carry the
    * store schema + hour_bucket): the stats aggregate and the
    * distinct-series bit-position OR share the one pass over the data.
    */
  private def manifestRows(scan: DataFrame): DataFrame = {
    val raw = scan.withColumn("__file", col("_metadata.file_path"))
    val stats = raw.groupBy(col("__file"))
      .agg(first(col("hour_bucket")).as("hour_bucket"),
        min(col("time")).as("min_time"), max(col("time")).as("max_time"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"),
        count(lit(1)).as("n_rows"))
    // THREE blooms from ONE distinct pass (series_id functionally
    // determines series AND tags, so the exploded distinct is still the
    // id-distinct — duplicate id rows across a series' tag entries are
    // harmless, bit-OR is idempotent): the id bloom serves by_id()
    // probes, the NAME bloom (r15) serves `from cpu.load`, and the TAG
    // bloom (r16) holds the file-distinct `k=v` tag pairs so
    // `where tag.host = 'a'` prunes inside a name's files (reference tag
    // index semantics, `/root/reference/src/sydra/storage/tags.zig:4-76`,
    // re-expressed as file skipping). Name positions offset into
    // [Bits, 2*Bits), tag positions into [2*Bits, 3*Bits), so one
    // explode → bit-OR chain builds all three; the final projection
    // splits the 3*Words-word space back into the arrays.
    // explode_outer keeps tagless series in the id/name blooms.
    val basePos = positions(col("series_id")) ++
      positions(col("series")).map(_ + lit(Bits.toLong))
    val tagPos = positions(concat(col("key"), lit("="), col("value")))
      .map(_ + lit((2 * Bits).toLong))
    val blooms = raw
      .select(col("__file"), col("series_id"), col("series"),
        explode_outer(col("tags")))
      .distinct()
      .select(col("__file"), explode(concat(array(basePos: _*),
        when(col("key").isNull, array().cast("array<long>"))
          .otherwise(array(tagPos: _*)))).as("pos"))
      .select(col("__file"), (col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("mask"))
      .groupBy(col("__file"), col("word"))
      .agg(bit_or(col("mask")).as("bits"))
      .groupBy(col("__file"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("m"))
      .select(col("__file"),
        array((0 until Words).map(w =>
          coalesce(element_at(col("m"), lit(w)), lit(0L))): _*).as("bloom"),
        array((Words until 2 * Words).map(w =>
          coalesce(element_at(col("m"), lit(w)), lit(0L))): _*).as("bloom_name"),
        array((2 * Words until 3 * Words).map(w =>
          coalesce(element_at(col("m"), lit(w)), lit(0L))): _*).as("bloom_tags"))
    stats.join(blooms, "__file")
      .withColumnRenamed("__file", "file")
      .select("file", "min_time", "max_time", "min_value", "max_value",
        "n_rows", "bloom", "bloom_name", "bloom_tags", "hour_bucket")
  }

  /** Build (overwrite) the manifest for every data file in the store.
    *
    * Written as ONE parquet file under `manifestDir/m`: a manifest that
    * were itself partitioned into thousands of tiny files would recreate
    * the listing pathology it exists to kill — the probe must read it in
    * one round-trip. O(files) rows ≈ a few hundred bytes each; even a
    * million-file store is a ~100 MB single object.
    */
  def build(store: SeriesStore, manifestDir: String): Unit = {
    require(!store.isEmpty, s"store at ${store.root} has no flushed segments to index")
    manifestRows(store.scan())
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$manifestDir/m")
    MetaCache.invalidate(manifestDir)
  }

  /** Incremental refresh after appends/compaction/retention touched
    * `hours`: recompute ONLY those hours' rows from the data (the
    * bounded scan), carry every untouched hour's rows forward from the
    * existing manifest (a metadata-sized read), and swap the single
    * manifest file in crash-safely (Maintenance's `_repack` rename
    * protocol — a died-mid-swap manifest is restored by the recovery
    * pass the next read runs). Hours the store no longer has (retention
    * drops) simply contribute no recomputed rows.
    *
    * Schema upgrades stay incremental (r16 — a pre-r15/r16 manifest
    * used to trigger a FULL rebuild here, O(store) hidden inside an
    * O(touched hours) call): carried rows keep NULL for blooms their
    * build predates (`unionByName` fills them), probes treat NULL as
    * "cannot prune" ([[bloomMayContain]]) and read those files, and
    * each hour gains its blooms when it next refreshes. Loud on stderr
    * so the weaker pruning during the transition is attributable.
    */
  def refresh(store: SeriesStore, manifestDir: String, hours: Seq[Long]): Unit = {
    if (hours.isEmpty) return
    val spark = store.spark
    val old = read(spark, manifestDir)
    val missing = Seq("bloom_name", "bloom_tags").filterNot(old.columns.contains)
    if (missing.nonEmpty)
      System.err.println(s"[graft] SkipIndex: upgrading manifest at $manifestDir " +
        s"in place — refreshed hours gain ${missing.mkString(", ")}; carried " +
        "rows keep them NULL (no pruning on those files) until their hours refresh")
    val kept = old.filter(!col("hour_bucket").isin(hours: _*))
    val fresh = manifestRows(store.scan().filter(col("hour_bucket").isin(hours: _*)))
    val next = kept.unionByName(fresh, allowMissingColumns = true).coalesce(1)
    Maintenance.swapRewrite(spark, manifestDir, "m") { tmp =>
      // `next` lazily READS the live manifest while writing to the
      // scratch path — the swap happens only after the write succeeds
      next.write.parquet(tmp)
    }
    MetaCache.invalidate(manifestDir)
  }

  /** Engine-integration convention (r12): a store's own manifest lives at
    * `<root>/skipindex`. [[graft.sydraql.Engine.executeOnStore]] routes
    * `by_id()` and time-bounded scans through it when present, and
    * [[SeriesStore.append]] keeps it fresh for the hours a batch touches
    * (a stale manifest after an append would silently MISS the new files;
    * since r13 [[Maintenance]]'s delete/retention/compaction paths run
    * the same refresh hook for the partitions they touch, and the
    * streaming maintenance twin covers continuous ingest).
    */
  def dirFor(store: SeriesStore): String = s"${store.root}/skipindex"

  /** Memoized per (dir, refresh generation) — [[MetaCache]]; [[build]]
    * and [[refresh]] bump the generation.
    */
  def exists(spark: SparkSession, manifestDir: String): Boolean =
    MetaCache.cached(manifestDir, "exists") {
      val p = new org.apache.hadoop.fs.Path(s"$manifestDir/m")
      java.lang.Boolean.valueOf(
        p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
    }.booleanValue()

  /** The manifest's total file count — the `filesTotal` evidence every
    * routed scan reports. Memoized: this was an extra count job on EVERY
    * routed query for a number that only changes when the manifest does.
    */
  private def filesTotal(spark: SparkSession, manifestDir: String): Int =
    MetaCache.cached(manifestDir, "filesTotal") {
      java.lang.Integer.valueOf(read(spark, manifestDir).count().toInt)
    }.intValue()

  /** Refresh the store-convention manifest for `hours`, if one exists. */
  def autoRefresh(store: SeriesStore, hours: Seq[Long]): Unit = {
    val dir = dirFor(store)
    if (hours.nonEmpty && exists(store.spark, dir)) refresh(store, dir, hours)
  }

  /** Time-range-only pruned scan (no series predicate — the `by name` /
    * all-series engine route): files whose [min_time, max_time] overlaps
    * the inclusive range, further pruned by the tag bloom when `tags`
    * equality pairs are passed (r16). Same contract as [[probeScan]]:
    * pruning is I/O-only, the exact residual filter runs on what is read.
    */
  def rangeScan(store: SeriesStore, manifestDir: String,
      startTs: Long, endTs: Long,
      tags: Seq[Seq[(String, String)]] = Nil): SkipScan = {
    val (survivors, total) = prune(store, manifestDir, startTs, endTs,
      idPos = None, namePos = None,
      Double.NegativeInfinity, Double.PositiveInfinity, tags)
    SkipScan(
      readFiles(store, survivors)
        .filter(col("time") >= startTs && col("time") <= endTs &&
          tagResidual(tags)),
      survivors.length, total)
  }

  def read(spark: SparkSession, manifestDir: String): DataFrame = {
    Maintenance.recoverSwaps(spark, manifestDir) // heal a died-mid-swap refresh
    spark.read.parquet(s"$manifestDir/m")
  }

  /** A manifest-pruned scan plus its skipping evidence. */
  final case class SkipScan(df: DataFrame, filesRead: Int, filesTotal: Int)

  /** Read exactly `files` of the store (partition column recovered via
    * basePath); the store's typed empty frame when nothing survived.
    */
  private def readFiles(store: SeriesStore, files: Array[String]): DataFrame =
    if (files.isEmpty) store.scan().filter(lit(false))
    else {
      val spark = store.spark
      val fs = new org.apache.hadoop.fs.Path(store.segDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val base = fs.makeQualified(new org.apache.hadoop.fs.Path(store.segDir)).toString
      spark.read.option("basePath", base).parquet(files.toIndexedSeq: _*)
    }

  /** Rows of `series_id = seriesId` with `startTs <= time <= endTs`
    * (inclusive, the [[SeriesStore.scanRange]] convention), reading only
    * files whose manifest entry overlaps the range AND whose bloom may
    * contain the series — AND (r14, when finite `minValue`/`maxValue`
    * bounds are passed) whose min/max_value stats can match, so
    * `by_id(N) … and value >= X` prunes on time ∧ bloom ∧ value stats
    * instead of losing the value dimension to the selector match.
    * Identical rows to the full-scan filter — the manifest changes what
    * is READ, never what is true. The value-stat filter and residual are
    * only applied for FINITE bounds: an infinite default must not touch
    * the value column at all (a `value >= -∞` residual would drop
    * null-valued rows a plain probe serves).
    */
  def probeScan(store: SeriesStore, manifestDir: String,
      startTs: Long, endTs: Long, seriesId: Long,
      minValue: Double = Double.NegativeInfinity,
      maxValue: Double = Double.PositiveInfinity): SkipScan = {
    // probe-side bit positions on the driver (r16) — the shared XXH64
    // kernel [[localPositions]], FunctionsSpec-pinned bit-identical to
    // the build expressions; r15 paid a Spark job per probe for parity
    val hasV = !minValue.isNegInfinity || !maxValue.isPosInfinity
    val (survivors, total) = prune(store, manifestDir, startTs, endTs,
      idPos = Some(localPositions(seriesId)), namePos = None,
      minValue, maxValue, Nil)
    val residual = col("series_id") === seriesId &&
      col("time") >= startTs && col("time") <= endTs &&
      (if (hasV) col("value") >= minValue && col("value") <= maxValue
      else lit(true))
    SkipScan(readFiles(store, survivors).filter(residual),
      survivors.length, total)
  }

  /** Whether the manifest carries the r15 name bloom — memoized like
    * [[exists]] (build/refresh bump the generation); a pre-r15 manifest
    * routes name selectors through [[rangeScan]]/[[thresholdScan]] until
    * its next refresh upgrades it.
    */
  def hasNameBloom(spark: SparkSession, manifestDir: String): Boolean =
    MetaCache.cached(manifestDir, "hasNameBloom") {
      java.lang.Boolean.valueOf(
        read(spark, manifestDir).columns.contains("bloom_name"))
    }.booleanValue()

  /** Whether the manifest carries the r16 `k=v` tag bloom — memoized
    * like [[hasNameBloom]]. Scans themselves tolerate its absence
    * (tag pruning just contributes nothing); this is for callers that
    * want to know whether tag probes will actually prune (ScaleSmoke's
    * curve setup, operator tooling).
    */
  def hasTagBloom(spark: SparkSession, manifestDir: String): Boolean =
    MetaCache.cached(manifestDir, "hasTagBloom") {
      java.lang.Boolean.valueOf(
        read(spark, manifestDir).columns.contains("bloom_tags"))
    }.booleanValue()

  /** [[probeScan]] for a NAME selector (`from cpu.load`): files whose
    * [min_time, max_time] overlaps the range AND whose name bloom may
    * contain `series` AND (finite bounds only) whose value stats can
    * match. A name maps to every tag combination under it — the name
    * bloom is over file-distinct names, so pruning is exactly as sharp
    * as the by_id bloom on single-tagset fixtures and still correct
    * (a superset) when one name spans many series_ids. `tags` (r16)
    * composes `tag.k = 'v'` conjuncts via the tag bloom — `from cpu.load
    * where tag.host = 'a'` prunes inside the name's files instead of at
    * name granularity only. Residual filters run on what is read, like
    * every routed scan.
    */
  def nameScan(store: SeriesStore, manifestDir: String,
      startTs: Long, endTs: Long, series: String,
      minValue: Double = Double.NegativeInfinity,
      maxValue: Double = Double.PositiveInfinity,
      tags: Seq[Seq[(String, String)]] = Nil): SkipScan = {
    val hasV = !minValue.isNegInfinity || !maxValue.isPosInfinity
    val (survivors, total) = prune(store, manifestDir, startTs, endTs,
      idPos = None, namePos = Some(localPositions(series)),
      minValue, maxValue, tags)
    val residual = col("series") === series &&
      col("time") >= startTs && col("time") <= endTs &&
      (if (hasV) col("value") >= minValue && col("value") <= maxValue
      else lit(true)) &&
      tagResidual(tags)
    SkipScan(readFiles(store, survivors).filter(residual),
      survivors.length, total)
  }

  /** Rows with `minValue <= value <= maxValue` in `[startTs, endTs]`
    * across ALL series — the anomaly sweep ("every point above threshold
    * last week"). Time predicates prune by range overlap; the value
    * bounds prune on the per-file `max_value`/`min_value` stats, which
    * parquet row-group stats cannot do without opening every footer.
    * Same contract as [[probeScan]]: pruning is I/O-only, exact residual
    * filters run on what is read. (`maxValue` defaults to +∞ — the
    * pre-r13 single-threshold form.)
    */
  def thresholdScan(store: SeriesStore, manifestDir: String,
      startTs: Long, endTs: Long, minValue: Double,
      maxValue: Double = Double.PositiveInfinity,
      tags: Seq[Seq[(String, String)]] = Nil): SkipScan = {
    val (survivors, total) = prune(store, manifestDir, startTs, endTs,
      idPos = None, namePos = None, minValue, maxValue, tags)
    SkipScan(
      readFiles(store, survivors).filter(col("value") >= minValue &&
        col("value") <= maxValue &&
        col("time") >= startTs && col("time") <= endTs &&
        tagResidual(tags)),
      survivors.length, total)
  }
}
