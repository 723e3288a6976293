package graft.sydraql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-stage timings in microseconds, mirroring the reference's query stats
  * object (`/root/reference/src/sydra/query/exec.zig:48-58`,
  * `http.zig:335-395`).
  */
final case class QueryStats(
    parseUs: Long,
    validateUs: Long,
    compileUs: Long,
    traceId: String,
    // which execution route answered (r15 — EXPLAIN was the only
    // visibility): "raw", "served:cells:td", "served:cells:tdtag",
    // "served:hybrid:td", "served:hybrid:tdtag", "insert", "delete"
    route: String = "raw")

final case class QueryResult(df: DataFrame, stats: QueryStats)

/** sydraQL execution pipeline: parse → validate → compile → DataFrame
  * (`exec.execute`, `/root/reference/src/sydra/query/exec.zig:14-61`; the
  * plan/optimize/physical stages dissolve into Catalyst).
  */
object Engine {

  private val rng = new java.security.SecureRandom()
  private def traceId(): String = {
    val alphabet = "abcdefghijklmnopqrstuvwxyz234567"
    (0 until 13).map(_ => alphabet(rng.nextInt(32))).mkString
  }

  /** Execute sydraQL text against a series source DataFrame (columns:
    * series, series_id, tags, time, value).
    */
  def execute(
      spark: SparkSession,
      source: DataFrame,
      sydraql: String,
      options: CompileOptions = CompileOptions()): QueryResult = {
    val t0 = System.nanoTime()
    val ast = Parser.parse(sydraql)
    val t1 = System.nanoTime()
    Validator.validate(ast)
    val t2 = System.nanoTime()
    executeAst(spark, source, ast, options,
      parseUs = (t1 - t0) / 1000, validateUs = (t2 - t1) / 1000)
  }

  /** Compile an already-parsed+validated statement — the store route
    * parses once for serving-route resolution and must not pay parse +
    * validate a second time on the raw fallthrough (r15).
    */
  private def executeAst(
      spark: SparkSession,
      source: DataFrame,
      ast: Ast.Statement,
      options: CompileOptions,
      parseUs: Long,
      validateUs: Long): QueryResult = {
    val t2 = System.nanoTime()
    val df = new Compiler(spark, source, options).compile(ast)
    QueryResult(df, QueryStats(
      parseUs = parseUs,
      validateUs = validateUs,
      compileUs = (System.nanoTime() - t2) / 1000,
      traceId = traceId()))
  }

  /** Convenience: DataFrame only. */
  def sql(spark: SparkSession, source: DataFrame, sydraql: String,
      options: CompileOptions = CompileOptions()): DataFrame =
    execute(spark, source, sydraql, options).df

  /** Conservative time bounds from a WHERE's TOP-LEVEL conjuncts: only
    * bare `time <op> <int literal>` comparisons count (anything under
    * OR/NOT, function-wrapped, or non-literal is ignored — pruning must
    * be a SUPERSET of the true predicate, which the compiler re-applies
    * exactly on whatever is read). `>` widens to `>=` / `<` to `<=` for
    * the same reason.
    */
  private def timeBounds(where: Option[Ast.Expr]): (Option[Long], Option[Long]) = {
    def conj(e: Ast.Expr): Seq[Ast.Expr] = e match {
      case Ast.Binary(Ast.And, l, r) => conj(l) ++ conj(r)
      case x => Seq(x)
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tighten(op: Ast.BinOp, v: Long): Unit = op match {
      case Ast.Ge | Ast.Gt => lo = Some(lo.fold(v)(math.max(_, v)))
      case Ast.Le | Ast.Lt => hi = Some(hi.fold(v)(math.min(_, v)))
      case Ast.Eq => tighten(Ast.Ge, v); tighten(Ast.Le, v)
      case _ => ()
    }
    def flip(op: Ast.BinOp): Ast.BinOp = op match {
      case Ast.Ge => Ast.Le
      case Ast.Gt => Ast.Lt
      case Ast.Le => Ast.Ge
      case Ast.Lt => Ast.Gt
      case o => o
    }
    where.toSeq.flatMap(conj).foreach {
      case Ast.Binary(op, id: Ast.Ident, Ast.IntLit(v))
        if id.full.equalsIgnoreCase("time") => tighten(op, v)
      case Ast.Binary(op, Ast.IntLit(v), id: Ast.Ident)
        if id.full.equalsIgnoreCase("time") => tighten(flip(op), v)
      case _ => ()
    }
    (lo, hi)
  }

  /** Conservative VALUE bounds from the WHERE's top-level conjuncts —
    * the [[timeBounds]] contract (superset pruning, `>`/`<` widened)
    * applied to `value <op> <numeric literal>` comparisons, feeding the
    * manifest's min/max_value file-stat pruning.
    */
  private def valueBounds(where: Option[Ast.Expr]): (Option[Double], Option[Double]) = {
    def conj(e: Ast.Expr): Seq[Ast.Expr] = e match {
      case Ast.Binary(Ast.And, l, r) => conj(l) ++ conj(r)
      case x => Seq(x)
    }
    var lo: Option[Double] = None
    var hi: Option[Double] = None
    def tighten(op: Ast.BinOp, v: Double): Unit = op match {
      case Ast.Ge | Ast.Gt => lo = Some(lo.fold(v)(math.max(_, v)))
      case Ast.Le | Ast.Lt => hi = Some(hi.fold(v)(math.min(_, v)))
      case Ast.Eq => tighten(Ast.Ge, v); tighten(Ast.Le, v)
      case _ => ()
    }
    def flip(op: Ast.BinOp): Ast.BinOp = op match {
      case Ast.Ge => Ast.Le
      case Ast.Gt => Ast.Lt
      case Ast.Le => Ast.Ge
      case Ast.Lt => Ast.Gt
      case o => o
    }
    def num(e: Ast.Expr): Option[Double] = e match {
      case Ast.IntLit(v) => Some(v.toDouble)
      case Ast.FloatLit(v) => Some(v)
      case _ => None
    }
    where.toSeq.flatMap(conj).foreach {
      case Ast.Binary(op, id: Ast.Ident, r)
        if id.full.equalsIgnoreCase("value") && num(r).isDefined =>
        tighten(op, num(r).get)
      case Ast.Binary(op, l, id: Ast.Ident)
        if id.full.equalsIgnoreCase("value") && num(l).isDefined =>
        tighten(flip(op), num(l).get)
      case _ => ()
    }
    (lo, hi)
  }

  /** Tag-equality CNF groups from the WHERE's TOP-LEVEL conjuncts —
    * the [[timeBounds]] contract: each extracted group is a predicate
    * the true WHERE implies, so pruning on it stays a superset. A plain
    * `tag.<k> = '<literal>'` conjunct (r16) is a singleton group; a
    * conjunct that is an OR whose EVERY disjunct is a tag equality
    * (r17 — `tag.host = 'a' or tag.host = 'b'`, the dashboard
    * multi-select) is a group pruned as the UNION of its pair probes.
    * A mixed disjunct (`tag.host = 'a' or value > 5`) is NOT implied by
    * its tag terms alone and extracts nothing. Keys keep their written
    * case — the compiler's residual `try_element_at(tags, <key>)` is
    * case-sensitive the same way, so probe and match semantics agree.
    */
  private def tagEquals(where: Option[Ast.Expr]): Seq[Seq[(String, String)]] = {
    def conj(e: Ast.Expr): Seq[Ast.Expr] = e match {
      case Ast.Binary(Ast.And, l, r) => conj(l) ++ conj(r)
      case x => Seq(x)
    }
    def tagEq(e: Ast.Expr): Option[(String, String)] = e match {
      case Ast.Binary(Ast.Eq, id: Ast.Ident, Ast.StringLit(v))
        if id.parts.length == 2 && id.parts.head.equalsIgnoreCase("tag") =>
        Some((id.parts(1), v))
      case Ast.Binary(Ast.Eq, Ast.StringLit(v), id: Ast.Ident)
        if id.parts.length == 2 && id.parts.head.equalsIgnoreCase("tag") =>
        Some((id.parts(1), v))
      case _ => None
    }
    // a pure-OR-of-tag-equalities disjunct, or None if any leaf is not one
    def orGroup(e: Ast.Expr): Option[Seq[(String, String)]] = e match {
      case Ast.Binary(Ast.Or, l, r) =>
        for (a <- orGroup(l); b <- orGroup(r)) yield a ++ b
      case other => tagEq(other).map(Seq(_))
    }
    where.toSeq.flatMap(conj).flatMap(orGroup)
  }

  /** Route a SELECT's source through the store's data-skipping manifest
    * ([[graft.storage.SkipIndex.dirFor]]) when one exists: `by_id()`
    * probes prune on time overlap + the series bloom, name/all-series
    * scans with time bounds prune on overlap alone. Pruning changes what
    * is READ, never what is true — the compiler applies the query's full
    * WHERE to whatever comes back, so the routed source only has to be a
    * superset of the matching rows. No manifest, no selector, no bounds →
    * the plain source view, byte-identical behavior to pre-r12.
    */
  private def routedSource(store: graft.storage.SeriesStore,
      s: Ast.Select): DataFrame = {
    import graft.storage.SkipIndex
    val spark = store.spark
    val dir = SkipIndex.dirFor(store)
    lazy val srcCols = Seq("series", "series_id", "tags", "time", "value")
    if (!SkipIndex.exists(spark, dir)) return store.source()
    val (lo, hi) = timeBounds(s.where)
    val (vlo, vhi) = valueBounds(s.where)
    // tag-equality conjuncts (r16) compose with every non-by_id route
    // below via the manifest's k=v tag bloom (by_id's series bloom
    // already subsumes the series' tags — one series_id, one tagset)
    val tagEqs = tagEquals(s.where)
    s.from match {
      case Some(Ast.ById(id)) =>
        // r14: value-threshold conjuncts COMPOSE with the by_id probe —
        // the most selective shape ("this series above X last month")
        // prunes on time ∧ bloom ∧ min/max_value stats at once
        SkipIndex.probeScan(store, dir,
            lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue), id,
            vlo.getOrElse(Double.NegativeInfinity),
            vhi.getOrElse(Double.PositiveInfinity))
          .df.select(srcCols.map(org.apache.spark.sql.functions.col): _*)
      case Some(Ast.ByName(n)) if SkipIndex.hasNameBloom(spark, dir) =>
        // r15: name selectors prune on the manifest's NAME bloom like
        // by_id prunes on the id bloom (time ∧ bloom ∧ value stats) —
        // `from cpu.load` used to read every time-overlapping file
        SkipIndex.nameScan(store, dir,
            lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue), n,
            vlo.getOrElse(Double.NegativeInfinity),
            vhi.getOrElse(Double.PositiveInfinity), tagEqs)
          .df.select(srcCols.map(org.apache.spark.sql.functions.col): _*)
      case _ if vlo.nonEmpty || vhi.nonEmpty =>
        // value-stat pruning (r13): `where value >= X` sweeps skip every
        // file whose max_value stat says it cannot match — the anomaly
        // sweep that footer stats alone cannot serve without opening
        // every file; composes with the time overlap bounds
        SkipIndex.thresholdScan(store, dir,
            lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue),
            vlo.getOrElse(Double.NegativeInfinity),
            vhi.getOrElse(Double.PositiveInfinity), tagEqs)
          .df.select(srcCols.map(org.apache.spark.sql.functions.col): _*)
      case _ if lo.nonEmpty || hi.nonEmpty || tagEqs.nonEmpty =>
        // time overlap ∧ (r16) tag bloom; a tag-only WHERE still routes —
        // `where tag.host = 'a'` with no time bounds prunes to the
        // host's files instead of reading the store
        SkipIndex.rangeScan(store, dir,
            lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue), tagEqs)
          .df.select(srcCols.map(org.apache.spark.sql.functions.col): _*)
      case _ => store.source()
    }
  }

  /** Rollup-routing rule (r12): serve a sydraQL sketch aggregate from the
    * store's at-rest t-digest cell store ([[graft.storage.SketchCells]])
    * instead of the raw scan, when the query's shape provably coarsens
    * the (series, day) cell keys:
    *  - every projection is `percentile_approx(value, <lit>) as <alias>`,
    *    `ndv(tag.<k>) as <alias>` for a tag key whose theta NDV cells
    *    the store carries (SketchCells `ndvTags`), or — r14 — a basic
    *    aggregate `avg/sum/min/max/count(value)` / `count()`, served
    *    EXACTLY from the cells' mergeable partials — mixed projections
    *    share one merge aggregate;
    *  - GROUP BY is any subset of {day-multiple `time_bucket`,
    *    `tag.<k>` with a tag-keyed tier} — at most one of each; they
    *    COMPOSE ("p95 per host per 2 days", r13). Tag tiers carry the
    *    store's theta NDV cells since r14, so `ndv(tag.j) GROUP BY
    *    tag.k` serves too (a pre-r14 tag tier without them falls
    *    through); ORDER BY at most the group keys, ascending or
    *    descending (r14); LIMIT/OFFSET serve only under a TOTAL order
    *    (no group keys, or ORDER BY covering every group key — applied
    *    to the served frame in the compiler's offset-then-limit order;
    *    a partial order's tie-breaking belongs to the raw route);
    *    FILL serves too (r14 — post-aggregation on the served buckets,
    *    the compiler's exact placement; a const fill whose expression
    *    isn't a plain literal falls through);
    *  - WHERE is exactly `time >= LO and time < HI` with literal bounds,
    *    plus (r16) at most one `tag.<k> = '<literal>'` equality served by
    *    filtering the tag tier's (series, day, tag value) cells to that
    *    value ("p95 for host X last week" — the raw route's null→false
    *    semantics for rows lacking the key hold, since those rows cell
    *    under a NULL tagval); a filter key differing from a tag group
    *    key, or a key without a tag tier, falls through.
    *    Day-aligned bounds read cells alone; RAGGED bounds (r14) serve
    *    HYBRID — interior whole days from cells, the sub-day edges from
    *    an hour-partition-pruned raw scan aggregated into the SAME
    *    mergeable partial shapes (digest/theta/sum/min/max/counts/struct
    *    extremes) and unioned before the one merge aggregate, so a 90-day
    *    dashboard window starting mid-afternoon reads ~89 cell rows plus
    *    at most 48 raw HOURS instead of 90 raw days. A window with no
    *    whole interior day falls through to raw (the hybrid would be all
    *    edge);
    *  - the selector is `by_id()`, a series name (the cell store keys),
    *    or ABSENT (r14): cells merge across series, so the fleet-wide
    *    dashboard shape serves from the same day-pruned blobs.
    * The served plan reads ONLY the probed days' cell partitions
    * (PlanSpec pins the PartitionFilters) and merges KB blobs — never
    * the raw points (edge hours excepted, pinned too). Estimates come
    * from merged day digests rather than one whole-window digest: both
    * satisfy the same t-digest error contract, which is what the sketch
    * gates pin (the same reason the at-rest tier q_ts_tdigest is
    * correct); edge digests/thetas are built by the raw route's own
    * aggregators, so the hybrid never mixes estimator families.
    */
  private def sketchServed(store: graft.storage.SeriesStore,
      s: Ast.Select): Option[(DataFrame, String)] = {
    import graft.storage.SketchCells
    import org.apache.spark.sql.functions.{col, lit}
    val spark = store.spark
    val dir = SketchCells.dirFor(store)
    // FILL serves too (r14): it applies POST-aggregation to the bucketed
    // frame, and the served frame has exactly the raw route's buckets
    // (cells coarsen losslessly), so the same Fill operator on the
    // served output is the same result. A const fill whose expression
    // isn't a plain literal falls through (evaluating it needs the
    // compiler's scalar context).
    s.fill match {
      case None | Some(Ast.FillNull) | Some(Ast.FillPrevious)
        | Some(Ast.FillLinear) | Some(Ast.FillConst(Ast.IntLit(_)))
        | Some(Ast.FillConst(Ast.FloatLit(_))) => ()
      case _ => return None
    }
    if (!SketchCells.exists(spark, dir)) return None
    // group keys: none (one global row), exactly
    // `time_bucket(<day-multiple literal>, time)` — a step the day cells
    // coarsen into exactly (every day maps wholly into one step bucket) —
    // or exactly `tag.<k>` for a key with a tag-keyed cell tier
    // ([[graft.storage.SketchCells.tagDir]], r13): its cells are keyed
    // (series, day, tag value), so a tag-grouped quantile is a day-pruned
    // per-value blob merge
    sealed trait GK { def e: Ast.Expr }
    case class BucketG(step: Long, origin: Long, e: Ast.Expr) extends GK
    case class TagG(key: String, e: Ast.Expr) extends GK
    // up to TWO keys compose (r13): one day-multiple bucket and one tag
    // key together coarsen the tag tier's (series, day, value) cells —
    // the "p95 per host per day" dashboard shape. The 3-arg form with a
    // DAY-ALIGNED literal origin serves too (r14 — "weeks starting
    // Monday"): bucket boundaries then sit on day boundaries, so every
    // day still maps wholly into one bucket; any other origin → raw.
    val groupKeys: Seq[GK] = {
      val parsed = s.groupBy.map {
        case c @ Ast.Call("time_bucket", Seq(Ast.IntLit(st), t: Ast.Ident))
          if t.full.equalsIgnoreCase("time") && st > 0 && st % 86400L == 0 =>
          Some(BucketG(st, 0L, c))
        case c @ Ast.Call("time_bucket", Seq(Ast.IntLit(st), t: Ast.Ident, Ast.IntLit(og)))
          if t.full.equalsIgnoreCase("time") && st > 0 &&
            st % 86400L == 0 && og % 86400L == 0 =>
          Some(BucketG(st, og, c))
        case id: Ast.Ident
          if id.parts.length == 2 && id.parts.head.equalsIgnoreCase("tag") =>
          Some(TagG(id.parts(1), id))
        case _ => None
      }
      if (parsed.exists(_.isEmpty)) return None
      val ks = parsed.flatten
      if (ks.count(_.isInstanceOf[BucketG]) > 1 ||
        ks.count(_.isInstanceOf[TagG]) > 1) return None
      ks
    }
    // WHERE must be exactly one `time >= LO` and one `time < HI` conjunct
    // with literal bounds — in EITHER order (r14; dashboards emit both) —
    // plus (r16) at most ONE `tag.<k> = '<literal>'` equality: the tag
    // tier's cells are keyed (series, day, tag value), so "p95 for host X
    // last week" serves by FILTERING that tier's cells to the one value
    // (the most common dashboard selector after name + time; raw rows
    // where the key is absent have NULL tagval cells and drop under the
    // same equality, matching the raw route's null→false semantics). Any
    // other conjunct means the cells can't answer → raw route.
    var tagEq: Option[(String, String)] = None
    val bounds: Option[(Long, Long)] = {
      def conj(e: Ast.Expr): Seq[Ast.Expr] = e match {
        case Ast.Binary(Ast.And, l, r) => conj(l) ++ conj(r)
        case x => Seq(x)
      }
      var lo: Option[Long] = None
      var hi: Option[Long] = None
      var ok = true
      s.where.toSeq.flatMap(conj).foreach {
        case Ast.Binary(Ast.Ge, t: Ast.Ident, Ast.IntLit(l))
          if t.full.equalsIgnoreCase("time") && lo.isEmpty => lo = Some(l)
        case Ast.Binary(Ast.Lt, t: Ast.Ident, Ast.IntLit(h))
          if t.full.equalsIgnoreCase("time") && hi.isEmpty => hi = Some(h)
        case Ast.Binary(Ast.Eq, id: Ast.Ident, Ast.StringLit(v))
          if id.parts.length == 2 && id.parts.head.equalsIgnoreCase("tag") &&
            tagEq.isEmpty => tagEq = Some((id.parts(1), v))
        case Ast.Binary(Ast.Eq, Ast.StringLit(v), id: Ast.Ident)
          if id.parts.length == 2 && id.parts.head.equalsIgnoreCase("tag") &&
            tagEq.isEmpty => tagEq = Some((id.parts(1), v))
        case _ => ok = false
      }
      (lo, hi) match {
        case (Some(l), Some(h)) if ok && l < h => Some((l, h))
        case _ => None
      }
    }
    if (bounds.isEmpty) return None
    // every projection is either THE bucket key (aliased), an aliased
    // percentile_approx(value, <literal>), an aliased ndv(tag.<k>) whose
    // theta cells the store carries, or — since r14 — an aliased basic
    // aggregate over value (`avg sum min max count(value) count()`),
    // served EXACTLY from the cells' mergeable partials (sum_v/min_v/
    // max_v/n_vals beside n_rows: min of day-mins IS the window min,
    // counts add, avg = merged sum / merged non-null count — the
    // reference's own RollupHint shape, plan.zig:19-21, finally serving
    // the aggregates dashboards ask most). Anything else → raw route.
    sealed trait P
    case class Grp(alias: String, k: GK) extends P
    case class Quant(alias: String, p: Double) extends P
    case class Ndv(alias: String, key: String) extends P
    case class Bas(alias: String, kind: String) extends P
    val projs: Seq[Option[P]] = s.projections.map {
      case Ast.Projection(c, Some(alias)) if groupKeys.exists(_.e == c) =>
        Some(Grp(alias, groupKeys.find(_.e == c).get))
      case Ast.Projection(
          Ast.Call("percentile_approx", Seq(v: Ast.Ident, p)), Some(alias))
        if v.full.equalsIgnoreCase("value") =>
        p match {
          case Ast.FloatLit(f) if f >= 0 && f <= 1 => Some(Quant(alias, f))
          case Ast.IntLit(i) if i >= 0 && i <= 1 => Some(Quant(alias, i.toDouble))
          case _ => None
        }
      case Ast.Projection(Ast.Call("ndv", Seq(id: Ast.Ident)), Some(alias))
        if id.parts.length == 2 && id.parts.head.equalsIgnoreCase("tag") =>
        Some(Ndv(alias, id.parts(1)))
      case Ast.Projection(Ast.Call(fn, Seq(v: Ast.Ident)), Some(alias))
        if Seq("avg", "sum", "min", "max", "first", "last",
          "delta", "rate").contains(fn) && v.full.equalsIgnoreCase("value") =>
        Some(Bas(alias, fn))
      case Ast.Projection(Ast.Call("count", Seq()), Some(alias)) =>
        Some(Bas(alias, "count_rows"))
      case Ast.Projection(Ast.Call("count", Seq(v: Ast.Ident)), Some(alias))
        if v.full.equalsIgnoreCase("value") =>
        Some(Bas(alias, "count_vals"))
      case _ => None
    }
    if (projs.exists(_.isEmpty) ||
      !projs.flatten.exists(p => !p.isInstanceOf[Grp]))
      return None
    val ps = projs.flatten
    // a valid query may project the SAME group key under two aliases
    // ("tag.host as h1, tag.host as h2"); grpAliases keeps one per key,
    // so serving would throw on the other — fall through to the raw
    // route, which handles it fine
    val grpProjKeys = ps.collect { case Grp(_, k) => k }
    if (grpProjKeys.distinct.length != grpProjKeys.length) return None
    // every requested NDV key must have its theta cells in the SERVING
    // table — checked on the base read's schema below (the td table
    // carries `ndvTags` theta cells; since r14 tag tiers carry the same
    // set, so "distinct users per host" serves too; a pre-r14 tag tier
    // without them falls through)
    val ndvKeys = ps.collect { case Ndv(_, k) => k }.distinct
    // every group key must be projected under an alias (the serving
    // frame's column names come from them)
    val grpAliases: Map[GK, String] = ps.collect { case Grp(a, k) => k -> a }.toMap
    if (groupKeys.exists(k => !grpAliases.contains(k))) return None
    val tagKeyOpt = groupKeys.collectFirst { case TagG(k, _) => k }
    // the tier that can serve: a tag GROUP key and a tag FILTER key must
    // be the SAME key (one tagval dimension per tier) — different keys →
    // raw route; either alone picks the tag tier
    if (tagEq.exists(te => tagKeyOpt.exists(_ != te._1))) return None
    val tierTagKey = tagKeyOpt.orElse(tagEq.map(_._1))
    if (tierTagKey.exists(k => !SketchCells.groupTagsOf(spark, dir).contains(k)))
      return None
    // ORDER BY: none, or keys (ascending OR descending — sorting the
    // SERVED frame either way is trivially the raw route's sort) each
    // naming a DISTINCT group key by expression or alias — anything
    // else → raw route
    val orderCols: Option[Seq[(String, Boolean)]] = {
      val resolved = s.orderBy.map {
        case Ast.SortKey(e, asc) =>
          groupKeys.find(_.e == e).map(grpAliases)
            .orElse(e match {
              case id: Ast.Ident =>
                grpAliases.values.find(a => id.full.equalsIgnoreCase(a))
              case _ => None
            }).map(a => (a, asc))
      }
      if (resolved.exists(_.isEmpty) ||
        resolved.flatten.map(_._1).distinct.length != resolved.length) None
      else Some(resolved.flatten)
    }
    if (orderCols.isEmpty) return None
    // LIMIT/OFFSET (r14 fix — they were silently DROPPED on served
    // shapes): applying them to the served frame equals the raw route
    // only when the result order is TOTAL — one row (no group keys) or
    // an ORDER BY covering every group key (result rows are unique per
    // key combination). A partial order leaves tie-breaking to the
    // engine, so which rows a LIMIT keeps is plan-dependent — fall
    // through and let the raw route own that semantics.
    if (s.limit.isDefined || s.offset.isDefined) {
      val totalOrder = groupKeys.isEmpty ||
        orderCols.exists(_.length == groupKeys.length)
      if (!totalOrder) return None
    }
    val (l, h) = bounds.get
    // hybrid window split (r14): whole days [dLo, dHi) come from cells;
    // the ragged sub-day edges [l, dLo) and [dHi, h) come from an
    // hour-pruned raw scan, aggregated into the same partial shapes and
    // unioned before the merge. No whole interior day → all edge → raw
    // route (nothing for the cells to save).
    val dLo = if (Math.floorMod(l, 86400L) == 0L) l
      else l - Math.floorMod(l, 86400L) + 86400L
    val dHi = h - Math.floorMod(h, 86400L)
    if (dLo >= dHi) return None
    // r17 crossover: the hybrid replaces the interior's raw scan with a
    // cells merge but still scans the edges raw AND pays the
    // union-of-partials machinery (~one small-window scan of overhead —
    // SCALE.md's honest serve table). When the edges are at least as
    // wide as the interior, the hybrid scans more than half the window
    // raw anyway and the tier cannot beat the raw route it wraps
    // (measured 1.02–1.2× AT BEST for edge-heavy sf0.1 windows) — fall
    // through. Only a 1-interior-day window can trip this (each edge is
    // < 24 h, so edges < 48 h ≤ interior at 2+ days); every multi-day
    // dashboard window keeps the hybrid.
    if ((dLo - l) + (h - dHi) >= dHi - dLo) return None
    // selector: by_id / name filter cells AND edge rows identically; an
    // absent selector (r14) is the fleet-wide shape — cells merge across
    // series, so no filter at all
    val sel: Option[org.apache.spark.sql.Column] = s.from.map {
      case Ast.ById(id) => col("series_id") === id
      case Ast.ByName(n) => col("series") === n
    }
    def selFiltered(df: DataFrame): DataFrame = sel.fold(df)(df.filter)
    // any tag grouping OR tag-equality filter reads the tag tier
    // (per-(series, day, value) digests); otherwise the td table (which
    // also carries theta cells). The equality filter applies on the
    // tier's tagval key — day-pruned KB cells of ONE tag value.
    val base = tagEq.foldLeft(
      selFiltered(tierTagKey match {
        case Some(k) => SketchCells.readTag(spark, dir, k)
        case None => SketchCells.read(spark, dir)
      }).filter(col("day") >= dLo && col("day") < dHi)) {
      case (df, (_, v)) => df.filter(col("tagval") === v)
    }
    // basic aggregates need the r14 mergeable-partial columns and NDV
    // projections need their theta cells IN THIS TABLE; a store predating
    // either lacks them — fall through to the raw route (correct, just
    // unserved) until it is rebuilt. The schema is already open (the
    // read above), so these checks cost no extra metadata round-trip.
    val basics = ps.collect { case Bas(_, k) => k }.toSet
    val needCols = basics.flatMap {
      case "avg" => Seq("sum_v", "n_vals")
      case "sum" => Seq("sum_v")
      case "min" => Seq("min_v")
      case "max" => Seq("max_v")
      case "count_rows" => Seq("n_rows")
      case "count_vals" => Seq("n_vals")
      case "first" => Seq("fl_first")
      case "last" => Seq("fl_last")
      case _ => Seq("nn_first", "nn_last", "n_vals") // delta / rate
    }
    if (!needCols.forall(base.columns.contains)) return None
    if (!ndvKeys.forall(j => base.columns.contains(s"theta_$j"))) return None
    // one merge aggregate carries every served blob and partial: the
    // t-digest (when any quantile is projected), one THETA union per
    // requested tag key — the raw route's estimator family at the raw
    // route's lgK, so tier presence changes which blobs merge, never
    // which estimator answers (cast to double — the raw ndv route's
    // type, so routing never changes the result schema either) — and the
    // basic partials actually requested (sum of day sums, min of day
    // mins, max of day maxes, row/non-null counts add)
    val needSum = basics.contains("avg") || basics.contains("sum")
    val needRate = basics.contains("delta") || basics.contains("rate")
    val needNv = basics.contains("avg") || basics.contains("count_vals") || needRate
    val aggs =
      (if (ps.exists(_.isInstanceOf[Quant]))
        Seq(graft.functions.TDigest.mergeAgg(col("td")).as("__td"))
      else Seq.empty) ++
        ndvKeys.map(k => graft.functions.ThetaSketch.estimate(
          graft.functions.ThetaSketch.unionAgg(col(s"theta_$k")))
          .cast("double").as(s"__ndv_$k")) ++
        (if (needSum) Seq(org.apache.spark.sql.functions.sum(col("sum_v")).as("__sum")) else Seq.empty) ++
        (if (basics.contains("min")) Seq(org.apache.spark.sql.functions.min(col("min_v")).as("__min")) else Seq.empty) ++
        (if (basics.contains("max")) Seq(org.apache.spark.sql.functions.max(col("max_v")).as("__max")) else Seq.empty) ++
        (if (basics.contains("count_rows")) Seq(org.apache.spark.sql.functions.sum(col("n_rows")).as("__nr")) else Seq.empty) ++
        (if (needNv) Seq(org.apache.spark.sql.functions.sum(col("n_vals")).as("__nv")) else Seq.empty) ++
        // first/last: struct min/max of the day partials — the earliest
        // day's earliest (time, value) IS the window's
        (if (basics.contains("first")) Seq(org.apache.spark.sql.functions.min(col("fl_first")).as("__ff")) else Seq.empty) ++
        (if (basics.contains("last")) Seq(org.apache.spark.sql.functions.max(col("fl_last")).as("__fl")) else Seq.empty) ++
        // delta/rate read the null-skipping extremes (orderedExtremes
        // parity); subtractions of exact point values — bit-exact vs raw
        (if (needRate) Seq(
          org.apache.spark.sql.functions.min(col("nn_first")).as("__nnf"),
          org.apache.spark.sql.functions.max(col("nn_last")).as("__nnl")) else Seq.empty)
    // group columns in declaration order: the bucket key is the same
    // floor expression the compiler emits for time_bucket, over the
    // cell's day — exact because step is a day multiple; the tag key is
    // the tier's tagval (per-(series, day, value) digests merge within
    // each group cell — the raw route's grouping, served from day-pruned
    // KB blobs)
    val groupCols = groupKeys.map {
      case k @ BucketG(st, og, _) =>
        // same floor arithmetic the compiler emits per arity, over the
        // cell's day — exact because step AND origin are day-aligned
        (if (og == 0L) graft.core.Functions.timeBucket(lit(st), col("day"))
        else graft.core.Functions.timeBucket(lit(st), col("day"), lit(og)))
          .as(grpAliases(k))
      case k @ TagG(_, _) => col("tagval").as(grpAliases(k))
    }
    // the columns the merge aggregate actually reads — both tiers of the
    // hybrid project exactly these, so the union stays KB-sized
    val aggInputCols: Seq[String] =
      (if (ps.exists(_.isInstanceOf[Quant])) Seq("td") else Seq.empty) ++
        ndvKeys.map(k => s"theta_$k") ++ needCols.toSeq.sorted
    val readCols = Seq("day") ++ tagKeyOpt.map(_ => "tagval").toSeq ++ aggInputCols
    // ragged-edge partials (r14, single-aggregate since r16): the raw
    // rows of each sub-day edge union FIRST and aggregate in ONE
    // partial-building groupBy into the SAME partial shapes the cells
    // carry — built by the raw route's own aggregators (TDigest.agg /
    // ThetaSketch.agg / sum / min / max / counts / struct extremes), so
    // merging them with cell blobs never mixes estimator families. The
    // leading edge lies wholly in day dLo−86400 and the trailing edge
    // in day dHi, so one day-keyed groupBy yields exactly the per-edge
    // rows the r14 two-subtree plan produced — minus one aggregation
    // subtree + exchange per query (the serve-latency floor the hybrid
    // pays over the cells-only path). One partial row per
    // (day [, tag value]) per edge — KB.
    def edgeRows(elo: Long, ehi: Long): DataFrame = {
      // time is integer seconds and bounds are inclusive, so [elo, ehi)
      // is the inclusive range [elo, ehi - 1]. Route through the skip
      // manifest when one exists: scanRange's spark.read.parquet(segDir)
      // must LIST the whole segments table before pruning — at 100 TB
      // (or ScaleSmoke's 3,400 hour dirs: measured 16 s vs 2 s) that
      // per-query listing dwarfs the ≤24-hour edge read the hybrid is
      // supposed to be, while the manifest hands back the edge hours'
      // explicit file list for one metadata read. Pruning is a superset
      // either way — the exact [elo, ehi) filter is applied below.
      val skipDir = graft.storage.SkipIndex.dirFor(store)
      val scan0 =
        if (graft.storage.SkipIndex.exists(spark, skipDir))
          graft.storage.SkipIndex.rangeScan(store, skipDir, elo, ehi - 1,
            tagEq.toSeq.map(Seq(_))).df
        else store.scanRange(elo, ehi - 1)
      tagEq.foldLeft(
        selFiltered(scan0).filter(col("time") >= elo && col("time") < ehi)) {
        case (df, (k, v)) => df.filter(
          org.apache.spark.sql.functions.try_element_at(
            col("tags"), lit(k)) === v)
      }
    }
    def edgePartials(raw: DataFrame): DataFrame = {
      import org.apache.spark.sql.functions.{count, max, min, pmod, struct, sum, when}
      val eAggs: Seq[org.apache.spark.sql.Column] =
        (if (ps.exists(_.isInstanceOf[Quant]))
          Seq(graft.functions.TDigest.agg(col("value")).as("td"))
        else Seq.empty) ++
          ndvKeys.map(k => graft.functions.ThetaSketch.agg(
            org.apache.spark.sql.functions.try_element_at(
              col("tags"), lit(k)).cast("string")).as(s"theta_$k")) ++
          needCols.toSeq.sorted.map {
            case "sum_v" => sum(col("value")).as("sum_v")
            case "min_v" => min(col("value")).as("min_v")
            case "max_v" => max(col("value")).as("max_v")
            case "n_rows" => count(lit(1)).as("n_rows")
            case "n_vals" => count(col("value")).as("n_vals")
            case "fl_first" =>
              min(struct(col("time").as("t"), col("value").as("v"))).as("fl_first")
            case "fl_last" =>
              max(struct(col("time").as("t"), col("value").as("v"))).as("fl_last")
            case "nn_first" => min(when(col("value").isNotNull,
              struct(col("time").as("t"), col("value").as("v")))).as("nn_first")
            case "nn_last" => max(when(col("value").isNotNull,
              struct(col("time").as("t"), col("value").as("v")))).as("nn_last")
          }
      val gcols = Seq((col("time") - pmod(col("time"), lit(86400L))).as("day")) ++
        tagKeyOpt.map(k => org.apache.spark.sql.functions.try_element_at(
          col("tags"), lit(k)).as("tagval")).toSeq
      raw.groupBy(gcols: _*).agg(eAggs.head, eAggs.tail: _*)
        .select(readCols.map(col): _*)
    }
    val edges = Seq((l, dLo), (dHi, h)).filter { case (a, b) => a < b }
    val unioned =
      if (edges.isEmpty) base.select(readCols.map(col): _*)
      else base.select(readCols.map(col): _*).unionByName(edgePartials(
        edges.map { case (a, b) => edgeRows(a, b) }.reduce(_ unionByName _)))
    val merged =
      if (groupCols.isEmpty) unioned.agg(aggs.head, aggs.tail: _*)
      else unioned.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
    val out = merged.select(ps.map {
      case Grp(a, _) => col(a)
      case Quant(a, p) => graft.functions.TDigest.quantileOf(col("__td"), p).as(a)
      case Ndv(a, k) => col(s"__ndv_$k").as(a)
      // avg = merged sum / merged non-null count — the raw route's exact
      // value up to double fold order (the gates' rounding discipline);
      // the others merge losslessly
      case Bas(a, "avg") => (col("__sum") / col("__nv")).as(a)
      case Bas(a, "sum") => col("__sum").as(a)
      case Bas(a, "min") => col("__min").as(a)
      case Bas(a, "max") => col("__max").as(a)
      case Bas(a, "count_rows") => col("__nr").as(a)
      case Bas(a, "first") => col("__ff").getField("v").as(a)
      case Bas(a, "last") => col("__fl").getField("v").as(a)
      case Bas(a, "delta") =>
        org.apache.spark.sql.functions.when(col("__nv") >= 1,
          col("__nnl").getField("v") - col("__nnf").getField("v")).as(a)
      case Bas(a, "rate") => {
        val dt = col("__nnl").getField("t") - col("__nnf").getField("t")
        org.apache.spark.sql.functions.when(col("__nv") >= 2 && dt > 0,
          (col("__nnl").getField("v") - col("__nnf").getField("v")) /
            dt.cast("double")).as(a)
      }
      case Bas(a, _) => col("__nv").as(a) // count_vals
    }: _*)
    // fill between the projection and the sort — the compiler's exact
    // placement (grouped → fill → project → order → offset → limit);
    // the served frame's columns ARE the output names, like `grouped`'s
    val filledOut = s.fill match {
      case None => out
      case Some(policy) =>
        val bkOpt = groupKeys.collectFirst {
          case k @ BucketG(st, _, _) => (grpAliases(k), st) }
        // validator guarantees a bucketed group for fill; defensive
        if (bkOpt.isEmpty) return None
        val (bkName, st) = bkOpt.get
        val fkeys = groupKeys.collect { case k: TagG => grpAliases(k) }
        val vcols = ps.collect {
          case Quant(a, _) => a
          case Ndv(a, _) => a
          case Bas(a, _) => a
        }
        policy match {
          case Ast.FillConst(Ast.IntLit(v)) =>
            graft.operators.Fill.applyConst(out, bkName, fkeys, st,
              org.apache.spark.sql.functions.lit(v), vcols)
          case Ast.FillConst(Ast.FloatLit(v)) =>
            graft.operators.Fill.applyConst(out, bkName, fkeys, st,
              org.apache.spark.sql.functions.lit(v), vcols)
          case p => graft.operators.Fill(out, bkName, fkeys, st, p, vcols)
        }
    }
    val sorted = if (s.orderBy.nonEmpty)
      filledOut.orderBy(orderCols.get.map { case (a, asc) =>
        if (asc) col(a).asc else col(a).desc }: _*)
    else filledOut
    // same application order as the compiler (offset skips, then limit
    // takes) — reached only under a total order (the guard above)
    val withOffset = s.offset.map(o => sorted.offset(o.toInt)).getOrElse(sorted)
    val served = s.limit.map(n => withOffset.limit(n.toInt)).getOrElse(withOffset)
    // route attribution (r15): which tier answered and whether ragged
    // edges forced the hybrid union — surfaced in QueryStats so the
    // stats object (not just EXPLAIN) shows a raw-path fallthrough
    val route = "served:" + (if (edges.nonEmpty) "hybrid" else "cells") +
      ":" + (if (tierTagKey.isDefined) "tdtag" else "td")
    Some((served, route))
  }

  /** Execute against a [[graft.storage.SeriesStore]]: SELECT/EXPLAIN read
    * the store's source view — routed through the store's data-skipping
    * manifest when one exists ([[routedSource]]), and sketch aggregates
    * served from the at-rest cell store when the shape coarsens its keys
    * ([[sketchServed]]) — INSERT appends; DELETE rewrites affected hour
    * partitions. The reference parses+validates INSERT/DELETE but never
    * plans them (`plan.zig:99-104`) — here they run.
    */
  def executeOnStore(
      store: graft.storage.SeriesStore,
      sydraql: String,
      options: CompileOptions = CompileOptions()): QueryResult =
    // one MetaCache marker read per dir for this whole query's routing
    // (r16): resolution touches several metadata memos per tier dir, and
    // each was paying its own marker freshness read — at dashboard QPS
    // against an object store that is the overhead the memo removes
    graft.storage.MetaCache.scoped {
      executeOnStoreImpl(store, sydraql, options)
    }

  private def executeOnStoreImpl(
      store: graft.storage.SeriesStore,
      sydraql: String,
      options: CompileOptions): QueryResult = {
    import graft.storage.Maintenance
    import org.apache.spark.sql.functions._
    val spark = store.spark
    val t0 = System.nanoTime()
    val ast = Parser.parse(sydraql)
    val t1 = System.nanoTime()
    Validator.validate(ast)
    val t2 = System.nanoTime()
    // real stage timings on every arm (r15 — served/INSERT/DELETE used
    // to report zeros): parse/validate measured above; compileUs is
    // everything from validation to the built plan (serving-route
    // resolution, predicate/row compilation) — called BEFORE the arm's
    // side effect runs, so execution time never pollutes it
    def statsOf(route: String): QueryStats = QueryStats(
      parseUs = (t1 - t0) / 1000,
      validateUs = (t2 - t1) / 1000,
      compileUs = (System.nanoTime() - t2) / 1000,
      traceId = traceId(),
      route = route)
    ast match {
      case _: Ast.Select | _: Ast.Explain =>
        val sel = ast match {
          case s: Ast.Select => Some(s)
          case Ast.Explain(s: Ast.Select) => Some(s)
          case _ => None
        }
        sel.flatMap(sketchServed(store, _)) match {
          case Some((df, route)) if ast.isInstanceOf[Ast.Select] =>
            QueryResult(df, statsOf(route))
          case Some((df, route)) => // EXPLAIN of a served query shows the SERVED plan
            import spark.implicits._
            QueryResult(
              Seq(df.queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
                .toDF("plan"),
              statsOf(route))
          case _ =>
            // raw route: reuse the parse/validate this method already
            // did (and their measured times) — compile only
            executeAst(spark,
              sel.map(routedSource(store, _)).getOrElse(store.source()),
              ast, options, (t1 - t0) / 1000, (t2 - t1) / 1000)
        }
      case Ast.Insert(series, cols, rows) =>
        val compiler = new Compiler(spark, store.source(), options)
        val colNames = if (cols.isEmpty) Seq("time", "value") else cols.map(_.toLowerCase)
        if (!colNames.contains("time") || !colNames.contains("value"))
          throw QueryError(QueryError.InvalidSyntax, "insert columns must include time and value")
        val rowDfs = rows.map { vals =>
          if (vals.length != colNames.length)
            throw QueryError(QueryError.InvalidFunctionArity,
              s"insert row has ${vals.length} values for ${colNames.length} columns")
          val exprs = colNames.zip(vals).map { case (n, e) => compiler.scalar(e).as(n) }
          val tagCols = colNames.filterNot(Seq("time", "value").contains)
          spark.range(1).select(exprs: _*).select(
            lit(series).as("series"),
            (if (tagCols.isEmpty) map().cast("map<string,string>")
             else map(tagCols.flatMap(t => Seq(lit(t), col(t).cast("string"))): _*)).as("tags"),
            col("time").cast("long").as("time"),
            col("value").cast("double").as("value"))
        }
        val pts = rowDfs.reduce(_ union _)
        val st = statsOf("insert") // plan built; the append is execution
        store.append(pts)
        import spark.implicits._
        QueryResult(Seq(rows.length.toLong).toDF("inserted"), st)
      case Ast.Delete(sel, where) =>
        val compiler = new Compiler(spark, store.source(), options)
        val selPred = sel match {
          case Ast.ById(id) => col("series_id") === id
          case Ast.ByName(n) => col("series") === n
        }
        val pred = where.map(w => selPred && compiler.scalar(w)).getOrElse(selPred)
        // same conservative WHERE time bounds the SELECT route extracts:
        // the matched-row count and the delete's affected-partition
        // discovery both prune through the skip manifest when one exists
        // (deleteRowsBounded routes internally; the tier refresh after the
        // rewrite keeps manifest + sketch cells consistent)
        val (lo, hi) = timeBounds(where)
        val sid = sel match {
          case Ast.ById(id) => Some(id)
          case _ => None
        }
        // one pruned pass does everything: deleteRowsBounded's discovery
        // routes through the skip manifest (time overlap + by_id bloom)
        // and its per-partition rewrite tallies the removed rows — no
        // separate matched-row count scan
        val st = statsOf("delete") // predicate compiled; the rewrite is execution
        val report = Maintenance.deleteRowsBounded(store, pred, lo, hi, sid)
        import spark.implicits._
        QueryResult(Seq(report.deletedRows).toDF("deleted"), st)
    }
  }
}
