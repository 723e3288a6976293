package graft.sydraql

import Ast._
import graft.core.{Functions => F}
import graft.operators.Fill
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compilation options.
  * @param now epoch-seconds value for `now()` — pinned per query for
  *            determinism (`exec` evaluates it once in the reference model).
  */
final case class CompileOptions(now: Long = System.currentTimeMillis() / 1000L)

/** AST → DataFrame compiler. This replaces the reference's logical/physical
  * planner + Volcano pipeline wholesale (SURVEY.md §3-4): the SELECT clauses
  * become declarative DataFrame transforms and Catalyst supplies every
  * rewrite the reference hand-rolls (predicate pushdown, project collapse,
  * time-bound extraction → parquet row-group/partition pruning, top-K
  * fusion) plus the ones it lacks (constant folding, codegen, partial aggs).
  *
  * The source DataFrame is the canonical series scan: columns
  * `series STRING, series_id LONG, tags MAP<STRING,STRING>, time LONG,
  * value DOUBLE` (FIXTURES.md §2).
  *
  * Numeric semantics ported from the executed reference
  * (`/root/reference/src/sydra/query/expression.zig:95-156`):
  * all-float `+ - * /`, integer-only `%`, float `abs`, `time_bucket` floor
  * arithmetic. Division by zero raises an error under Spark's default ANSI
  * mode — exact parity with the reference's DivisionByZero
  * (`expression.zig:119-123`).
  */
final class Compiler(spark: SparkSession, source: DataFrame, options: CompileOptions = CompileOptions()) {

  def compile(stmt: Statement): DataFrame = stmt match {
    case s: Select => compileSelect(s)
    case Explain(inner) => {
      import spark.implicits._
      val plan = compile(inner) match {
        case df => df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      }
      Seq(plan).toDF("plan")
    }
    case _: Insert =>
      throw QueryError(QueryError.Unimplemented,
        "INSERT executes through graft.storage.Ingest (Engine routes it)")
    case _: Delete =>
      throw QueryError(QueryError.Unimplemented,
        "DELETE executes through graft.storage.Retention (Engine routes it)")
  }

  private def compileSelect(s0: Select): DataFrame = {
    // reset BEFORE anything compiles: WHERE is compiled ahead of the
    // projection pre-pass, and a stale entry from a previous compile on a
    // reused instance would resolve to a helper column that doesn't exist
    scalarWinPre = Map.empty
    windowPre = Map.empty
    emaPre = Map.empty
    // `select *` expands to the canonical scan columns [time, value]
    val s = s0.copy(projections = s0.projections.flatMap {
      case Projection(Star, _) =>
        Seq(Projection(Ident(Seq("time")), None), Projection(Ident(Seq("value")), None))
      case p => Seq(p)
    })
    // Output-alias references (`select tag.host as site ... where site='web'`
    // — parser.zig test corpus) resolve by AST substitution.
    val aliasMap: Map[String, Expr] = s.projections.collect {
      case Projection(e, Some(a)) => a.toLowerCase -> e
    }.toMap
    def subst(e: Expr): Expr = e match {
      case id: Ident if aliasMap.contains(id.full.toLowerCase) => aliasMap(id.full.toLowerCase)
      case Binary(op, l, r) => Binary(op, subst(l), subst(r))
      case Unary(op, o) => Unary(op, subst(o))
      case Call(n, args) => Call(n, args.map(subst))
      case other => other
    }

    val where = s.where.map(subst)
    val groupBy = s.groupBy.map(subst)

    val base: DataFrame = s.from match {
      case None =>
        // Selector-less: scalar shapes (`select 1`, `select now()`) get
        // the reference's OneRow source; a query that references source
        // columns (`select avg(value) … where time >= …` — the r14
        // fleet-wide dashboard shape) reads the WHOLE source instead, so
        // the raw route answers it exactly like the cell-served route
        // does (pre-r15 the raw fallthrough threw an unresolved-column
        // error, making fleet-wide shapes depend on tier presence).
        val exprs = s.projections.map(p => subst(p.expr)) ++ where ++
          s.groupBy.map(subst) ++ s.orderBy.map(sk => subst(sk.expr))
        if (exprs.exists(refsSourceCols)) source
        else spark.range(1).toDF("__one")
      case Some(ById(id)) => source.filter(col("series_id") === id)
      case Some(ByName(name)) => source.filter(col("series") === name)
    }

    val filtered = where.map(w => base.filter(scalar(w))).getOrElse(base)

    val needsAgg = groupBy.nonEmpty || s.projections.exists(p => containsAggregate(p.expr))

    // ORDER BY keys resolve against output columns first (projection-
    // structural or alias match; `time` resolves to the time_bucket group
    // key after aggregation — reference corpus `... fill(previous) order by
    // time desc`). A key matching no output (standard SQL's "order by a
    // non-projected column", e.g. corpus `select value ... order by time`)
    // rides along as a hidden column computed pre-projection and is dropped
    // after the sort (only possible without aggregation).
    val sortKeyNames: Seq[Option[String]] = s.orderBy.map { sk =>
      s.projections.zipWithIndex.collectFirst {
        case (p, i) if subst(p.expr) == subst(sk.expr) ||
            p.alias.exists(a => sk.expr == Ident(Seq(a.toLowerCase))) =>
          outName(p, i)
      }.orElse {
        sk.expr match {
          case id: Ident if id.trailing == "time" && needsAgg =>
            bucketKeyInfo(s, groupBy).map(_._1)
          case _ => None
        }
      }
    }
    val hidden: Seq[(Int, String)] = sortKeyNames.zipWithIndex.collect {
      case (None, i) if !needsAgg => i -> s"__sort$i"
    }

    val projected: DataFrame =
      if (needsAgg) compileAggregate(filtered, s, groupBy)
      else {
        // scale-safe pre-pass for the per-series window functions: each
        // call gets a helper column computed by SeriesWindows inside
        // (series_id, day) partitions with boundary correction, replacing
        // the whole-series single-partition window (scalarCall then just
        // references the helper; see scalarWinPre)
        val winCalls = (s.projections.map(_.expr) ++
            hidden.map { case (i, _) => subst(s.orderBy(i).expr) })
          .flatMap(collectCalls(_, Set("lag", "lead", "moving_avg", "fill_forward")))
          .distinct
        var frame = filtered
        winCalls.zipWithIndex.foreach { case (c @ Call(fn, args), i) =>
          val helper = s"__sw$i"
          fn match {
            case "lag" | "lead" =>
              val n = windowOffset(fn, args)
              frame =
                if (fn == "lag") graft.operators.SeriesWindows.lagN(frame, helper, scalar(args.head), n)
                else graft.operators.SeriesWindows.leadN(frame, helper, scalar(args.head), n)
            case "moving_avg" =>
              val dur = args(1) match {
                case IntLit(v) => v
                case FloatLit(v) => v.toLong
                case _ => throw QueryError(QueryError.InvalidSyntax, "moving_avg duration must be a literal")
              }
              frame = graft.operators.SeriesWindows.movingAvg(frame, helper, dbl(scalar(args.head)), dur)
            case "fill_forward" =>
              frame = graft.operators.SeriesWindows.fillForward(frame, helper, scalar(args.head))
            case _ => ()
          }
          scalarWinPre += (c: Expr) -> helper
        }
        val cols = s.projections.zipWithIndex.map { case (p, i) =>
          scalar(p.expr).as(outName(p, i))
        } ++ hidden.map { case (i, n) => scalar(subst(s.orderBy(i).expr)).as(n) }
        frame.select(cols: _*)
      }

    val ordered =
      if (s.orderBy.isEmpty) projected
      else {
        val hiddenByIdx = hidden.toMap
        val sortCols = s.orderBy.zipWithIndex.map { case (sk, i) =>
          val c = sortKeyNames(i).orElse(hiddenByIdx.get(i)) match {
            case Some(n) => col(n)
            case None => scalar(subst(sk.expr)) // post-agg fallback: Spark resolves or errors
          }
          if (sk.ascending) c.asc_nulls_first else c.desc_nulls_last
        }
        projected.orderBy(sortCols: _*).drop(hidden.map(_._2): _*)
      }

    val withOffset = s.offset.map(o => ordered.offset(o.toInt)).getOrElse(ordered)
    s.limit.map(n => withOffset.limit(n.toInt)).getOrElse(withOffset)
  }

  /** Find the time_bucket group key: (output name, step). */
  private def bucketKeyInfo(s: Select, groupBy: Seq[Expr]): Option[(String, Long)] =
    groupBy.zipWithIndex.collectFirst {
      case (c @ Call("time_bucket", args), i) =>
        val step = args.head match {
          case IntLit(v) => v
          case FloatLit(v) => v.toLong
          case _ => throw QueryError(QueryError.UnsupportedFillPolicy,
            "fill requires a literal time_bucket step")
        }
        (groupKeyName(s, groupBy, c, i), step)
    }

  private def outName(p: Projection, idx: Int): String = p.alias.getOrElse(p.expr match {
    case id: Ident => id.trailing
    case Call(f, _) => s"${f}_$idx" // generated names per plan.zig:237-247
    case _ => s"_col$idx"
  })

  private def groupKeyName(s: Select, groupBy: Seq[Expr], g: Expr, i: Int): String =
    s.projections.zipWithIndex.collectFirst {
      case (p, pi) if stripAlias(s, p.expr) == g => outName(p, pi)
    }.getOrElse(s"__g$i")

  private def stripAlias(s: Select, e: Expr): Expr = e

  /** integral/irate args that get a window pre-pass: arg AST → column
    * prefix for the lag/rank helper columns. Set per compileAggregate call
    * (the Compiler is single-use per statement).
    */
  private var windowPre: Map[Expr, String] = Map.empty

  /** Ungrouped ema calls resolved by the two-phase [[graft.operators.SeriesWindows.emaGlobal]]
    * pre-pass: call AST → the one-row helper column cross-joined onto the
    * frame. Grouped ema keeps the per-bucket fold (bounded by the bucket).
    */
  private var emaPre: Map[Expr, String] = Map.empty

  /** Scalar window calls (lag/lead/moving_avg/fill_forward) resolved by
    * the SeriesWindows pre-pass: call AST → helper column. Reset at the
    * top of compileSelect; a call with no entry (WHERE, GROUP BY, fill
    * expressions) is rejected by scalarCall — there is deliberately no
    * whole-series fallback window anywhere in this compiler.
    */
  private var scalarWinPre: Map[Expr, String] = Map.empty

  /** Post-order: a matched call's argument subtree is emitted BEFORE the
    * call itself, so nested window calls (e.g. moving_avg(fill_forward(v)))
    * get their helper columns built first and the outer call's value
    * expression resolves to the inner helper instead of falling back to a
    * whole-series window.
    */
  private def collectCalls(e: Expr, names: Set[String]): Seq[Expr] = e match {
    case Call(n, args) if names.contains(n) =>
      args.flatMap(collectCalls(_, names)) :+ e
    case Call(_, args) => args.flatMap(collectCalls(_, names))
    case Binary(_, l, r) => collectCalls(l, names) ++ collectCalls(r, names)
    case Unary(_, o) => collectCalls(o, names)
    case _ => Seq.empty
  }

  /** lag/lead offset: positive literal int required (silently defaulting a
    * non-literal to 1 would return wrong offsets without any error, and
    * n <= 0 would crash inside the pre-pass's slice arithmetic).
    */
  private def windowOffset(fn: String, args: Seq[Expr]): Int = args.lift(1) match {
    case None => 1
    case Some(IntLit(v)) if v >= 1 => v.toInt
    case Some(_) => throw QueryError(QueryError.InvalidSyntax,
      s"$fn offset must be a positive integer literal")
  }

  private def compileAggregate(df0: DataFrame, s: Select, groupBy: Seq[Expr]): DataFrame = {
    val groupNames = groupBy.zipWithIndex.map { case (g, i) => groupKeyName(s, groupBy, g, i) }
    val groupCols = groupBy.zip(groupNames).map { case (g, n) => scalar(g).as(n) }
    val groupIndex: Map[Expr, String] = groupBy.zip(groupNames).toMap

    // Window pre-pass for the order-sensitive aggregates that would
    // otherwise materialize every point per group (collect_list): integral
    // needs consecutive-pair trapezoids (lag), irate the last two samples
    // (row_number desc). The window partitions on the same keys as the
    // aggregation, so Catalyst reuses one exchange; the sort is spill-safe.
    val preCalls = s.projections.flatMap(p => collectCalls(p.expr, Set("integral", "irate")))
      .distinct
    var df = df0
    windowPre = Map.empty
    preCalls.zipWithIndex.foreach { case (c @ Call(fn, args), i) =>
      val prefix = s"__wp$i"
      df = keyedPrePass(df, fn, prefix, dbl(scalar(args.head)), groupBy.map(scalar))
      windowPre += (c: Expr) -> prefix
    }

    // ema: the per-group fold would buffer each group's entire point array
    // — unbounded for an ungrouped query OR a non-time group key (a tag
    // group holds its whole history in one buffer). Every call instead
    // gets the two-phase day-partitioned fold (SeriesWindows.emaByKey —
    // affine-map composition, two doubles of state per key-day task)
    // joined back as a per-group constant column; aggCall reads it with
    // first(). Ungrouped = the keys-empty one-row case, broadcast
    // cross-joined.
    val emaCalls = s.projections.flatMap(p => collectCalls(p.expr, Set("ema"))).distinct
    emaCalls.zipWithIndex.foreach { case (c @ Call(_, args), i) =>
      val helper = s"__ema$i"
      val v = dbl(scalar(args.head))
      val alpha = alphaLit(args(2))
      if (groupBy.isEmpty) {
        df = df.crossJoin(broadcast(
          graft.operators.SeriesWindows.emaGlobal(df, helper, v, alpha)))
      } else {
        // materialize the group keys, fold per key, null-safe join-back
        // (tag keys can be NULL and a NULL group must still find its fold)
        val keyNames = groupBy.indices.map(j => s"${helper}_k$j")
        groupBy.zip(keyNames).foreach { case (g, n) => df = df.withColumn(n, scalar(g)) }
        val perKey = graft.operators.SeriesWindows.emaByKey(df, helper, v, alpha, keyNames)
        val rhs = keyNames.foldLeft(perKey)((p, n) => p.withColumnRenamed(n, s"${n}_r"))
        val cond = keyNames.map(n => df(n) <=> rhs(s"${n}_r")).reduce(_ && _)
        df = df.join(rhs, cond, "left").drop(keyNames.map(n => s"${n}_r"): _*)
      }
      emaPre += (c: Expr) -> helper
    }

    val projNames = s.projections.zipWithIndex.map { case (p, i) => outName(p, i) }
    val aggExprs = s.projections.zipWithIndex.flatMap { case (p, i) =>
      if (groupIndex.contains(p.expr)) None
      else Some(aggExpr(p.expr, groupIndex).as(outName(p, i)))
    }

    val grouped =
      if (aggExprs.nonEmpty)
        df.groupBy(groupCols: _*).agg(aggExprs.head, aggExprs.tail: _*)
      else
        df.groupBy(groupCols: _*).agg(count(lit(1)).as("__cnt"))

    // fill(...) between aggregation and final projection (design doc §2.11)
    val filledDf = s.fill match {
      case None => grouped
      case Some(policy) =>
        val (bucketName, step) = bucketKeyInfo(s, groupBy).getOrElse(
          throw QueryError(QueryError.UnsupportedFillPolicy,
            "fill(...) requires group by time_bucket(step, time)"))
        val keyCols = groupNames.filterNot(_ == bucketName)
        val valueCols = grouped.columns.filterNot(groupNames.contains).filterNot(_ == "__cnt").toSeq
        policy match {
          case FillConst(e) =>
            Fill.applyConst(grouped, bucketName, keyCols, step, scalar(e), valueCols)
          case p => Fill(grouped, bucketName, keyCols, step, p, valueCols)
        }
    }

    val outCols = s.projections.zipWithIndex.map { case (p, i) =>
      groupIndex.get(p.expr) match {
        case Some(gname) => col(gname).as(outName(p, i))
        case None => col(outName(p, i))
      }
    }
    filledDf.select(outCols: _*)
  }

  /** Pre-pass for integral/irate, keyed on the aggregation's group keys
    * (empty for an ungrouped query). Partitioning the window by the group
    * keys alone is bounded only when a key is time-derived (time_bucket);
    * a pure tag group — or no group — would move a group's entire history
    * into one task for the window sort: fine on a laptop, a scale-killer
    * on a cluster (the r3 ungrouped-integral bug, one layer deeper).
    * Instead rows ALWAYS get a coarse day key (`time div 86400` — monotone
    * in time, so day ranges are disjoint and (t, v) order within a day
    * equals group order restricted to the day), the lag/rank windows run
    * inside (keys, day) partitions, and the cross-day boundary terms come
    * from a per-(keys, day) aggregate (one row per non-empty key-day —
    * metadata-sized) joined back null-safely (tag keys can be NULL):
    *  - integral: the first row of each key-day takes its lag (t, v) from
    *    the key's previous non-empty day's last point;
    *  - irate: per-key desc rank = within-day rank + total row count of
    *    the key's later days.
    * No exchange moves more than one key-day of data to a single task.
    * (The boundary frame carries NO broadcast hint: its cardinality is
    * keys × days — user-data-dependent and unbounded, so a hard hint
    * could blow the broadcast limit exactly on the high-cardinality tag
    * groups this pre-pass exists for. AQE broadcasts it at runtime
    * whenever the actual size is small, which is every benign case.)
    */
  private def keyedPrePass(df0: DataFrame, fn: String, prefix: String, v: Column,
      keys: Seq[Column]): DataFrame = {
    val t = col("time").cast("long")
    val gName = s"${prefix}_g"
    val keyNames = keys.indices.map(j => s"${prefix}_k$j")
    var df = df0
    keys.zip(keyNames).foreach { case (k, n) => df = df.withColumn(n, k) }
    df = df.withColumn(gName, graft.operators.SeriesWindows.dayKey(t, 86400L))
    val kc = keyNames.map(col)
    val part = kc :+ col(gName)
    // null-safe keyed join-back of a per-(keys, day) boundary frame
    def joinBack(left: DataFrame, right: DataFrame): DataFrame = {
      val rhs = (keyNames :+ gName).foldLeft(right)((p, n) => p.withColumnRenamed(n, s"${n}_r"))
      val cond = (keyNames :+ gName).map(n => left(n) <=> rhs(s"${n}_r")).reduce(_ && _)
      left.join(rhs, cond, "left").drop((keyNames :+ gName).map(n => s"${n}_r"): _*)
    }
    fn match {
      case "integral" =>
        val wLocal = Window.partitionBy(part: _*).orderBy(t, v)
        val withLag = df
          .withColumn(s"${prefix}_lt0", lag(t, 1).over(wLocal))
          .withColumn(s"${prefix}_lv0", lag(v, 1).over(wLocal))
        // last (t, v) per key-day, shifted to the key's next non-empty day;
        // the day-shift window is over ≤ one row per key-day
        val lasts = df.groupBy(part: _*)
          .agg(max(struct(t.as("t"), v.as("v"))).as(s"${prefix}_p"))
        val prev = lasts
          .withColumn(s"${prefix}_q",
            lag(col(s"${prefix}_p"), 1).over(Window.partitionBy(kc: _*).orderBy(col(gName))))
          .select(part ++ Seq(
            col(s"${prefix}_q.t").as(s"${prefix}_pt"),
            col(s"${prefix}_q.v").as(s"${prefix}_pv")): _*)
        joinBack(withLag, prev)
          .withColumn(s"${prefix}_lt", coalesce(col(s"${prefix}_lt0"), col(s"${prefix}_pt")))
          .withColumn(s"${prefix}_lv", coalesce(col(s"${prefix}_lv0"), col(s"${prefix}_pv")))
      case "irate" =>
        val wLocal = Window.partitionBy(part: _*).orderBy(t.desc, v.desc)
        val withRn = df.withColumn(s"${prefix}_lrn", row_number().over(wLocal).cast("long"))
        val counts = df.groupBy(part: _*).agg(count(lit(1)).as(s"${prefix}_n"))
        val later = counts
          .withColumn(s"${prefix}_later",
            coalesce(sum(col(s"${prefix}_n")).over(
              Window.partitionBy(kc: _*).orderBy(col(gName).desc)
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(part :+ col(s"${prefix}_later"): _*)
        joinBack(withRn, later)
          .withColumn(s"${prefix}_rn",
            col(s"${prefix}_lrn") + coalesce(col(s"${prefix}_later"), lit(0L)))
      case _ => df0
    }
  }

  /** `ema` counts as an aggregate: the reference plans window-kind calls
    * into its Aggregate node (`plan.zig:339-348`), and a final smoothed
    * value per group is the only bounded-state reading.
    */
  private def refsSourceCols(e: Expr): Boolean = Compiler.refsSourceCols(e)

  private def containsAggregate(e: Expr): Boolean = e match {
    case Call(n, args) =>
      FunctionRegistry.isAggregate(n) || n == "ema" || args.exists(containsAggregate)
    case Binary(_, l, r) => containsAggregate(l) || containsAggregate(r)
    case Unary(_, o) => containsAggregate(o)
    case _ => false
  }

  // ---------------------------------------------------------------- scalar

  private def dbl(c: Column): Column = c.cast("double")

  def scalar(e: Expr): Column = e match {
    case IntLit(v) => lit(v)
    case FloatLit(v) => lit(v)
    case StringLit(v) => lit(v)
    case BoolLit(v) => lit(v)
    case NullLit => lit(null)
    case id: Ident => identCol(id)
    case Call(name, args) => scalarCall(name, args, agg = false)
    case Binary(op, l, r) => binary(op, scalar(l), scalar(r))
    case Unary(Not, o) => !scalar(o)
    case Unary(Neg, o) => -dbl(scalar(o))
    case Unary(Pos, o) => dbl(scalar(o))
  }

  /** Identifier typing rules (`type_inference.zig:85-100`): trailing `time`
    * → the time column; `tag.<key>` → tags lookup (string, nullable);
    * `value` → value; `series` → series name.
    */
  private def identCol(id: Ident): Column = id.trailing match {
    case "time" => col("time")
    case "value" => col("value")
    case "series" => col("series")
    case "series_id" => col("series_id")
    // try_element_at: a missing tag key is NULL (string nullable,
    // type_inference.zig:92-100), not an ANSI error
    case k if id.isTag => try_element_at(col("tags"), lit(id.parts.last))
    case other =>
      if (source.columns.map(_.toLowerCase).contains(other)) col(other)
      else try_element_at(col("tags"), lit(other)) // loose fallback: bare tag name
  }

  private def binary(op: BinOp, l: Column, r: Column): Column = op match {
    case Add => dbl(l) + dbl(r)
    case Sub => dbl(l) - dbl(r)
    case Mul => dbl(l) * dbl(r)
    case Div => dbl(l) / dbl(r)
    case Mod => l.cast("long") % r.cast("long") // integer-only (expression.zig:113)
    case Eq => l === r
    case Ne => l =!= r
    case Lt => l < r
    case Le => l <= r
    case Gt => l > r
    case Ge => l >= r
    case RegexMatch => regexp_like(l.cast("string"), r.cast("string"))
    case RegexNotMatch => !regexp_like(l.cast("string"), r.cast("string"))
    case And => l && r
    case Or => l || r
  }

  private def scalarCall(name: String, args: Seq[Expr], agg: Boolean): Column = {
    def a(i: Int): Column = if (agg) aggOrScalar(args(i)) else scalar(args(i))
    // window calls covered by the SeriesWindows pre-pass resolve to their
    // helper column (day-partitioned, boundary-corrected — never a
    // whole-series single-partition window)
    scalarWinPre.get(Call(name, args)).foreach(h => return col(h))
    name match {
      case "abs" => abs(dbl(a(0)))
      case "ceil" => ceil(dbl(a(0))).cast("double") // declared float return
      case "floor" => floor(dbl(a(0))).cast("double")
      case "round" => round(dbl(a(0))).cast("double")
      case "pow" => pow(dbl(a(0)), dbl(a(1)))
      case "ln" => log(dbl(a(0)))
      case "sqrt" => sqrt(dbl(a(0)))
      case "now" => lit(options.now)
      case "time_bucket" =>
        if (args.length == 2) F.timeBucket(a(0), a(1))
        else F.timeBucket(a(0), a(1), a(2))
      case "coalesce" => coalesce(args.indices.map(a): _*)
      case "fill_forward" | "lag" | "lead" | "moving_avg" =>
        // Every supported position (projection, ORDER BY — incl. nested
        // calls, post-order) is compiled by the SeriesWindows pre-pass
        // (day-partitioned, boundary-corrected) and resolved above via
        // scalarWinPre. Reaching here means the call sits somewhere the
        // pre-pass does not cover (WHERE, GROUP BY, fill expressions) —
        // positions the reference never executes (functions.zig:326-393
        // are registry-only) and where the old whole-series fallback
        // window would single-partition the entire scan. Rejected so the
        // compiler CANNOT emit a single-partition window (r4 verdict #2).
        throw QueryError(QueryError.InvalidSyntax,
          s"window function '$name' is only supported in the projection or ORDER BY of a non-aggregated query")
      case other =>
        throw QueryError(QueryError.UnknownFunction, s"unknown function '$other'")
    }
  }

  private def alphaLit(e: Expr): Double = e match {
    case FloatLit(v) => v
    case IntLit(v) => v.toDouble
    case _ => throw QueryError(QueryError.InvalidSyntax, "ema alpha must be a literal")
  }

  // ------------------------------------------------------------- aggregate

  private def aggOrScalar(e: Expr): Column =
    if (containsAggregate(e)) aggExpr(e, Map.empty) else scalar(e)

  /** Compile a projection in aggregation context: aggregate calls become agg
    * Columns; group-matching subtrees become group column refs; arithmetic
    * over agg results is allowed (superset of the reference, which rejects
    * `avg(v)*2` — operator.zig:407-429).
    */
  def aggExpr(e: Expr, groupIndex: Map[Expr, String]): Column = {
    if (groupIndex.contains(e)) return col(groupIndex(e))
    e match {
      case IntLit(v) => lit(v)
      case FloatLit(v) => lit(v)
      case StringLit(v) => lit(v)
      case BoolLit(v) => lit(v)
      case NullLit => lit(null)
      case c @ Call(name, args) if FunctionRegistry.isAggregate(name) || name == "ema" =>
        aggCall(c)
      case Call(name, args) =>
        // scalar over aggregate results, e.g. round(avg(v))
        scalarCallAgg(name, args, groupIndex)
      case Binary(op, l, r) => binary(op, aggExpr(l, groupIndex), aggExpr(r, groupIndex))
      case Unary(Not, o) => !aggExpr(o, groupIndex)
      case Unary(Neg, o) => -dbl(aggExpr(o, groupIndex))
      case Unary(Pos, o) => dbl(aggExpr(o, groupIndex))
      case id: Ident =>
        throw QueryError(QueryError.InvalidSyntax,
          s"'${id.full}' must appear in GROUP BY or inside an aggregate")
    }
  }

  private def scalarCallAgg(name: String, args: Seq[Expr], groupIndex: Map[Expr, String]): Column = {
    def a(i: Int): Column = aggExpr(args(i), groupIndex)
    name match {
      case "abs" => abs(dbl(a(0)))
      case "ceil" => ceil(dbl(a(0))).cast("double")
      case "floor" => floor(dbl(a(0))).cast("double")
      case "round" => round(dbl(a(0))).cast("double")
      case "pow" => pow(dbl(a(0)), dbl(a(1)))
      case "ln" => log(dbl(a(0)))
      case "sqrt" => sqrt(dbl(a(0)))
      case "now" => lit(options.now)
      case "coalesce" => coalesce(args.indices.map(a): _*)
      case "time_bucket" =>
        throw QueryError(QueryError.InvalidSyntax,
          "time_bucket in an aggregated projection must be a GROUP BY key")
      case other =>
        throw QueryError(QueryError.UnknownFunction, s"unknown function '$other' in aggregate context")
    }
  }

  /** Sorted (t, v) points for the aggregates that genuinely need every
    * point (irate's second-to-last, integral's trapezoid, ema's recursion).
    * NULL values are dropped before collection (`when` without otherwise →
    * NULL entries skipped by collect_list). State is O(bucket size): fine
    * for time-bucketed groups (bounded by bucket duration × sample rate);
    * rate/delta/first/last use the O(1) [[orderedExtremes]] path instead.
    */
  private def sortedPts(arg: Expr): Column = {
    val v = scalar(arg)
    sort_array(collect_list(when(v.isNotNull, struct(col("time").cast("long").as("t"), dbl(v).as("v")))))
  }

  /** O(1)-state first/last extremes in (t, v) order, null values skipped
    * (min_by/max_by ignore rows with a NULL ordering key):
    * (firstV, lastV, firstT, lastT, nonNullCount).
    */
  private def orderedExtremes(arg: Expr): (Column, Column, Column, Column, Column) = {
    val v = dbl(scalar(arg))
    val ord = when(v.isNotNull, struct(col("time").cast("long").as("t"), v.as("v")))
    (min_by(v, ord), max_by(v, ord),
      min_by(col("time").cast("long"), ord), max_by(col("time").cast("long"), ord),
      count(v))
  }

  private def aggCall(c: Call): Column = {
    val Call(name, args) = c
    aggCallImpl(c, name, args)
  }

  private def aggCallImpl(c: Call, name: String, args: Seq[Expr]): Column = name match {
    case "avg" => avg(dbl(scalar(args.head)))
    case "sum" => sum(dbl(scalar(args.head))) // executed parity: float sum (operator.zig:781-790)
    case "min" => min(scalar(args.head))
    case "max" => max(scalar(args.head))
    case "count" =>
      if (args.isEmpty) count(lit(1)) // zero-arg counts rows (functions.zig:234-238)
      else count(scalar(args.head)) // count(expr) skips NULLs
    // earliest/latest by time (sydraql-design.md:126); ties at equal time
    // break on the value itself so the result is deterministic
    case "first" => min_by(scalar(args.head), struct(col("time"), dbl(scalar(args.head))))
    case "last" => max_by(scalar(args.head), struct(col("time"), dbl(scalar(args.head))))
    case "percentile" =>
      val p = args(1) match {
        case FloatLit(v) => v
        case IntLit(v) => v.toDouble
        case _ => throw QueryError(QueryError.InvalidSyntax, "percentile p must be a literal")
      }
      percentile(dbl(scalar(args.head)), lit(p))
    case "percentile_approx" =>
      // superset: t-digest sketch percentile (graft.functions.TDigest) —
      // bounded mergeable state where exact percentile sorts the group;
      // the 100 TB default for dashboard quantiles
      val p = args(1) match {
        case FloatLit(v) => v
        case IntLit(v) => v.toDouble
        case _ => throw QueryError(QueryError.InvalidSyntax, "percentile_approx p must be a literal")
      }
      if (p < 0 || p > 1)
        throw QueryError(QueryError.InvalidSyntax, "percentile_approx p must be in [0,1]")
      graft.functions.TDigest.quantileOf(
        graft.functions.TDigest.agg(dbl(scalar(args.head))), p)
    case "ndv" =>
      // superset: theta-sketch distinct estimate (exact below 2^12)
      graft.functions.ThetaSketch.estimate(
        graft.functions.ThetaSketch.agg(scalar(args.head).cast("string")))
    case "delta" =>
      // last - first (functions.zig:359-365; Prometheus-style). Bounded
      // O(1) aggregation state: min_by/max_by over the (t, v) order — no
      // point materialization, safe for arbitrarily large buckets.
      val (firstV, lastV, _, _, n) = orderedExtremes(args.head)
      when(n >= 1, lastV - firstV)
    case "rate" =>
      // (last-first)/(t_last-t_first) per bucket; NULL when <2 points or
      // zero time span (semantics chosen & documented — the reference
      // registers but never executes rate, SURVEY.md §7.4). Bounded state.
      val (firstV, lastV, firstT, lastT, n) = orderedExtremes(args.head)
      val dt = lastT - firstT
      when(n >= 2 && dt > 0, (lastV - firstV) / dt.cast("double"))
    case "irate" =>
      // last two samples (functions.zig:352-358) via the windowPre rank
      // column — O(1) aggregation state, no point materialization
      val prefix = windowPre.getOrElse(c,
        throw QueryError(QueryError.InvalidSyntax, "irate requires aggregation context"))
      val rn = col(s"${prefix}_rn")
      val v = dbl(scalar(args.head))
      val t = col("time").cast("long")
      val v1 = min(when(rn === 1, v))
      val v2 = min(when(rn === 2, v))
      val t1 = min(when(rn === 1, t))
      val t2 = min(when(rn === 2, t))
      when(count(v) >= 2 && t1 - t2 > 0, (v1 - v2) / (t1 - t2).cast("double"))
    case "integral" =>
      // trapezoid (functions.zig:366-372) over windowPre lag columns:
      // consecutive-pair areas summed by the hash aggregate — O(1) state,
      // spill-safe sort instead of per-group arrays
      val prefix = windowPre.getOrElse(c,
        throw QueryError(QueryError.InvalidSyntax, "integral requires aggregation context"))
      val lt = col(s"${prefix}_lt")
      val lv = col(s"${prefix}_lv")
      val v = dbl(scalar(args.head))
      val t = col("time").cast("long")
      coalesce(sum(when(lt.isNotNull, (t - lt).cast("double") * (v + lv) / 2.0)), lit(0.0))
    case "ema" =>
      // the emaPre pre-pass already folded every projected call per group
      // (two-phase day-partitioned — no per-group point buffer anywhere);
      // the helper is a per-group constant column from the join-back
      val helper = emaPre.getOrElse(c,
        throw QueryError(QueryError.InvalidSyntax,
          "ema is only supported in the projection of an aggregated query"))
      first(col(helper))
    case other =>
      throw QueryError(QueryError.UnknownFunction, s"unknown aggregate '$other'")
  }
}

object Compiler {
  /** Does the expression reference a source column (time/value/series,
    * or a tag.* path)? Only IDENTIFIERS count (aggregate CALLS over
    * literals, e.g. `count()` alone, stay scalar: nothing to read).
    * One shared definition for the two decisions that must agree:
    * the compiler's OneRow-vs-whole-source choice for selector-less
    * selects, and the validator's r17 rule that a selector-less select
    * over source columns requires a time predicate (without the shared
    * test, a shape the validator exempts as scalar could still compile
    * to an unbounded whole-store scan).
    */
  private[sydraql] def refsSourceCols(e: Expr): Boolean = e match {
    case id: Ident =>
      Seq("time", "value", "series", "series_id").contains(id.full.toLowerCase) ||
        id.parts.headOption.exists(_.equalsIgnoreCase("tag"))
    case Binary(_, l, r) => refsSourceCols(l) || refsSourceCols(r)
    case Unary(_, o) => refsSourceCols(o)
    case Call(_, args) => args.exists(refsSourceCols)
    case _ => false
  }
}
