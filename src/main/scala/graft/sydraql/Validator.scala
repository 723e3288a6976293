package graft.sydraql

import Ast._

/** Semantic analyzer, ported from
  * `/root/reference/src/sydra/query/validator.zig`:
  *  - any SELECT/DELETE with a FROM selector requires a time predicate in
  *    WHERE (:57-66, :96-105);
  *  - unknown functions rejected, arity checked (:124-139).
  */
object Validator {

  private val WindowFns = Seq("lag", "lead", "moving_avg", "fill_forward")

  def validate(stmt: Statement): Unit = stmt match {
    case s: Select =>
      (s.projections.map(_.expr) ++ s.where ++ s.groupBy ++ s.orderBy.map(_.expr))
        .foreach(checkFunctions)
      if (s.from.isDefined && !s.where.exists(hasTimePredicate))
        throw QueryError(QueryError.TimeRangeRequired,
          "queries over a series require a time predicate in WHERE")
      // r17: a selector-less SELECT that references source columns
      // (`select time, value`, `select avg(value)`) reads the WHOLE
      // store when no time predicate bounds it — at fleet scale that is
      // a full-table scan one forgotten FROM away, the exact hazard the
      // reference's rule exists to prevent (validator.zig:57-66; it has
      // no FROM-less form, so the bounded-read intent extends here).
      // Scalar shapes (`select 1`, `select now()`) reference nothing
      // and stay exempt — same test the compiler uses to choose OneRow
      // vs whole-source, shared so the two can never diverge.
      if (s.from.isEmpty && !s.where.exists(hasTimePredicate)) {
        val exprs = s.projections.map(_.expr) ++ s.where ++ s.groupBy ++
          s.orderBy.map(_.expr)
        if (exprs.exists(Compiler.refsSourceCols))
          throw QueryError(QueryError.TimeRangeRequired,
            "selector-less queries over source columns require a time predicate in WHERE")
      }
      s.fill.foreach {
        case FillConst(e) => checkFunctions(e)
        case _ => ()
      }
      if (s.fill.isDefined) {
        val isBucketed = s.groupBy.exists {
          case Call("time_bucket", _) => true
          case _ => false
        }
        if (!isBucketed)
          throw QueryError(QueryError.UnsupportedFillPolicy,
            "fill(...) requires group by time_bucket(step, time)")
      }
      // ema (grouped or not — ungrouped is a superset; the reference
      // registers but never executes it, SURVEY §7.4) compiles through the
      // two-phase day-partitioned fold (Compiler emaPre — bounded state),
      // which collects calls from projections only. In ORDER BY it must
      // reference a projected call, which then resolves to the output
      // column; an unprojected one has no helper to resolve to.
      s.orderBy.map(_.expr).foreach { e =>
        if (containsCall(e, "ema") && !s.projections.exists(_.expr == e))
          throw QueryError(QueryError.InvalidSyntax,
            "ema in ORDER BY must also appear as a projection")
      }
      // Window functions have no defined frame in WHERE / GROUP BY (the
      // reference registers them only for projections — functions.zig:
      // 326-393 never execute elsewhere), and compiling them there would
      // need a whole-series window: the exact single-partition scan shape
      // the SeriesWindows pre-pass exists to prevent. Rejected up front;
      // the compiler's scalarCall backstop enforces the same invariant.
      s.where.foreach { w =>
        WindowFns.find(containsCall(w, _)).foreach(n =>
          throw QueryError(QueryError.InvalidSyntax,
            s"window function '$n' is not allowed in WHERE"))
      }
      s.groupBy.foreach { g =>
        WindowFns.find(containsCall(g, _)).foreach(n =>
          throw QueryError(QueryError.InvalidSyntax,
            s"window function '$n' is not allowed in GROUP BY"))
      }
      // LIMIT/OFFSET execute through DataFrame.limit/offset, which take
      // Int — a literal above Int.MaxValue would otherwise WRAP via
      // .toInt (2³¹ → -2147483648, 2³² → 0) and silently return the
      // wrong rows. The parser accepts any long literal; reject here,
      // loudly, before anything plans.
      Seq("limit" -> s.limit, "offset" -> s.offset).foreach { case (kw, v) =>
        v.filter(n => n > Int.MaxValue || n < 0).foreach(n =>
          throw QueryError(QueryError.InvalidSyntax,
            s"$kw $n out of range (0 .. ${Int.MaxValue})"))
      }
    case d: Delete =>
      d.where.foreach(checkFunctions)
      if (!d.where.exists(hasTimePredicate))
        throw QueryError(QueryError.TimeRangeRequired,
          "delete requires a time predicate in WHERE")
    case i: Insert =>
      i.values.flatten.foreach(checkFunctions)
    case Explain(inner) => validate(inner)
  }

  /** A time predicate is a comparison conjunct with the `time` identifier on
    * either side. ORs don't establish bounds, so only the AND-spine counts
    * (mirrors the reference's conjunct walk, `physical.zig:138-264`).
    */
  def hasTimePredicate(e: Expr): Boolean = e match {
    case Binary(And, l, r) => hasTimePredicate(l) || hasTimePredicate(r)
    case Binary(op, l, r)
        if Seq(Lt, Le, Gt, Ge, Eq).contains(op) =>
      isTimeIdent(l) || isTimeIdent(r)
    case _ => false
  }

  private def isTimeIdent(e: Expr): Boolean = e match {
    case id: Ident => id.trailing == "time"
    case _ => false
  }

  private def containsCall(e: Expr, name: String): Boolean = e match {
    case Call(n, args) => n == name || args.exists(containsCall(_, name))
    case Binary(_, l, r) => containsCall(l, name) || containsCall(r, name)
    case Unary(_, o) => containsCall(o, name)
    case _ => false
  }

  private def checkFunctions(e: Expr): Unit = e match {
    case Call(name, args) =>
      FunctionRegistry.checkArity(name, args.length)
      args.foreach(checkFunctions)
    case Binary(_, l, r) => checkFunctions(l); checkFunctions(r)
    case Unary(_, o) => checkFunctions(o)
    case _ => ()
  }
}
