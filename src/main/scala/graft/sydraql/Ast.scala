package graft.sydraql

/** sydraQL abstract syntax — ported surface of the reference grammar
  * (`/root/reference/src/sydra/query/ast.zig`; statements :4-10,
  * expressions :73-168, fill :129-139).
  */
object Ast {

  sealed trait Statement
  final case class Select(
      projections: Seq[Projection],
      from: Option[Selector],
      where: Option[Expr],
      groupBy: Seq[Expr],
      fill: Option[FillPolicy],
      orderBy: Seq[SortKey],
      limit: Option[Long],
      offset: Option[Long]) extends Statement
  final case class Insert(series: String, columns: Seq[String], values: Seq[Seq[Expr]]) extends Statement
  final case class Delete(from: Selector, where: Option[Expr]) extends Statement
  final case class Explain(inner: Statement) extends Statement

  /** `by_id(N)` or a bare series name (`parser.zig:337-359`). */
  sealed trait Selector
  final case class ById(id: Long) extends Selector
  final case class ByName(name: String) extends Selector

  final case class Projection(expr: Expr, alias: Option[String])
  final case class SortKey(expr: Expr, ascending: Boolean)

  sealed trait FillPolicy
  case object FillPrevious extends FillPolicy
  case object FillLinear extends FillPolicy
  case object FillNull extends FillPolicy
  final case class FillConst(value: Expr) extends FillPolicy

  sealed trait Expr
  /** `select *` — sugar for the canonical scan schema `[time, value]`
    * (every sydraQL scan emits exactly those columns, plan.zig:255-280).
    * Not in the reference grammar, but its SQL translator passes
    * `select * from t` through verbatim, so the engine accepts it.
    */
  case object Star extends Expr
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  final case class StringLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  /** Dotted identifier; resolution is case-insensitive by trailing segment
    * (`expression.zig:64-80`, `type_inference.zig:85-100`).
    */
  final case class Ident(parts: Seq[String]) extends Expr {
    def full: String = parts.mkString(".")
    def trailing: String = parts.last.toLowerCase
    def isTag: Boolean = parts.length >= 2 && parts.init.last.equalsIgnoreCase("tag")
  }
  final case class Call(name: String, args: Seq[Expr]) extends Expr
  final case class Binary(op: BinOp, left: Expr, right: Expr) extends Expr
  final case class Unary(op: UnOp, operand: Expr) extends Expr

  sealed abstract class BinOp(val sym: String)
  case object Add extends BinOp("+")
  case object Sub extends BinOp("-")
  case object Mul extends BinOp("*")
  case object Div extends BinOp("/")
  case object Mod extends BinOp("%")
  case object Eq extends BinOp("=")
  case object Ne extends BinOp("!=")
  case object Lt extends BinOp("<")
  case object Le extends BinOp("<=")
  case object Gt extends BinOp(">")
  case object Ge extends BinOp(">=")
  case object RegexMatch extends BinOp("=~")
  case object RegexNotMatch extends BinOp("!~")
  case object And extends BinOp("and")
  case object Or extends BinOp("or")

  sealed abstract class UnOp(val sym: String)
  case object Not extends UnOp("not")
  case object Neg extends UnOp("-")
  case object Pos extends UnOp("+")
}

/** Structured query error with the reference's error codes
  * (`/root/reference/src/sydra/query/errors.zig:4-10`).
  */
final case class QueryError(code: String, message: String, pos: Int = -1)
    extends RuntimeException(s"[$code] $message" + (if (pos >= 0) s" at $pos" else ""))

object QueryError {
  val TimeRangeRequired = "time_range_required"
  val UnsupportedFillPolicy = "unsupported_fill_policy"
  val InvalidFunctionArity = "invalid_function_arity"
  val InvalidSyntax = "invalid_syntax"
  val UnknownFunction = "unknown_function"
  val Unimplemented = "unimplemented"
}
