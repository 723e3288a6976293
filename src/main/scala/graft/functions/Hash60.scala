package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd portable 60-bit hash: the top 60 bits of md5(s), numerically
  * equal to `int(md5(s)[0:15], 16)` — bit-identical to the composed
  * `conv(substring(md5(s), 1, 15), 16, 10)` form every DuckDB oracle
  * replays (FunctionsSpec pins the equivalence on random inputs).
  *
  * The composed form materializes a 32-char hex UTF8String per row and
  * re-parses 15 chars of it through `conv`'s base-conversion loop; this
  * expression goes digest-bytes → long directly — one static call inside
  * whole-stage codegen, no intermediate strings. It is the per-row kernel
  * of every deterministic sampling decision (`Sampling.hashUnit`),
  * fingerprinting, and the minhash shingle pre-hash, so at 100 TB it runs
  * per document × position.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hash60 expects STRING, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override def nullSafeEval(s: Any): Any =
    Hash60.hash(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {

  /** Top 60 bits of the md5 digest: 7 whole bytes + the high nibble of
    * byte 7 — exactly the value of the first 15 hex digits.
    */
  def hash(bytes: Array[Byte]): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Column API (casts to string like the composed form did). */
  def apply(c: Column): Column =
    GraftShim.column(Hash60(GraftShim.expression(c.cast("string"))))
}
