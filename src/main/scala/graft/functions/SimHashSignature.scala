package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd SimHash: the 60-bit multiplicity-weighted sign signature of
  * an ARRAY<LONG> of word hashes in ONE fused pass (elements outer, bits
  * inner, JIT'd) — replacing the nested-HOF form (60 interpreted
  * per-element folds per document), bit-for-bit:
  *
  *   votes[b] = Σ_h ((h >> b) & 1 == 1 ? +1 : -1);  bit b set iff votes[b] > 0
  *
  * Null elements vote like h = 0 (every bit −1), exactly as the HOF's
  * `when(... === 1, 1).otherwise(-1)` resolves a NULL comparison; an empty
  * array yields 0. The raw expression yields NULL for a NULL array, but
  * the Column API coalesces that to 0 — the HOF form's
  * `when(votes > 0, ...).otherwise(0)` accumulates 0 from NULL votes, and
  * a NULL signature would silently drop null-text docs from the banded
  * pairing (r4 advice #1). The pigeonhole banding and the DuckDB oracle
  * in q_pl_simhash pin the output unchanged.
  */
case class SimHashSignature(child: Expression, bits: Int = 60)
    extends UnaryExpression {

  require(bits > 0 && bits <= 60, "bits must be in 1..60")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig expects ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val x = if (hs.isNullAt(j)) 0L else hs.getLong(j)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((x >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $hs.numElements();
         |final int[] $votes = new int[$bits];
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $x = $hs.isNullAt($j) ? 0L : $hs.getLong($j);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $votes[$b] += ((($x >> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSignature {
  /** Column API (60-bit default lives on the case-class constructor).
    * NULL input → 0, matching the nested-HOF form it replaced.
    */
  def apply(hs: Column): Column = apply(hs, 60)
  def apply(hs: Column, bits: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      GraftShim.column(SimHashSignature(GraftShim.expression(hs), bits)),
      org.apache.spark.sql.functions.lit(0L))
}
