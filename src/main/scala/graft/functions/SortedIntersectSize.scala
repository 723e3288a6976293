package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd `size(array_intersect(a, b))` for ASCENDING-SORTED
  * ARRAY<LONG> inputs — the exact-verification kernel of the dedup pair
  * miners (`graft.pipeline.Dedup`), whose shingle sets are
  * `array_sort(array_distinct(...))` by construction.
  *
  * `array_intersect` builds a hash set over one side and materializes the
  * intersection array per evaluation, and the verify projection + the
  * pushed-down threshold filter evaluate the intersection up to four
  * times per candidate pair (Catalyst's alias substitution duplicates the
  * expression; subexpression elimination does not reach across the
  * filter/project boundary). This kernel is one allocation-free merge
  * walk inside whole-stage codegen — cheap enough that the duplication is
  * noise (r17: the LSH/ngram verify stages were the headline set's
  * hottest CPU after the scans).
  *
  * Equivalence contract (FunctionsSpec pins it against
  * `size(array_intersect)` on the real shingle frames and on random
  * sorted inputs): for ascending-sorted inputs — duplicates allowed,
  * nulls allowed only in the trailing position `array_sort` gives them —
  * the result is the count of DISTINCT common values (null matching null,
  * as `array_intersect` does), i.e. exactly
  * `size(array_intersect(a, b))`. Unsorted inputs are out of contract.
  * NULL array → NULL, matching `size(array_intersect)`'s propagation.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got ($l, $r)")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) {
        // array_sort puts nulls last; null matches only null (counted once)
        if (x.isNullAt(i) && y.isNullAt(j)) { c += 1; i = n; j = m }
        else if (x.isNullAt(i)) j += 1
        else i += 1
      } else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else {
          c += 1
          while (i < n && !x.isNullAt(i) && x.getLong(i) == xv) i += 1
          while (j < m && !y.isNullAt(j) && y.getLong(j) == yv) j += 1
        }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    if ($a.isNullAt($i) && $b.isNullAt($j)) { $c++; break; }
         |    else if ($a.isNullAt($i)) $j++;
         |    else $i++;
         |  } else {
         |    final long $xv = $a.getLong($i);
         |    final long $yv = $b.getLong($j);
         |    if ($xv < $yv) $i++;
         |    else if ($xv > $yv) $j++;
         |    else {
         |      $c++;
         |      while ($i < $n && !$a.isNullAt($i) && $a.getLong($i) == $xv) $i++;
         |      while ($j < $m && !$b.isNullAt($j) && $b.getLong($j) == $yv) $j++;
         |    }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column API. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectSize(GraftShim.expression(a), GraftShim.expression(b)))
}
