package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Codegen'd k-means assignment: `struct(d, c)` — the squared-L2 distance to
  * the nearest of a fixed centroid matrix and that centroid's index — in ONE
  * fused JIT'd pass, replacing the interpreted
  * `array_min(array(struct(aggregate(zip_with(...)))))` composition that
  * evaluated k per-element HOF folds per row (the r4-flagged hot spot of
  * `q_pl_kmeans` / `q_ann_ivf_km`).
  *
  * Bit-identical to the HOF form by construction: the accumulation is
  * elements-outer / centroids-inner, so each centroid's distance is the same
  * left-to-right fold `((0 + d_0) + d_1) + …` the `aggregate` HOF computes,
  * and ties take the LOWEST centroid index exactly like the struct-min over
  * `(d, c)` pairs (FunctionsSpec pins the equivalence; the DuckDB kmeans
  * oracles replay the identical fold).
  *
  * A NULL array, a NULL element, or a length/dim mismatch yields NULL
  * (inputs are non-null fixed-dim vectors by contract; the HOF form's
  * `zip_with` null-pads a length mismatch into NULL distances, and a
  * struct-min over NULL distances is engine-defined — NULL is the honest
  * answer).
  */
case class KMeansAssign(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.forall(_.length == centroids.head.length),
    "centroids must share one dimensionality")

  private def dim: Int = centroids.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kmeans_assign expects ARRAY<DOUBLE>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "kmeans_assign"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dim) return null
    val k = centroids.length
    val accs = new Array[Double](k)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      var j = 0
      while (j < k) {
        val d = x - centroids(j)(i)
        accs(j) += d * d
        j += 1
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < k) {
      if (accs(j) < accs(best)) best = j
      j += 1
    }
    new GenericInternalRow(Array[Any](accs(best), best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val accs = ctx.freshName("accs")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      s"""
         |final int $n = $v.numElements();
         |final int $k = $cents.length;
         |if ($n != $cents[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $accs = new double[$k];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $v.getDouble($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final double $d = $x - $cents[$j][$i];
         |      $accs[$j] += $d * $d;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    int $best = 0;
         |    for (int $j = 1; $j < $k; $j++) {
         |      if ($accs[$j] < $accs[$best]) $best = $j;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{ java.lang.Double.valueOf($accs[$best]), java.lang.Integer.valueOf($best) });
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KMeansAssign {
  /** Column API: `struct(d, c)` argmin of `v` over the centroid matrix. */
  def apply(v: Column, centroids: Array[Seq[Double]]): Column =
    GraftShim.column(KMeansAssign(GraftShim.expression(v), centroids.map(_.toArray)))
}
