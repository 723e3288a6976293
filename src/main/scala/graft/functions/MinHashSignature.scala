package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature: all `numHashes` minima of
  * `(a_i * x + b_i) mod P` over an ARRAY<LONG> of shingle hashes in one
  * fused pass.
  *
  * The composed form — `numHashes` separate
  * `array_min(transform(hs, x => (a*x+b) % P))` columns — walks the array
  * once per hash function through interpreted lambda eval; this kernel is
  * one JIT'd loop (elements outer, hash functions inner) inside
  * whole-stage codegen. The coefficient schedule is identical to
  * [[graft.pipeline.Dedup.minhashLshPairs]]'s documented one, so
  * signatures (hence LSH candidates) are bit-identical to the HOF form.
  *
  * An empty input array yields a signature of Long.MaxValue sentinels
  * (the fold identity); NULL input or a NULL element yields NULL, matching
  * `transform`/`array_min` null propagation.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val (as, bs) = MinHashSignature.coefficients(numHashes)
    var j = 0
    while (j < n) {
      if (hs.isNullAt(j)) return null
      val x = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = (as(i) * x + bs(i)) % MinHashSignature.P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (as, bs) = MinHashSignature.coefficients(numHashes)
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $hs.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($hs.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final long $x = $hs.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    final long $v = ($aRef[$i] * $x + $bRef[$i]) % ${MinHashSignature.P}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** 2^31-1: (a*x+b) stays under 2^62 for 31-bit inputs — no overflow. */
  val P = 2147483647L

  /** Deterministic coefficient schedule (public splitmix-style constants);
    * MUST stay in lockstep with the documented schedule in
    * [[graft.pipeline.Dedup.minhashLshPairs]].
    */
  def coefficients(numHashes: Int): (Array[Long], Array[Long]) = {
    val as = Array.tabulate(numHashes)(i => 1L + ((i * 2654435761L + 104729L) % (P - 1)))
    val bs = Array.tabulate(numHashes)(i => (i * 40503L + 15485863L) % P)
    (as, bs)
  }

  /** Column API. */
  def apply(hs: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSignature(GraftShim.expression(hs), numHashes))
}
