package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused token statistics for [[graft.pipeline.TextAnalysis.tokenStats]]:
  * one UTF-8 byte walk computes
  *
  *  - `n_tokens` = `regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")`
  *    (the BPE-ish TokenPattern: maximal ASCII letter runs, maximal ASCII
  *    digit runs, every other non-whitespace CODE POINT singly), and
  *  - `n_nonws` = `length(regexp_replace(text, "\s+", ""))` (code points
  *    not in Java's `\s` = `[ \t\n\x0B\f\r]` — ASCII-only, exactly the
  *    class both regex forms use),
  *
  *  - `n_words` = `size(split(text, "\s+"))` (Java split semantics at
  *    limit -1: number of maximal `\s+` runs + 1, leading/trailing
  *    empties included — lowercasing never changes whitespace, so this
  *    also equals `size(words(text))`),
  *
  * replacing three `java.util.regex` passes (one of which allocates the
  * whitespace-stripped copy of every document, another the full word
  * array used only for its length) with one branchy loop over
  * the raw UTF-8 bytes — no decode, no allocation. Multi-byte sequences
  * are one code point: one `[^…]` token each, matching Java regex
  * code-point semantics (a supplementary character is ONE token, and
  * non-ASCII whitespace like U+00A0 is NOT `\s`, so it counts — same as
  * the regex forms). FunctionsSpec pins both counts against the regex
  * composition on the real corpus plus adversarial edge strings.
  *
  * NULL text → NULL; empty → (0, 0).
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_counts expects STRING, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_nonws", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "token_counts"

  /** `[n_tokens, n_nonws, n_words]` — full longs from one call (r18: the
    * r17 form packed three 21-bit fields into one long and THREW on a
    * ≥2M-count document; the regex composition it replaced handled any
    * size, so the pack was a behavioral regression for one oversized doc).
    */
  def counts(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var tokens = 0L
    var nonws = 0L
    var wsRuns = 0L
    while (i < n) {
      val b = bytes(i)
      if (b >= 0) { // ASCII
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          tokens += 1; nonws += 1; i += 1
          while (i < n && {
            val d = bytes(i); (d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z')
          }) { nonws += 1; i += 1 }
        } else if (b >= '0' && b <= '9') {
          tokens += 1; nonws += 1; i += 1
          while (i < n && bytes(i) >= '0' && bytes(i) <= '9') { nonws += 1; i += 1 }
        } else if (TokenCounts.isWs(b)) {
          wsRuns += 1; i += 1
          while (i < n && TokenCounts.isWs(bytes(i))) i += 1
        } else { tokens += 1; nonws += 1; i += 1 }
      } else {
        // multi-byte UTF-8 sequence = one non-ASCII code point = one
        // [^A-Za-z0-9\s] token (Java regex classes match code points)
        tokens += 1; nonws += 1; i += 1
        while (i < n && (bytes(i) & 0xC0) == 0x80) i += 1
      }
    }
    Array(tokens, nonws, wsRuns + 1)
  }

  override def nullSafeEval(input: Any): Any = {
    val c = counts(input.asInstanceOf[UTF8String])
    new GenericInternalRow(Array[Any](c(0), c(1), c(2))): InternalRow
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCounts", this, classOf[TokenCounts].getName)
    nullSafeCodeGen(ctx, ev, s => {
      val c = ctx.freshName("counts")
      s"""
         |final long[] $c = $ref.counts($s);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $c[0], $c[1], $c[2] });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCounts {
  /** Java `\s` — ASCII-only: space, tab, LF, VT, FF, CR. */
  @inline def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Column API. */
  def apply(text: Column): Column =
    GraftShim.column(TokenCounts(GraftShim.expression(text)))
}
