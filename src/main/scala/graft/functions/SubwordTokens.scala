package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the subword pre-tokenizer
  * ([[graft.ops.Text.subwordTokenizer]]'s kernel) as one compiled
  * char-class scan — maximal ASCII letter runs, maximal ASCII digit
  * runs, single other non-whitespace glyphs.
  *
  * Why (SURVEY §2.8 policy, same rationale as [[LangTrigramScores]]):
  * the built-in spelling `regexp_extract_all(t,
  * '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)` walks the java.util.regex
  * backtracking engine per position — the pre-tokenize step under every
  * BPE/chunk/pack/token-budget gate. Here each position is classified
  * by two range checks and the runs are consumed in a tight loop.
  *
  * Bit-compatibility contract (must match the regex spelling — kept as
  * [[graft.ops.Text.subwordTokenizerHof]] — and the identical DuckDB
  * `regexp_extract_all` replay; A/B-gated in SubwordTokensSpec):
  * alternatives are disjoint, so order never matters; `\s` is Java's
  * ASCII-only class [ \t\n\x0B\f\r] (NO Unicode whitespace — NBSP is a
  * glyph token, exactly as the regex treats it); the negated class
  * matches one CODE POINT, so a supplementary char is one token, never
  * half a surrogate pair. NULL in, NULL out; empty string yields an
  * empty array.
  */
object SubwordTokens {

  private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Static kernel referenced from generated code. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (isLetter(c)) {
        val st = i
        i += 1
        while (i < n && isLetter(str.charAt(i))) i += 1
        out += UTF8String.fromString(str.substring(st, i))
      } else if (isDigit(c)) {
        val st = i
        i += 1
        while (i < n && isDigit(str.charAt(i))) i += 1
        out += UTF8String.fromString(str.substring(st, i))
      } else if (isWs(c)) {
        i += 1
      } else {
        val cc = Character.charCount(str.codePointAt(i))
        out += UTF8String.fromString(str.substring(i, i + cc))
        i += cc
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class SubwordTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_tokens requires a string input, got ${other.simpleString}")
  }

  // containsNull = true mirrors regexp_extract_all's declared element
  // nullability, so swapping kernels never changes a resolved schema
  override def dataType: DataType = ArrayType(StringType)

  override def prettyName: String = "subword_tokens"

  override protected def nullSafeEval(input: Any): Any =
    SubwordTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SubwordTokens.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SubwordTokens = copy(child = newChild)
}
