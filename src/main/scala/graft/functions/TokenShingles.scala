package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT token n-gram shingle array
  * ([[graft.ops.Dedup.shingles]]' per-row kernel) in one fused pass —
  * split on single spaces, slide the n-token window, join with spaces,
  * first-occurrence dedup.
  *
  * Why (SURVEY §2.8 policy, same rationale as [[SubwordTokens]]): the
  * built-in spelling `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i+1, n))))` evaluates the lambda
  * interpreted per window, allocating a sliced array + a concat per
  * position, then pays array_distinct's pairwise scan — and the shingle
  * explode is the CPU-dense stage of the whole dedup family (jaccard,
  * containment, MinHash signatures, decontamination, the fingerprint
  * min-shingle, the streaming decontaminate twin). Here the window
  * slides over one token array with a hash-set dedup, inside
  * whole-stage codegen.
  *
  * Bit-compatibility contract (must match the HOF spelling — kept as
  * [[graft.ops.Dedup.shinglesHofCol]] — and the DuckDB oracles' range/
  * list_aggr replay; A/B-gated in TokenShinglesSpec): tokens =
  * `split(text, ' ', -1)` (consecutive/leading/trailing separators
  * yield empty tokens, kept); windows start at every position
  * 0..max(nTokens−n, 0), so a doc shorter than n yields its ONE short
  * shingle (the whole doc) rather than none — a doc must never silently
  * drop out of the dedup universe; dedup keeps FIRST occurrence order
  * (the array_distinct rule). NULL text behaves exactly like EMPTY
  * text — one empty-string shingle [""] — because the HOF's
  * `greatest(size(null)-n, 0)` null-skips to 0 and `concat_ws` over
  * the null slice lands on ""; the expression is therefore
  * non-nullable.
  */
object TokenShingles {

  /** The NULL-text result (see the class doc): same as empty text,
    * one empty-string shingle. Fresh per call.
    */
  def nullArr(): ArrayData =
    new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))

  /** Static kernel referenced from generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = toks.length
    val count = math.max(m - n, 0) + 1
    val seen = new java.util.HashSet[String](count * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, m)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) out += UTF8String.fromString(sh)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"token_shingles needs n >= 1, got $n")
    else child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_shingles requires a string input, got ${other.simpleString}")
    }

  // containsNull = true mirrors the transform/array_distinct spelling's
  // declared element nullability, so swapping kernels never changes a
  // resolved schema
  override def dataType: DataType = ArrayType(StringType)

  override def prettyName: String = "token_shingles"

  // NULL text scores like empty text (the HOF contract), so the
  // expression is non-nullable regardless of the child
  override def nullable: Boolean = false

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TokenShingles.nullArr()
    else TokenShingles.compute(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val arr = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = code"""
        ${childGen.code}
        $arr ${ev.value} = ${childGen.isNull} ?
          graft.functions.TokenShingles.nullArr() :
          graft.functions.TokenShingles.compute(${childGen.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenShingles = copy(child = newChild)
}
