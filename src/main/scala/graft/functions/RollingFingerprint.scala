package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the document rolling fingerprint
  * (Text.fingerprints' per-row kernel) in one fused pass — tokenize, md5
  * per token, 20-bit reduce, polynomial fold mod 2^40.
  *
  * Why (SURVEY §2.8 policy, same rationale as [[CosineSimilarity]]): the
  * built-in spelling `aggregate(transform(split(...)))` evaluates BOTH
  * lambdas interpreted per token, allocating a hash-column array per row.
  * Here the whole chain is one static Java call inside whole-stage
  * codegen.
  *
  * Bit-compatibility contract (must match the DuckDB oracle AND the HOF
  * spelling exactly, token by token):
  * `fold((acc,t) -> (acc*131 + (int('0x'+md5(t)[:15]) % 2^20)) % 2^40, 0)`
  * over `split(text, ' ', -1)` — consecutive/trailing separators yield
  * empty tokens, which hash like any other (Spark `split` keeps them).
  */
object RollingFingerprint {
  private val TOK_MOD = 1048576L        // 2^20
  private val FP_MOD = 1099511627776L   // 2^40

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel referenced from generated code. */
  def compute(s: UTF8String): Long = {
    val md = mdLocal.get()
    var acc = 0L
    s.toString.split(" ", -1).foreach { t =>
      md.reset()
      val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      acc = (acc * 131L + h % TOK_MOD) % FP_MOD
    }
    acc
  }
}

case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_fp"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingFingerprint.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprint = copy(child = newChild)
}
