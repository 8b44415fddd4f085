package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's 60-bit md5 key
  * (`Dedup.h60`'s kernel) in one fused step — digest the input bytes and
  * read the first 15 hex digits' worth (bytes 0..6 plus the high nibble
  * of byte 7) straight into a long.
  *
  * Why (SURVEY §2.8 policy, same rationale as [[RollingFingerprint]],
  * which embeds this exact byte trick per token): the built-in spelling
  * `conv(substring(md5(c),1,15),16,10).cast("long")` pays a 32-char hex
  * ENCODE, a substring, and a radix-16 string PARSE per row on top of
  * the digest — and h60 is the seeded noise/lattice source under the
  * bootstrap, DP release, sampling, split, and waterfill operators
  * (30 call sites). Here the digest goes straight to the long, the
  * `MessageDigest` instance is thread-local instead of per-row, and the
  * whole thing is one static call inside whole-stage codegen.
  *
  * Bit-compatibility contract (must match the DuckDB oracles' replay
  * `CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT)` and the retired
  * built-in spelling [[graft.ops.Dedup.h60Hof]] exactly — A/B-gated in
  * Md5H60Spec): value = the integer named by the first 15 hex digits of
  * the md5, always in [0, 2^60). String inputs hash their UTF-8 bytes
  * (the analyzer's implicit string→binary cast, same as Spark's `md5`).
  * NULL in, NULL out.
  */
object Md5H60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel referenced from generated code. */
  def compute(bytes: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** String overload referenced from generated code: hashes the UTF-8
    * bytes, exactly what Spark's implicit string→binary cast feeds md5.
    */
  def compute(s: UTF8String): Long = compute(s.getBytes)
}

case class Md5H60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_h60 requires a string or binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_h60"

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Md5H60.compute(s)
    case b: Array[Byte] => Md5H60.compute(b)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5H60.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5H60 = copy(child = newChild)
}
