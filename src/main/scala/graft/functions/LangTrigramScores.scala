package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the four-language char-trigram profile
  * battery ([[graft.ops.Text.langScores]]' per-row kernel) in one fused
  * scan — every 3-codepoint window of the (already lowered) text probed
  * ONCE against a packed-key hash table carrying all four profile
  * membership bits.
  *
  * Why (SURVEY §2.8 policy, same rationale as [[RollingFingerprint]]):
  * the built-in spelling `aggregate(transform(sequence(...)))` evaluates
  * both lambdas interpreted per trigram position, materializes the gram
  * array, and pays four set probes + a struct allocation PER POSITION —
  * the single hottest per-row kernel in the engine (language ID, the
  * windowed language-mix monitor, and every CCNet funnel stage flow
  * through it). Here the whole battery is one static Java call inside
  * whole-stage codegen: no gram array, no per-gram structs, one
  * open-addressed table probe per window (keys pack the 3 BMP chars into
  * a long, so the common case allocates nothing).
  *
  * Bit-compatibility contract (must match the DuckDB oracle AND the HOF
  * spelling [[graft.ops.Text.langScoresHof]] exactly — A/B-gated in
  * TextSpec): input is the LOWERED text (callers wrap Spark's own
  * `Lower`, so locale/ICU lowering semantics are Spark's, not ours);
  * score_L = count of positions i in 1..numChars-2 whose 3-codepoint
  * substring is in profile L. Texts of fewer than 3 codepoints score 0
  * everywhere (the HOF's single short junk gram matches no 3-char
  * profile). A window containing a supplementary (non-BMP) codepoint
  * spans more than 3 UTF-16 chars and is skipped — it can never equal a
  * 3-BMP-char profile entry. NULL text scores (0,0,0,0) — NOT null —
  * because the HOF's `greatest(length(null)-2, 1)` null-skips to 1, its
  * single null gram `isin`-matches nothing, and the fold lands on the
  * zero seed; the expression is therefore non-nullable.
  */
object LangTrigramScores {

  /** Char-trigram language profiles — the fastText/langdetect family's
    * signal reduced to its deterministic core: the most frequent
    * character trigrams (spaces included, so function words like "the"
    * anchor as " th"/"he ") of each supported language, curated from
    * public frequency knowledge and validated on Text.langIdFixture
    * (50/50 in TextSpec). Kept as plain literals so the DuckDB oracle
    * embeds the identical lists ([[graft.ops.Text.triEn]] re-exports).
    */
  val triEn: Seq[String] = Seq(" th", "the", "he ", "and", "nd ", " an",
    "ing", "ng ", " of", "of ", " to", "to ", " in", "is ", " is",
    "ed ", " be", "at ", "er ", "hat", "ere", " ha", " wa", "ght", "ith")
  val triDe: Seq[String] = Seq("der", "die", "und", " un", "ein", " ei",
    "ich", "sch", " sc", "ch ", "cht", "ht ", "ung", "gen", " ge",
    "das", " da", "ist", "zu ", " zu", "den", "ten", "ie ", "em ",
    "auf", " ko", "ben")
  val triEs: Seq[String] = Seq(" de", "de ", "la ", " la", "el ", " el",
    "os ", "que", " qu", "ue ", "ión", "ón ", "ado", "ar ", "as ",
    "los", " lo", "una", "sta", "año", "nte", "ien", " co", "con",
    "an ", "ndo", "ia ", "bre", "stá", "ás ", "ca ")
  val triFr: Seq[String] = Seq(" de", "de ", "le ", " le", "la ", " la",
    "les", "ais", "ait", "our", "ur ", " po", "que", " qu", "ue ",
    "eur", "une", " au", "aux", "oir", "ont", " so", "ans", " pa",
    "eau", "ée ", "ées", " ce", "tte", "ès ")

  // Open-addressed long->int table: key = the window's 3 BMP chars
  // packed 16 bits each (48 bits used), value = profile membership bits
  // (1 en | 2 de | 4 es | 8 fr). ~113 distinct keys in 512 slots (load
  // 0.22); empty slot <=> flags 0, valid because every inserted entry
  // has a nonzero flag.
  private val SIZE = 512
  private val MASK = SIZE - 1
  private val tKeys = new Array[Long](SIZE)
  private val tFlags = new Array[Int](SIZE)

  private def pack3(g: String): Long = {
    require(g.length == 3, s"profile entry '$g' must be 3 BMP chars")
    (g.charAt(0).toLong << 32) | (g.charAt(1).toLong << 16) |
      g.charAt(2).toLong
  }

  private def slot(key: Long): Int =
    (((key * 0x9E3779B97F4A7C15L) >>> 55).toInt) & MASK

  private def insert(key: Long, flag: Int): Unit = {
    var idx = slot(key)
    while (tFlags(idx) != 0 && tKeys(idx) != key) idx = (idx + 1) & MASK
    tKeys(idx) = key
    tFlags(idx) |= flag
  }

  Seq(triEn -> 1, triDe -> 2, triEs -> 4, triFr -> 8).foreach {
    case (profile, flag) => profile.foreach(g => insert(pack3(g), flag))
  }

  private def lookup(key: Long): Int = {
    var idx = slot(key)
    var f = tFlags(idx)
    while (f != 0 && tKeys(idx) != key) {
      idx = (idx + 1) & MASK
      f = tFlags(idx)
    }
    f
  }

  val scoreSchema: StructType = StructType(Seq(
    StructField("en", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false)))

  /** The NULL-text result (see the class doc: the HOF scores null text
    * all-zero, so the kernel must too). Fresh row per call — consumers
    * may hold references across rows.
    */
  def zeroRow(): InternalRow =
    new GenericInternalRow(Array[Any](0, 0, 0, 0))

  /** Static kernel referenced from generated code. `tl` must already be
    * lowered (the expression wraps Spark's `Lower` around its child).
    */
  def compute(tl: UTF8String): InternalRow = {
    val s = tl.toString
    val n = s.length
    var en = 0; var de = 0; var es = 0; var fr = 0
    if (n >= 3) {
      // rolling codepoint-start indices: window k spans chars [a, d)
      // over codepoints (k, k+1, k+2); d - a == 3 <=> all three BMP
      var a = 0
      var b = Character.charCount(s.codePointAt(0))
      if (b < n) {
        var c = b + Character.charCount(s.codePointAt(b))
        if (c < n) {
          var d = c + Character.charCount(s.codePointAt(c))
          var cont = true
          while (cont) {
            if (d - a == 3) {
              val key = (s.charAt(a).toLong << 32) |
                (s.charAt(a + 1).toLong << 16) | s.charAt(a + 2).toLong
              val f = lookup(key)
              if (f != 0) {
                en += f & 1
                de += (f >> 1) & 1
                es += (f >> 2) & 1
                fr += (f >> 3) & 1
              }
            }
            if (d >= n) cont = false
            else {
              a = b; b = c; c = d
              d += Character.charCount(s.codePointAt(d))
            }
          }
        }
      }
    }
    new GenericInternalRow(Array[Any](en, de, es, fr))
  }
}

case class LangTrigramScores(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_scores requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LangTrigramScores.scoreSchema

  override def prettyName: String = "lang_scores"

  // NULL text scores all-zero (the HOF contract), so the battery is
  // non-nullable regardless of the child
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LangTrigramScores.zeroRow()
    else LangTrigramScores.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val row = "org.apache.spark.sql.catalyst.InternalRow"
    ev.copy(
      code = code"""
        ${childGen.code}
        $row ${ev.value} = ${childGen.isNull} ?
          graft.functions.LangTrigramScores.zeroRow() :
          graft.functions.LangTrigramScores.compute(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LangTrigramScores = copy(child = newChild)
}
