package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** The native lang_scores expression must be bit-identical to the HOF
  * spelling it replaced (the one-pass `aggregate` fold over the trigram
  * array), which is in turn what the DuckDB oracles recompute from the
  * embedded profile lists.
  */
class LangTrigramScoresSpec extends SparkSpec {

  private def bothAgree(df: org.apache.spark.sql.DataFrame): Unit = {
    val cmp = df.select(
      Text.langScores(col("text")).as("native"),
      Text.langScoresHof(col("text")).as("hof"))
    val diff = cmp.filter(
      not(col("native") <=> col("hof"))).count()
    assert(diff === 0L, cmp.limit(5).collect().mkString("; "))
  }

  test("lang_scores == the HOF spelling over the documents corpus") {
    bothAgree(Tables.documents(spark, sfDir).select("text"))
  }

  test("lang_scores == the HOF spelling on the labeled fixture") {
    import spark.implicits._
    bothAgree(Text.langIdFixture.toDF("id", "lang", "text").select("text"))
  }

  test("edge battery: null, short, CJK, supplementary, case, accents") {
    import spark.implicits._
    val edge = Seq(
      null.asInstanceOf[String], "", "a", "ab", "abc", " th", "THE",
      "The QUICK Brown FOX and the lazy dog", "der schnelle fuchs",
      "la empresa anunció que las ganancias", "éèà",
      "中文文本的三字组",
      // supplementary (non-BMP) codepoints interleaved with hits
      "😀😀😀", "a😀bc the end",
      " th😀e ", "ing ng  of of ",
      "tabs\tand\nnewlines the of and", "   ", "İstanbul Iı")
      .toDF("text")
    bothAgree(edge)
  }

  test("whole-stage codegen: lang_scores in the generated plan") {
    val p = Tables.documents(spark, sfDir)
      .select(Text.langScores(col("text")))
      .queryExecution.executedPlan.toString
    assert(p.contains("lang_scores"), p.take(400))
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      p.take(400))
  }

  test("SQL registration: lang_scores callable through expr()") {
    import spark.implicits._
    val r = Seq("the quick brown fox and the lazy dog")
      .toDF("text")
      .selectExpr("lang_scores(text) AS s")
      .select(col("s")("en").as("en"), col("s")("de").as("de"))
      .head()
    assert(r.getInt(0) > 0)
    assert(r.getInt(0) > r.getInt(1))
  }
}
