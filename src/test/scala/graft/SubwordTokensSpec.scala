package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** The native subword_tokens expression must be bit-identical to the
  * regex spelling it replaced (`regexp_extract_all` over
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`), which is in turn what the DuckDB
  * oracles replay for every subword-unit gate.
  */
class SubwordTokensSpec extends SparkSpec {

  private def bothAgree(df: org.apache.spark.sql.DataFrame): Unit = {
    val diff = df.select(
      Text.subwordTokenizer(col("text")).as("native"),
      Text.subwordTokenizerHof(col("text")).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(diff === 0L)
  }

  test("subword_tokens == the regex spelling over the documents corpus") {
    bothAgree(Tables.documents(spark, sfDir).select("text"))
  }

  test("edge battery: null, empty, runs, glyphs, unicode, whitespace") {
    import spark.implicits._
    bothAgree(Seq(
      null.asInstanceOf[String], "", " ", "abc", "abc123", "abc 123",
      "a1b2c3", "hello, world! v2.0", "über café niño",   // accents split
      "中文 text 😀 mix", "a\tb\ncd\fe\rf",
      "  double  spaces  ", "!!!", "non breaking",   // NBSP = glyph
      "trailing space ", "100,000.50", "snake_case-kebab")
      .toDF("text"))
  }

  test("semantics: runs split at class boundaries, NBSP is a token") {
    import spark.implicits._
    val toks = Seq("ab12!x y").toDF("text")
      .select(Text.subwordTokenizer(col("text")).as("t"))
      .head().getSeq[String](0)
    assert(toks === Seq("ab", "12", "!", "x", " ", "y"))
  }

  test("whole-stage codegen: subword_tokens in the generated plan") {
    val p = Tables.documents(spark, sfDir)
      .select(Text.subwordTokenizer(col("text")))
      .queryExecution.executedPlan.toString
    assert(p.contains("subword_tokens"), p.take(400))
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      p.take(400))
  }
}
