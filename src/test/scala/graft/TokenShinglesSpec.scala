package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import graft.ops.Dedup

/** The native token_shingles expression must be bit-identical to the HOF
  * spelling it replaced (array_distinct over the transform/slice/
  * concat_ws window), which is in turn what the DuckDB oracles replay
  * for every shingle-family gate.
  */
class TokenShinglesSpec extends SparkSpec {

  private def native(t: org.apache.spark.sql.Column, n: Int) =
    ColumnBridge.column(graft.functions.TokenShingles(
      ColumnBridge.expression(t), n))

  private def bothAgree(df: org.apache.spark.sql.DataFrame,
                        n: Int): Unit = {
    val bad = df.select(col("text"), native(col("text"), n).as("a"),
      Dedup.shinglesHofCol(col("text"), n).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(bad.count() === 0L, bad.collect().take(3).mkString("; "))
  }

  test("token_shingles == the HOF spelling over the corpus, n=3 and n=8") {
    val docs = Tables.documents(spark, sfDir).select("text")
    bothAgree(docs, 3)
    bothAgree(docs, 8)
  }

  test("edge battery: null, empty, separators, short docs, repeats") {
    import spark.implicits._
    val edge = Seq(
      null.asInstanceOf[String], "", " ", "  ", "one", "one two",
      "one two three", "a a a a a", "a b a b a b",
      "x  y", " lead", "trail ", "a b c d e f g h i j")
      .toDF("text")
    bothAgree(edge, 3)
    bothAgree(edge, 1)
  }

  test("semantics: short doc yields its one whole-doc shingle; dedup " +
    "keeps first occurrence") {
    import spark.implicits._
    val one = Seq("one two").toDF("text")
      .select(native(col("text"), 3).as("s")).head().getSeq[String](0)
    assert(one === Seq("one two"))
    val rep = Seq("a b a b a").toDF("text")
      .select(native(col("text"), 2).as("s")).head().getSeq[String](0)
    assert(rep === Seq("a b", "b a"))
  }

  test("whole-stage codegen: token_shingles in the generated plan") {
    val p = Tables.documents(spark, sfDir)
      .select(native(col("text"), 3))
      .queryExecution.executedPlan.toString
    assert(p.contains("token_shingles"), p.take(400))
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      p.take(400))
  }
}
