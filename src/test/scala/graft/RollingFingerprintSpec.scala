package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** The native rolling_fp expression must be bit-identical to the built-in
  * HOF spelling it replaced (two interpreted lambdas per token), which is
  * in turn what the DuckDB oracle recomputes.
  */
class RollingFingerprintSpec extends SparkSpec {

  private def hofSpelling = aggregate(
    transform(split(col("text"), " "),
      x => pmod(Dedup.h60(x), lit(1048576L))),
    lit(0L), (acc, h) => pmod(acc * 131 + h, lit(1099511627776L)))

  test("rolling_fp == the HOF spelling over the documents corpus") {
    val docs = Tables.documents(spark, sfDir)
    val diff = docs.select(
      expr("rolling_fp(text)").as("native"), hofSpelling.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff === 0L)
  }

  test("edge tokens: empty string, consecutive and trailing separators") {
    import spark.implicits._
    val edge = Seq("", " ", "a  b ", "single", "a b c")
      .toDF("text")
    val diff = edge.select(
      expr("rolling_fp(text)").as("native"), hofSpelling.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff === 0L)
  }

  test("whole-stage codegen: rolling_fp in the generated plan") {
    val p = Tables.documents(spark, sfDir)
      .select(expr("rolling_fp(text)"))
      .queryExecution.executedPlan.toString
    assert(p.contains("rolling_fp"), p.take(400))
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      p.take(400))
  }
}
