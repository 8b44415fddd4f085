package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** The native md5_h60 expression must be bit-identical to the built-in
  * spelling it replaced (`conv(substring(md5(c),1,15),16,10)`), which is
  * in turn what every DuckDB oracle replays for the seeded lattice.
  */
class Md5H60Spec extends SparkSpec {

  private def bothAgree(df: org.apache.spark.sql.DataFrame): Unit = {
    val diff = df.select(
      Dedup.h60(col("k")).as("native"),
      Dedup.h60Hof(col("k")).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(diff === 0L)
  }

  test("md5_h60 == the conv/substring/md5 spelling over the corpus") {
    bothAgree(Tables.documents(spark, sfDir)
      .select(concat(lit("seed_"), col("doc_id").cast("string"),
        lit("_"), coalesce(col("text"), lit(""))).as("k")))
  }

  test("edge keys: null, empty, unicode, long") {
    import spark.implicits._
    bothAgree(Seq(null.asInstanceOf[String], "", "a", "ü ión 中文 😀",
      "x" * 10000, "seed_1_2", "0", " ").toDF("k"))
  }

  test("binary input hashes the same bytes as the string cast") {
    import spark.implicits._
    val df = Seq("abc", "ü 中", "").toDF("k")
    val diff = df.select(
      Dedup.h60(col("k").cast("binary")).as("native"),
      Dedup.h60Hof(col("k")).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(diff === 0L)
  }

  test("range: always in [0, 2^60)") {
    val bad = Tables.documents(spark, sfDir)
      .select(Dedup.h60(col("text")).as("h"))
      .filter(col("h") < 0L || col("h") >= lit(1152921504606846976L))
      .count()
    assert(bad === 0L)
  }

  test("whole-stage codegen: md5_h60 in the generated plan") {
    val p = Tables.documents(spark, sfDir)
      .select(Dedup.h60(col("text")))
      .queryExecution.executedPlan.toString
    assert(p.contains("md5_h60"), p.take(400))
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      p.take(400))
  }
}
