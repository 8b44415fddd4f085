package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** The native cosine_sim expression: SQL registration via GraftExtensions,
  * codegen and interpreted paths agreeing, float/double inputs, null and
  * edge-case semantics.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("registered in SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("orthogonal, opposite, identical vectors") {
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, 2.0), Array(-1.0, -2.0), -1.0),
      (Array(3.0, 4.0), Array(3.0, 4.0), 1.0)
    ).toDF("a", "b", "want")
    val bad = df.withColumn("got", expr("cosine_sim(a, b)"))
      .filter(abs(col("got") - col("want")) > 1e-12).count()
    assert(bad === 0L)
  }

  test("float arrays widen to double (the embeddings path)") {
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-7)
  }

  test("null array yields null; scale invariance holds") {
    val got = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))").head
    assert(got.isNullAt(0))
    val df = Seq((Array(0.3, -0.7, 2.0), Array(1.1, 0.4, -0.2))).toDF("a", "b")
    val c1 = df.select(expr("cosine_sim(a, b)")).head.getDouble(0)
    val c2 = df.select(expr(
      "cosine_sim(transform(a, x -> x * 17.0), b)")).head.getDouble(0)
    assert(math.abs(c1 - c2) < 1e-12)
  }

  test("interpreted eval agrees with the codegen result") {
    val a = Array(0.1, -0.5, 0.9, 2.0)
    val b = Array(1.0, 0.5, -0.3, 0.7)
    // interpreted: call nullSafeEval through the expression's eval on a row
    val expr0 = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = expr0.eval(null).asInstanceOf[Double]
    val codegen = Seq((a, b)).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).head.getDouble(0)
    assert(interpreted === codegen)
  }

  test("rejects non-array inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(1.0, array(1.0D))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("array"))
  }
}
