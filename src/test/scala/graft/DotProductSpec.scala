package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** The native dot_prod expression: SQL registration, bit-identity with the
  * HOF fold it replaced in scoreLinear, float/double inputs, null and edge
  * semantics, interpreted-vs-codegen agreement.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("registered in SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT dot_prod(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head
    assert(r.getDouble(0) === 11.0)
  }

  test("bit-identical to the aggregate(zip_with(...)) fold it replaced") {
    // adversarial magnitudes: summation-order-sensitive values — the two
    // spellings must accumulate in the same sequence, hence agree exactly
    val rows = Seq(
      (Array(1e16, 1.0, -1e16, 3.5), Array(1.0, 1.0, 1.0, 1.0)),
      (Array(0.1, 0.2, 0.3), Array(-0.3, 0.2, -0.1)),
      (Array.tabulate(64)(i => math.sin(i + 1.0)),
        Array.tabulate(64)(i => math.cos(i * 2.0))))
    val df = rows.toDF("a", "b")
      .withColumn("native", expr("dot_prod(a, b)"))
      .withColumn("hof",
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
    assert(df.filter(col("native") =!= col("hof")).count() === 0L,
      "native kernel diverged from the sequential HOF fold")
  }

  test("float arrays widen to double (the embeddings path)") {
    val got = Seq((Array(1.5f, 2.0f), Array(2.0f, 0.5f))).toDF("a", "b")
      .select(expr("dot_prod(a, b)")).head.getDouble(0)
    assert(math.abs(got - 4.0) < 1e-6)
  }

  test("null array yields null; mismatched lengths use the common prefix") {
    assert(spark.sql(
      "SELECT dot_prod(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .head.isNullAt(0))
    val got = spark.sql(
      "SELECT dot_prod(array(2.0D, 3.0D, 99.0D), array(4.0D, 5.0D))")
      .head.getDouble(0)
    assert(got === 23.0)
  }

  test("null ELEMENT propagates NULL, matching the HOF fold") {
    // the fold poisons its running sum on x * NULL — the kernel must too
    val df = Seq((Array[java.lang.Double](1.0, null, 3.0),
        Array[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("a", "b")
      .withColumn("native", expr("dot_prod(a, b)"))
      .withColumn("hof",
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
    val r = df.head
    assert(r.isNullAt(r.fieldIndex("native")))
    assert(r.isNullAt(r.fieldIndex("hof")))
    // and a null element BEYOND the common prefix stays invisible
    val ok = spark.sql(
      "SELECT dot_prod(array(2.0D, 3.0D, CAST(NULL AS DOUBLE)), " +
        "array(4.0D, 5.0D)) AS d").head
    assert(ok.getDouble(0) === 23.0)
  }

  test("interpreted eval agrees with the codegen result") {
    val a = Array(0.1, -0.5, 0.9, 2.0)
    val b = Array(1.0, 0.5, -0.3, 0.7)
    val expr0 = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = expr0.eval(null).asInstanceOf[Double]
    val codegen = Seq((a, b)).toDF("a", "b")
      .select(expr("dot_prod(a, b)")).head.getDouble(0)
    assert(interpreted === codegen)
  }

  test("rejects non-array inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_prod(1.0, array(1.0D))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("dot_prod") ||
      e.getMessage.toLowerCase.contains("array"))
  }
}
