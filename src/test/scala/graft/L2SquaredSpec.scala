package graft

import org.apache.spark.sql.functions._

/** The native l2_sq expression: SQL registration, bit-identity with the
  * HOF fold it replaced in the PQ kernels, float/double inputs, null and
  * edge semantics, and the dyadic-lattice exactness the PQ oracle's
  * dot-product spelling relies on.
  */
class L2SquaredSpec extends SparkSpec {
  import spark.implicits._

  test("registered in SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT l2_sq(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d").head
    assert(r.getDouble(0) === 25.0)
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
      .withColumn("native", expr("l2_sq(a, b)"))
      .withColumn("hof",
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, t) => acc + t))
    assert(df.filter(col("native") =!= col("hof")).count() === 0L,
      "native kernel diverged from the sequential HOF fold")
  }

  test("dyadic-lattice exactness: fold equals the dot-product spelling " +
    "the DuckDB oracle uses, bit for bit") {
    // values on the 2^-10 grid (the PQ pipeline's lattice): every term
    // and partial sum is exact, so Σ(a-b)² == a·a − 2·a·b + b·b exactly
    val a = Array.tabulate(16)(i => math.floor(math.sin(i) * 1024) / 1024)
    val b = Array.tabulate(16)(i => math.floor(math.cos(i) * 1024) / 1024)
    val df = Seq((a, b)).toDF("a", "b")
      .withColumn("fold", expr("l2_sq(a, b)"))
      .withColumn("dots", expr(
        "dot_prod(a, a) - 2 * dot_prod(a, b) + dot_prod(b, b)"))
    val r = df.head
    assert(r.getAs[Double]("fold") === r.getAs[Double]("dots"))
  }

  test("float arrays widen to double (the embeddings path)") {
    val got = Seq((Array(1.5f, 2.0f), Array(2.0f, 0.5f))).toDF("a", "b")
      .select(expr("l2_sq(a, b)")).head.getDouble(0)
    assert(math.abs(got - 2.5) < 1e-6)
  }

  test("null array yields null; mismatched lengths use the common " +
    "prefix; null ELEMENT propagates NULL") {
    assert(spark.sql(
      "SELECT l2_sq(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .head.isNullAt(0))
    val got = spark.sql(
      "SELECT l2_sq(array(2.0D, 3.0D, 99.0D), array(4.0D, 5.0D))")
      .head.getDouble(0)
    assert(got === 8.0)
    val withNull = Seq((Array[java.lang.Double](1.0, null, 3.0),
        Array[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("a", "b")
      .withColumn("native", expr("l2_sq(a, b)"))
    assert(withNull.head.isNullAt(2))
  }
}
