package graft

import org.apache.spark.sql.functions._
import graft.ops.Features

/** Properties of the feature ops that the SQL oracle can't check —
  * chiefly the randomized stratified split (F23): sklearn's `stratify=y`
  * contract is per-class proportion preservation, disjointness, coverage.
  */
class FeatureSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sfDir)

  test("stratifiedSplit: per-stratum test fraction ≈ testFrac") {
    val frac = 0.3
    val (train, test) = Features.stratifiedSplit(orders, "o_orderkey",
      "o_orderstatus", frac, 42L)
    val trainN = train.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val testN = test.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val labels = (trainN.keySet ++ testN.keySet)
    assert(labels.nonEmpty)
    labels.foreach { l =>
      val tr = trainN.getOrElse(l, 0L).toDouble
      val te = testN.getOrElse(l, 0L).toDouble
      val n = tr + te
      assert(n > 0, s"stratum $l empty")
      // percent_rank cut is exact to within 1 row per stratum
      val got = te / n
      assert(math.abs(got - frac) <= 1.5 / n + 1e-9,
        s"stratum $l: test fraction $got vs target $frac (n=$n)")
    }
  }

  test("stratifiedSplit: disjoint and covering") {
    val (train, test) = Features.stratifiedSplit(orders, "o_orderkey",
      "o_orderstatus", 0.3, 42L)
    val n = orders.count()
    assert(train.count() + test.count() === n)
    // key column is unique in orders, so overlap check via intersect on key
    val overlap = train.select("o_orderkey")
      .intersect(test.select("o_orderkey")).count()
    assert(overlap === 0L)
  }

  test("stratifiedSplit: deterministic under a fixed seed") {
    val (tr1, _) = Features.stratifiedSplit(orders, "o_orderkey",
      "o_orderstatus", 0.3, 7L)
    val (tr2, _) = Features.stratifiedSplit(orders, "o_orderkey",
      "o_orderstatus", 0.3, 7L)
    assert(tr1.select("o_orderkey").exceptAll(tr2.select("o_orderkey")).count() === 0L)
  }

  test("interpolate fixed points: non-null rows unchanged") {
    val ev = Tables.events(spark, sfDir)
    val masked = ev.withColumn("vm",
      when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
    val out = graft.ops.Windows.interpolate(masked, "user_id",
      Seq("ts", "event_id"), "vm")
    val broken = out.filter(col("vm").isNotNull &&
      abs(col("vm_interp") - round(col("vm"), 6)) > 1e-9).count()
    assert(broken === 0L)
  }

  test("quantileBins: equal-frequency quartiles with exact interpolated " +
    "edges on integers") {
    import spark.implicits._
    // 1..8: q25 = 2.75, q50 = 4.5, q75 = 6.25 -> bins of 2 each
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val out = Features.quantileBins(df, "v", bins = 4).collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    assert(out === Array((1, 2L, 1.0, 2.0), (2, 2L, 3.0, 4.0),
      (3, 2L, 5.0, 6.0), (4, 2L, 7.0, 8.0)))
  }

  test("targetEncodeLoo: leave-one-out excludes self, singleton falls " +
    "back to the global mean") {
    import spark.implicits._
    val d = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0)).toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(d, "cat", "y", "id").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("encoded")).toMap
    assert(out(1L) === 25.0)  // (20+30)/2
    assert(out(2L) === 20.0)  // (10+30)/2
    assert(out(3L) === 15.0)  // (10+20)/2
    assert(out(4L) === 40.0)  // singleton -> global mean (160/4)
  }

  test("quantileNormalize: every group ends with the identical rank-mean " +
    "distribution; hand-computed means") {
    import spark.implicits._
    val d = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 100.0), ("b", 5L, 400.0), ("b", 6L, 900.0))
      .toDF("g", "id", "v")
    val out = Features.quantileNormalize(d, "g", "id", "v").collect()
    val byGroup = out.groupBy(_.getString(0)).view
      .mapValues(_.map(r => (r.getAs[Int]("rank"),
        r.getAs[Double]("qnorm"))).sorted.toSeq)
    // rank means: (10+100)/2=55, (20+400)/2=210, (30+900)/2=465
    val expect = Seq((1, 55.0), (2, 210.0), (3, 465.0))
    assert(byGroup("a") === expect && byGroup("b") === expect)
  }
}
