package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift

/** Hand-computed properties of the distribution-drift operators the SQL
  * oracle doesn't show: KS closed forms, PSI identity/shift direction,
  * outlier clamping.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("ksDrift: hand-computed D and argmin attaining value, exact ties") {
    val a = Seq(1.0, 2.0, 3.0).toDF("x")
    val b = Seq(3.0, 4.0).toDF("x")
    val r = Drift.ksDrift(a, b, "x").head
    // ECDFs at pooled values 1,2,3,4: a = 1/3, 2/3, 1, 1; b = 0, 0, .5, 1
    assert(math.abs(r.getAs[Double]("ks_d") - 2.0 / 3) < 1e-6) // 6-dec round
    assert(r.getAs[Double]("at_value") === 2.0)
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    // identical samples: D = 0
    val z = Drift.ksDrift(a, a, "x").head
    assert(z.getAs[Double]("ks_d") === 0.0)
  }

  test("psiDrift: zero on identical samples, grows with shift, clamps " +
    "outliers into the edge bins") {
    val a = Seq.tabulate(100)(i => i / 10.0).toDF("x") // uniform [0, 10)
    val same = Drift.psiDrift(a, a, "x", 0.0, 10.0, 5).collect()
    assert(same.length === 5)
    assert(same.forall(_.getAs[Double]("psi") === 0.0))
    assert(same.forall(_.getAs[Double]("contrib") === 0.0))
    // shifted: all of b in the top half
    val b = Seq.tabulate(100)(i => 5.0 + i / 20.0).toDF("x")
    val shifted = Drift.psiDrift(a, b, "x", 0.0, 10.0, 5).collect()
    assert(shifted.head.getAs[Double]("psi") > 0.5,
      "a wholesale shift must register as major drift (PSI >> 0.25)")
    // outliers beyond [lo, hi) land in the edge bins, never a new bin
    val out = Drift.psiDrift(
      Seq(-5.0, 20.0).toDF("x"), Seq(1.0).toDF("x"), "x", 0.0, 10.0, 5)
      .collect()
    assert(out.length === 5)
    assert(out.map(r => r.getAs[Long]("c_a")).sum === 2L)
    assert(out.head.getAs[Long]("c_a") === 1L, "low outlier clamps to bin 0")
    assert(out.last.getAs[Long]("c_a") === 1L, "high outlier clamps to top")
  }

  test("psiDrift: NULL measures excluded, garbage extremes clamp " +
    "without an ANSI cast overflow") {
    val a = Seq[Option[Double]](Some(1.0), None, Some(1e18), Some(-1e18))
      .toDF("x")
    val b = Seq(5.0).toDF("x")
    val rows = Drift.psiDrift(a, b, "x", 0.0, 10.0, 5).collect() // no throw
    assert(rows.map(_.getAs[Long]("c_a")).sum === 3L,
      "the NULL measure must not be counted in any bin")
    assert(rows.head.getAs[Long]("c_a") === 2L, "-1e18 and 1.0 in bin 0")
    assert(rows.last.getAs[Long]("c_a") === 1L, "1e18 clamps to the top bin")
  }

  test("psi contributions reconcile: psi equals the sum of per-bin " +
    "contributions") {
    val ev = Tables.events(spark, sfDir)
    val rows = Drift.psiDrift(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      "value", 0.0, 500.0, 10).collect()
    val s = rows.map(_.getAs[Double]("contrib")).sum
    assert(math.abs(rows.head.getAs[Double]("psi") - s) < 1e-5)
  }

  test("embeddingDimStats: per-dimension stats are exact on a hand frame " +
    "and flag a dead (all-zero) dimension") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, -2.0f)),
      (2L, Array(3.0f, 0.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val out = Drift.embeddingDimStats(emb, "embedding").collect()
    assert(out.map(_.getAs[Long]("dim")).toSeq === Seq(1L, 2L, 3L))
    val d1 = out(0); val dead = out(1)
    assert(d1.getAs[Double]("mean_x") === 2.0 &&
      d1.getAs[Double]("min_x") === 1.0 && d1.getAs[Double]("max_x") === 3.0)
    // the dead dimension: zero mean AND zero spread
    assert(dead.getAs[Double]("mean_x") === 0.0 &&
      dead.getAs[Double]("std_x") === 0.0 &&
      dead.getAs[Double]("min_x") === 0.0 &&
      dead.getAs[Double]("max_x") === 0.0)
  }

  test("cusumChangepoint: mean shift peaks at the shift day; constant " +
    "series -> NULL score") {
    import spark.implicits._
    // key a: 0,0,0,10,10,10 -> |S| peaks at 15 on day 3;
    // sd = sqrt(30), score = 15 / (sqrt(30) * sqrt(6))
    val rows = Seq(("a", 1, 0.0), ("a", 2, 0.0), ("a", 3, 0.0),
      ("a", 4, 10.0), ("a", 5, 10.0), ("a", 6, 10.0),
      ("b", 1, 5.0), ("b", 2, 5.0), ("b", 3, 5.0))
    val out = Drift.cusumChangepoint(rows.toDF("k", "d", "v"),
      "k", "d", "v").collect()
    val a = out.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("n_obs") === 6L)
    assert(math.abs(a.getAs[Double]("cusum_score")
      - 15.0 / (math.sqrt(30.0) * math.sqrt(6.0))) < 1e-6)
    assert(a.getAs[Int]("change_at") === 3)
    val b = out.find(_.getString(0) == "b").get
    assert(b.isNullAt(b.fieldIndex("cusum_score")))
  }

  test("pettittChangepoint: a clean level shift maximizes |U| exactly " +
    "at the boundary with the closed-form rank value and p-value; " +
    "segment means recover the two levels") {
    import spark.implicits._
    // 10 days at 1.0 then 10 at 5.0: midranks 5.5 / 15.5, so
    // U_t = -10t up to the shift (peak |U| = 100 at t = 10) and
    // 10t - 200 after — the textbook Pettitt ladder
    val rows = (1 to 20).map(i => ("a", i, if (i <= 10) 1.0 else 5.0))
    val r = Drift.pettittChangepoint(rows.toDF("k", "d", "v"),
      "k", "d", "v").head
    assert(r.getAs[Long]("n_obs") === 20L)
    assert(r.getAs[Int]("change_at") === 10)
    assert(r.getAs[Long]("u_max") === -100L,
      "upward shift gives the negative-signed pair statistic")
    val pExp = math.min(1.0,
      2.0 * math.exp(-6.0 * 100.0 * 100.0 / (8000.0 + 400.0)))
    assert(math.abs(r.getAs[Double]("p_value") - pExp) < 1e-6)
    assert(r.getAs[Double]("mean_before") === 1.0)
    assert(r.getAs[Double]("mean_after") === 5.0)
    assert(r.getAs[Double]("p_value") < 0.01, "the shift is significant")
  }

  test("mmdDrift: hand-computed mean-embedding distance; identical " +
    "snapshots score exactly 0; off-grid values floor to the lattice") {
    import spark.implicits._
    // A means (0.5, 0.5), B means (1, 1) → MMD² = 0.25 + 0.25 = 0.5
    val a = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)).toDF("embedding")
    val b = Seq(Seq(1.0f, 1.0f)).toDF("embedding")
    val out = Drift.mmdDrift(a, b, "embedding").collect()
    assert(out.map(r => (r.getAs[Int]("dim"),
      r.getAs[Double]("mean_a"), r.getAs[Double]("mean_b"),
      r.getAs[Double]("mean_gap"), r.getAs[Double]("mmd2"))).toSeq ===
      Seq((0, 0.5, 1.0, -0.5, 0.5), (1, 0.5, 1.0, -0.5, 0.5)))
    assert(Drift.mmdDrift(a, a, "embedding").collect()
      .forall(_.getAs[Double]("mmd2") === 0.0))
    // 0.3 is not dyadic: both sides floor to 307/1024 = 0.299805
    val c = Seq(Seq(0.3f)).toDF("embedding")
    val rc = Drift.mmdDrift(c, c, "embedding").collect().head
    assert(rc.getAs[Double]("mean_a") === 0.299805)
    assert(rc.getAs[Double]("mmd2") === 0.0)
  }

  test("pageHinkley: a clean level shift fires at the hand-computed " +
    "first λ-crossing; a flat series never alarms") {
    import spark.implicits._
    val ser = (1 to 4).map(t => ("k", t, 0.0)) ++
      (5 to 8).map(t => ("k", t, 10.0)) ++
      (1 to 8).map(t => ("flat", t, 7.0))
    val out = Drift.pageHinkley(ser.toDF("key", "t", "v"), "key", "t",
      "v", delta = 0.05, lambda = 3.0).collect()
    val flat = out(0)
    assert(flat.getAs[String]("key") === "flat")
    assert(!flat.getAs[Boolean]("alarmed"))
    assert(flat.getAs[Long]("n_over") === 0L)
    val k = out(1)
    // z = ±5/sqrt(200/7); PH grows by z−δ per post-shift step and
    // crosses 3.0 only on the 4th post-shift point
    assert(k.getAs[Double]("ph_max") === 3.541657)
    assert(k.getAs[Boolean]("alarmed"))
    assert(k.getAs[Int]("alarm_at") === 8)
    assert(k.getAs[Long]("n_over") === 1L)
  }
}
