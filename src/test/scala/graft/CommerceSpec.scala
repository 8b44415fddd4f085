package graft

import java.sql.Timestamp
import graft.ops.Commerce

/** Behavior specs for the commerce analytics (ops/Commerce.scala) on
  * hand-checkable order frames: RFM score direction and conservation,
  * cohort LTV accumulation, inter-order gap tie discipline.
  */
class CommerceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rfmSegments: scores stay in 1..q, customers are conserved, the " +
    "extremes score at the ends (recent buyer high R, top spender " +
    "high M)") {
    // 10 customers with strictly monotone recency/frequency/monetary:
    // customer i orders i times, last order i days before the horizon,
    // each order worth 100·i
    val rows = for {
      i <- 1 to 10
      j <- 1 to i
    } yield (i.toLong, ts(f"2024-01-${21 - i}%02d 00:00:00"),
      (i * 100 + j).toLong, i * 100.0)
    val orders = rows.toDF("cust", "d", "oid", "amt")
    val out = Commerce.rfmSegments(orders, "cust", "d", "amt")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.map(_._4).sum === 10L, "every customer lands in one cell")
    assert(out.forall(t => t._1 >= 1 && t._1 <= 5 &&
      t._2 >= 1 && t._2 <= 5 && t._3 >= 1 && t._3 <= 5))
    // customer 10: most orders and highest spend but ordered LONGEST
    // ago (10 days before the horizon) → R=1, F=5, M=5
    assert(out.exists(t => t._1 === 1 && t._2 === 5 && t._3 === 5))
    // customer 1: one cheap order on the horizon day → R=5, F=1, M=1
    assert(out.exists(t => t._1 === 5 && t._2 === 1 && t._3 === 1))
  }

  test("cohortLtv: cumulative per-customer value by month age, cohorts " +
    "independent") {
    val orders = Seq(
      // cohort 2024-01: two customers; month 0 revenue 30, month 1: 10
      (1L, ts("2024-01-05 00:00:00"), 10.0),
      (2L, ts("2024-01-20 00:00:00"), 20.0),
      (1L, ts("2024-02-10 00:00:00"), 10.0),
      // cohort 2024-02: one customer, single order
      (3L, ts("2024-02-15 00:00:00"), 50.0)
    ).toDF("cust", "d", "amt")
    val out = Commerce.cohortLtv(orders, "cust", "d", "amt")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out === Array(
      ("2024-01-01", 0, 2L, 30.0, 15.0),
      ("2024-01-01", 1, 2L, 10.0, 20.0),   // cum 40 / 2 customers
      ("2024-02-01", 0, 1L, 50.0, 50.0)))
  }

  test("abcClasses: boundary-inclusive Pareto classes in the pinned " +
    "revenue-desc order; ties break on the item id") {
    // revenues 80/15/5: cumulative shares exactly 0.80 / 0.95 / 1.00 —
    // A and B are boundary-INCLUSIVE (<=), the tail is C
    val d = Seq((1L, 80.0), (2L, 15.0), (3L, 5.0)).toDF("item", "rev")
    val out = Commerce.abcClasses(d, "item", "rev").collect()
    assert(out.map(r => (r.getAs[Long]("item"), r.getAs[Int]("rank"),
      r.getAs[Double]("cum_share"), r.getAs[String]("abc_class")))
      .toSeq === Seq((1L, 1, 0.8, "A"), (2L, 2, 0.95, "B"),
        (3L, 3, 1.0, "C")))
    // repeated item rows aggregate first; revenue ties order by item
    val dup = Seq((7L, 40.0), (7L, 40.0), (8L, 80.0), (9L, 40.0))
      .toDF("item", "rev")
    val o2 = Commerce.abcClasses(dup, "item", "rev").collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Int]("rank")))
    assert(o2.toSeq === Seq((7L, 1), (8L, 2), (9L, 3)),
      "item 7 sums to 80 and ties with 8 — smaller id ranks first")
  }

  test("giniConcentration: hand-computed Gini at unit bins; equal " +
    "spend scores 0; top-share counts whole customers") {
    // per-customer totals 1,2,3,4 → G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    val o = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("cust", "amt")
    val r = Commerce.giniConcentration(o, "cust", "amt", binBits = 0,
      topPcts = Seq(0.25)).collect().head
    assert(r.getAs[Long]("n_customers") === 4L)
    assert(r.getAs[Long]("n_bins") === 4L)
    assert(r.getAs[Double]("total_rev") === 10.0)
    assert(r.getAs[Double]("gini") === 0.25)
    // top 25% = floor(4*0.25) = 1 customer = the 4.0 spender
    assert(r.getAs[Double]("top25_share") === 0.4)
    // equal spend: Gini exactly 0, every share = k/n
    val eq = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 5.0))
      .toDF("cust", "amt")
    val re = Commerce.giniConcentration(eq, "cust", "amt", binBits = 0,
      topPcts = Seq(0.5)).collect().head
    assert(re.getAs[Double]("gini") === 0.0)
    assert(re.getAs[Double]("top50_share") === 0.5)
    // multi-order customers collapse before binning
    val multi = Seq((1L, 0.5), (1L, 0.5), (2L, 2.0), (3L, 3.0),
      (4L, 4.0)).toDF("cust", "amt")
    val rm = Commerce.giniConcentration(multi, "cust", "amt",
      binBits = 0, topPcts = Seq(0.25)).collect().head
    assert(rm.getAs[Double]("gini") === 0.25)
  }

  test("interOrderGaps: consecutive gaps per customer, date ties " +
    "ordered by id, first order emits no gap") {
    val orders = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-04 00:00:00"), 2L),
      (1L, ts("2024-01-04 00:00:00"), 3L),   // tie: after id 2, gap 0
      (1L, ts("2024-01-10 00:00:00"), 4L),
      (2L, ts("2024-03-01 00:00:00"), 5L)    // single order → no gap
    ).toDF("cust", "d", "oid")
    val out = Commerce.interOrderGaps(orders, "cust", "d", "oid")
      .orderBy("cust", "gap_days")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((1L, 0L), (1L, 3L), (1L, 6L)))
  }

  test("marketConcentration: hand-checked HHI/CR4/entropy on a " +
    "60/30/10 market; a monopoly scores HHI = 1, entropy = 0") {
    import spark.implicits._
    val tx = Seq(("m", 1L, 60.0), ("m", 2L, 30.0), ("m", 3L, 10.0),
      ("solo", 9L, 50.0)).toDF("seg", "cust", "v")
    val out = Commerce.marketConcentration(tx, "seg", "cust", "v")
      .collect()
    val m = out(0)
    assert(m.getAs[String]("market") === "m")
    assert(m.getAs[Long]("n_firms") === 3L)
    assert(m.getAs[Double]("hhi") === 0.46)
    assert(m.getAs[Double]("effective_firms") === 2.173913)
    assert(m.getAs[Double]("cr4") === 1.0)
    assert(m.getAs[Double]("entropy") === 0.897946)
    val solo = out(1)
    assert(solo.getAs[Double]("hhi") === 1.0)
    assert(solo.getAs[Double]("effective_firms") === 1.0)
    assert(solo.getAs[Double]("entropy") === 0.0)
  }
}
