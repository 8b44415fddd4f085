package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Drift, Models, Stats, Windows}

/** Hand-computed contracts for the round-8 statistics/eval operators —
  * the closed-form values the DuckDB oracle replays but doesn't derive.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("spearmanCorr: 1.0 on a monotone pair, exact tie handling") {
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 99.0))
      .toDF("x", "y")
    assert(Stats.spearmanCorr(mono, "x", "y").head
      .getAs[Double]("spearman") === 1.0)
    val anti = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 5.0)).toDF("x", "y")
    assert(Stats.spearmanCorr(anti, "x", "y").head
      .getAs[Double]("spearman") === -1.0)
    // ties: x = (1,2,2,3), y = (1,2,3,4); average ranks x: 1, 2.5, 2.5, 4
    // Pearson of ranks = 4.5 / sqrt(4.5 * 5) = 0.9486832... (scipy value)
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0))
      .toDF("x", "y")
    val r = Stats.spearmanCorr(tied, "x", "y").head
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("spearman") - 0.948683) < 1e-6)
  }

  test("chiSquare: hand-computed 2x2 table, dof, Cramer's V") {
    // table: (a1,b1)=10 (a1,b2)=20 (a2,b1)=30 (a2,b2)=40
    // n=100, row a1=30 a2=70, col b1=40 b2=60
    // e11=12 e12=18 e21=28 e22=42
    // chi2 = 4/12 + 4/18 + 4/28 + 4/42 = 0.79365079...
    val rows = Seq.fill(10)(("a1", "b1")) ++ Seq.fill(20)(("a1", "b2")) ++
      Seq.fill(30)(("a2", "b1")) ++ Seq.fill(40)(("a2", "b2"))
    val r = Stats.chiSquare(rows.toDF("a", "b"), "a", "b").head
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(math.abs(r.getAs[Double]("chi2") - 0.793651) < 1e-6)
    assert(math.abs(r.getAs[Double]("cramers_v")
      - math.sqrt(0.7936507936 / 100)) < 1e-6)
  }

  test("madOutliers: hand-computed median/MAD and strict-k flagging") {
    // key a: values 1..7 plus outlier 100 → med 4.5, deviations
    // (3.5, 2.5, 1.5, .5, .5, 1.5, 2.5, 95.5) → mad 2.0;
    // |v - 4.5| > 3*2.0 = 6 flags only 100
    val df = (Seq.tabulate(7)(i => ("a", (i + 1).toDouble)) :+
      ("a", 100.0)).toDF("k", "v")
    val r = Stats.madOutliers(df, "k", "v", k = 3.0).head
    assert(r.getAs[Double]("median") === 4.5)
    assert(r.getAs[Double]("mad") === 2.0)
    assert(r.getAs[Long]("n") === 8L && r.getAs[Long]("n_outliers") === 1L)
  }

  test("groupedOls: recovers a planted line per key; degenerate x -> NULL") {
    // key a: y = 2x + 3 exactly; key b: x constant (degenerate)
    val a = Seq.tabulate(10)(i => ("a", i.toDouble, 2.0 * i + 3.0))
    val b = Seq.tabulate(5)(_ => ("b", 1.0, 7.0))
    val out = Stats.groupedOls((a ++ b).toDF("k", "x", "y"), "k", "x", "y")
      .collect()
    val ra = out.find(_.getString(0) == "a").get
    assert(math.abs(ra.getAs[Double]("slope") - 2.0) < 1e-6)
    assert(math.abs(ra.getAs[Double]("intercept") - 3.0) < 1e-6)
    assert(math.abs(ra.getAs[Double]("r2") - 1.0) < 1e-6)
    val rb = out.find(_.getString(0) == "b").get
    assert(rb.isNullAt(rb.fieldIndex("slope")) &&
      rb.isNullAt(rb.fieldIndex("r2")))
  }

  test("jsDivergence: symmetric, zero on identical, bounded by ln 2") {
    val a = Seq.tabulate(100)(i => i / 10.0).toDF("x")
    val b = Seq.tabulate(100)(i => 5.0 + i / 20.0).toDF("x")
    val same = Drift.jsDivergence(a, a, "x", 0.0, 10.0, 5).collect()
    assert(same.forall(_.getAs[Double]("jsd") === 0.0))
    val ab = Drift.jsDivergence(a, b, "x", 0.0, 10.0, 5).head
      .getAs[Double]("jsd")
    val ba = Drift.jsDivergence(b, a, "x", 0.0, 10.0, 5).head
      .getAs[Double]("jsd")
    assert(ab === ba, "JSD must be symmetric")
    assert(ab > 0.0 && ab <= math.log(2.0) + 1e-9,
      "JSD is positive under shift and bounded by ln 2")
  }

  test("prAuc: perfect separation = 1.0; hand-computed tie case") {
    val perfect = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))
      .toDF("l", "s")
    assert(Models.prAuc(perfect, "l", "s").head
      .getAs[Double]("pr_auc") === 1.0)
    // scores: pos at .9, (pos,neg) tied at .5, neg at .1
    // sweep: t=.9 -> P=1, dR=1/2; t=.5 -> P=2/3, dR=1/2; t=.1 no pos
    // AP = 1*.5 + 2/3*.5 = 0.833333
    val tied = Seq((1, 0.9), (1, 0.5), (0, 0.5), (0, 0.1)).toDF("l", "s")
    val r = Models.prAuc(tied, "l", "s").head
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 2L)
    assert(math.abs(r.getAs[Double]("pr_auc") - 0.833333) < 1e-6)
  }

  test("liftGain: band-atomic ties, capture reaches 1, lift vs base rate") {
    // 10 rows, 2 buckets of 5: top-5 scores hold 4 positives of 5 total
    val rows = Seq.tabulate(10)(i => (if (i < 4 || i == 7) 1 else 0,
      1.0 - i / 10.0)).toDF("l", "s")
    val out = Models.liftGain(rows, "l", "s", buckets = 2).collect()
    assert(out.length === 2)
    val b0 = out.head
    assert(b0.getAs[Int]("bucket") === 0 && b0.getAs[Long]("n_rows") === 5L)
    assert(b0.getAs[Long]("n_pos") === 4L)
    // lift = (4/5) / (5/10) = 1.6; capture = 4/5
    assert(math.abs(b0.getAs[Double]("lift") - 1.6) < 1e-6)
    assert(math.abs(b0.getAs[Double]("capture") - 0.8) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("capture") - 1.0) < 1e-6)
    // a tie group straddling the cut stays atomic: all 4 equal scores
    // land in bucket 0, bucket 1 holds only the remaining 2
    val tied = Seq((1, 0.9), (0, 0.9), (1, 0.9), (0, 0.9), (0, 0.5),
      (1, 0.1)).toDF("l", "s")
    val tb = Models.liftGain(tied, "l", "s", buckets = 2).collect()
    assert(tb.map(_.getAs[Long]("n_rows")).toSeq === Seq(4L, 2L))
  }

  test("ewma: hand-computed adjust=False recursion per key") {
    // alpha .5: x = 2, 4, 8 -> y = 2, 3, 5.5; key b independent
    val df = Seq(("a", 1, 2.0), ("a", 2, 4.0), ("a", 3, 8.0),
      ("b", 1, 10.0), ("b", 2, 0.0)).toDF("k", "t", "v")
    val out = Windows.ewma(df, "k", "t", "v", alpha = 0.5).collect()
    assert(out.map(r => (r.getString(0), r.getInt(1),
      r.getAs[Double]("ewma"))).toSeq ===
      Seq(("a", 1, 2.0), ("a", 2, 3.0), ("a", 3, 5.5),
        ("b", 1, 10.0), ("b", 2, 5.0)))
  }

  test("prefixDupGroups: shared 2-token prefix groups, singletons dropped") {
    val docs = Seq((1L, "the cat sat here"), (2L, "the cat ran off"),
      (3L, "a dog sat"), (4L, "the cat sat"), (5L, "unique words only"))
      .toDF("doc_id", "text")
    val out = Curation.prefixDupGroups(docs, "doc_id", "text", k = 2)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("prefix") === "the cat")
    assert(out.head.getAs[Long]("n_docs") === 3L)
    assert(out.head.getAs[Long]("min_doc") === 1L)
  }

  test("sourceReport: cross-source dup involvement counts on both sides") {
    val docs = Seq(
      (1L, "same text", "s1", "en"), (2L, "same text", "s2", "de"),
      (3L, "other", "s1", "en"), (4L, "third", "s2", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val out = Curation.sourceReport(docs, "doc_id", "text", "source",
      "lang", "en").collect()
    val s1 = out.find(_.getString(0) == "s1").get
    val s2 = out.find(_.getString(0) == "s2").get
    assert(s1.getAs[Long]("n_dup_docs") === 1L &&
      s2.getAs[Long]("n_dup_docs") === 1L)
    assert(s1.getAs[Double]("pct_en") === 1.0 &&
      s2.getAs[Double]("pct_en") === 0.5)
  }

  test("welchT: hand-computed t and Welch-Satterthwaite df; n<2 -> NULL") {
    // a = 1..5 (n 5, mean 3, var 2.5); b = 2,4,6 (n 3, mean 4, var 4)
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val b = Seq(2.0, 4.0, 6.0).toDF("v")
    val r = Stats.welchT(a, b, "v").head
    val se2a = 2.5 / 5; val se2b = 4.0 / 3
    val t = (3.0 - 4.0) / math.sqrt(se2a + se2b)
    val df = math.pow(se2a + se2b, 2) /
      (se2a * se2a / 4 + se2b * se2b / 2)
    assert(r.getAs[Long]("n_a") === 5L && r.getAs[Long]("n_b") === 3L)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-5)
    assert(math.abs(r.getAs[Double]("df") - df) < 1e-5)
    val single = Seq(7.0).toDF("v")
    val r2 = Stats.welchT(a, single, "v").head
    assert(r2.isNullAt(r2.fieldIndex("t_stat")) &&
      r2.isNullAt(r2.fieldIndex("df")))
  }

  test("mannWhitney: scipy-checked U with average ranks and tie-corrected z") {
    // a = (1,2,3), b = (2,3,4): avg ranks 1, 2.5, 4.5 -> Ra 8, U 2
    // ties sum (t^3 - t) = 12, sigma^2 = .75 * (7 - 12/30) = 4.95
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    val r = Stats.mannWhitney(a, b, "v").head
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("u_stat") === 2.0)
    assert(math.abs(r.getAs[Double]("z") - (-2.5 / math.sqrt(4.95)))
      < 1e-6)
  }

  test("acf: hand-computed lags on a 4-point series (statsmodels " +
    "full-series denominator)") {
    // x = 1,2,3,4, mean 2.5, ss = 5
    // acf1 = 1.25/5, acf2 = -1.5/5, acf3 = -2.25/5
    val s = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)).toDF("t", "v")
    val out = Windows.acf(s, "t", "v", maxLag = 3).collect()
      .map(r => (r.getInt(0), r.getAs[Double]("acf")))
    assert(out === Array((1, 0.25), (2, -0.3), (3, -0.45)))
  }

  test("ljungBox: hand-computed Q on the acf fixture; a trend series " +
    "rejects white noise") {
    // rho = (0.25, -0.3, -0.45), n = 4, Q_k = n(n+2)*sum(rho^2/(n-k)):
    // Q1 = 24*0.0625/3 = 0.5; Q2 = 0.5 + 24*0.09/2 = 1.58;
    // Q3 = 1.58 + 24*0.2025 = 6.44 — all below the 5% critical values
    val s = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)).toDF("t", "v")
    val out = Windows.ljungBox(s, "t", "v", maxLag = 3).collect()
    val exp = Seq(0.5, 1.58, 6.44)
    out.zip(exp).foreach { case (r, q) =>
      assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-6)
      assert(!r.getAs[Boolean]("reject_white_noise"))
    }
    assert(out.map(_.getAs[Double]("chi2_crit_5pct")).toSeq ===
      Seq(3.841459, 5.991465, 7.814728))
    // a strong linear trend is NOT white noise: Q blows past the
    // critical value from lag 1, and Q is nondecreasing in the lag
    val trend = (1 to 20).map(i => (i, i.toDouble)).toDF("t", "v")
    val tr = Windows.ljungBox(trend, "t", "v", maxLag = 5).collect()
    assert(tr.forall(_.getAs[Boolean]("reject_white_noise")))
    val qs = tr.map(_.getAs[Double]("q_stat")).toSeq
    assert(qs === qs.sorted)
  }

  test("pacf: Durbin-Levinson closed form on the acf fixture") {
    // same series as the acf test: r1 = 1/4, r2 = -3/10, r3 = -9/20
    // p1 = 1/4; p2 = (r2 - r1^2)/(1 - r1^2) = -29/75;
    // p3 = (r3 - p21*r2 - p2*r1)/v2 = -187/598 (exact fractions)
    val s = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)).toDF("t", "v")
    val out = Windows.pacf(s, "t", "v").collect()
      .map(r => (r.getInt(0), r.getAs[Double]("pacf")))
    assert(out === Array((1, 0.25), (2, -0.386667), (3, -0.312709)))
  }

  test("ccf: a 2-day-shifted copy of the series peaks at lag 2 with " +
    "ccf exactly 1.0") {
    import java.sql.Date
    import java.time.LocalDate
    val vals = Seq(5.0, 1.0, 4.0, 2.0, 8.0, 3.0, 7.0, 0.0, 6.0, 9.0,
      2.5, 4.5)
    val days = vals.indices
      .map(i => Date.valueOf(LocalDate.of(2024, 1, 1).plusDays(i)))
    val x = days.zip(vals).toDF("day", "v")
    val y = days.map(d => Date.valueOf(d.toLocalDate.plusDays(2)))
      .zip(vals).toDF("day", "v")
    val out = Windows.ccf(x, y, "day", "v", maxLag = 3).collect()
      .map(r => (r.getInt(0), r.getAs[Double]("ccf"))).toMap
    assert(out(2) === 1.0)
    assert(out.filter(_._1 != 2).values.forall(v => math.abs(v) < 0.999))
  }

  test("rollingCorrelation: perfectly coupled window reads 1, " +
    "anti-coupled reads -1, short windows NULL") {
    val d = Seq((1, 1.0, 2.0), (2, 2.0, 4.0), (3, 3.0, 6.0),
      (4, 4.0, 8.0), (5, 5.0, 6.0), (6, 6.0, 4.0))
      .toDF("t", "x", "y")
    val out = Windows.rollingCorrelation(d, "t", "x", "y",
      windowRows = 3, minPeriods = 3).collect()
      .map(r => r.getInt(0) -> Option(r.getAs[java.lang.Double](3))).toMap
    assert(out(1).isEmpty && out(2).isEmpty)   // below minPeriods
    assert(out(3).contains(1.0) && out(4).contains(1.0))
    assert(out(6).contains(-1.0))              // window (4,5,6) anti-coupled
  }

  test("holtForecast: hand-computed two-point recursion and linear " +
    "extrapolation") {
    // x = [10, 12]: l1=10, b1=0; l2 = .5*12+.5*10 = 11,
    // b2 = .25*(11-10) = 0.25; f_h = 11 + 0.25h
    val s = Seq(("k", 1, 10.0), ("k", 2, 12.0)).toDF("g", "t", "v")
    val r = Windows.holtForecast(s, "g", "t", "v").head
    assert(r.getAs[Double]("level") === 11.0)
    assert(r.getAs[Double]("trend") === 0.25)
    assert(r.getAs[Double]("f1") === 11.25)
    assert(r.getAs[Double]("f2") === 11.5)
    assert(r.getAs[Double]("f3") === 11.75)
    assert(r.getAs[Int]("last_ord") === 2)
  }

  test("holtWintersForecast: matches a Scala replay of the additive " +
    "recursion on a seasonal series, and the forecast carries the " +
    "matching seasonal index") {
    // strong period-2 seasonality on a rising trend
    val xs = Seq(10.0, 20.0, 12.0, 22.0, 14.0, 24.0, 16.0, 26.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i + 1, v) }
      .toDF("g", "t", "v")
    val r = Windows.holtWintersForecast(df, "g", "t", "v", period = 2,
      horizons = 2).head
    // Scala replay of the exact fold (alpha=.5, beta=.25, gamma=.25)
    var hist = Vector.empty[(Double, Double, Double)] // (l, b, s)
    xs.foreach { x =>
      if (hist.isEmpty) hist :+= ((x, 0.0, 0.0))
      else {
        val (lp, bp, _) = hist.last
        val sm = if (hist.size >= 2) hist(hist.size - 2)._3 else 0.0
        val l = 0.5 * (x - sm) + 0.5 * (lp + bp)
        val b = 0.25 * (l - lp) + 0.75 * bp
        val s = 0.25 * (x - lp - bp) + 0.75 * sm
        hist :+= ((l, b, s))
      }
    }
    val (lT, bT, _) = hist.last
    def rd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("level") === rd(lT))
    assert(r.getAs[Double]("trend") === rd(bT))
    // f_h = l + h·b + s_{T+h-m}: h=1 reads the second-to-last seasonal
    // (same parity as the next step), h=2 the last
    assert(r.getAs[Double]("f1") === rd(lT + 1 * bT + hist(hist.size - 2)._3))
    assert(r.getAs[Double]("f2") === rd(lT + 2 * bT + hist.last._3))
    // the seasonal indices must separate the two phases: f1 continues the
    // low phase (next point ~18), f2 the high phase (~28) — plain Holt
    // would put both on the trend line and miss the alternation
    assert(r.getAs[Double]("f2") - r.getAs[Double]("f1") > 4.0)
  }

  test("thetaForecast: recovers the exact slope on a noiseless line " +
    "and matches a Scala replay of the theta2 SES on noisy data") {
    // perfect line x_t = 3 + 2t: OLS recovers (3, 2) exactly and the
    // theta2 line equals the series itself
    val line = (1 to 8).map(t => ("k", t, 3.0 + 2.0 * t))
      .toDF("g", "t", "v")
    val r = Windows.thetaForecast(line, "g", "t", "v", alpha = 0.5,
      horizons = 2).head
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 3.0)
    // noisy series: full Scala replay of the combination
    val xs = Seq(10.0, 14.0, 11.0, 18.0, 15.0, 22.0)
    val noisy = xs.zipWithIndex.map { case (v, i) => ("k", i + 1, v) }
      .toDF("g", "t", "v")
    val out = Windows.thetaForecast(noisy, "g", "t", "v", alpha = 0.5,
      horizons = 2).head
    def rd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = xs.size.toDouble
    val st = (1 to xs.size).map(_.toDouble).sum
    val sx = xs.sum
    val stx = xs.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    val stt = (1 to xs.size).map(t => t.toDouble * t).sum
    val b = rd((n * stx - st * sx) / (n * stt - st * st))
    val a = rd((sx - b * st) / n)
    assert(out.getAs[Double]("slope") === b)
    assert(out.getAs[Double]("intercept") === a)
    var l = 0.0
    xs.zipWithIndex.foreach { case (v, i) =>
      val z = 2 * v - (a + b * (i + 1.0))
      l = if (i == 0) z else 0.5 * z + 0.5 * l
    }
    assert(out.getAs[Double]("ses_level") === rd(l))
    assert(out.getAs[Double]("f1") ===
      rd(0.5 * (a + b * (n + 1.0)) + 0.5 * l))
    assert(out.getAs[Double]("f2") ===
      rd(0.5 * (a + b * (n + 2.0)) + 0.5 * l))
  }

  test("holtWintersDamped: phi = 1 recovers the un-damped recursion " +
    "exactly; phi < 1 pulls long-horizon forecasts toward the level") {
    val xs = Seq(10.0, 20.0, 12.0, 22.0, 14.0, 24.0, 16.0, 26.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i + 1, v) }
      .toDF("g", "t", "v")
    val plain = Windows.holtWintersForecast(df, "g", "t", "v",
      period = 2, horizons = 2).head
    val und = Windows.holtWintersDamped(df, "g", "t", "v", period = 2,
      phi = 1.0, horizons = 2).head
    Seq("level", "trend", "f1", "f2").foreach { c =>
      assert(und.getAs[Double](c) === plain.getAs[Double](c),
        s"phi = 1 must be the identity on $c")
    }
    // damped: the h-step trend multiplier is φ+…+φʰ < h, so with a
    // positive fitted trend the damped forecasts sit strictly below
    val dmp = Windows.holtWintersDamped(df, "g", "t", "v", period = 2,
      phi = 0.5, horizons = 2).head
    assert(dmp.getAs[Double]("trend") !== plain.getAs[Double]("trend"),
      "phi enters the recursion itself, not just the forecast")
    // Scala replay of the damped fold at phi = 0.5
    var hist = Vector.empty[(Double, Double, Double)]
    xs.foreach { x =>
      if (hist.isEmpty) hist :+= ((x, 0.0, 0.0))
      else {
        val (lp, bp, _) = hist.last
        val sm = if (hist.size >= 2) hist(hist.size - 2)._3 else 0.0
        val l = 0.5 * (x - sm) + 0.5 * (lp + 0.5 * bp)
        val b = 0.25 * (l - lp) + 0.75 * 0.5 * bp
        val s = 0.25 * (x - lp - 0.5 * bp) + 0.75 * sm
        hist :+= ((l, b, s))
      }
    }
    val (lT, bT, _) = hist.last
    def rd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(dmp.getAs[Double]("level") === rd(lT))
    assert(dmp.getAs[Double]("trend") === rd(bT))
    assert(dmp.getAs[Double]("f1") ===
      rd(lT + 0.5 * bT + hist(hist.size - 2)._3))
    assert(dmp.getAs[Double]("f2") === rd(lT + 0.75 * bT + hist.last._3))
  }

  test("holtWintersAuto: picks the SSE-minimizing candidate, agrees with " +
    "holtWintersForecast at the winning triple, tie-breaks on cand id") {
    // strong period-2 seasonality: the grid member tracking it tightest
    // one-step-ahead must win; whatever wins, the reported state and
    // forecasts must equal the fixed-parameter recursion at that triple
    val xs = Seq(10.0, 20.0, 12.0, 22.0, 14.0, 24.0, 16.0, 26.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i + 1, v) }
      .toDF("g", "t", "v")
    val grid = for (a <- Seq(0.25, 0.5, 0.75); b <- Seq(0.125, 0.25);
                    g <- Seq(0.25, 0.5)) yield (a, b, g)
    val r = Windows.holtWintersAuto(df, "g", "t", "v", period = 2,
      candidates = grid, horizons = 2).head
    val (al, be, ga) = (r.getAs[Double]("alpha"), r.getAs[Double]("beta"),
      r.getAs[Double]("gamma"))
    assert(grid.contains((al, be, ga)))
    val fixed = Windows.holtWintersForecast(df, "g", "t", "v", period = 2,
      alpha = al, beta = be, gamma = ga, horizons = 2).head
    assert(r.getAs[Double]("level") === fixed.getAs[Double]("level"))
    assert(r.getAs[Double]("trend") === fixed.getAs[Double]("trend"))
    assert(r.getAs[Double]("f1") === fixed.getAs[Double]("f1"))
    assert(r.getAs[Double]("f2") === fixed.getAs[Double]("f2"))
    // the winner's SSE really is the grid minimum: replay every candidate
    def sse(a: Double, b: Double, g: Double): Double = {
      var hist = Vector.empty[(Double, Double, Double)]
      var acc = 0.0
      xs.foreach { x =>
        if (hist.isEmpty) hist :+= ((x, 0.0, 0.0))
        else {
          val (lp, bp, _) = hist.last
          val sm = if (hist.size >= 2) hist(hist.size - 2)._3 else 0.0
          val err = x - (lp + bp + sm)
          acc += err * err
          val l = a * (x - sm) + (1.0 - a) * (lp + bp)
          val bb = b * (l - lp) + (1.0 - b) * bp
          val s = g * (x - lp - bp) + (1.0 - g) * sm
          hist :+= ((l, bb, s))
        }
      }
      acc
    }
    val best = grid.minBy { case (a, b, g) => sse(a, b, g) }
    assert((al, be, ga) === best)
    // degenerate one-candidate grid: returned triple is that candidate
    val one = Windows.holtWintersAuto(df, "g", "t", "v", period = 2,
      candidates = Seq((0.5, 0.25, 0.25)), horizons = 1).head
    assert(one.getAs[Double]("alpha") === 0.5)
  }

  test("benford: digit extraction incl. sub-1 values; absent digits " +
    "report zero; expected shares are Benford") {
    // leading significant digits: 1, 1, 2, 5 (from 0.52), 9
    val df = Seq(123.45, 1.0, 250.0, 0.52, 900.0, -5.0, 0.0)
      .toDF("v") // non-positive rows excluded
    val out = Stats.benford(df, "v").collect()
    assert(out.length === 9)
    val byDigit = out.map(r => r.getInt(0) -> r.getAs[Long]("n")).toMap
    assert(byDigit(1) === 2L && byDigit(2) === 1L &&
      byDigit(5) === 1L && byDigit(9) === 1L && byDigit(3) === 0L)
    val d1 = out.find(_.getInt(0) == 1).get
    assert(math.abs(d1.getAs[Double]("expected")
      - math.log10(2.0)) < 1e-6)
    assert(math.abs(d1.getAs[Double]("share") - 0.4) < 1e-6)
  }

  test("logRank: hand-computed U/V on a 4-subject fixture; identical " +
    "groups score chi2 = 0") {
    import spark.implicits._
    // A: events at t=1,3; B: event at t=2, censored at t=4.
    // U = 0.5 - 1/3 + 0.5 = 2/3; V = 0.25 + 2/9 + 0.25 = 13/18;
    // chi2 = (4/9)/(13/18) = 8/13 = 0.615385
    val subj = Seq(("a", 1L, 1), ("a", 3L, 1), ("b", 2L, 1),
      ("b", 4L, 0)).toDF("grp", "dur", "ev")
    val r = Stats.logRank(subj, "grp", "dur", "ev").collect().head
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("events_a") === 2L)
    assert(r.getAs[Long]("events_b") === 1L)
    assert(r.getAs[Double]("observed_minus_expected") === 0.666667)
    assert(r.getAs[Double]("variance") === 0.722222)
    assert(r.getAs[Double]("chi2") === 0.615385)
    assert(!r.getAs[Boolean]("groups_differ_5pct"))
    // mirrored groups: every per-time term cancels exactly
    val same = Seq(("a", 1L, 1), ("a", 5L, 0), ("b", 1L, 1),
      ("b", 5L, 0)).toDF("grp", "dur", "ev")
    val rs = Stats.logRank(same, "grp", "dur", "ev").collect().head
    assert(rs.getAs[Double]("chi2") === 0.0)
    assert(rs.getAs[Double]("observed_minus_expected") === 0.0)
  }

  test("powerAnalysis: textbook two-proportion n at a 10% baseline; " +
    "smaller lifts need more users; days follow the traffic rate") {
    import spark.implicits._
    import java.sql.Timestamp
    // 100 users split across 2 days (50/day); users 1..10 convert
    val ev = (1L to 100L).map { u =>
      val day = if (u <= 50) "2024-01-01" else "2024-01-02"
      val ty = if (u <= 10) "purchase" else "view"
      (u, Timestamp.valueOf(s"$day 10:00:00"), ty, 500.0)
    }.toDF("user_id", "ts", "event_type", "value")
    val out = Stats.powerAnalysis(ev, "user_id", "ts", "event_type",
      "value", "purchase", minValue = 200.0).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[Double]("baseline_rate") === 0.1)
      assert(r.getAs[Long]("n_users") === 100L)
      val n = r.getAs[Long]("n_per_arm")
      // hand formula: (1.959964+0.841621)^2 (p1q1+p2q2)/(p2-p1)^2
      val p1 = 0.1
      val p2 = p1 * (1.0 + r.getAs[Double]("rel_lift"))
      val z = 1.959964 + 0.841621
      val exp = math.ceil(z * z * (p1 * (1 - p1) + p2 * (1 - p2))
        / ((p2 - p1) * (p2 - p1))).toLong
      assert(n === exp)
      // 50 distinct users/day → days = ceil(2n / 50)
      assert(r.getAs[Long]("days_to_run") ===
        math.ceil(2.0 * n / 50.0).toLong)
    }
    val ns = out.sortBy(_.getAs[Double]("rel_lift"))
      .map(_.getAs[Long]("n_per_arm")).toSeq
    assert(ns === ns.sorted.reverse, "smaller lifts need more users")
  }

  test("grangerLite: a lagged copy (plus wiggle) of x is flagged as " +
    "Granger-causal; a collinear x = y degrades to NULL, not a crash") {
    import spark.implicits._
    val xs = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)
      .map(_.toDouble)
    // y_t = x_{t-1} + tiny wiggle → x1 explains nearly all of y
    val rows = xs.indices.map { t =>
      val y = if (t == 0) 0.0 else xs(t - 1) + 0.1 * (t % 3)
      (t, y, xs(t))
    }
    val out = Windows.grangerLite(rows.toDF("day", "y", "x"),
      "day", "y", "x").collect().head
    assert(out.getAs[Long]("n") === 15L)
    assert(out.getAs[Boolean]("x_granger_causes_y"))
    assert(out.getAs[Double]("f_stat") > 10.0)
    assert(out.getAs[Double]("sse_u") < out.getAs[Double]("sse_r"))
    // x identical to y → lagged regressors collinear → det = 0 exactly
    val same = rows.map { case (t, y, _) => (t, y, y) }
    val nul = Windows.grangerLite(same.toDF("day", "y", "x"),
      "day", "y", "x").collect().head
    assert(nul.isNullAt(nul.fieldIndex("f_stat")))
    assert(nul.isNullAt(nul.fieldIndex("x_granger_causes_y")))
  }

  test("psmStratified: stratification recovers the true effect (5) " +
    "where the naive difference is confounded (11.67)") {
    import spark.implicits._
    // two covariate levels; treatment concentrates at the high level;
    // outcome = covariate + 5·treated → true effect 5 in every stratum
    val units =
      (1 to 10).map(_ => (0.0, 0.0, 0.0)) ++    // control, x=0
      (1 to 2).map(_ => (0.0, 1.0, 5.0)) ++     // treated, x=0
      (1 to 2).map(_ => (10.0, 0.0, 10.0)) ++   // control, x=10
      (1 to 10).map(_ => (10.0, 1.0, 15.0))     // treated, x=10
    val df = units.toDF("x", "t", "y")
    val out = Stats.psmStratified(df, "x", "t", "y").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Double]("diff") === 5.0)
      assert(r.getAs[Double]("att") === 5.0)
      assert(r.getAs[Double]("naive_diff") === 11.666667)
      assert(r.getAs[Long]("n_treated") + r.getAs[Long]("n_control")
        === 12L)
    }
    assert(out.map(_.getAs[Double]("mean_treated")).toSeq ===
      Seq(5.0, 15.0))
    assert(out.map(_.getAs[Double]("mean_control")).toSeq ===
      Seq(0.0, 10.0))
  }

  test("bootstrapCi: constant data collapses every replicate to the " +
    "constant; varying data brackets the mean; nulls drop from n") {
    import spark.implicits._
    val const = (1L to 100L).map(i => (i, 7.5)).toDF("id", "v")
    val r = Stats.bootstrapCi(const, "id", "v", reps = 64,
      seed = "t").collect().head
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Int]("reps") === 64)
    assert(r.getAs[Double]("point_mean") === 7.5)
    assert(r.getAs[Double]("boot_mean") === 7.5)
    assert(r.getAs[Double]("boot_se") === 0.0)
    assert(r.getAs[Double]("ci_lo") === 7.5)
    assert(r.getAs[Double]("ci_hi") === 7.5)
    val varied = (1L to 200L).map(i => (i, (i % 10).toDouble))
      .toDF("id", "v") // mean 4.5
    val rv = Stats.bootstrapCi(varied, "id", "v", reps = 64,
      seed = "t").collect().head
    assert(rv.getAs[Double]("ci_lo") <= rv.getAs[Double]("boot_mean"))
    assert(rv.getAs[Double]("boot_mean") <= rv.getAs[Double]("ci_hi"))
    assert(math.abs(rv.getAs[Double]("boot_mean") - 4.5) < 1.0)
    assert(rv.getAs[Double]("boot_se") > 0.0)
    val withNull = varied.unionAll(
      Seq((999L, Option.empty[Double])).toDF("id", "v"))
    assert(Stats.bootstrapCi(withNull, "id", "v", reps = 64, seed = "t")
      .collect().head.getAs[Long]("n") === 200L)
  }

  test("srmCheck: an md5 split of 400 users passes the guardrail; " +
    "counts partition exactly") {
    import spark.implicits._
    val ev = (1L to 400L).map(u => (u, "view")).toDF("user_id", "ty")
    val r = Stats.srmCheck(ev, "user_id", seed = "t").collect().head
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === 400L)
    assert(r.getAs[Double]("expected_a") === 200.0)
    assert(!r.getAs[Boolean]("srm_detected"),
      "an honest md5 split must not trip SRM")
    assert(r.getAs[Double]("chi2") < 3.841459)
  }

  test("quantileTreatmentEffects: a constant +100 treated shift gives " +
    "qte = 100 at every decile") {
    import spark.implicits._
    import graft.ops.Dedup
    val ids = (1L to 200L).toDF("u")
    val armOf = ids.withColumn("arm",
      when(Dedup.h60(concat(lit("qte1"), lit("_"),
        col("u").cast("string"))) % 2 === 0, "A").otherwise("B"))
      .collect().map(r => r.getAs[Long]("u") -> r.getAs[String]("arm"))
      .toMap
    val ev = (1L to 200L).flatMap { u =>
      Seq((u, 100.0)) ++
        (if (armOf(u) == "B") Seq((u, 100.0)) else Nil)
    }.toDF("user_id", "value")
    val out = Stats.quantileTreatmentEffects(ev, "user_id", "value",
      seed = "qte1").collect()
    assert(out.length === 9)
    assert(out.map(_.getAs[Double]("quantile")).toSeq ===
      (1 to 9).map(_ / 10.0))
    out.foreach { r =>
      assert(r.getAs[Double]("q_control") === 100.0)
      assert(r.getAs[Double]("q_treated") === 200.0)
      assert(r.getAs[Double]("qte") === 100.0)
    }
  }

  test("fdrBh: the textbook 6-p-value family rejects exactly the " +
    "step-up prefix; adjusted p-values are the monotone tail minima") {
    import spark.implicits._
    val pv = Seq(("a", 0.001), ("b", 0.008), ("c", 0.039),
      ("d", 0.041), ("e", 0.27), ("f", 0.60)).toDF("metric", "p")
    val out = Stats.fdrBh(pv, "metric", "p", q = 0.05).collect()
    assert(out.map(_.getAs[String]("key")).toSeq ===
      Seq("a", "b", "c", "d", "e", "f"))
    assert(out.map(_.getAs[Boolean]("rejected")).toSeq ===
      Seq(true, true, false, false, false, false),
      "k* = 2: c (0.039 > 0.025) fails the step-up even though d " +
        "would not on its own rank")
    assert(out.map(_.getAs[Double]("p_adj")).toSeq ===
      Seq(0.006, 0.024, 0.0615, 0.0615, 0.324, 0.6))
    assert(out(0).getAs[Double]("bh_threshold") === 0.008333)
  }

  test("cmsHeavyHitters: estimates dominate exact counts, the min-over-" +
    "depths rescues single-depth collisions, and top-k order is total") {
    import spark.implicits._
    val rows = Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z")
    val out = Stats.cmsHeavyHitters(rows.toDF("k"), "k", topK = 10)
      .collect()
    assert(out.map(r => (r.getAs[String]("key"),
      r.getAs[Long]("exact_n"))).toSeq ===
      Seq(("x", 5L), ("y", 3L), ("z", 1L)))
    out.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L)
      assert(r.getAs[Long]("estimate") ===
        r.getAs[Long]("exact_n") + r.getAs[Long]("overestimate"))
    }
    // 3 keys across 4 independent 256-bucket rows: no full-depth
    // collision, so the estimates are exact here
    assert(out.forall(_.getAs[Long]("overestimate") === 0L))
  }

  test("nelsonAalen: hand-checked cumulative hazard, Aalen variance, " +
    "and Breslow survival on a 4-subject curve") {
    import spark.implicits._
    val subj = Seq(("g", 1, 1), ("g", 1, 1), ("g", 2, 0), ("g", 3, 1))
      .toDF("grp", "dur", "event")
    val out = Stats.nelsonAalen(subj, "grp", "dur", "event").collect()
    assert(out.length === 2, "censored-only times are not emitted")
    val t1 = out(0)
    assert(t1.getAs[Long]("t") === 1L)
    assert(t1.getAs[Long]("n_risk") === 4L)
    assert(t1.getAs[Double]("cum_hazard") === 0.5)
    assert(t1.getAs[Double]("hazard_var") === 0.0625)
    assert(t1.getAs[Double]("breslow_survival") === 0.606531)
    val t3 = out(1)
    assert(t3.getAs[Long]("t") === 3L)
    assert(t3.getAs[Long]("n_risk") === 1L)
    assert(t3.getAs[Double]("cum_hazard") === 1.5)
    assert(t3.getAs[Double]("breslow_survival") === 0.223130)
  }

  test("mannKendall: a strictly increasing series is 'increasing' with " +
    "the hand-checked z; a constant series degrades to z = 0") {
    import spark.implicits._
    val ser = (1 to 5).map(i => ("up", i, i.toDouble)) ++
      (1 to 5).map(i => ("flat", i, 7.0))
    val out = Stats.mannKendall(ser.toDF("k", "x", "y"), "k", "x", "y")
      .collect()
    val flat = out(0)
    assert(flat.getAs[String]("k") === "flat")
    assert(flat.getAs[Long]("s") === 0L)
    assert(flat.getAs[Long]("tie_term") === 300L)
    assert(flat.getAs[Double]("var_s") === 0.0)
    assert(flat.getAs[Double]("z") === 0.0)
    assert(flat.getAs[String]("trend") === "no_trend")
    val up = out(1)
    assert(up.getAs[String]("k") === "up")
    assert(up.getAs[Long]("s") === 10L)
    assert(up.getAs[Long]("tie_term") === 0L)
    assert(up.getAs[Double]("z") === 2.204541)
    assert(up.getAs[String]("trend") === "increasing")
  }

  test("causalImpact: exact counterfactual from a y = 2x pre-period " +
    "fit; effects, cumulative, and relative lift are hand-checked") {
    import spark.implicits._
    import java.sql.Date
    def d(i: Int) = Date.valueOf(f"2024-01-$i%02d")
    // pre: y = 2x exactly → a = 0, b = 2; post actuals 13, 14, 20 vs
    // counterfactuals 12, 14, 16 → effects 1, 0, 4; cum 1, 1, 5;
    // relative = (47 - 42)/42 = 0.119048
    val daily = Seq(
      (d(1), 2.0, 1.0), (d(2), 4.0, 2.0), (d(3), 6.0, 3.0),
      (d(4), 8.0, 4.0), (d(5), 10.0, 5.0),
      (d(6), 13.0, 6.0), (d(7), 14.0, 7.0), (d(8), 20.0, 8.0)
    ).toDF("day", "y", "x")
    val out = Windows.causalImpact(daily, "day", "y", "x",
      intervention = "2024-01-06").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Double]("counterfactual")).toSeq ===
      Seq(12.0, 14.0, 16.0))
    assert(out.map(_.getAs[Double]("effect")).toSeq ===
      Seq(1.0, 0.0, 4.0))
    assert(out.map(_.getAs[Double]("cum_effect")).toSeq ===
      Seq(1.0, 1.0, 5.0))
    assert(out.forall(_.getAs[Double]("relative_effect") === 0.119048))
  }

  test("reconcileForecasts: reconciled children sum to the aggregate " +
    "forecast; an already-coherent hierarchy is left unchanged") {
    import spark.implicits._
    // constant series: Holt level = value, trend 0 → children already
    // sum to the total forecast, so reconciliation is the identity
    val const = (1 to 5).flatMap(d =>
      Seq(("a", d, 10.0), ("b", d, 20.0))).toDF("k", "t", "v")
    val rc = Windows.reconcileForecasts(const, "k", "t", "v").collect()
    rc.foreach { r =>
      assert(r.getAs[Double]("reconciled") ===
        r.getAs[Double]("base_forecast"))
      assert(r.getAs[Double]("total_forecast") === 30.0)
    }
    // trending child: independent fits drift apart; reconciliation
    // restores coherence (children sum to the total) per horizon
    val trend = (1 to 5).flatMap(d =>
      Seq(("a", d, d.toDouble), ("b", d, 10.0))).toDF("k", "t", "v")
    val out = Windows.reconcileForecasts(trend, "k", "t", "v")
      .collect()
    (1 to 3).foreach { h =>
      val rows = out.filter(_.getAs[Int]("horizon") === h)
      val total = rows.head.getAs[Double]("total_forecast")
      val sumRec = rows.map(_.getAs[Double]("reconciled")).sum
      assert(math.abs(sumRec - total) < 1e-5,
        s"h=$h incoherent: $sumRec vs $total")
    }
  }

  test("upliftReport: a treatment that only works on engaged users " +
    "concentrates observed uplift in the top score deciles") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.ops.Dedup
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val ids = (1L to 400L).toDF("u")
    val armOf = ids.withColumn("arm",
      when(Dedup.h60(concat(lit("upl1"), lit("_"),
        col("u").cast("string"))) % 2 === 0, "A").otherwise("B"))
      .collect().map(r => r.getAs[Long]("u") -> r.getAs[String]("arm"))
      .toMap
    val ev = (1L to 400L).flatMap { u =>
      val views = (u % 20).toInt
      val base = Seq((u, t0, "signup", 1.0)) ++
        (1 to views).map(i => (u, t0, "view", 1.0))
      // treatment converts ONLY engaged (views >= 10) treated users
      if (armOf(u) == "B" && views >= 10)
        base :+ ((u, t0, "purchase", 500.0))
      else base
    }.toDF("user_id", "ts", "event_type", "value")
    val out = Stats.upliftReport(ev, "user_id", "event_type", "value",
      "purchase", minValue = 200.0, engageType = "view",
      seed = "upl1").collect()
    assert(out.map(r => r.getAs[Long]("n_treated")
      + r.getAs[Long]("n_control")).sum === 400L)
    val top = out.maxBy(_.getAs[Int]("bucket"))
    val bottom = out.minBy(_.getAs[Int]("bucket"))
    assert(top.getAs[Double]("observed_uplift") > 0.5,
      "top decile must show the effect")
    assert(bottom.getAs[Double]("observed_uplift") < 0.2,
      "bottom decile must not")
    assert(top.getAs[Double]("predicted_uplift") >
      bottom.getAs[Double]("predicted_uplift"))
    // control never converts in this fixture
    assert(out.map(_.getAs[Long]("conv_control")).sum === 0L)
  }

  test("msprtCurve: always-valid p is monotone non-increasing and " +
    "fires on a decisive effect; no-signal start stays at p = 1-ish") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.ops.Dedup
    // recover each user's md5 arm with the op's own rule, then make
    // ONLY arm-B users convert — a decisive true effect
    val ids = (1L to 200L).toDF("u")
    val armOf = ids.withColumn("arm",
      when(Dedup.h60(concat(lit("seq1"), lit("_"),
        col("u").cast("string"))) % 2 === 0, "A").otherwise("B"))
      .collect().map(r => r.getAs[Long]("u") -> r.getAs[String]("arm"))
      .toMap
    val ev = (1L to 200L).flatMap { u =>
      val base = Seq((u, Timestamp.valueOf("2024-01-01 10:00:00"),
        "view", 1.0))
      if (armOf(u) == "B")
        base :+ ((u, Timestamp.valueOf("2024-01-02 10:00:00"),
          "purchase", 500.0))
      else base
    }.toDF("user_id", "ts", "event_type", "value")
    val out = Stats.msprtCurve(ev, "user_id", "ts", "event_type",
      "value", "purchase", minValue = 200.0, seed = "seq1")
      .collect()
    assert(out.length === 2)
    assert(out(1).getAs[Boolean]("significant"),
      "a 0% vs 100% split must fire")
    assert(out(1).getAs[Double]("p_always_valid") < 0.05)
    // day 1: zero conversions → pooled rate 0, variance undefined →
    // the curve has no verdict yet (NULL p, not a false positive)
    assert(out(0).getAs[Double]("theta") === 0.0)
    assert(out(0).isNullAt(out(0).fieldIndex("p_always_valid")))
    assert(out(0).isNullAt(out(0).fieldIndex("significant")))
    assert(out(1).getAs[Long]("conv_a") === 0L)
    assert(out(1).getAs[Long]("conv_b") ===
      armOf.values.count(_ == "B").toLong)
  }

  test("didReport: a uniform change cancels to DiD 0 with NULL z; " +
    "heterogeneous changes reconcile with the arm means") {
    import spark.implicits._
    import java.sql.Timestamp
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    // every user changes by exactly +5 → both arms' mean_change = 5,
    // did = 0, and zero diff variance degrades z to NULL
    val uniform = (1L to 20L).flatMap { u =>
      Seq((u, pre, u.toDouble), (u, post, u.toDouble + 5.0))
    }.toDF("user_id", "ts", "value")
    val out = Stats.didReport(uniform, "user_id", "ts", "value",
      cutoff = "2024-01-16 00:00:00", seed = "t").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_change") === 5.0)
      assert(r.getAs[Double]("did") === 0.0)
      assert(r.isNullAt(r.fieldIndex("z")))
    }
    // u-dependent change: did must equal the arm mean-change gap
    val hetero = (1L to 20L).flatMap { u =>
      Seq((u, pre, u.toDouble), (u, post, u.toDouble + (u % 3)))
    }.toDF("user_id", "ts", "value")
    val h = Stats.didReport(hetero, "user_id", "ts", "value",
      cutoff = "2024-01-16 00:00:00", seed = "t").collect()
    val byArm = h.map(r => r.getAs[String]("arm") ->
      r.getAs[Double]("mean_change")).toMap
    assert(math.abs(h.head.getAs[Double]("did")
      - (byArm("B") - byArm("A"))) < 1e-5)
    assert(h.head.getAs[Double]("se") > 0.0)
  }

  test("cupedReport: a perfectly predictive covariate gives theta = 2, " +
    "full variance reduction, and pulls both adjusted means to the " +
    "global post mean") {
    import spark.implicits._
    import java.sql.Timestamp
    // user i: pre spend i (Jan 10), post spend 2i (Jan 20) → Y = 2X
    // exactly, so theta = 2, rho² = 1, adjusted means = global mean 17,
    // and the adjusted z degrades to NULL (zero residual variance)
    val ev = (1L to 16L).flatMap { u =>
      Seq((u, Timestamp.valueOf("2024-01-10 00:00:00"), u.toDouble),
        (u, Timestamp.valueOf("2024-01-20 00:00:00"), 2.0 * u))
    }.toDF("user_id", "ts", "value")
    val out = Stats.cupedReport(ev, "user_id", "ts", "value",
      cutoff = "2024-01-16 00:00:00", seed = "t").collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[String]("arm")).toSeq === Seq("A", "B"))
    assert(out.map(_.getAs[Long]("n_users")).sum === 16L)
    out.foreach { r =>
      assert(r.getAs[Double]("theta") === 2.0)
      assert(r.getAs[Double]("var_reduction") === 1.0)
      assert(r.getAs[Double]("adj_mean_post") === 17.0)
      assert(r.isNullAt(r.fieldIndex("z_adj")))
      // raw arm means differ from 17 unless the md5 split is balanced;
      // either way adjusted means agree exactly across arms
      assert(r.getAs[Double]("mean_post") ===
        2.0 * r.getAs[Double]("mean_pre"))
    }
  }

  test("abTestReport: deterministic arm split partitions users, rates " +
    "from distinct converters, z sign follows the rate gap") {
    import spark.implicits._
    val ev = (1L to 200L).flatMap { u =>
      // every user views; users 1..50 convert (value 500 purchase)
      Seq((u, "view", 1.0)) ++
        (if (u <= 50) Seq((u, "purchase", 500.0)) else Nil)
    }.toDF("user_id", "event_type", "value")
    val out = Stats.abTestReport(ev, "user_id", "event_type", "value",
      "purchase", 200.0, "s1").collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Long]("n_users")).sum === 200L)
    assert(out.map(_.getAs[Long]("n_converted")).sum === 50L)
    val byArm = out.map(r => r.getString(0) ->
      (r.getAs[Long]("n_users"), r.getAs[Long]("n_converted"),
        r.getAs[Double]("z"))).toMap
    // both rows carry the SAME z; its sign matches rate(A) - rate(B)
    val za = byArm("A")._3
    assert(za === byArm("B")._3)
    val rateA = byArm("A")._2.toDouble / byArm("A")._1
    val rateB = byArm("B")._2.toDouble / byArm("B")._1
    assert(math.signum(za) === math.signum(rateA - rateB))
    // same seed reproduces; the split is a pure function of ids
    val again = Stats.abTestReport(ev, "user_id", "event_type", "value",
      "purchase", 200.0, "s1").collect()
    assert(again.map(_.toString).toSeq === out.map(_.toString).toSeq)
    // degenerate split (one user → one arm only): the populated arm's
    // row must still report, with z NULL — not an empty frame
    val one = Seq((1L, "view", 1.0), (1L, "purchase", 500.0))
      .toDF("user_id", "event_type", "value")
    val deg = Stats.abTestReport(one, "user_id", "event_type", "value",
      "purchase", 200.0, "s1").collect()
    assert(deg.length === 1)
    assert(deg.head.getAs[Long]("n_users") === 1L)
    assert(deg.head.isNullAt(deg.head.fieldIndex("z")))
  }

  test("dpNoisyCounts: deterministic, counts perturbed, noise scales " +
    "inversely with epsilon") {
    val df = (1 to 60).map(i => s"k${i % 3}").toDF("k")
    val a = Stats.dpNoisyCounts(df, "k", 1.0, "s").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val b = Stats.dpNoisyCounts(df, "k", 1.0, "s").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(a === b)
    assert(a.values.map(_._1).sum === 60L)
    // eps 0.5 doubles the noise magnitude exactly (same uniform draw)
    val half = Stats.dpNoisyCounts(df, "k", 0.5, "s").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    a.foreach { case (k, (n, noisy)) =>
      assert(math.abs((half(k) - n) - 2.0 * (noisy - n)) < 1e-5)
    }
    // a different seed draws different noise somewhere
    val other = Stats.dpNoisyCounts(df, "k", 1.0, "t").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(other != a.view.mapValues(_._2).toMap)
  }

  test("kfold: deterministic md5 assignment; report partitions the corpus") {
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, "w " * (i % 7 + 1), if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val f1 = Curation.kfold(docs, "doc_id", k = 5, seed = "cv0")
    val f2 = Curation.kfold(docs, "doc_id", k = 5, seed = "cv0")
    assert(f1.select("doc_id", "fold").except(
      f2.select("doc_id", "fold")).isEmpty)
    val folds = f1.select("fold").distinct().collect().map(_.getInt(0))
    assert(folds.forall(f => f >= 0 && f < 5))
    val rep = Curation.kfoldReport(docs, "doc_id", "text", "lang", "en",
      k = 5, seed = "cv0").collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum === 200L)
    // a different seed reshuffles at least one document
    val f3 = Curation.kfold(docs, "doc_id", k = 5, seed = "cv1")
    assert(f1.select("doc_id", "fold").except(
      f3.select("doc_id", "fold")).count() > 0)
  }

  test("kaplanMeier: risk sets count censored subjects, censored-only " +
    "times are not emitted, d=n collapses survival to exactly 0") {
    import spark.implicits._
    // grp A: events at t=5 (2 of 4 at risk), censored at 8, event at 10
    //   -> S(5) = 1 - 2/4 = 0.5; at t=10 the last subject fails (d=n)
    //   -> S(10) = 0 exactly, censor time 8 emits no row
    val subj = Seq(
      ("A", 5L, 1), ("A", 5L, 1), ("A", 8L, 0), ("A", 10L, 1),
      ("B", 3L, 1), ("B", 7L, 0)
    ).toDF("grp", "dur", "ev")
    val out = graft.ops.Stats.kaplanMeier(subj, "grp", "dur", "ev")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out === Array(
      ("A", 5L, 4L, 2L, 0.5),
      ("A", 10L, 1L, 1L, 0.0),
      ("B", 3L, 2L, 1L, 0.5)))
  }

  test("groupedPercentiles: interpolated edges per group on grid " +
    "values, row counts preserved") {
    import spark.implicits._
    // group a: 0..15 (on the 2^-4 grid already): p50 = 7.5 by the
    // (n-1)p interpolation; group b: constant
    val df = ((0 until 16).map(i => ("a", i.toDouble)) ++
      Seq(("b", 3.0), ("b", 3.0))).toDF("k0", "v0")
    val out = graft.ops.Stats.groupedPercentiles(df, "k0", "v0",
      probs = Seq(0.5, 0.95)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap2
    assert(out("a") === (16L, 7.5, 14.25))  // (15)·0.95 = 14.25
    assert(out("b") === (2L, 3.0, 3.0))
  }

  test("quantileDrift: a pure location shift moves every quantile by " +
    "exactly the shift; one-sided groups drop") {
    import spark.implicits._
    val a = ((0 until 16).map(i => ("x", i.toDouble)) ++
      Seq(("only_a", 1.0))).toDF("k0", "v0")
    val b = ((0 until 16).map(i => ("x", i + 2.0)) ++
      Seq(("only_b", 1.0))).toDF("k0", "v0")
    val out = graft.ops.Stats.quantileDrift(a, b, "k0", "v0",
      probs = Seq(0.5, 0.9)).collect()
    assert(out.length === 1, "groups present in only one snapshot drop")
    val r = out.head
    assert(r.getString(0) === "x")
    assert(r.getAs[Double]("d_p50") === 2.0)
    assert(r.getAs[Double]("d_p90") === 2.0)
    assert(r.getAs[Double]("max_abs_shift") === 2.0)
    assert(r.getAs[Double]("p50_a") === 7.5 &&
      r.getAs[Double]("p50_b") === 9.5)
  }

  test("groupedPercentiles: column names carry the full decimal (p99_5, " +
    "p50_4), and colliding rounded names are rejected up front") {
    import spark.implicits._
    val df = (0 until 16).map(i => ("a", i.toDouble)).toDF("k0", "v0")
    val out = graft.ops.Stats.groupedPercentiles(df, "k0", "v0",
      probs = Seq(0.5, 0.504, 0.995))
    assert(out.columns.toSeq === Seq("grp", "n_rows", "p50", "p50_4",
      "p99_5"))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Stats.groupedPercentiles(df, "k0", "v0",
        probs = Seq(0.5, 0.5))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] =
      rows.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }

  test("theilSen: exact line recovered, single outlier does not move " +
    "the median slope (the OLS-breaking case)") {
    import spark.implicits._
    // y = 2x + 1 at x = 1..5, with y(5) corrupted to 100: most pairwise
    // slopes are exactly 2, so the median slope stays 2 and the median
    // intercept stays 1 (OLS would be dragged far off)
    val pts = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.0),
      (5.0, 100.0)).map { case (x, y) => ("g", x, y) }
      .toDF("k0", "x0", "y0")
    val out = graft.ops.Stats.theilSen(pts, "k0", "x0", "y0").collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_points") === 5L)
    assert(out(0).getAs[Double]("slope") === 2.0)
    assert(out(0).getAs[Double]("intercept") === 1.0)
  }

  test("mutualInformation: identical columns give MI = ln 2 on a " +
    "2-symbol uniform frame; independent columns give ~0") {
    import spark.implicits._
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x0", "y0")
    val outDep = graft.ops.Stats.mutualInformation(dep, "x0", "y0")
      .collect()
    assert(math.abs(outDep.map(_.getAs[Double]("contrib")).sum -
      math.log(2.0)) < 1e-5)
    assert(outDep.forall(r => math.abs(r.getAs[Double]("pmi") -
      math.log(2.0)) < 1e-5))
    // x uniform over {a,b} crossed with y uniform over {c,d}
    val ind = (for (x <- Seq("a", "b"); y <- Seq("c", "d"))
      yield (x, y)).toDF("x0", "y0")
    val outInd = graft.ops.Stats.mutualInformation(ind, "x0", "y0")
      .collect()
    assert(outInd.forall(r => math.abs(r.getAs[Double]("pmi")) < 1e-9))
  }

  test("kruskalWallis: textbook two-group H, mean ranks, df") {
    // a = {1,2,3}, b = {4,5,6}: ranks 1..6, Ra = 6, Rb = 15 →
    // H = 12/(6·7)·(36/3 + 225/3) − 3·7 = 3.857143 (no ties, C = 1)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val out = Stats.kruskalWallis(df, "g", "v").collect()
    assert(out.length === 2)
    val a = out.find(_.getAs[String]("grp") == "a").get
    val b = out.find(_.getAs[String]("grp") == "b").get
    assert(a.getAs[Double]("mean_rank") === 2.0)
    assert(b.getAs[Double]("mean_rank") === 5.0)
    assert(a.getAs[Double]("h") === 3.857143)
    assert(a.getAs[Double]("h_tie_corrected") === 3.857143)
    assert(a.getAs[Long]("df_h") === 1L)
    // ε² = (H − k + 1)/(N − k) = (3.857142857 − 1)/4
    assert(math.abs(a.getAs[Double]("epsilon_sq") - 0.714286) < 1e-6)
  }

  test("kruskalWallis: fully tied data degenerates — tie correction " +
    "hits zero and the corrected H goes NULL, ranks stay midpoint") {
    val df = Seq(("a", 7.0), ("a", 7.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val out = Stats.kruskalWallis(df, "g", "v").collect()
    assert(out.forall(_.getAs[Double]("mean_rank") === 2.5))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("h_tie_corrected"))))
    assert(out.forall(_.getAs[Double]("h") === 0.0))
  }

  test("anovaOneWay: textbook three-group decomposition — SSB 6, " +
    "SSW 6, F 3, eta-squared 0.5; constant data degenerates to NULL F") {
    // A = {1,2,3}, B = {2,3,4}, C = {3,4,5}: S = 27, S²/N = 81,
    // Σ S_g²/n_g = 12 + 27 + 48 = 87 → SSB = 6; Q = 93 → SST = 12
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 3.0), ("c", 4.0), ("c", 5.0)).toDF("g", "v")
    val out = Stats.anovaOneWay(df, "g", "v").collect()
    assert(out.length === 3)
    val byG = out.map(r => r.getAs[String]("grp") -> r).toMap
    assert(byG("a").getAs[Double]("mean_g") === 2.0)
    assert(byG("c").getAs[Double]("mean_g") === 4.0)
    out.foreach { r =>
      assert(r.getAs[Double]("ss_between") === 6.0)
      assert(r.getAs[Double]("ss_within") === 6.0)
      assert(r.getAs[Long]("df_between") === 2L)
      assert(r.getAs[Long]("df_within") === 6L)
      assert(r.getAs[Double]("f_stat") === 3.0)
      assert(r.getAs[Double]("eta_sq") === 0.5)
    }
    // all-constant data: SSW = SST = 0 → F and eta² degrade to NULL,
    // and the rounded zero SSB must publish as +0.0 (not -0.0)
    val const = Seq(("a", 7.0), ("a", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val deg = Stats.anovaOneWay(const, "g", "v").collect()
    deg.foreach { r =>
      assert(r.getAs[Double]("ss_between") === 0.0)
      assert(!(1.0 / r.getAs[Double]("ss_between") < 0),
        "negative zero leaked through the + 0.0 guard")
      assert(r.isNullAt(r.fieldIndex("f_stat")))
      assert(r.isNullAt(r.fieldIndex("eta_sq")))
    }
  }

  test("cochranArmitage: hand-computed Z on a rising dose-response; " +
    "a flat trend publishes +0.0, never -0.0") {
    // scores 1/2/3, n = 10 each, successes 2/5/8: p̄ = 0.5,
    // T = 36 − 0.5·60 = 6, Var = 0.25·(140 − 120) = 5, Z = 6/√5
    val rows = (1 to 3).flatMap { s =>
      val r = s * 3 - 1
      Seq.fill(r)((s, 1L)) ++ Seq.fill(10 - r)((s, 0L))
    }
    val out = Stats.cochranArmitage(rows.toDF("s", "hit"), "s", "hit")
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_total") === 30L)
      assert(r.getAs[Double]("t_stat") === 6.0)
      assert(r.getAs[Double]("z") === 2.683282)
    }
    assert(out.map(_.getAs[Double]("rate")).toSeq ===
      Seq(0.2, 0.5, 0.8))
    // flat rates: T is exactly zero and must publish as +0.0
    val flat = (1 to 3).flatMap(s =>
      Seq.fill(5)((s, 1L)) ++ Seq.fill(5)((s, 0L)))
    val f = Stats.cochranArmitage(flat.toDF("s", "hit"), "s", "hit")
      .collect()
    f.foreach { r =>
      assert(r.getAs[Double]("t_stat") === 0.0)
      assert(!(1.0 / r.getAs[Double]("t_stat") < 0), "-0.0 leaked")
      assert(r.getAs[Double]("z") === 0.0)
    }
  }

  test("cohenKappa: the textbook 2x2 table gives kappa 0.4; perfect " +
    "agreement gives 1; marginal-skewed chance agreement is visible") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no: p_o = 0.7,
    // p_e = (25·30 + 25·20)/50² = 0.5 → κ = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes")) ++
      Seq.fill(15)(("no", "no"))
    val out = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.length === 2)
    val yes = out.find(_.getAs[String]("cls") == "yes").get
    assert(yes.getAs[Long]("n_a") === 25L)
    assert(yes.getAs[Long]("n_b") === 30L)
    assert(yes.getAs[Long]("n_agree") === 20L)
    out.foreach { r =>
      assert(r.getAs[Long]("n") === 50L)
      assert(r.getAs[Double]("p_o") === 0.7)
      assert(r.getAs[Double]("p_e") === 0.5)
      assert(r.getAs[Double]("kappa") === 0.4)
    }
    // perfect agreement: κ = 1 for any non-degenerate mix
    val perfect = Stats.cohenKappa(
      Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b"), "a", "b")
      .collect()
    assert(perfect.forall(_.getAs[Double]("kappa") === 1.0))
    // a class only one rater ever uses still reports both marginals
    val skew = Stats.cohenKappa(
      Seq(("x", "z"), ("x", "x")).toDF("a", "b"), "a", "b").collect()
    val z = skew.find(_.getAs[String]("cls") == "z").get
    assert(z.getAs[Long]("n_a") === 0L && z.getAs[Long]("n_b") === 1L)
  }
}
