package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-commerce analytics — the order-table staples every revenue
  * dashboard runs beyond the reference's per-status counts (reference
  * stops at the funnel/error-rate surface, streamlit/etl_logs.py:190-205):
  * RFM segmentation, cohort lifetime-value curves, inter-purchase timing.
  * All three collapse the order table to customer- or cohort-bounded
  * frames before any window.
  */
object Commerce {

  /** RFM segmentation (recency / frequency / monetary quintile scores) —
    * the classic customer-value grid. Each dimension is scored 1..q by
    * quantile edges; recency is INVERTED (recent = high score) per the
    * standard convention. Output: one row per (r, f, m) cell with its
    * customer count and average monetary value.
    *
    * Scale shape: orders collapse to one row per customer (map-side
    * combined); the quantile edges use the [[Curation.winsorize]]
    * dyadic-grid discipline — values quantize to a 2^-gridBits lattice
    * and the exact percentile runs WEIGHTED over the value histogram, so
    * the aggregation buffer is bounded by distinct quantized values,
    * never customer count (an oracle replays the same grid unweighted
    * over the rows: identical multiset, identical edges). Edges are
    * 1-row broadcast scalars; scoring is a pure projection.
    */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
                  amountCol: String, quantiles: Int = 5,
                  gridBits: Int = 4): DataFrame = {
    require(quantiles >= 2 && quantiles <= 10,
      "rfmSegments needs 2 <= quantiles <= 10")
    val scale = math.pow(2.0, gridBits)
    val horizon = orders.agg(max(col(dateCol)).as("__hz"))
    val per = orders
      .groupBy(col(custCol).as("cust"))
      .agg(max(col(dateCol)).as("__last"),
        count(lit(1)).as("__f"),
        sum(col(amountCol)).as("__m0"))
      .crossJoin(broadcast(horizon))
      .select(col("cust"),
        (floor(datediff(col("__hz"), col("__last")).cast("double")
          * scale) / scale).as("rec"),
        (floor(col("__f").cast("double") * scale) / scale).as("freq"),
        (floor(round(col("__m0"), 2).cast("double") * scale) / scale)
          .as("mon"))
      .localCheckpoint()
    val probs = (1 until quantiles).map(_.toDouble / quantiles)
    def edges(c: String) = broadcast(per
      .groupBy(col(c).as("__vq")).agg(count(lit(1)).as("__w"))
      .agg(expr(s"percentile(__vq, array(${probs.mkString(",")}), __w)")
        .as(s"__e_$c")))
    def bucket(c: String) = (1 until quantiles).foldLeft(lit(1)) {
      (acc, i) =>
        acc + when(col(c) >= element_at(col(s"__e_$c"), i), 1)
          .otherwise(0)
    }
    per
      .crossJoin(edges("rec")).crossJoin(edges("freq"))
      .crossJoin(edges("mon"))
      .select(col("mon"),
        (lit(quantiles + 1) - bucket("rec")).as("r_score"),
        bucket("freq").as("f_score"), bucket("mon").as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("mon")), 6).as("avg_monetary"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Cohort lifetime-value curve: customers cohorted by first-order
    * month; for each (cohort, months-since-cohort) the period revenue
    * and the CUMULATIVE revenue per cohort customer — the LTV ramp that
    * retention triangles don't show (retention counts actives, LTV
    * accumulates value).
    *
    * Scale shape: one customer-keyed groupBy for cohorts, one
    * customer-keyed equi-join back, one (cohort, age) groupBy — the
    * cumulative window runs over the cohorts×months-bounded frame,
    * partitioned by cohort. Period revenue is rounded to 2 BEFORE the
    * cumulative sum so the running total is exact cross-engine.
    */
  def cohortLtv(orders: DataFrame, custCol: String, dateCol: String,
                amountCol: String): DataFrame = {
    val cohorts = orders
      .groupBy(col(custCol).as("cust"))
      .agg(min(trunc(col(dateCol), "MM")).as("cohort"))
      .localCheckpoint()
    val sizes = cohorts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_customers"))
    val ages = orders
      .select(col(custCol).as("cust"),
        trunc(col(dateCol), "MM").as("__om"),
        col(amountCol).as("__amt"))
      .join(cohorts, "cust")
      .groupBy(col("cohort"),
        months_between(col("__om"), col("cohort")).cast("int")
          .as("age_months"))
      .agg(round(sum(col("__amt")), 2).as("revenue"))
    val w = Window.partitionBy("cohort").orderBy("age_months")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ages
      .withColumn("__cum", sum(col("revenue")).over(w))
      .join(sizes, "cohort")
      .select(col("cohort"), col("age_months"), col("n_customers"),
        col("revenue"),
        round(col("__cum") / col("n_customers").cast("double"), 6)
          .as("ltv_per_customer"))
      .orderBy("cohort", "age_months")
  }

  /** Inter-purchase gaps: one row per consecutive order pair of a
    * customer with the day gap between them — the input to purchase-
    * cycle histograms and churn-risk thresholds. One customer-keyed
    * window pass; ties on the date break by the order id so the
    * consecutive sequence is total-ordered and deterministic.
    */
  /** Revenue-concentration readout — binned Lorenz/Gini plus top-share
    * lines ("how unequal is spend across customers; what fraction of
    * revenue do the top 1% / 10% hold?"). The Gini is EXACT on the
    * binned multiset (every customer priced at its dyadic bin floor)
    * via the rank-sum identity with ties:
    * G = 2·Σᵢ rankᵢ·xᵢ / (n·Σx) − (n+1)/n, where a bin of count nᵢ at
    * cumulative count Cᵢ₋₁ contributes vᵢ·(nᵢ·Cᵢ₋₁ + nᵢ(nᵢ+1)/2).
    * Top-p share counts floor(n·p) whole customers from the top bin
    * down (the boundary bin contributes partially, by count).
    *
    * Float discipline: bin values are exact multiples of 2^binBits,
    * counts are exact longs, every product stays < 2^53, and both
    * Σ-folds run in PINNED bin order — bit-identical across engines.
    *
    * Scale shape: one map-side-combined rollup to customers, one
    * histogram groupBy bounded by DISTINCT BINS (value-range/2^binBits,
    * not customer count); the windows run over that bins-bounded frame.
    */
  def giniConcentration(orders: DataFrame, custCol: String,
                        amountCol: String, binBits: Int = 11,
                        topPcts: Seq[Double] = Seq(0.01, 0.10))
      : DataFrame = {
    require(binBits >= 0 && binBits <= 20,
      "giniConcentration needs binBits in 0..20")
    require(topPcts.forall(p => p > 0.0 && p < 1.0),
      "giniConcentration top shares need p in (0,1)")
    val width = math.pow(2.0, binBits)
    val hist = orders
      .groupBy(col(custCol).as("__cust"))
      .agg(round(sum(col(amountCol)), 2).cast("double").as("__r"))
      .select((floor(col("__r") / width) * width).as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val asc = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("__c", sum(col("cnt")).over(asc))
      .withColumn("__d", sum(col("cnt")).over(desc))
      .withColumn("__n", sum(col("cnt")).over(tot))
      .withColumn("__tot", sum(col("v") * col("cnt")).over(tot))
      .withColumn("__rs", sum(col("v") * ((col("__c") - col("cnt"))
        * col("cnt") + col("cnt") * (col("cnt") + lit(1L)) / lit(2.0)))
        .over(tot))
    val shares = topPcts.map { p =>
      val k = floor(col("__n") * lit(p))
      val pct = math.round(p * 1000) / 10.0
      val name = "top" + (if (pct == pct.toInt) pct.toInt.toString
        else pct.toString.replace('.', '_')) + "_share"
      round(sum(col("v") * (least(col("__d"), k)
        - least(col("__d") - col("cnt"), k))).over(tot)
        / col("__tot"), 6).as(name)
    }
    cum.select(Seq(col("__n").as("n_customers"),
        count(lit(1)).over(tot).as("n_bins"),
        round(col("__tot"), 2).as("total_rev"),
        round(lit(2.0) * col("__rs") / (col("__n") * col("__tot"))
          - (col("__n") + lit(1.0)) / col("__n"), 6).as("gini"))
        ++ shares: _*)
      .limit(1)
  }

  /** ABC inventory classification — the Pareto workhorse behind every
    * stock-policy table ([[giniConcentration]] measures HOW skewed the
    * revenue is; ABC assigns the actionable class): items sorted by
    * revenue descending, class A while the cumulative share ≤ `aCut`
    * (tight control, frequent counts), B to `bCut`, C for the long
    * tail. Rank and the class counts ride along so the classic "20% of
    * items / 80% of revenue" readout is one filter away.
    *
    * Float discipline: per-item revenue publishes at 2 decimals; the
    * cumulative sum folds in the PINNED (revenue DESC, item) total
    * order, so both engines walk the identical IEEE accumulation and
    * the boundary comparisons against the dyadic-or-not cut literals
    * cannot diverge; shares re-round to 6.
    *
    * Scale shape: one map-side-combined groupBy to per-item revenue,
    * then ITEMS-bounded window arithmetic (the giniConcentration
    * allowlist shape — the corpus never enters the window).
    */
  def abcClasses(df: DataFrame, itemCol: String, revCol: String,
                 aCut: Double = 0.8, bCut: Double = 0.95): DataFrame = {
    require(aCut > 0.0 && aCut < bCut && bCut < 1.0,
      "abcClasses needs 0 < aCut < bCut < 1")
    val per = df
      .where(col(itemCol).isNotNull && col(revCol).isNotNull)
      .groupBy(col(itemCol).as("item"))
      .agg(round(sum(col(revCol).cast("double")), 2).as("revenue"))
    val ord = Window.orderBy(col("revenue").desc, col("item"))
    val run = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val all = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    per
      .withColumn("rank", row_number().over(ord))
      .withColumn("__cum", sum(col("revenue")).over(run))
      .withColumn("__tot", sum(col("revenue")).over(all))
      .withColumn("__share", col("__cum") / col("__tot"))
      .withColumn("abc_class",
        when(col("__share") <= aCut, "A")
          .when(col("__share") <= bCut, "B").otherwise("C"))
      .select(col("item"), col("rank"), col("revenue"),
        round(col("__share"), 6).as("cum_share"), col("abc_class"))
      .orderBy("rank")
  }

  def interOrderGaps(orders: DataFrame, custCol: String,
                     dateCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("cust").orderBy(col("__d"), col("__id"))
    orders
      .select(col(custCol).as("cust"), col(dateCol).as("__d"),
        col(idCol).as("__id"))
      .withColumn("__prev", lag(col("__d"), 1).over(w))
      .where(col("__prev").isNotNull)
      .select(col("cust"),
        datediff(col("__d"), col("__prev")).cast("long").as("gap_days"))
  }

  /** Market-concentration report per market — the antitrust/portfolio
    * diagnostics read off firm revenue shares: HHI = Σ sᵢ² (DOJ
    * thresholds: >0.25 highly concentrated), effective firm count
    * 1/HHI, CR4 (top-4 share), and Shannon entropy of the share
    * distribution. The "is this segment's revenue one whale or a
    * long tail?" readout [[giniConcentration]] summarizes with a
    * single index.
    *
    * Determinism: one corpus groupBy yields rounded per-firm revenue;
    * every share/HHI/entropy accumulation is a PINNED-ORDER window
    * fold (ORDER BY firm, ROWS UNBOUNDED both ways) over the
    * market-partitioned firm frame, so both engines fold identical
    * doubles in identical order; outputs round to 6.
    *
    * Scale shape: the corpus collapses map-side to the (market, firm)
    * frame before any window; the folds are per-market sequential over
    * the FIRM domain — concentration is a firms-bounded report (for
    * customer-grade firm domains at extreme scale, pre-bin upstream —
    * the [[giniConcentration]] histogram pattern).
    */
  def marketConcentration(df: DataFrame, marketCol: String,
                          firmCol: String, valueCol: String): DataFrame = {
    val per = df
      .select(col(marketCol).as("market"), col(firmCol).as("firm"),
        col(valueCol).cast("double").as("__v"))
      .where(col("market").isNotNull && col("firm").isNotNull)
      .groupBy(col("market"), col("firm"))
      .agg(round(sum(col("__v")), 2).as("__rev"))
    val wM = Window.partitionBy("market")
    val pin = wM.orderBy("firm").rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("__tot", sum(col("__rev")).over(pin))
      .withColumn("__s", col("__rev") / col("__tot"))
      .withColumn("__rnk", row_number().over(
        wM.orderBy(col("__rev").desc, col("firm"))))
      .withColumn("__hhi", sum(col("__s") * col("__s")).over(pin))
      .withColumn("__cr4", sum(when(col("__rnk") <= 4, col("__s"))
        .otherwise(lit(0.0))).over(pin))
      .withColumn("__ent", sum(when(col("__s") > 0.0,
        lit(0.0) - col("__s") * log(col("__s"))).otherwise(lit(0.0)))
        .over(pin))
      .withColumn("__n", count(lit(1)).over(wM))
      .withColumn("__r1", row_number().over(wM.orderBy("firm")))
      .where(col("__r1") === 1)
      .select(col("market"), col("__n").as("n_firms"),
        round(col("__hhi"), 6).as("hhi"),
        round(lit(1.0) / col("__hhi"), 6).as("effective_firms"),
        round(col("__cr4"), 6).as("cr4"),
        round(col("__ent"), 6).as("entropy"))
      .orderBy("market")
  }
}
