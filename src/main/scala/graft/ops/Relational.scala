package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface: projections/filters (SURVEY §2.2), joins (§2.3),
  * aggregations (§2.4), sorts/limits/distinct (§2.6).
  *
  * Every function is a pure `DataFrame => DataFrame` over already-loaded
  * inputs, so Catalyst sees one declarative plan per query: filters and
  * projections reach the parquet scan (pushdown + pruning), dimension tables
  * are broadcast explicitly, and the only shuffles are the group-by /
  * join-key exchanges that the semantics require. That is the scale story:
  * the same plans hold at 100 TB with partitioned inputs.
  *
  * Reference semantics re-expressed (cites into /root/reference):
  *  - ETL funnel per country: streamlit/etl_logs.py:188-204
  *  - dashboard scalar metrics / error rates: streamlit/etl_logs.py:125-360
  *  - dedup-on-load anti-join: etl/loader.py:36-57, database/operations.py:175-206
  *  - left join degraded to inner by post-filter: database/operations.py:113-120
  */
object Relational {

  /** ETL funnel (etl_logs.py:188-204): per-nation extract→transform→load style
    * counts over the customer→orders→lineitem chain. Left joins preserve
    * customers with no downstream rows; nation dim is broadcast.
    */
  def funnel(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
             nation: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left")
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"), "left")
      .groupBy(nation("n_name").as("nation"))
      .agg(
        countDistinct(customer("c_custkey")).as("n_customers"),
        countDistinct(orders("o_orderkey")).as("n_orders"),
        count(lineitem("l_orderkey")).as("n_lineitems"),
        sum(when(orders("o_orderstatus") === "F", 1).otherwise(0)).as("n_fulfilled"))
      .orderBy("nation")

  /** Projection + equality/range predicates (P1/P4/P5; operations.py:113-128):
    * pushed to the parquet scan — the 100 TB plan reads only 4 columns and
    * skips row groups outside the date range.
    */
  def projectFilter(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderstatus") === "O" &&
        col("o_orderdate").between("1996-01-01", "1997-12-31"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
      .orderBy("o_orderkey")

  /** IN-list + threshold predicates (P7/P9; etl_logs.py:105-117,475). */
  def inListThreshold(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag").isin("A", "R") && col("l_quantity") >= 30)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")

  /** 4-way inner join chain (J2/J5; operations.py:209-236): region→nation→
    * customer are broadcast dims; the only shuffle is the final group-by.
    */
  def multiJoinAgg(region: DataFrame, nation: DataFrame, customer: DataFrame,
                   orders: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_revenue"))
      .orderBy("region", "nation")

  /** Left join degraded to inner by a post-join status filter — replicated
    * exactly as the reference wrote it (J3; operations.py:113-120 filters
    * `t.status='Processed'` after a LEFT JOIN, which drops the NULL rows).
    */
  def leftJoinStatusFilter(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"), "left")
      .filter(col("l_returnflag") === "R")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_returned"))
      .orderBy("priority")

  /** Funnel with left-join chain kept outer (J4; etl_logs.py:195-198):
    * orders that never shipped still counted, via CASE on the null side.
    */
  def leftFunnelStatus(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem.select(col("l_orderkey"),
          col("l_linestatus")).dropDuplicates("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("stage",
        when(col("l_orderkey").isNotNull, "Shipped").otherwise("Order Only"))
      .groupBy("stage")
      .agg(countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("stage")

  /** Dedup-before-insert as a real anti-join (J6/C4; etl/loader.py:36-57 +
    * operations.py:175-206): the reference probes existence row-by-row
    * (N+1 SELECTs); the set-based form is one `left_anti` per batch —
    * a single shuffle instead of N round-trips, the load-bearing change
    * for 100 TB ingest.
    */
  def antiJoinNewRows(incoming: DataFrame, existing: DataFrame,
                      keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).dropDuplicates(keys),
      keys, "left_anti")

  /** Conditional aggregates + ratio (A4/A6; etl_logs.py:152,332-333):
    * error-rate style percentage per group, single map-side-combinable pass.
    */
  def conditionalRates(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("value") >= 10, 1).otherwise(0)).as("n_high"),
        round(sum(when(col("value") >= 10, 1).otherwise(0)) * 100.0
          / count(lit(1)), 2).as("high_rate_pct"))
      .orderBy("event_type")

  /** COUNT DISTINCT + AVG over computed durations (A3/A5; etl_logs.py:191,298):
    * epoch-difference between order and ship dates.
    */
  def distinctAndDurations(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        round(avg(unix_timestamp(col("l_shipdate")) -
          unix_timestamp(col("o_orderdate"))), 2).as("avg_ship_delay_sec"))
      .orderBy("status")

  /** describe()-style summary (A12; weather_analysis.py:151): count / mean /
    * std / min / quartiles / max in ONE aggregation pass (exact percentiles;
    * at 100 TB swap `percentile` → `percentile_approx` — same plan shape).
    */
  def describeColumn(df: DataFrame, c: String): DataFrame =
    df.agg(
      count(col(c)).as("n"),
      round(avg(col(c)), 6).as("mean"),
      round(stddev_samp(col(c)), 6).as("std"),
      round(min(col(c)), 6).as("min"),
      // one array-percentile: a single sort buffer for all three
      // quartiles instead of three independent ones
      expr(s"percentile($c, array(0.25, 0.5, 0.75))").as("__qs"),
      round(max(col(c)), 6).as("max"))
      .select(col("n"), col("mean"), col("std"), col("min"),
        round(element_at(col("__qs"), 1), 6).as("q1"),
        round(element_at(col("__qs"), 2), 6).as("median"),
        round(element_at(col("__qs"), 3), 6).as("q3"),
        col("max"))

  /** Parameterized dashboard funnel (§3.2; streamlit/etl_logs.py:104-117
    * splices user-selected filters into SQL f-strings — here they are
    * typed Column predicates, so Catalyst sees real filters, pushdown
    * works, and the injection hazard is structurally gone).
    */
  def funnelFiltered(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, nation: DataFrame,
                     dateFrom: Option[String] = None,
                     dateTo: Option[String] = None,
                     nations: Seq[String] = Nil): DataFrame = {
    val o0 = dateFrom.map(d => orders.filter(col("o_orderdate") >= lit(d)))
      .getOrElse(orders)
    val o = dateTo.map(d => o0.filter(col("o_orderdate") <= lit(d)))
      .getOrElse(o0)
    val n = if (nations.nonEmpty)
      nation.filter(col("n_name").isin(nations.map(x => x: Any): _*))
    else nation
    funnel(customer, o, lineitem, n)
  }

  /** Skew-salted equi-join — the join-side twin of [[saltedAgg]], for the
    * case AQE's skew splitting can't reach (a single hot key bigger than
    * any split threshold). The probe side spreads each key across `salt`
    * sub-keys (deterministically, hashing `saltSrc` — pass a unique row
    * id so the spread is uniform); the build side is replicated `salt`
    * times via a small explode. Each probe row matches exactly ONE
    * replica, so the result is row-identical to the plain join while the
    * hot key's rows land on `salt` different reducers. Replication cost:
    * build side × salt — use only when build ≪ probe and the key
    * histogram is pathological.
    */
  def saltedJoin(probe: DataFrame, saltSrc: Column, build: DataFrame,
                 key: String, salt: Int): DataFrame = {
    val p = probe.withColumn("__salt", pmod(hash(saltSrc), lit(salt)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-screened semi-join — the pre-shuffle reduction for the
    * "big probe ∈ selective build" shape: a bloom filter over the build
    * keys broadcasts to the probe scan and drops definite non-members
    * BEFORE the shuffle, then an exact left-semi join removes the bloom's
    * false positives — so the result is row-identical to the plain
    * semi-join while the shuffle carries only the (selectivity + fpp)
    * fraction of the probe. This is Spark's own runtime-filter machinery
    * (`BloomFilterAggregate`/`BloomFilterMightContain`, the classes
    * `InjectRuntimeFilter` plants), exposed as a first-class operator via
    * `GraftExtensions` because the optimizer only injects it under its
    * own heuristics — a pipeline author often KNOWS the build side is
    * selective (a date-bounded dimension, a contaminated-id list) and
    * wants the screen unconditionally.
    *
    * `estimatedItems` sizes the filter (fpp grows past it); the bloom is
    * one scalar aggregate over the build side, broadcast like any
    * parameter. Keys hash through xxhash64 on both sides, exactly as the
    * runtime filter does.
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                    buildKey: String, estimatedItems: Long): DataFrame = {
    require(estimatedItems > 0, "bloomSemiJoin needs estimatedItems > 0")
    // might_contain requires its bloom side to be a CONSTANT (or scalar
    // subquery) — the same contract the optimizer's runtime filter meets
    // by collapsing its subquery to a literal before execution. So the
    // filter materializes here as a one-row driver scalar (KB-to-MB
    // parameter, the autoPlanes-count class of statistics collection —
    // never data rows) and rides into the probe scan as a binary literal.
    val bfBytes = build.agg(
      expr(s"bloom_agg(xxhash64($buildKey), ${estimatedItems}L)"))
      .head.getAs[Array[Byte]](0)
    probe
      .filter(call_function("bloom_might_contain", lit(bfBytes),
        expr(s"xxhash64($probeKey)")))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
  }

  /** Skew-resistant two-stage aggregation: salt the hot key space into
    * `buckets` sub-keys, partially aggregate, then combine — the manual
    * form of what AQE's skew handling does for joins, for groupBys whose
    * key histogram is pathological (one key ≫ executor memory). Only
    * algebraic aggregates (count/sum/min/max — and avg as sum/count)
    * compose across the two stages.
    */
  def saltedAgg(df: DataFrame, keyCol: String, valCol: String,
                buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valCol)), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valCol)).as("__s"),
        min(col(valCol)).as("__mn"), max(col(valCol)).as("__mx"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"),
        round(sum(col("__s")), 4).as("total"),
        min(col("__mn")).as("min_v"),
        max(col("__mx")).as("max_v"),
        round(sum(col("__s")) / sum(col("__n")), 6).as("mean"))
      .orderBy(keyCol)

  /** describe() over MANY columns (A12; pandas describes every numeric
    * column at once). Two passes, both cheap:
    *
    *  1. count/mean/std/min/max for all columns in one WIDE codegen'd
    *     hash aggregate (declarative aggs only — no imperative buffer in
    *     the per-row path), unpivoted to a row per column with `stack`;
    *  2. exact medians from per-column VALUE HISTOGRAMS — unpivot, count
    *     per (column, value) in a codegen'd hash agg, then the weighted
    *     `percentile(v, 0.5, w)` whose imperative buffer takes one update
    *     per DISTINCT value instead of one per row.
    *
    * Putting the scalar `percentile` calls in the wide agg instead costs
    * rows×columns interpreted OpenHashMap updates (measured 2.8s vs 0.9s
    * at sf0.1); histogramming first bounds the slow path by the distinct
    * count — the same move that makes exact medians feasible at 100 TB
    * for bounded-cardinality columns (unbounded ones: swap
    * percentile_approx, same plan shape).
    */
  def describeColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        round(avg(col(c)), 6).as(s"mean_$c"),
        round(stddev_samp(col(c)), 6).as(s"std_$c"),
        round(min(col(c)).cast("double"), 6).as(s"min_$c"),
        round(max(col(c)).cast("double"), 6).as(s"max_$c"))
    }
    val stacked = cols.map(c =>
      s"'$c', n_$c, mean_$c, std_$c, min_$c, max_$c").mkString(", ")
    val base = df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stacked) " +
        "AS (col_name, n, mean, std, min, max)"))
    val names = array(cols.map(lit): _*)
    val medians = df
      .select(posexplode(array(cols.map(c => col(c).cast("double")): _*))
        .as(Seq("__i", "__v")))
      .select(element_at(names, col("__i") + 1).as("col_name"), col("__v"))
      .groupBy("col_name", "__v").agg(count(lit(1)).as("__w"))
      .groupBy("col_name")
      .agg(round(expr("percentile(__v, 0.5D, __w)"), 6).as("median"))
    // left join: on an empty input the histogram branch has no rows, but
    // the contract is still one row per column (n = 0, null stats)
    base.join(medians, Seq("col_name"), "left")
      .select("col_name", "n", "mean", "std", "min", "median", "max")
      .orderBy("col_name")
  }

  /** Pearson correlation matrix (A13; weather_analysis.py:124-127) — all
    * pairs in a single pass over the data, not one job per pair.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      (a, i) <- cols.zipWithIndex; (b, j) <- cols.zipWithIndex if i < j
    } yield round(corr(col(a), col(b)), 6).as(s"corr_${a}_$b")
    df.agg(pairs.head, pairs.tail: _*)
  }

  /** Per-column null counts (A14; weather_analysis.py:244-251). */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => sum(col(c).isNull.cast("long")).as(s"nulls_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Percentile-threshold extremes (P10/A15; weather_analysis.py:217-224):
    * two-phase like the reference — scalar percentile, then filter. The
    * scalar is computed distributed and crossed in (broadcast of 1 row),
    * NOT collected through the driver.
    */
  def percentileExtremes(orders: DataFrame): DataFrame = {
    val thr = orders.agg(
      expr("percentile(o_totalprice, 0.95)").as("thr"))
    orders.crossJoin(broadcast(thr))
      .filter(col("o_totalprice") >= col("thr"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** GROUP BY multi-key incl. derived date (A8; etl_logs.py:515). */
  def groupByDerivedDate(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("order_day"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("priority", "order_day")

  /** min/max + distinct values (A11/A17/O4; weather_analysis.py:47,63-64,198). */
  def domainSummary(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy("status")

  /** Top-k by measure (W8; weather_analysis.py:233-236). Unique tiebreak key
    * keeps the result deterministic under parallel execution.
    */
  def topK(orders: DataFrame, k: Int): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** Log tail: ORDER BY time DESC LIMIT n (W9/O2; etl_logs.py:385-387). */
  def logTail(events: DataFrame, n: Int): DataFrame =
    events
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .orderBy(col("ts").desc, col("event_id").asc)
      .limit(n)

  /** Deterministic dedup (O3; etl/loader.py:79-86 path-set dedup): keep the
    * first row per key by a total order — expressed as min-id semi-join so
    * the kept row is well-defined (dropDuplicates would be arbitrary).
    */
  def dedupFirstPerKey(events: DataFrame): DataFrame = {
    val firsts = events.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("event_id"))
    events.join(firsts, Seq("user_id", "event_type", "event_id"), "left_semi")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** Distributional window ranks: percent_rank / cume_dist / ntile(4)
    * per calendar-month cohort (the "where does this order sit in its
    * month" dashboard cut). The window orders by the UNIQUE
    * (measure, key) pair so ntile bucket assignment is deterministic
    * under any parallelism, and it is PARTITIONED by month — the sort is
    * per-cohort, never a global single-reducer sort; at 100 TB each
    * month's cohort sorts independently across the cluster. ntile is
    * cast to long so the schema is engine-portable (Spark's int32 vs
    * the oracle's int64).
    */
  def windowRanks(orders: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(date_trunc("month", col("o_orderdate")))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders.select(
      col("o_orderkey"),
      round(percent_rank().over(w), 6).as("pr"),
      round(cume_dist().over(w), 6).as("cd"),
      ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("o_orderkey")
  }

  /** Per-group top-k (the "top N orders per customer" slice — global
    * [[topK]]'s keyed sibling): row_number over a per-key window ordered
    * by (measure desc, unique key asc) so the cut is deterministic. The
    * window is PARTITIONED by the group key — at 100 TB every customer
    * ranks in parallel after one hash shuffle; never a global sort.
    */
  def groupTopK(orders: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Approximate aggregates — the sketch levers that replace exact
    * distinct-count and percentile at 100 TB: `approx_count_distinct`
    * (HyperLogLog++, default 5% rsd — constant memory per group vs the
    * exact op's per-key state) and `percentile_approx` (t-digest-style
    * quantile sketch — one pass, no value histogram materialization).
    * Per group both sketches AND their exact counterparts, so the error
    * is visible in the output itself (and property-gated in
    * RelationalOpsSpec-style tests rather than hash-compared — sketch
    * internals differ across engines by design; the driver records a
    * rows-only check).
    */
  def approxStats(events: DataFrame): DataFrame = {
    // the exact distinct count is aggregated SEPARATELY from the
    // sketches: mixing `countDistinct` with other aggregates triggers
    // Spark's two-level distinct rewrite, which built the HLL sketch,
    // the 10000-accuracy percentile buffer AND the exact-percentile
    // state once per (event_type, user_id) GROUP and shuffled those
    // 56-column buffers per user before merging (r16 plan audit,
    // plans/r16/q_approx_stats_before.txt) — ~20x the aggregate state
    // the query needs. Split, each aggregation is single-level
    // (sketches: one partial+merge per event_type; distinct: the
    // standard two-level count over 2-column rows), re-joined on the
    // event-type-bounded key. Exact columns are bit-identical;
    // sketch-column VALUES may shift within their documented error
    // bound (merge order changes — the reason this gate is rows-only
    // by design; q_approx_stats_exact hash-checks the exact half).
    val sketches = events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000))
          .as("approx_median"),
        median(col("value")).as("exact_median"))
    val exact = events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(sketches, Seq("event_type"))
      .select(col("event_type"), col("exact_users"), col("approx_users"),
        col("approx_median"), col("exact_median"))
      .orderBy("event_type")
  }

  /** Share-of-total contribution analysis (the "which segment drives
    * revenue" dashboard cut): per-group sum plus its fraction of the
    * grand total. The grand total is DERIVED from the group sums (a
    * groups-bounded second aggregate broadcast back) — the corpus is
    * scanned once, and the only single-row stage carries one partial per
    * group, never raw rows.
    */
  def shareOfTotal(orders: DataFrame): DataFrame = {
    val g = orders.groupBy(col("o_orderpriority"))
      .agg(sum(col("o_totalprice")).as("__s"))
    val t = g.agg(sum(col("__s")).as("__t"))
    g.crossJoin(broadcast(t))
      .select(col("o_orderpriority"),
        round(col("__s"), 2).as("revenue"),
        round(col("__s") / col("__t"), 6).as("share"))
      .orderBy("o_orderpriority")
  }

  /** Per-key mode (most frequent label; pandas `.mode()` / SQL `mode()`):
    * highest count wins, ties break to the lexicographically SMALLEST
    * label so the answer is total and engine-independent. NULL labels are
    * excluded up front (pandas `.mode()`'s dropna default — and the only
    * portable choice: engines disagree on where NULL sorts in a
    * tie-break). Two map-side-combined aggregates — (key, label) counts,
    * then a `min_by` over the (-count, label) order — no window, no
    * sort, output = key cardinality.
    */
  def modePerKey(events: DataFrame, keyCol: String,
                 labelCol: String): DataFrame =
    events
      .where(col(labelCol).isNotNull)
      .groupBy(col(keyCol), col(labelCol)).agg(count(lit(1)).as("n"))
      .groupBy(col(keyCol))
      .agg(
        min_by(col(labelCol), struct((-col("n")).as("nn"), col(labelCol)))
          .as("mode_label"),
        max(col("n")).as("mode_n"))
      .orderBy(keyCol)

  /** Fixed-width value histogram (the dashboard distribution plot; also
    * the binning kernel Drift.psiDrift shares): bin = clamped
    * floor((v - lo) / width). NULL values are excluded — a null is a
    * missing measurement, not a minimal one (the same rule psiDrift
    * applies; without the filter, greatest(NULL, 0) would silently file
    * missing readings in bin 0). One map-side-combined groupBy whose
    * output is `bins` rows — corpus-size-independent. Bin ids are exact
    * cross-engine: IEEE division and floor on identical doubles.
    */
  def valueHistogram(events: DataFrame, lo: Double, width: Double,
                     bins: Int): DataFrame =
    events
      .where(col("value").isNotNull)
      .withColumn("bin", least(greatest(
        floor((col("value") - lo) / width), lit(0.0)), lit(bins - 1.0))
        .cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .orderBy("bin")

  /** Unpivot / melt (pandas `df.melt` — the wide→long reshape every
    * plotting/export path needs; inverse of the W10 pivot): per-flag
    * aggregates melted to (key, metric, value). The melt itself is a
    * zero-shuffle local expansion (Spark `Expand` node) over the
    * already-aggregated frame — rows × metrics, no join, no window.
    */
  def meltMetrics(lineitem: DataFrame): DataFrame = {
    val agg = lineitem.groupBy(col("l_returnflag")).agg(
      round(avg(col("l_discount")), 6).as("avg_disc"),
      round(sum(col("l_extendedprice")), 6).as("sum_price"),
      round(sum(col("l_quantity")), 6).as("sum_qty"))
    agg.unpivot(
      Array(col("l_returnflag")),
      Array(col("avg_disc"), col("sum_price"), col("sum_qty")),
      "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  /** Key-skew diagnosis report — the "should I salt this join?" evidence
    * query ([[saltedJoin]]'s decision input): one row of distribution
    * statistics over the per-key row counts. max/total share and the
    * p99-vs-median gap are the salting signals; the Shannon entropy (in
    * bits, vs the uniform log₂ n_keys ceiling) summarizes overall
    * balance. One map-side-combined groupBy(key) + one scalar aggregate
    * over the keys-bounded count frame — no window, no sort, no
    * key-count materialization beyond the aggregate.
    */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_key_rows"),
        round(avg(col("__c")), 6).as("avg_key_rows"),
        round(expr("percentile(__c, 0.5)"), 6).as("p50_key_rows"),
        round(expr("percentile(__c, 0.99)"), 6).as("p99_key_rows"),
        round(sum(col("__c") * log(2.0, col("__c"))), 9).as("__sxlx"))
      .select(col("n_keys"), col("n_rows"), col("max_key_rows"),
        col("avg_key_rows"), col("p50_key_rows"), col("p99_key_rows"),
        round(col("max_key_rows").cast("double") /
          col("n_rows").cast("double"), 6).as("top_key_share"),
        // H = log2(N) - (1/N) * sum(c * log2(c)) over the count frame
        round(log(2.0, col("n_rows").cast("double")) -
          col("__sxlx") / col("n_rows").cast("double"), 6)
          .as("key_entropy_bits"),
        round(log(2.0, col("n_keys").cast("double")), 6)
          .as("uniform_entropy_bits"))
  }

  /** 2-D skyline (Pareto frontier, maximizing both columns): rows no
    * other row weakly dominates (x' ≥ x ∧ y' ≥ y, strict in at least
    * one). Equal (x, y) duplicates are mutually non-dominating and all
    * survive — the oracle's NOT EXISTS spelling agrees.
    *
    * The naive spelling is an all-pairs anti-join; this one is the
    * sort-scan identity: group to one max-y per distinct x, take the
    * running max of y in descending-x order, and a distinct x is on the
    * frontier iff its max-y strictly beats the running max of every
    * strictly-greater x (the lag of the cumulative max — well-defined
    * because the frame has ONE row per x). Input rows then semi-join the
    * frontier pairs.
    *
    * The running max is DISTRIBUTED — with near-unique x (per-customer
    * spend) the distinct-x frame is input-sized, so a bare
    * `Window.orderBy` would funnel 100 TB through one reducer. Instead:
    * range-partition descending-x, run the cumulative max and its lag
    * WITHIN each partition in parallel, and resolve cross-partition
    * carry-in with one prefix-max over the per-partition maxima — a
    * frame bounded by the partition COUNT (the only single-partition
    * window left), broadcast back. prev(r) = greatest(partition-local
    * lag, carry-in from all higher-x partitions); NULL only for the
    * globally first row. Identical frontier for any partition-boundary
    * placement, so the sampling in repartitionByRange cannot change the
    * result.
    */
  def skyline(df: DataFrame, xCol: String, yCol: String,
              partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(partitions >= 1, "skyline needs partitions >= 1")
    val perX = df.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol).cast("double")).as("__my"))
    val parted = perX.repartitionByRange(partitions, col("__x").desc)
      .withColumn("__pid", spark_partition_id())
    val wp = Window.partitionBy(col("__pid")).orderBy(col("__x").desc)
    val local = parted
      .withColumn("__cm", max(col("__my"))
        .over(wp.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__lprev", lag(col("__cm"), 1).over(wp))
    val pmax = local.groupBy(col("__pid")).agg(max(col("__my")).as("__pm"))
    val prefix = pmax
      .withColumn("__pre", max(col("__pm")).over(Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__pre"))
    val frontier = local.join(broadcast(prefix), Seq("__pid"))
      // greatest() skips NULLs: first row of a partition has no local
      // lag, the first partition has no carry-in
      .withColumn("__prev", greatest(col("__lprev"), col("__pre")))
      .where(col("__prev").isNull || col("__my") > col("__prev"))
      .select(col("__x"), col("__my"))
    df.join(frontier,
      col(xCol) === col("__x") &&
        col(yCol).cast("double") === col("__my"))
      .drop("__x", "__my")
  }

  /** Price-volume-mix decomposition per group between two periods — the
    * BI bridge chart ("how much of the revenue change is quantity vs
    * price?"): with q = Σquantity, r = Σrevenue, p = r/q,
    * volume_effect = (q₁−q₀)·p₀ (Laspeyres volume at base price) and
    * price_effect = Δr − volume_effect (the Paasche price effect
    * (p₁−p₀)·q₁ pre-rounding). The identity volume + price = Δr holds
    * exactly in real arithmetic; since the published columns are
    * independently rounded (Δr to 2, effects to 6), price_effect is
    * COMPUTED as the rounded residual of the published delta_rev minus
    * the published volume_effect, so the published bridge closes by
    * construction.
    * Groups present in only one period are dropped (a ±100% bridge row
    * is a different report; NULL arithmetic would silently poison the
    * totals).
    *
    * Scale shape: one map-side-combined groupBy to (group, period)
    * sums, a groups-bounded pivot, pure projection arithmetic. Sums are
    * rounded to 2 BEFORE the derived math (the cross-engine rule), so
    * every effect is deterministic.
    */
  def priceVolumeMix(base: DataFrame, groupCol: String,
                     periodCol: String, qtyCol: String, revCol: String,
                     period0: String, period1: String): DataFrame = {
    val per = base
      .select(col(groupCol).as("grp"),
        col(periodCol).cast("string").as("__p"),
        col(qtyCol).cast("double").as("__q"),
        col(revCol).cast("double").as("__r"))
      .where(col("__p").isin(period0, period1))
      .groupBy(col("grp"), col("__p"))
      .agg(round(sum(col("__q")), 2).as("q"),
        round(sum(col("__r")), 2).as("r"))
    val piv = per.groupBy(col("grp"))
      .pivot("__p", Seq(period0, period1))
      .agg(first(col("q")).as("q"), first(col("r")).as("r"))
      .select(col("grp"), col(s"${period0}_q").as("q0"),
        col(s"${period0}_r").as("r0"), col(s"${period1}_q").as("q1"),
        col(s"${period1}_r").as("r1"))
      .where(col("q0").isNotNull && col("q1").isNotNull &&
        col("q0") =!= 0.0 && col("q1") =!= 0.0)
    piv
      .withColumn("__p0", col("r0") / col("q0"))
      .withColumn("__p1", col("r1") / col("q1"))
      .select(col("grp"), col("q0"), col("q1"), col("r0"), col("r1"),
        round(col("r1") - col("r0"), 2).as("delta_rev"),
        round((col("q1") - col("q0")) * col("__p0"), 6)
          .as("volume_effect"),
        // residual of the PUBLISHED columns: bridge closes exactly
        round(round(col("r1") - col("r0"), 2) -
          round((col("q1") - col("q0")) * col("__p0"), 6), 6)
          .as("price_effect"))
      .orderBy("grp")
  }

  /** Reciprocal-rank fusion — the standard hybrid-search combiner
    * (Cormack et al. 2009; what Elasticsearch/Vespa/LanceDB run to fuse
    * a keyword ranking with an embedding ranking): each input list
    * contributes 1/(kf + rank) for the ids it ranked, the fused order
    * is the score sum. Rank-based (not score-based), so the lists'
    * score scales never need calibrating against each other — the
    * reason RRF is the default fusion everywhere.
    *
    * Input contract: each frame carries (`idCol`, `rank`) with ranks
    * unique per list — exactly what [[graft.ops.Similarity.cosineTopK]]
    * (rk) and a ranked [[graft.ops.Text.keywordSearch]] emit. The
    * fusion is a fold of full-outer joins on the id over LIST-SIZED
    * frames (each bounded by its own top-k — never corpus-sized), the
    * score is a fixed-order expression sum (deterministic — no
    * float-order freedom), and the final rank is a total
    * (score DESC, id) order over the ≤ Σ top-k candidate union.
    *
    * Output: (fused_rank, id, n_lists, rrf_score) — `n_lists` is the
    * coverage count, the "found by both retrievers" signal.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, kf: Int = 60,
              topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(kf >= 1, "rrfFuse needs kf >= 1 (60 is the standard)")
    val renamed = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col("rank").as(s"__r$i"))
    }
    val joined = renamed.reduceLeft(
      (a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices.map(i =>
      when(col(s"__r$i").isNotNull,
        lit(1.0) / (lit(kf) + col(s"__r$i"))).otherwise(lit(0.0)))
      .reduce(_ + _)
    val nLists = rankings.indices.map(i =>
      when(col(s"__r$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
    joined
      .withColumn("__s", score)
      .withColumn("n_lists", nLists)
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("__s").desc, col(idCol))))
      .filter(col("fused_rank") <= topK)
      .select(col("fused_rank"), col(idCol), col("n_lists"),
        round(col("__s"), 6).as("rrf_score"))
      .orderBy("fused_rank")
  }
}
