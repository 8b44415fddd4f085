package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function & feature-engineering surface (SURVEY §2.7): every
  * reference "UDF" decomposes into built-in Column expressions, so the whole
  * family stays inside whole-stage codegen — zero udf() anywhere.
  *
  * Reference evidence: date features notebooks/weather_classification.ipynb
  * cell 8; season bucketing weather_forecasting.ipynb cell 11; cyclical
  * encodings ibid. cell 30; standardization dags/classification_dag.py:86-88;
  * label encoding weather_forecasting.ipynb cell 12; stratified split
  * dags/classification_dag.py:82-84; JSON parsing etl/transformer.py:24.
  */
object Features {

  /** Calendar/cyclical feature extraction (F7–F11). `dow_norm` is normalized
    * to pandas convention (Mon=0 … Sun=6) in ONE place, per SURVEY §7.3(1).
    */
  def dateFeatures(orders: DataFrame): DataFrame =
    orders
      .withColumn("yr", year(col("o_orderdate")))
      .withColumn("mon", month(col("o_orderdate")))
      .withColumn("dom", dayofmonth(col("o_orderdate")))
      .withColumn("doy", dayofyear(col("o_orderdate")))
      .withColumn("qtr", quarter(col("o_orderdate")))
      // Spark dayofweek: Sun=1..Sat=7  ->  pandas Mon=0..Sun=6
      .withColumn("dow_norm", (dayofweek(col("o_orderdate")) + 5) % 7)
      .withColumn("is_weekend", (col("dow_norm") >= 5).cast("int"))
      .withColumn("mon_name", date_format(col("o_orderdate"), "MMM"))
      .withColumn("season",
        when(col("mon").isin(12, 1, 2), "winter")
          .when(col("mon").isin(3, 4, 5), "spring")
          .when(col("mon").isin(6, 7, 8), "summer")
          .otherwise("autumn"))
      .withColumn("sin_mon", round(sin(lit(2 * math.Pi) * col("mon") / 12), 6))
      .withColumn("cos_mon", round(cos(lit(2 * math.Pi) * col("mon") / 12), 6))
      .select(col("o_orderkey"), col("yr"), col("mon"), col("dom"), col("doy"),
        col("qtr"), col("dow_norm"), col("is_weekend"), col("mon_name"),
        col("season"), col("sin_mon"), col("cos_mon"))
      .orderBy("o_orderkey")

  /** String/epoch/rounding scalar functions in one pass (F4/F6/F13/F14/F16/
    * F17/F18/F19).
    */
  def scalarFunctions(events: DataFrame): DataFrame =
    events
      .withColumn("file_key",
        concat_ws("_", col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd")))
      .withColumn("epoch_sec", unix_timestamp(col("ts")))
      .withColumn("value_r1", round(col("value"), 1))
      .withColumn("etype_upper", upper(col("event_type")))
      .withColumn("zone_rewrite",
        regexp_replace(concat(lit("raw/"), col("event_type")), "^raw/", "processed/"))
      .withColumn("is_high", (col("value") > 10).cast("int"))
      .withColumn("value_filled", coalesce(col("value"), lit(0.0)))
      .select(col("event_id"), col("file_key"), col("epoch_sec"),
        col("value_r1"), col("etype_upper"), col("zone_rewrite"),
        col("is_high"), col("value_filled"))
      .orderBy("event_id")

  /** JSON extraction (F20; etl/transformer.py:24, fixture events.props). */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
      .orderBy("event_type", "k")

  /** Per-group standardization (F21; classification_dag.py:86-88): (x−μ)/σ
    * via window aggregates — no collect, no fit/transform round-trip.
    */
  def standardize(orders: DataFrame): DataFrame = {
    val g = Window.partitionBy("o_orderstatus")
    orders
      .withColumn("z_price", round(
        (col("o_totalprice") - avg(col("o_totalprice")).over(g))
          / stddev_samp(col("o_totalprice")).over(g), 6))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("z_price"))
      .orderBy("o_orderkey")
  }

  /** Label encoding (F22; LabelEncoder = ordinal by sorted category). */
  def labelEncode(events: DataFrame): DataFrame =
    events.select(col("event_type")).distinct()
      .withColumn("label",
        dense_rank().over(Window.orderBy("event_type")) - 1)
      .orderBy("event_type")

  /** Stratified split (F23; classification_dag.py:82-84). Exact sklearn
    * row parity is impossible (different RNG) and never required — the
    * `stratify=y` contract is per-stratum test fraction ≈ testFrac
    * (within 1/n_stratum), splits disjoint and covering. Implemented as
    * percent_rank over a DETERMINISTIC pseudo-random ordering WITHIN each
    * label partition — md5 of (seed, row id), the [[graft.ops.Curation
    * .sampleExactK]] key recipe — cut at testFrac. One shuffle on the
    * label, no collect; the md5 order makes the assignment a pure
    * function of (seed, id): stable across runs, partitionings, and
    * engines, so the DuckDB oracle replays the exact split (a `rand(seed)`
    * ordering is partition-order-dependent and was only rows-checkable).
    * Reshuffle by changing `seed`; `idCol` must be unique per row.
    */
  def stratifiedSplit(df: DataFrame, idCol: String, labelCol: String,
                      testFrac: Double, seed: Long): (DataFrame, DataFrame) = {
    val key = md5(concat(lit(seed.toString), lit("_"),
      col(idCol).cast("string")))
    val w = Window.partitionBy(labelCol).orderBy(key, col(idCol))
    val tagged = df.withColumn("__pr", percent_rank().over(w))
    // test takes the TOP testFrac of ranks, STRICTLY above the cut:
    // percent_rank is 0 for the first row of every stratum (so singleton
    // strata stay in train — sklearn refuses splits that would empty a
    // class) and 1 for the last (so testFrac=0 yields an empty test set;
    // >= would pull the boundary row in whenever testFrac*(n-1) is
    // integral)
    (tagged.filter(col("__pr") <= 1.0 - testFrac).drop("__pr"),
      tagged.filter(col("__pr") > 1.0 - testFrac).drop("__pr"))
  }

  /** Per-stratum summary of [[stratifiedSplit]] — the `queries` surface
    * for F23, hash-checked: the md5-rank split is deterministic, so the
    * oracle replays the identical per-(label, split) counts; FeatureSpec
    * additionally asserts the proportion/disjoint/covering contract.
    */
  def stratifiedSplitSummary(df: DataFrame, idCol: String, labelCol: String,
                             testFrac: Double, seed: Long): DataFrame = {
    val (train, test) = stratifiedSplit(df, idCol, labelCol, testFrac, seed)
    train.withColumn("split", lit("train"))
      .unionByName(test.withColumn("split", lit("test")))
      .groupBy(col(labelCol), col("split"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col(labelCol), col("split"))
  }

  /** Calendar gap-fill (F3; extractor.py:126 day iteration): generate the
    * full day range and left-join per-day counts, zero-filling gaps.
    */
  def calendarGapFill(orders: DataFrame): DataFrame = {
    val bounds = orders.agg(
      min(to_date(col("o_orderdate"))).as("d0"),
      max(to_date(col("o_orderdate"))).as("d1"))
    val days = bounds.select(explode(
      expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val perDay = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    days.join(perDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  /** Two-branch staging union (§2.6; dags/etl_dag.py:50-64 — the COVID and
    * WEATHER extract branches land in one zone): per-branch projection then
    * unionByName.
    */
  def unionBranches(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), lit("CLICK").as("branch"),
        col("value"))
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), lit("VIEW").as("branch"),
        col("value"))
    clicks.unionByName(views).orderBy("event_id")
  }

  /** Equal-frequency discretizer (pandas `qcut` shape): exact interior
    * quantile edges via ONE distributed `percentile` aggregate (single
    * pass, map-side partials — never a global sort/ntile, which is the
    * scale-killer spelling of this op), broadcast back, bin id =
    * 1 + Σ [v ≥ edgeᵢ]. Returns the per-bin summary (bin, n_rows,
    * lo, hi) — the feature card a binned feature ships with.
    *
    * Engine-exactness: with integer-valued inputs the linearly
    * interpolated edges are exact in binary floating point in any engine
    * using the standard (1−f)·a + f·b rule (both Spark `percentile` and
    * DuckDB `quantile_cont` do), so the ≥-against-edge comparisons — and
    * therefore the bin populations — replay identically; fractional
    * inputs with denominators not a power of two would make edge
    * equality float-fragile, so gate-level use sticks to integral
    * measures.
    */
  def quantileBins(df: DataFrame, valCol: String, bins: Int): DataFrame = {
    require(bins >= 2, "quantileBins needs bins >= 2")
    val v = col(valCol).cast("double")
    val probs = (1 until bins).map(_.toDouble / bins)
    val edges = df.where(v.isNotNull).agg(
      expr(s"percentile($valCol, array(${probs.mkString(",")}))")
        .as("__e"))
    val binId = (1 until bins).foldLeft(lit(1)) { (acc, i) =>
      acc + when(v >= element_at(col("__e"), i), 1).otherwise(0)
    }
    df.where(v.isNotNull).crossJoin(broadcast(edges))
      .select(binId.as("bin"), v.as("__v"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("__v")), 6).as("lo"),
        round(max(col("__v")), 6).as("hi"))
      .orderBy("bin")
  }

  /** Leave-one-out target encoding: each row's category becomes the mean
    * target of the OTHER rows in its category, (Σy − yᵢ)/(n − 1) — the
    * high-cardinality categorical encoder that avoids the self-leakage a
    * plain group mean carries into training. Singleton categories fall
    * back to the global mean (the standard prior). One map-side-combined
    * groupBy(category) + one broadcast-scalar global mean + one equi-join
    * back — the encoder table is categories-bounded, never corpus-sized.
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
                      idCol: String): DataFrame = {
    val y = col(targetCol).cast("double")
    val stats = df.groupBy(col(catCol))
      .agg(sum(y).as("__sy"), count(lit(1)).as("__n"))
    val global = df.agg(avg(y).as("__gm"))
    df.select(col(idCol), col(catCol), y.as("__y"))
      .join(stats, catCol)
      .crossJoin(broadcast(global))
      .select(col(idCol), col(catCol),
        round(when(col("__n") > 1,
          (col("__sy") - col("__y")) / (col("__n") - 1).cast("double"))
          .otherwise(col("__gm")), 6).as("encoded"))
      .orderBy(idCol)
  }

  /** Quantile normalization across groups (the microarray/batch-effect
    * classic): rank each row within its group (ties broken by id — a
    * total, engine-reproducible order), replace the value with the MEAN
    * across groups of the values at that rank. After it, every group has
    * the identical value distribution — the strongest distribution-
    * matching normalizer short of learning a mapping, and the standard
    * fix when per-source value scales drift (n_chars, quality scores)
    * but you need cross-source comparability. Groups of unequal size
    * average over the groups PRESENT at each rank (the common
    * implementation choice).
    *
    * One group-keyed window (rank), one groupBy(rank) bounded by the max
    * group size, one equi-join back on rank — no global sort, no
    * corpus-wide state.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valCol), col(idCol))
    val ranked = df
      .select(col(groupCol), col(idCol), col(valCol))
      .withColumn("rank", row_number().over(w))
    val refs = ranked.groupBy(col("rank"))
      .agg(round(avg(col(valCol).cast("double")), 6).as("qnorm"))
    ranked.join(refs, "rank")
      .select(col(groupCol), col(idCol), col(valCol), col("rank"),
        col("qnorm"))
      .orderBy(groupCol, "rank")
  }
}
