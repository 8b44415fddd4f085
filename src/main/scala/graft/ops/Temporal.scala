package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — extension surface beyond the reference (which
  * only ever aligns series on EXACT dates, e.g. the forecasting DAG's
  * date-keyed weather reads). A real pipeline joining irregular series
  * needs the two relaxations implemented here:
  *
  *  - [[asofJoin]]: each left row picks the latest right row at-or-before
  *    its timestamp (pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *  - [[bandFollowers]]: equi-key + bounded time-range self-join ("events
  *    of the same key within the following w seconds").
  *
  * Neither exists as a native Spark operator, and the naive spellings are
  * scale-killers (an inequality theta-join plans as BNLJ / cartesian).
  * Both implementations here reduce to ONE hash shuffle:
  *
  *  - as-of: union both sides, ONE window pass per key ordered by time —
  *    `last(right_payload, ignoreNulls)` over the preceding frame is
  *    exactly "latest right row ≤ t". O(n log n) per key, no join at all.
  *  - band: quantize time into buckets the width of the band, explode the
  *    probe interval onto its ≤2 covering buckets, equi-join on
  *    (key, bucket), then apply the exact range predicate. The theta-join
  *    becomes a hash join whose fan-out is bounded by band density.
  */
object Temporal {

  /** As-of join: for each left row, the right-side `payload` columns of
    * the LATEST right row with the same key and `rightTime <= leftTime`
    * (inclusive, pandas `merge_asof(direction="backward")` semantics),
    * appended as `asof_<col>`; left rows with no qualifying right row
    * keep NULLs (left-outer semantics).
    *
    * Among right rows tied on (key, time) the one with the LARGEST
    * `tiebreak` value wins, so the result is deterministic under any
    * parallelism — mirror the same tiebreak in any oracle.
    *
    * Implementation: no join. Both sides are unioned (right tagged
    * side=0, left side=1 so equal timestamps sort right-before-left,
    * giving the inclusive bound), then one window pass per key ordered by
    * (time, side, tiebreak) carries the last non-null right payload
    * forward. The payload rides in ONE struct so all columns come from
    * the SAME matched row (per-column `last(ignoreNulls)` could mix
    * rows when a matched row holds NULL fields). At 100 TB this is one
    * shuffle on the key plus an in-partition sort — the same cost as any
    * keyed window — versus the O(|L|·|R|) BNLJ the inequality-join
    * spelling plans to.
    *
    * Right rows with a NULL key or NULL time can never match (SQL
    * inequality semantics) and are filtered before the union; left rows
    * with NULL time sort before all right rows (nulls-first) and so
    * correctly see no match.
    *
    * `toleranceSec` (pandas `merge_asof(tolerance=...)`): when set, a
    * match older than `leftTime - toleranceSec` is discarded — the
    * "state too stale to trust" bound. Applied AFTER the window pass on
    * the matched struct's own timestamp, so it costs one codegen'd
    * comparison, not a second window.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String], tiebreak: String,
               toleranceSec: Option[Long] = None): DataFrame = {
    // the union-window machinery injects these working columns into the
    // caller's frames — a caller column with one of these names would be
    // silently overwritten, so fail fast instead (same discipline as
    // compactParquet's require)
    val reserved = Set("__k", "__t", "__side", "__tb", "__r", "__m")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty, "asofJoin reserves internal column names " +
      s"${reserved.mkString(", ")}; input carries: ${clash.mkString(", ")}")
    val r = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"),
        col(rightTime).cast("timestamp").as("__t"),
        col(tiebreak).as("__tb"),
        struct((col(rightTime).cast("timestamp").as("__rt") +:
          payload.map(col)): _*).as("__r"))
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__side", lit(1))
    // unionByName fills the columns each side lacks (left: __tb/__r,
    // right: every left column) with typed NULLs
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__r"), ignoreNulls = true).over(w)
    val bounded = toleranceSec match {
      case Some(tol) => when(
        unix_micros(col("__m").getField("__rt")) >=
          unix_micros(col("__t")) - tol * 1000000L, col("__m"))
      case None => col("__m")
    }
    val out = u
      .withColumn("__m", matched)
      .where(col("__side") === 1)
      .withColumn("__m", bounded)
    payload.foldLeft(out) { (df, p) =>
      df.withColumn(s"asof_$p", col("__m").getField(p))
    }.select(left.columns.map(col) ++ payload.map(p => col(s"asof_$p")): _*)
  }

  /** Band (equi + range) self-join, aggregated: for each row of `events`,
    * the count and value-sum of OTHER rows with the same `key` whose time
    * falls in the half-open-from-the-left band `(t, t + widthSec]`.
    * Rows with no followers keep count 0 and a NULL sum (SQL empty-sum
    * semantics). Output: (id, n_next, sum_next) ordered by id.
    *
    * Implementation: bucket time by `widthSec` (exact integer microsecond
    * arithmetic — no float epoch). A probe interval of width `widthSec`
    * covers at most 2 consecutive buckets, so the probe side explodes
    * onto (bucket, bucket+1), joins the build side on (key, bucket) —
    * a plain hash equi-join — and the exact band predicate filters the
    * bucket-mates. Each build row lands in exactly ONE bucket, so no
    * pair is produced twice and no dedup pass is needed. This is the
    * standard bucketed range-join rewrite; fan-out per probe row is
    * bounded by 2× the per-key band density, never by table size.
    */
  def bandFollowers(events: DataFrame, key: String, time: String,
                    id: String, valueCol: String,
                    widthSec: Long): DataFrame = {
    val widthUs = widthSec * 1000000L
    val base = events.select(
      col(id).as("__id"), col(key).as("__k"),
      unix_micros(col(time).cast("timestamp")).as("__us"),
      col(valueCol).as("__v"))
    val probe = base
      .withColumn("__b", explode(array(
        expr(s"__us div ${widthUs}L"),
        expr(s"__us div ${widthUs}L + 1L"))))
      .select(col("__id"), col("__k"), col("__us"), col("__b"))
    val build = base.select(
      col("__k").as("__bk"), col("__us").as("__bus"),
      expr(s"__us div ${widthUs}L").as("__b"), col("__v"))
    val counts = probe
      .join(build,
        probe("__k") === col("__bk") && probe("__b") === build("__b") &&
          col("__bus") > col("__us") &&
          col("__bus") <= col("__us") + widthUs)
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__n"), round(sum(col("__v")), 6).as("sum_next"))
    base.select(col("__id").as(id))
      .join(counts, col(id) === counts("__id"), "left")
      .select(col(id), coalesce(col("__n"), lit(0L)).as("n_next"),
        col("sum_next"))
      .orderBy(id)
  }

  /** OHLC resample (pandas `resample('D').ohlc()` — the downsample every
    * time-series dashboard runs): per (key, day) the first/max/min/last
    * value plus count and sum. First/last are picked by (time, id) so
    * ties on the timestamp are deterministic; `min_by`/`max_by` over the
    * unique (time, id) struct makes the whole thing ONE map-side-combined
    * aggregate — one shuffle on (key, day), no window, no sort.
    */
  def ohlcResample(events: DataFrame, key: String, time: String,
                   id: String, valueCol: String): DataFrame =
    events
      .groupBy(col(key), to_date(col(time)).as("day"))
      .agg(
        min_by(col(valueCol), struct(col(time), col(id))).as("open"),
        round(max(col(valueCol)), 6).as("high"),
        round(min(col(valueCol)), 6).as("low"),
        max_by(col(valueCol), struct(col(time), col(id))).as("close"),
        count(lit(1)).as("n"),
        round(sum(col(valueCol)), 6).as("sum_value"))
      .orderBy(col(key), col("day"))

  /** Gap-based batch sessionization: one `[session_start, session_end]`
    * interval per (key, session), where a new session opens whenever the
    * gap to the previous event of the same key exceeds `gapSec` (the
    * batch twin of the streaming `Streams.sessionize` state machine, and
    * the classic web-analytics session definition).
    *
    * Scale shape: ONE window pass per key (lag + running sum) and ONE
    * groupBy on (key, session) — both shuffles are keyed by the session
    * key, so the whole thing is two stages with no self-join. Ties on the
    * timestamp cannot split a session (a zero gap is never > gapSec), so
    * the spans are deterministic under any parallelism.
    */
  def sessionSpans(events: DataFrame, keyCol: String, timeCol: String,
                   gapSec: Long): DataFrame = {
    require(gapSec > 0, "sessionSpans needs a positive gap")
    val w = Window.partitionBy("__k").orderBy("__t")
    events
      .select(col(keyCol).as("__k"), col(timeCol).as("__t"))
      .where(col("__k").isNotNull && col("__t").isNotNull)
      .withColumn("__gap",
        unix_micros(col("__t")) -
          unix_micros(lag(col("__t"), 1).over(w)))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSec * 1000000L, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__k"), col("__sid"))
      .agg(min(col("__t")).as("session_start"),
        max(col("__t")).as("session_end"))
      .select(col("__k").as(keyCol), col("session_start"),
        col("session_end"))
  }

  /** Per-day peak concurrency over closed `[start, end]` intervals — "how
    * many sessions were open at once" (the capacity-planning sweep-line
    * every ops dashboard needs; no native Spark operator exists).
    *
    * The naive spelling (self-join intervals against instants) is
    * quadratic; the sweep here is linear and TWO-LEVEL so it scales:
    *
    *  1. boundary deltas (+1 at start, −1 at end) are swept WITHIN each
    *     day by a day-partitioned running sum — per-day parallel, never
    *     a global sort of the interval table;
    *  2. mass crossing midnight is carried by a prefix sum over the
    *     per-day NET deltas — a frame bounded by the calendar span
    *     (cardinality-bounded single partition, WindowAuditSpec-listed).
    *
    *  Peak(day) = carry-in(day) + max within-day running sum. At equal
    *  timestamps starts are processed before ends (closed-interval
    *  convention: touching intervals count as concurrent); the per-day
    *  max is invariant to the remaining tie order because equal-(t,delta)
    *  runs are single-signed, so the result is deterministic — mirror
    *  the same `ORDER BY t, delta DESC` sweep in any oracle. Days with
    *  boundary activity are reported; a day fully inside one long
    *  interval contributes only carry and is not emitted (document in
    *  the gate, or gap-fill downstream with [[Features.calendarGapFill]]).
    */
  def maxConcurrency(intervals: DataFrame, startCol: String,
                     endCol: String): DataFrame = {
    // drop half-open rows BEFORE the boundary union: filtering nulls
    // per-boundary after the union would leave an unmatched +1/-1 that
    // permanently skews the midnight-carry prefix sum
    val closed = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
    val deltas = closed
      .select(col(startCol).as("__t"), lit(1).as("__d"))
      .unionAll(closed.select(col(endCol).as("__t"),
        lit(-1).as("__d")))
      .withColumn("__day", to_date(col("__t")))
    val dayNet = deltas.groupBy(col("__day"))
      .agg(sum(col("__d")).as("__net"))
    val carry = dayNet.withColumn("__carry",
      coalesce(sum(col("__net")).over(Window.orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val sweep = Window.partitionBy("__day")
      .orderBy(col("__t").asc, col("__d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = deltas.withColumn("__run", sum(col("__d")).over(sweep))
      .groupBy(col("__day")).agg(max(col("__run")).as("__peak"))
    // the start-of-day PLATEAU is a candidate peak too: a day whose
    // first boundaries are ends-only (sessions opened on prior days
    // closing) has max(__run) < 0, but carry sessions were open from
    // midnight — floor the within-day contribution at 0
    peaks.join(carry, "__day")
      .select(col("__day").as("day"),
        (col("__carry") + greatest(col("__peak"), lit(0L))).cast("long")
          .as("peak_concurrency"))
      .orderBy("day")
  }
}
