package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** Behavior specs for the temporal join operators (ops/Temporal.scala) on
  * hand-checkable frames: as-of inclusive bound, tie resolution, left-outer
  * NULLs, null-key hygiene; band-join boundary inclusion/exclusion and
  * bucket-edge correctness; OHLC first/last tie determinism.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    // (key, time, quoteId, px)
    (1L, ts("2024-01-01 10:00:00"), 10L, 1.0),
    (1L, ts("2024-01-01 11:00:00"), 11L, 2.0),
    (1L, ts("2024-01-01 11:00:00"), 12L, 3.0), // tie on time: larger id wins
    (2L, ts("2024-01-01 12:00:00"), 20L, 9.0)
  ).toDF("k", "t", "qid", "px")

  private lazy val trades = Seq(
    (100L, 1L, ts("2024-01-01 09:00:00")), // before any quote -> NULL
    (101L, 1L, ts("2024-01-01 10:30:00")), // -> quote 10
    (102L, 1L, ts("2024-01-01 11:00:00")), // exact tie -> quote 12 (max id)
    (103L, 1L, ts("2024-01-01 23:00:00")), // -> quote 12 (latest)
    (104L, 3L, ts("2024-01-01 10:00:00"))  // key with no quotes -> NULL
  ).toDF("tid", "k", "t")

  test("asofJoin: inclusive backward match, tie by max tiebreak, " +
    "left-outer NULLs for early rows and unmatched keys") {
    val out = Temporal.asofJoin(trades, quotes,
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
      payload = Seq("qid", "px"), tiebreak = "qid")
      .orderBy("tid")
      .select("tid", "asof_qid", "asof_px")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out === Array(
      (100L, None, None),
      (101L, Some(10L), Some(1.0)),
      (102L, Some(12L), Some(3.0)),
      (103L, Some(12L), Some(3.0)),
      (104L, None, None)))
  }

  test("asofJoin: payload columns come from the SAME matched row even " +
    "when the matched row carries NULL fields") {
    // latest quote has a NULL px: a per-column last(ignoreNulls) would
    // resurrect the older row's px; the struct match must not
    val q = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, Some(1.0)),
      (1L, ts("2024-01-01 11:00:00"), 11L, Option.empty[Double])
    ).toDF("k", "t", "qid", "px")
    val l = Seq((200L, 1L, ts("2024-01-01 12:00:00"))).toDF("tid", "k", "t")
    val r = Temporal.asofJoin(l, q, "k", "k", "t", "t",
      Seq("qid", "px"), "qid").collect().head
    assert(r.getAs[Long]("asof_qid") === 11L)
    assert(r.isNullAt(r.fieldIndex("asof_px")))
  }

  test("asofJoin: NULL right keys/times never match; NULL left time " +
    "yields no match") {
    val q = Seq(
      (Option.empty[Long], Some(ts("2024-01-01 10:00:00")), 10L, 1.0),
      (Some(1L), Option.empty[Timestamp], 11L, 2.0)
    ).toDF("k", "t", "qid", "px")
    val l = Seq(
      (300L, Option.empty[Long], Some(ts("2024-01-01 12:00:00"))),
      (301L, Some(1L), Option.empty[Timestamp])
    ).toDF("tid", "k", "t")
    val out = Temporal.asofJoin(l, q, "k", "k", "t", "t",
      Seq("qid"), "qid").orderBy("tid").collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("asof_qid"))))
  }

  test("asofJoin: toleranceSec discards matches older than the staleness " +
    "bound, keeps fresh ones, and leaves no-match rows NULL") {
    val out = Temporal.asofJoin(trades, quotes,
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
      payload = Seq("qid"), tiebreak = "qid",
      toleranceSec = Some(3600L)) // 1h staleness bound
      .orderBy("tid")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("tid")),
        if (r.isNullAt(r.fieldIndex("asof_qid"))) None
        else Some(r.getLong(r.fieldIndex("asof_qid")))))
    assert(out === Array(
      (100L, None),            // no match at all
      (101L, Some(10L)),       // 30 min old: fresh
      (102L, Some(12L)),       // exact tie: age 0
      (103L, None),            // quote 12 is 12h old: too stale
      (104L, None)))
  }

  test("bandFollowers: strict lower bound, inclusive upper bound, " +
    "cross-bucket matches counted exactly once") {
    // width 60s; events at 0s, 30s, 60s, 61s, plus another key
    val e = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, 1L, ts("2024-01-01 00:00:30"), 20.0),
      (3L, 1L, ts("2024-01-01 00:01:00"), 30.0), // = id1 + 60s: inclusive
      (4L, 1L, ts("2024-01-01 00:01:01"), 40.0), // > id1 + 60s: excluded
      (5L, 2L, ts("2024-01-01 00:00:10"), 50.0)  // other key
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Temporal.bandFollowers(e, "user_id", "ts", "event_id",
      "value", widthSec = 60L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out === Array(
      (1L, 2L, Some(50.0)),  // ids 2,3 (3 exactly at +60s, bucket edge)
      (2L, 2L, Some(70.0)),  // ids 3,4
      (3L, 1L, Some(40.0)),  // id 4
      (4L, 0L, None),
      (5L, 0L, None)))
  }

  test("bandFollowers matches the plain inequality-join spelling on " +
    "real data (bucketing is an exact rewrite)") {
    val e = Tables.events(spark, sfDir)
    val fast = Temporal.bandFollowers(e, "user_id", "ts", "event_id",
      "value", widthSec = 86400L)
    val a = e.select(col("event_id"), col("user_id"), col("ts"))
    val b = e.select(col("user_id").as("bu"), col("ts").as("bts"),
      col("event_id").as("bid"), col("value").as("bv"))
    val slow = a.join(b,
        col("bu") === col("user_id") && col("bts") > col("ts") &&
          col("bts") <= col("ts") + expr("INTERVAL 1 DAY"), "left")
      .groupBy("event_id")
      .agg(count(col("bid")).as("n_next"),
        round(sum(col("bv")), 6).as("sum_next"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("ohlcResample: first/last resolved by (time, id) — deterministic " +
    "under timestamp ties") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 5.0),
      (2L, 1L, ts("2024-01-01 00:00:00"), 7.0), // same ts: id breaks tie
      (3L, 1L, ts("2024-01-01 23:00:00"), 1.0),
      (4L, 1L, ts("2024-01-02 01:00:00"), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Temporal.ohlcResample(e, "user_id", "ts", "event_id", "value")
      .collect()
    assert(out.length === 2)
    val d1 = out.head
    assert(d1.getAs[Double]("open") === 5.0)   // id 1, not 2
    assert(d1.getAs[Double]("close") === 1.0)  // latest ts
    assert(d1.getAs[Double]("high") === 7.0)
    assert(d1.getAs[Double]("low") === 1.0)
    assert(d1.getAs[Long]("n") === 3L)
  }

  test("asofJoin plan: one keyed window, no join operator at all") {
    val plan = Temporal.asofJoin(trades, quotes, "k", "k", "t", "t",
      Seq("qid", "px"), "qid").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      "window must be partitioned by key")
  }

  test("bandFollowers plan: hash equi-join on (key, bucket) — no BNLJ, " +
    "no cartesian") {
    val plan = Temporal.bandFollowers(Tables.events(spark, sfDir),
      "user_id", "ts", "event_id", "value", 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must stay bucketed-equi:\n$plan")
  }

  test("sessionSpans: gap splits, single-event spans, null-key hygiene") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")), // 600 s gap -> same session
      (1L, ts("2024-01-01 12:00:00")), // > 1800 s -> new session
      (2L, ts("2024-01-01 10:00:00"))  // single-event session
    ).toDF("u", "t")
      .union(Seq((Option.empty[Long], Option(ts("2024-01-01 10:00:00"))))
        .toDF("u", "t"))
    val out = Temporal.sessionSpans(ev, "u", "t", gapSec = 1800L)
      .orderBy("u", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    assert(out === Array(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"))))
  }

  test("maxConcurrency: within-day peak, touching intervals concurrent, " +
    "midnight carry reaches the next day") {
    val iv = Seq(
      // day 1: two overlapping + one touching at the second's end
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")),
      (ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00")),
      // spans midnight: +1 on day 1 carries into day 2
      (ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")),
      (ts("2024-01-02 00:30:00"), ts("2024-01-02 00:45:00")),
      // ends-only day: the Jan 3 straddler closes on Jan 4 with no
      // other Jan 4 activity — the start-of-day PLATEAU (carry = 1)
      // must be the reported peak, not carry + (-1) = 0
      (ts("2024-01-03 22:00:00"), ts("2024-01-04 02:00:00"))
    ).toDF("s", "e")
    val out = Temporal.maxConcurrency(iv, "s", "e")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    // day 1 peak: [10:00,11:00] ∩ [10:30,12:00] = 2 (the 12:00 touch
    // also yields 2: -1 of the second and +1 of the third meet, starts
    // first -> 2); day 2 peak: midnight straddler + 00:30 interval = 2
    assert(out === Array(("2024-01-01", 2L), ("2024-01-02", 2L),
      ("2024-01-03", 1L), ("2024-01-04", 1L)))
  }

  test("maxConcurrency: half-open intervals (null start or end) are " +
    "dropped whole — no unmatched boundary skews later carries") {
    val iv = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      // still open: were its +1 kept, every later day's carry would be
      // permanently inflated by 1
      (ts("2024-01-01 10:30:00"), null),
      (null, ts("2024-01-01 12:00:00")),
      (ts("2024-01-03 09:00:00"), ts("2024-01-03 09:30:00"))
    ).toDF("s", "e")
    val out = Temporal.maxConcurrency(iv, "s", "e").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(out === Array(("2024-01-01", 1L), ("2024-01-03", 1L)))
  }

  test("maxConcurrency plan: the only unpartitioned window is over the " +
    "per-day net frame (calendar-bounded), sweep is day-partitioned") {
    val plan = Temporal.maxConcurrency(
      Temporal.sessionSpans(Tables.events(spark, sfDir), "user_id", "ts",
        1800L), "session_start", "session_end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"sweep is join-lean:\n$plan")
  }
}
