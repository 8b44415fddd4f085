package graft

import java.sql.Timestamp
import graft.ops.Events

/** Behavior specs for the event-analytics operators (ops/Events.scala):
  * cohort assignment and offsets; funnel ORDER sensitivity (a step-2 event
  * before the step-1 anchor must not convert), the per-step time bound,
  * and the zero-conversion row contract.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retentionCohorts: cohort = first active day; repeat activity " +
    "within a day counts once") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 23:00:00")), // same user+day: one active row
      (1L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-02 08:00:00")),
      (2L, ts("2024-01-03 08:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.retentionCohorts(e, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out === Array(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L)))
  }

  test("seqFunnel: order matters (step-2 event before the step-1 anchor " +
    "does not convert) and the time bound is enforced") {
    val e = Seq(
      // user 1: view 10:00 -> click 10:30 (converts)
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      // user 2: click BEFORE first view -> no conversion
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: click past the 1h bound -> no conversion
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:30:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.seqFunnel(e, "user_id", "ts", "event_type",
      Seq("view", "click"), withinSec = 3600L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out === Array((1L, "view", 3L), (2L, "click", 1L)))
  }

  test("seqFunnel: a zero-conversion step still emits its row, and later " +
    "steps anchor on the EARLIEST qualifying event") {
    val e = Seq(
      // view -> two qualifying clicks; anchor must be 10:10, so the
      // purchase at 11:30 is within 10:10+2h but NOT within 11:50+...
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 11:50:00"), "click"),
      (1L, ts("2024-01-01 10:05:00"), "purchase") // before click: no
    ).toDF("user_id", "ts", "event_type")
    val out = Events.seqFunnel(e, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), withinSec = 7200L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out === Array(
      (1L, "view", 1L), (2L, "click", 1L), (3L, "purchase", 0L)))
  }

  test("transitions: per-user bigrams with (ts, id) tie discipline and " +
    "row-normalized probabilities") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "B"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "A"),
      // user 2: same-timestamp pair — event_id 5 follows 4
      (2L, ts("2024-01-01 09:00:00"), 4L, "B"),
      (2L, ts("2024-01-01 09:00:00"), 5L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.transitions(e, "user_id", "ts", "event_id",
      "event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Double]("p")))
    assert(out === Array(
      ("A", "B", 1L, 1.0), ("B", "A", 1L, 0.5), ("B", "B", 1L, 0.5)))
  }

  test("lastTouchAttribution: latest preceding touch within lookback; " +
    "boundary inclusive at -L, exclusive at the conversion instant") {
    val e = Seq(
      // user 1: click then view -> view is the latest touch
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 11:30:00"), 2L, "view"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "purchase"),
      // user 2: conversion with no preceding event -> none
      (2L, ts("2024-01-01 12:00:00"), 4L, "purchase"),
      // user 3: touch outside the 2h lookback -> none; the same-instant
      // view must NOT be credited (strict upper bound)
      (3L, ts("2024-01-01 09:00:00"), 5L, "click"),
      (3L, ts("2024-01-01 12:00:00"), 6L, "view"),
      (3L, ts("2024-01-01 12:00:00"), 7L, "purchase"),
      // user 4: touch at EXACTLY t-2h -> inclusive, credited
      (4L, ts("2024-01-01 10:00:00"), 8L, "click"),
      (4L, ts("2024-01-01 12:00:00"), 9L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.lastTouchAttribution(e, "user_id", "ts", "event_id",
      "event_type", "purchase", lookbackSec = 7200L).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out === Array(("click", 1L), ("none", 2L), ("view", 1L)))
  }

  test("sessionPaths: gap splits sessions, paths order by (ts, id), " +
    "count ties break to the lexicographically first path") {
    val e = Seq(
      // user 1, session 1: view > click; session 2 (after gap): view
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 15:00:00"), 3L, "view"),
      // user 2: one session view > click (same-ts pair ordered by id)
      (2L, ts("2024-01-02 09:00:00"), 4L, "view"),
      (2L, ts("2024-01-02 09:00:00"), 5L, "click"),
      // user 3: single purchase
      (3L, ts("2024-01-03 11:00:00"), 6L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.sessionPaths(e, "user_id", "ts", "event_id",
      "event_type", gapSec = 3600L, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out === Array(("view>click", 2L), ("purchase", 1L),
      ("view", 1L)))
    // topK cuts deterministically after the tie-ordered sort
    val top1 = Events.sessionPaths(e, "user_id", "ts", "event_id",
      "event_type", gapSec = 3600L, topK = 1).collect()
    assert(top1.map(_.getString(0)).toSeq === Seq("view>click"))
  }

  test("linearAttribution: in-window touches split credit 1/n, " +
    "boundary [t-L, t), untouched conversions credit 'none' in full, " +
    "totals reconcile with the conversion count") {
    import spark.implicits._
    val ev = Seq(
      // user 1: two touches then a purchase -> 0.5 each
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:30:00"), 2L, "click"),
      (1L, ts("2024-01-01 11:00:00"), 3L, "purchase"),
      // user 2: touch exactly at t-L (included), one at t (excluded)
      (2L, ts("2024-01-01 09:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 5L, "click"),   // == purchase ts
      (2L, ts("2024-01-01 11:00:00"), 6L, "purchase"),
      // user 3: conversion with no touch in window
      (3L, ts("2024-01-01 11:00:00"), 7L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Events.linearAttribution(ev, "user_id", "ts",
      "event_id", "event_type", "purchase", lookbackSec = 7200L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("credit"), r.getAs[Long]("n_touchpoints"))).toMap
    assert(out("view") === ((1.5, 2L)))   // 0.5 (u1) + 1.0 (u2)
    assert(out("click") === ((0.5, 1L)))  // u2's same-instant click excluded
    assert(out("none") === ((1.0, 1L)))
    assert(math.abs(out.values.map(_._1).sum - 3.0) < 1e-9,
      "credit must reconcile with the 3 conversions")
  }

  test("rollingActiveUsers: overlapping users counted once per window, " +
    "window ends trimmed to real activity days") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-08 10:00:00"))
    ).toDF("user_id", "ts")
    val out = graft.ops.Events.rollingActiveUsers(ev, "user_id", "ts", 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // day 1: {1}; day 2: {1,2}; day 3: {1,2} (user 1 deduped);
    // day 8: window [2..8] -> {1(day3), 2(day2), 3} = 3
    assert(out === Map("2024-01-01" -> 1L, "2024-01-02" -> 2L,
      "2024-01-03" -> 2L, "2024-01-08" -> 3L))
  }

  test("timeDecayAttribution: recency-weighted shares 2^(-dt/halflife), " +
    "reconciling to the conversion count") {
    import spark.implicits._
    // touches 30min and 60min before the conversion, halflife 1h:
    // w = 2^-0.5, 2^-1 -> shares w1/(w1+w2), w2/(w1+w2)
    val ev = Seq(
      (1L, ts("2024-01-01 10:30:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 11:00:00"), 3L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Events.timeDecayAttribution(ev, "user_id", "ts",
      "event_id", "event_type", "purchase", 7200L, 3600L)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("credit"))
      .toMap
    val w1 = math.pow(2.0, -0.5); val w2 = 0.5
    assert(math.abs(out("view") - w1 / (w1 + w2)) < 1e-6)
    assert(math.abs(out("click") - w2 / (w1 + w2)) < 1e-6)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    // the more recent touch must out-earn the older one
    assert(out("view") > out("click"))
  }

  test("timeToConvert: first-anchor rule, earliest-after conversion, " +
    "pre-anchor conversions ignored, non-converters absent") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "purchase"),  // BEFORE the anchor
      (1L, ts("2024-01-01 11:00:00"), "view"),      // anchor
      (1L, ts("2024-01-01 11:30:00"), "purchase"),  // earliest after
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "view")       // never converts
    ).toDF("user_id", "ts", "event_type")
    val out = graft.ops.Events.timeToConvert(ev, "user_id", "ts",
      "event_type", "view", "purchase")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out === Array((1L, 30.0)))
  }

  test("growthAccounting: new/retained/resurrected/churned classify " +
    "per the week-lag rules; churn lands on the absent week") {
    import spark.implicits._
    // Mondays: 2024-01-01, -08, -15, -22. User 1: w1, w2, w4
    // (new, retained, resurrected); user 2: w1 only (churned in w2)
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-24 10:00:00")),
      (2L, ts("2024-01-03 10:00:00"))
    ).toDF("user_id", "ts")
    val out = graft.ops.Events.growthAccounting(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(
      ("2024-01-01", 2L, 0L, 0L, 0L),
      ("2024-01-08", 0L, 1L, 0L, 1L),   // user 1 retained, user 2 churned
      ("2024-01-15", 0L, 0L, 0L, 1L),   // DEAD week still carries churn
      ("2024-01-22", 0L, 0L, 1L, 0L))) // user 1 resurrected after the gap
    // nothing past the horizon: user 1's final-week activity is
    // right-censored, not churned into 2024-01-29
  }

  test("cumulativeUsers: first-seen days only, running total counts " +
    "each user once") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-05 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")), (3L, ts("2024-01-03 11:00:00"))
    ).toDF("user_id", "ts")
    val out = graft.ops.Events.cumulativeUsers(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out === Array(
      ("2024-01-01", 1L, 1L),
      ("2024-01-03", 2L, 3L)))   // Jan 5 emits nothing: no first-seens
  }

  test("activityStreaks: islands split on gaps, longest wins, equal " +
    "lengths resolve to the earliest start") {
    import spark.implicits._
    val ev = Seq(
      // user 1: 3-day streak then a gap then a 2-day streak
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 15:00:00")),
      (1L, ts("2024-01-02 09:00:00")), (1L, ts("2024-01-03 09:00:00")),
      (1L, ts("2024-01-10 09:00:00")), (1L, ts("2024-01-11 09:00:00")),
      // user 2: two 2-day streaks -> earliest start wins the tie
      (2L, ts("2024-02-01 09:00:00")), (2L, ts("2024-02-02 09:00:00")),
      (2L, ts("2024-02-10 09:00:00")), (2L, ts("2024-02-11 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.activityStreaks(ev, "user_id", "ts", topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    assert(out === Array(
      (1L, "2024-01-01", 3L),
      (2L, "2024-02-01", 2L)))
  }

  test("transitionEntropy: hand-computed chain entropy — a forked " +
    "state scores ln3 - (2/3)ln2, a deterministic state scores 0") {
    // u1: a,b,a,b → a→b, b→a, a→b; u2: a,a → a→a
    // from a: {b: 2/3, a: 1/3} → H = 0.636514; from b: H = 0
    // shares: a 3/4, b 1/4 → rate = 0.477386
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "b"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 6L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.transitionEntropy(e, "user_id", "ts", "event_id",
      "event_type").collect()
    assert(out.map(r => (r.getAs[String]("from_type"),
      r.getAs[Long]("n_out"), r.getAs[Double]("h_row"),
      r.getAs[Double]("visit_share"), r.getAs[Double]("contribution"),
      r.getAs[Double]("entropy_rate"))).toSeq === Seq(
      ("a", 3L, 0.636514, 0.75, 0.477386, 0.477386),
      ("b", 1L, 0.0, 0.25, 0.0, 0.477386)))
    val br = out.map(r => r.getAs[Double]("effective_branching"))
    assert(br(1) === 1.0)
    assert(math.abs(br(0) - 1.889882) < 1e-6)
  }

  test("markovAttribution: hand-solved two-channel chain — removing " +
    "the only converting channel zeroes conversion; journeys split at " +
    "each purchase and trailing touches absorb to NULL") {
    // u1: view→CONV; u2: click→NULL; u3: view→CONV then trailing view
    // (second journey view→NULL). Transition chain: START→{view 3/4,
    // click 1/4}; view→{CONV 2/3, NULL 1/3}; click→NULL.
    // P(conv) = 3/4 * 2/3 = 0.5; removing view → 0 (effect 1, share 1);
    // removing click changes nothing (effect 0, share 0).
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "purchase"),
      (2L, ts("2024-01-01 10:00:00"), 3L, "click"),
      (3L, ts("2024-01-01 10:00:00"), 4L, "view"),
      (3L, ts("2024-01-01 11:00:00"), 5L, "purchase"),
      (3L, ts("2024-01-01 12:00:00"), 6L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.markovAttribution(e, "user_id", "ts", "event_id",
      "event_type", "purchase", steps = 8).collect()
      .map(r => (r.getAs[String]("channel"),
        r.getAs[Double]("p_conv_total"),
        r.getAs[Double]("p_conv_without"),
        r.getAs[Double]("removal_effect"),
        r.getAs[Double]("attribution_share")))
    assert(out === Array(
      ("click", 0.5, 0.5, 0.0, 0.0),
      ("view", 0.5, 0.0, 1.0, 1.0)))
  }

  test("shapleyAttribution: hand-solved 3-conversion game — symmetric " +
    "click/view split, dummy channels get exactly zero, efficiency " +
    "holds") {
    import spark.implicits._
    // j1: click→purchase; j2: view→purchase; j3: click,view→purchase;
    // j4: click, no conversion. v({c})=1, v({v})=1, v({c,v})=3.
    val e = Seq(
      (1L, 1, 1L, "click"), (1L, 2, 2L, "purchase"),
      (2L, 1, 3L, "view"), (2L, 2, 4L, "purchase"),
      (3L, 1, 5L, "click"), (3L, 2, 6L, "view"),
      (3L, 3, 7L, "purchase"),
      (4L, 1, 8L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.shapleyAttribution(e, "user_id", "ts", "event_id",
      "event_type", convType = "purchase",
      channels = Seq("click", "error", "signup", "view"))
      .collect()
      .map(r => (r.getAs[String]("channel"),
        r.getAs[Double]("shapley_conversions"),
        r.getAs[Double]("share")))
    assert(out === Array(
      ("click", 1.5, 0.5), ("error", 0.0, 0.0),
      ("signup", 0.0, 0.0), ("view", 1.5, 0.5)))
    // efficiency: credits sum to v(full) − v(∅) = 3 conversions
    assert(out.map(_._2).sum === 3.0)
  }
}
