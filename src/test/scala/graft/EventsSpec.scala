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
}
