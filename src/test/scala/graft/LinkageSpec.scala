package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("linkRecords: blocking bounds candidates, best match wins, " +
    "threshold filters, tie resolves to the smaller right id") {
    val left = Seq(
      (1L, 10, "alpha corp"),
      (2L, 10, "beta industries"),
      (3L, 20, "alpha corp")        // same name, other block
    ).toDF("lid", "blk", "name")
    val right = Seq(
      (100L, 10, "alpha corp"),     // exact match for 1 (sim 1.0)
      (101L, 10, "alpha corpse"),   // near match for 1
      (102L, 10, "zzzzzzzzzzzzzzz"),// no match
      (103L, 20, "alpha corp"),     // exact match for 3 in its block
      (104L, 20, "alpha corp")      // tie — larger id must lose
    ).toDF("rid", "blk", "name")
    val out = Linkage.linkRecords(left, right, "lid", "rid",
      "blk", "blk", "name", "name", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("sim")))
    assert(out.length === 2)
    val byLeft = out.map(x => x._1 -> ((x._2, x._3))).toMap
    // left 1: exact beats near; left 2: nothing above threshold;
    // left 3: cross-block "alpha corp" at 100 must NOT be reachable,
    // and the in-block tie goes to 103
    assert(byLeft(1L) === ((100L, 1.0)))
    assert(!byLeft.contains(2L))
    assert(byLeft(3L) === ((103L, 1.0)))
  }
}
