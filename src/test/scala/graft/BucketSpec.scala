package graft

import org.apache.spark.sql.functions._

/** The bucketing scale path: a fact-fact join between tables bucketed on
  * their join keys must execute with NO shuffle exchange on either side —
  * this is the plan shape that makes repeated 100 TB joins affordable, and
  * the swap the `Tables` loader seam exists for.
  */
class BucketSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem: no Exchange in the join plan") {
    Tables.writeBucketed(Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderstatus"),
      "orders_bucketed", "o_orderkey", 4)
    Tables.writeBucketed(Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity"),
      "lineitem_bucketed", "l_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the join must pick sort-merge — the point is
      // that bucketing removes the exchanges a shuffle join would need
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("lineitem_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("qty"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1200))
      // neither join side shuffles: the ONLY exchange in the whole plan is
      // the groupBy's (on o_orderstatus) — no hashpartitioning on either
      // join key anywhere
      assert(!p.contains("hashpartitioning(o_orderkey") &&
        !p.contains("hashpartitioning(l_orderkey"), p.take(1500))
      // and the join result is right
      val rows = joined.collect()
      assert(rows.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }

  test("date-partitioned gold: a partition-key predicate prunes the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_part").toString + "/events_gold"
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    Tables.writePartitioned(ev, dir, "day")
    val nDays = ev.select("day").distinct().count()
    assert(nDays > 1, "need multiple partitions for pruning to mean anything")
    val someDay = ev.agg(min(col("day"))).head.getDate(0).toString
    val q = spark.read.parquet(dir).filter(col("day") === someDay)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // the day predicate must land in PartitionFilters (directory pruning),
    // NOT just the parquet row-group PushedFilters
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("day"), scan.take(1200))
    // and the pruned read returns exactly that day's (non-empty) rows
    val n = q.count()
    assert(n > 0 && n === ev.filter(col("day") === someDay).count())
  }
}
