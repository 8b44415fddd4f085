package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout levers: multidimensional clustering keys and the evidence
  * queries that grade them. At 100 TB the scan you never run is the
  * cheapest operator in the engine — writing a fact table sorted by a
  * Z-order (Morton) key keeps BOTH join/filter dimensions' per-file
  * min/max spans tight, so parquet zone maps (and partition pruning above
  * them) drop most files for a 2-D selective query, where a single-column
  * sort only serves one dimension.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of x lands at position 2i, bit i
    * of y at 2i+1. Pure integer bit arithmetic (one codegen'd projection,
    * no shuffle), and exactly reproducible in any engine with `>>`, `&`,
    * `<<` — the cross-engine contract the q_zorder oracle replays.
    */
  def mortonKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "mortonKey needs 1 <= bits <= 31")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** The zone-map evidence query for a Z-ordered layout: range-partition
    * rows into `buckets` files by exact zkey quantile (what a
    * repartitionByRange writer produces at scale — the edges here are one
    * scalar percentile aggregate broadcast back, the run-time twin of the
    * writer's range sampling), then report each bucket's row count and
    * per-dimension min/max — the exact statistics a reader's file-skipping
    * consults. Tight (x, y) boxes per bucket = most buckets pruned for a
    * 2-D point/range query; the [[mortonKey]] projection is what makes
    * them tight in both dimensions at once.
    *
    * Scale contract: the quantile edges are computed HISTOGRAM-FIRST — a
    * scalable `groupBy(zkey).count()` shuffle agg, then the weighted exact
    * `percentile(z, probs, w)` whose imperative buffer takes one update
    * per DISTINCT zkey rather than one per row (the [[Relational
    * .describeColumns]] move). zkeys are bounded integers (≤ 2^(2·bits),
    * and in practice ≤ #distinct (x, y) pairs), so the final scalar agg's
    * buffer is bounded by the key domain, not the row count — this is what
    * keeps the plan alive on a 100 TB fact table, where a row-fed exact
    * percentile's per-partition value map would OOM. Weighted `percentile`
    * over the histogram is value-identical to the unweighted aggregate
    * over the raw rows (integral frequencies = multiset expansion), so
    * the cross-engine oracle (plain `quantile_cont`) is unchanged.
    */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int, buckets: Int): DataFrame = {
    require(buckets >= 2, "zorderStats needs buckets >= 2")
    val keyed = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .withColumn("__z",
        mortonKey(col("__x"), col("__y"), bits).cast("double"))
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val edges = keyed.groupBy(col("__z")).agg(count(lit(1)).as("__w"))
      .agg(expr(
        s"percentile(__z, array(${probs.mkString(",")}), __w)").as("__e"))
    val bucketId = (1 until buckets).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col("__z") >= element_at(col("__e"), i), 1).otherwise(0)
    }
    keyed.crossJoin(broadcast(edges))
      .select(bucketId.as("bucket"), col("__x"), col("__y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
        min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))
      .orderBy("bucket")
  }
}
