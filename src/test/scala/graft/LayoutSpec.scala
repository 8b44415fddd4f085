package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonKey: exact interleave on known pairs") {
    val df = Seq((3L, 5L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("x", "y")
      .withColumn("z", Layout.mortonKey(col("x"), col("y"), 8))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // x=3 (bits 0,1 → positions 0,2), y=5 (bits 0,2 → positions 1,5):
    // 1 + 4 + 2 + 32 = 39
    assert(z((3L, 5L)) === 39L)
    assert(z((0L, 0L)) === 0L)
    assert(z((7L, 0L)) === 1L + 4L + 16L)   // even positions 0,2,4
    assert(z((0L, 7L)) === 2L + 8L + 32L)   // odd positions 1,3,5
  }

  test("zorderStats: buckets bound BOTH dimensions — max bounding-box " +
    "area a fraction of the domain; a y-blind x-sort cannot") {
    // full 32x32 grid, one row per cell
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val stats = Layout.zorderStats(grid, "x", "y", bits = 5, buckets = 16)
      .collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum === 1024L)
    // a perfect 16-bucket Z partition of a 32x32 grid gives 8x8 tiles;
    // quantile edges may merge neighbors, so allow 2 tiles of slack —
    // but every bucket must bound y as well as x (area << 32*32)
    val maxArea = stats.map { r =>
      (r.getAs[Long]("x_max") - r.getAs[Long]("x_min") + 1) *
        (r.getAs[Long]("y_max") - r.getAs[Long]("y_min") + 1)
    }.max
    assert(maxArea <= 160L,
      s"z-order bucket bounding box too loose: $maxArea")
    // contrast: bucketing the same grid by x alone leaves y unbounded
    // (every x-slice spans the full y domain) — the 2-D win is real
  }

  test("zorderStats edges: the histogram-weighted percentile (buffer " +
    "bounded by DISTINCT zkeys, the 100 TB-safe plan) is value-identical " +
    "to a row-fed exact percentile") {
    // heavy duplication: 4096 rows over only 64 distinct (x, y) cells —
    // the histogram agg's buffer sees 64 entries where a row-fed exact
    // percentile would buffer 4096
    val rows = (for (x <- 0 until 8; y <- 0 until 8; _ <- 0 until (x + 8 * y + 1))
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val keyed = rows.withColumn("__z",
      Layout.mortonKey(col("x"), col("y"), 3).cast("double"))
    val probs = (1 until 16).map(_.toDouble / 16)
    val direct = keyed
      .agg(expr(s"percentile(__z, array(${probs.mkString(",")}))"))
      .head.getSeq[Double](0)
    val viaHist = keyed.groupBy(col("__z")).agg(count(lit(1)).as("__w"))
      .agg(expr(s"percentile(__z, array(${probs.mkString(",")}), __w)"))
      .head.getSeq[Double](0)
    assert(viaHist === direct)
    // and zorderStats (which uses the histogram path) buckets all rows
    val stats = Layout.zorderStats(rows, "x", "y", bits = 3, buckets = 4)
      .collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum === rows.count())
  }
}
