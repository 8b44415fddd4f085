package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the dedup hot paths (not part of the
  * driver contract; run via `runMain graft.Profile <sfDir>`).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(Some("local[32]"), shufflePartitions = 32,
      extraConf = Map("spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm
    val sh = ops.Dedup.shingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.count())
    time("shingles+checkpoint")(sh.localCheckpoint().count())
    val shc = sh.localCheckpoint()
    time("signatures(32)") {
      val hashed = shc.withColumn("h31",
        ops.Dedup.h60(col("shingle")) % 2147483648L)
      val mins = (0 until 32).map(i =>
        min((col("h31") * (2 * i + 1) + lit(1000003L * i)) % 2147483647L)
          .as(s"mh$i"))
      hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*).count()
    }
    time("full minhashLshPairs")(
      ops.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.8).count())
    time("full ngramJaccard(capped)")(
      ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
        Some(10L)).count())
    time("curation funnel(minhash)")(
      ops.Curation.funnelCounts(docs, "doc_id", "text", 0.5, 3, 0.8,
        Seq("en", "de", "es", "fr"),
        ops.Curation.NearDup.MinHashLsh(32, 8)).count())
    spark.stop()
  }
}
