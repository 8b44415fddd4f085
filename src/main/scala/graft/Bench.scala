package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.session(Some(s"local[$cpus]"),
      shufflePartitions = cpus.toInt,
      extraConf = Map("spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-reader paths with a FIXED cheap query
    // (queries is an unordered Map — headOption could pick the most
    // expensive one and double wall time). Twice: the first run compiles
    // the codegen, the second runs it — so the timed passes start from a
    // fully warm path.
    try SparkEntry.queries.get("q_describe").foreach { f =>
      f(spark, sfDir).count(); f(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // dev-only focus filter: SPARK_GRAFT_ONLY=q_a,q_b times just those
    val names = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(only) => only.split(",").map(_.trim).toSeq
        .filter(SparkEntry.queries.contains).sorted
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    // per-query convergence-round counts (dupClusters/star iterations…)
    // observed while the query ran — reported in the detail line so a
    // convergence regression is visible without re-deriving it from logs
    val roundCounts = scala.collection.mutable.Map.empty[String, Int]
    def timeOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      graft.ops.IterStats.drain() // clear anything a prior query left
      val t0 = System.nanoTime()
      // HONEST sink (the official timing): queryExecution.toRdd.count()
      // executes the gate's FULL physical plan — every projected column
      // and the final order — where .count() let Catalyst prune the very
      // projections some gates exist to measure (q_lang_id benched
      // 0.16 s while its trigram battery costs ~3 s at sf0.01; the
      // Verify parquet write always paid the real cost). The one-round
      // transition "cnt" pass (r15) served its purpose and is retired:
      // from round 16 on, s/med under the toRdd sink are the only
      // conventions (BASELINE.md round-15/16 provenance).
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
      } catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      val rounds = graft.ops.IterStats.drain().values.sum
      if (rounds > 0) roundCounts(name) = rounds
      // drop anything a query persisted so later timings aren't flattered
      // (or penalized) by resident cache
      spark.catalog.clearCache()
      // clearCache() only drops catalog-cached plans; localCheckpoint
      // blocks live as persisted RDDs and otherwise accumulate across the
      // suite (block-manager + GC pressure inflated q_curation_funnel
      // 3.7s→8.9s in round 4). Safe here: each query rebuilds its frames,
      // nothing references a prior query's checkpoints.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    // Three passes per query, report the per-query min AND median: JIT/
    // codegen warmup noise was swinging identical queries 5-10x across
    // rounds and burying real regressions. min is the official per-query
    // value (sum = "total"); median ("med") makes drift visible in the
    // data itself: a real regression moves min and median together,
    // drift moves only one. The passes run CONSECUTIVELY per query (not
    // as three full suite sweeps): with sweeps, a query's 3rd sample ran
    // after the whole suite had piled up heap/block-manager pressure,
    // which inflated medians 2-4x over mins on the heavy gates (r8:
    // q_dup_clusters med 14.3s vs min 3.3s) and drifted even the trivial
    // warm-up query (q_describe 0.11→0.53s across rounds) — noise that
    // could bury a real regression. Back-to-back passes draw min and med
    // from the same local window, and a System.gc() barrier before each
    // query stops one query's garbage from being billed to the next.
    // dev-only pass-count override (scaling runs use 2); the driver never
    // sets it, so the official run keeps the 3-pass min+median protocol
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    // machine-load marker: 1-min loadavg read at each query's start. A
    // loaded-machine bench run (driver box busy with something else) is
    // then self-evidently environmental in the archived detail — r9
    // forensics had to compare builder-vs-driver runs to prove a 3x
    // "regression" was load, not a plan change.
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val results = names.map { n =>
      System.gc()
      Thread.sleep(50)
      val t0Epoch = System.currentTimeMillis() / 1000
      val load = loadAvg()
      val ts = Seq.fill(nPasses)(timeOne(n)).sorted
      n -> (ts.head, ts(ts.size / 2), t0Epoch, load)
    }
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // decimal-comma locale would print 3,700 — invalid JSON for the driver
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Per-query detail goes on its OWN lines: the driver keeps only a
    // 2000-char stdout tail and parses its LAST line, and one monolithic
    // map outgrew that tail three rounds running (the r6 tail held 63 of
    // 90 queries — the head block's history was invisible). Split into
    // numbered chunks of ≤1600 chars, newest-first NOT needed — the tail
    // keeps the LAST lines, so emitting chunks before the total keeps as
    // many whole chunks visible as fit; the full set is also written to a
    // file whose path rides on the total line, so nothing is ever lost.
    // Iterative queries carry their convergence-round count ("rounds").
    val entries = results.map { case (k, (mn, md, _, _)) =>
      val rounds = roundCounts.get(k).map(r => s""","rounds":$r""").getOrElse("")
      "\"" + k + "\":{\"s\":" + fmt(mn) + ",\"med\":" + fmt(md) + rounds + "}"
    }
    // file-only rows additionally carry the start timestamp (epoch s)
    // and the 1-min loadavg at start — drift attribution data the
    // stdout chunks omit to stay inside the driver's 2000-char tail
    val fileEntries = results.map { case (k, (mn, md, t0, load)) =>
      val rounds = roundCounts.get(k).map(r => s""","rounds":$r""").getOrElse("")
      "\"" + k + "\":{\"s\":" + fmt(mn) + ",\"med\":" + fmt(md) +
        ",\"t0\":" + t0 + ",\"load\":" + fmt(load) + rounds + "}"
    }
    val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    entries.foreach { e =>
      if (cur.nonEmpty && cur.length + e.length + 1 > 1600) {
        chunks += cur.result(); cur.clear()
      }
      if (cur.nonEmpty) cur.append(',')
      cur.append(e)
    }
    if (cur.nonEmpty) chunks += cur.result()
    val detailLines = chunks.zipWithIndex.map { case (c, i) =>
      s"""{"metric":"detail_${i + 1}","of":${chunks.size},""" +
        s""""queries":{$c},"sf":"$sfDir"}"""
    }
    val total = results.map(_._2._1).sum
    // Full detail also lands in a file (one JSON object, all queries) so
    // per-query history survives even if the stdout tail clips the chunks —
    // inside the repo, so the end-of-round commit archives it in git.
    val detailPath = "/root/repo/BENCH_DETAIL.json"
    try {
      val fw = new java.io.FileWriter(detailPath)
      fw.write(s"""{"queries":{${fileEntries.mkString(",")}},""" +
        s""""passes":$nPasses,"sink":"toRdd","sf":"$sfDir"}""")
      fw.close()
    } catch { case _: Throwable => () }
    // FINAL line: compact total-only JSON (~100 chars) — immune to query-
    // count growth, always fits the tail whole.
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""detail_file":"$detailPath","sf":"$sfDir"}"""
    // Stop Spark BEFORE printing so shutdown chatter (even at WARN) cannot
    // land after the JSON — the driver parses the LAST line of the tail.
    spark.stop()
    detailLines.foreach(println)
    println(line)
  }
}
