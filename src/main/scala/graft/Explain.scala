package graft

/** Dev tool: dump `.explain("formatted")` of declared gates to files —
  * the plan evidence the optimization rounds commit under `plans/rNN/`.
  * Usage: runMain graft.Explain <sfDir> <outDir> <suffix> [q_a,q_b,...]
  * (no query list = all declared gates). Not a driver surface; plans
  * are captured OUTSIDE any timed region.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = if (args.length > 3)
      args(3).split(",").map(_.trim).filter(SparkEntry.queries.contains)
    else SparkEntry.queries.keys.toArray.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // SPARK_GRAFT_AUDIT=1: capture with Par.cp disabled so the FULL
    // composed chain is visible instead of the post-checkpoint tail
    // (the PlanSpec audit-mode flag, plumbed through for plan evidence)
    val audit = sys.env.get("SPARK_GRAFT_AUDIT").contains("1")
    val spark = Graft.session(Some(s"local[$cpus]"),
      shufflePartitions = cpus.toInt,
      extraConf = Map("spark.ui.enabled" -> "false") ++
        (if (audit) Map("spark.graft.audit.noCheckpoint" -> "true")
         else Map.empty))
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt")
        java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
        println(s"[explain] wrote $p")
      } catch {
        case e: Throwable =>
          println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
