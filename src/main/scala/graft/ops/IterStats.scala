package graft.ops

/** Driver-side observability for iterative operators: each convergence
  * loop records how many rounds it ran, keyed by operator name. Bench
  * drains the map after timing each query and prints the counts next to
  * the per-query timing, so a convergence regression (3 rounds → 8 on the
  * same data) is visible in the bench detail line without re-deriving it
  * from event logs. The loops run on the driver, so a plain process-local
  * map is the whole mechanism; per-op counts SUM across invocations (a
  * pipeline may run the same iterative operator twice) and are drained per
  * query — no cross-query leakage.
  */
object IterStats {
  private val rounds =
    new java.util.concurrent.ConcurrentHashMap[String, Int]()

  def record(op: String, n: Int): Unit =
    rounds.merge(op, n, (a: Int, b: Int) => a + b)

  /** Snapshot-and-clear: everything recorded since the last drain. */
  def drain(): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    val snap = rounds.asScala.toMap
    rounds.clear()
    snap
  }
}
