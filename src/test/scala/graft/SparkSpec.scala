package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local SparkSession per suite (lazy, reused), built
  * through the library's own entry point so every suite also exercises
  * [[Graft.session]]'s wiring.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Graft.session(master = Some("local[4]"), shufflePartitions = 4,
      extraConf = Map("spark.ui.enabled" -> "false"))

  val sfDir = "/root/testdata/sf0.001"
}
