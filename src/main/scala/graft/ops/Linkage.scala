package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-table record linkage (entity resolution across two sources —
  * [[Dedup]]'s within-corpus machinery pointed at the A×B matching
  * problem): blocked candidate generation, string-similarity scoring,
  * best-match-per-left selection. The master-data step that precedes any
  * cross-source join when the sources don't share a key.
  */
object Linkage {

  /** Link left records to their best right match: candidates are generated
    * by a BLOCKING equi-join (never A×B — the blocking key bounds the
    * comparison set exactly like [[Dedup.editDistancePairs]]'s prefix
    * blocks), scored by normalized Levenshtein similarity
    * 1 − d/max(len, len), thresholded, and resolved to ONE best match per
    * left id (max similarity, ties to the smallest right id — a total
    * deterministic rule). The per-left window is keyed by the left id, so
    * resolution shuffles candidate rows only.
    */
  def linkRecords(left: DataFrame, right: DataFrame,
                  leftId: String, rightId: String,
                  leftBlock: String, rightBlock: String,
                  leftStr: String, rightStr: String,
                  threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      "linkRecords needs threshold in [0, 1]")
    // fail fast on reserved working names (the asofJoin discipline) —
    // a caller column named __blk would be silently conflated otherwise
    val reserved = Set("__lid", "__rid", "__blk", "__ls", "__rs", "__rk")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty, "linkRecords reserves internal column names " +
      s"${reserved.mkString(", ")}; input carries: ${clash.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val l = left.select(col(leftId).as("__lid"),
      col(leftBlock).as("__blk"), col(leftStr).as("__ls"))
    val r = right.select(col(rightId).as("__rid"),
      col(rightBlock).as("__blk"), col(rightStr).as("__rs"))
    val w = Window.partitionBy(col("__lid"))
      .orderBy(col("sim").desc, col("__rid"))
    l.join(r, "__blk")
      .withColumn("sim",
        round(lit(1.0) - levenshtein(col("__ls"), col("__rs"))
          .cast("double") /
          greatest(length(col("__ls")), length(col("__rs")))
            .cast("double"), 6))
      .where(col("sim") >= threshold)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        col("sim"))
      .orderBy(leftId)
  }
}
