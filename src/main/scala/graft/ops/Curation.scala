package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The capstone training-data curation pipeline: the dedup/text operators
  * composed the way a 100 TB pre-training corpus job actually runs them —
  *
  *   quality gate → exact dedup → near-dup removal → language filter
  *
  * Each stage is one of the already-verified operators; the composition
  * stays a single lazy DataFrame lineage (no materialization between
  * stages, Catalyst optimizes across them). [[funnelCounts]] reports the
  * per-stage survivor counts — the number every curation run logs — in a
  * single aggregation job over stage-flag joins (stages are not re-run per
  * count). At corpus scale, persist the post-exact-dedup frame before the
  * shingle self-join if the funnel AND the output corpus are both needed.
  */
object Curation {

  private case class Stages(afterQuality: DataFrame, afterExact: DataFrame,
                            afterNearDup: DataFrame, afterLang: DataFrame)

  private def stages(docs: DataFrame, idCol: String, textCol: String,
                     minQuality: Double, n: Int, jaccardThreshold: Double,
                     keepLangs: Seq[String]): Stages = {
    val quality = Text.qualityScore(docs, idCol, textCol)
      .filter(col("quality") >= minQuality).select(col(idCol))
    val afterQuality = docs.join(quality, idCol)

    val keepExact = Dedup.exactDedup(afterQuality, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val afterExact = afterQuality.join(keepExact, idCol)

    // near-dup removal keeps the lower doc id of each pair above the
    // threshold (greedy keep-first, the standard corpus policy)
    val dupIds = Dedup.ngramJaccardPairs(afterExact, idCol, textCol, n,
      jaccardThreshold).select(col("id_j").as(idCol)).distinct()
    val afterNearDup = afterExact.join(dupIds, Seq(idCol), "left_anti")

    val langKeep = Text.langId(afterNearDup, idCol, textCol)
      .filter(col("pred_lang").isin(keepLangs.map(x => x: Any): _*))
      .select(col(idCol))
    Stages(afterQuality, afterExact, afterNearDup,
      afterNearDup.join(langKeep, idCol))
  }

  /** Documents surviving all four stages. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double, n: Int, jaccardThreshold: Double,
             keepLangs: Seq[String]): DataFrame =
    stages(docs, idCol, textCol, minQuality, n, jaccardThreshold,
      keepLangs).afterLang

  /** Stage-by-stage survivor funnel: (stage, n_docs), ordered by stage.
    * One aggregation over left-joined stage flags — each stage's subplan
    * executes once, not once per count.
    */
  def funnelCounts(docs: DataFrame, idCol: String, textCol: String,
                   minQuality: Double, n: Int, jaccardThreshold: Double,
                   keepLangs: Seq[String]): DataFrame = {
    val st = stages(docs, idCol, textCol, minQuality, n, jaccardThreshold,
      keepLangs)
    def flag(df: DataFrame, name: String) =
      df.select(col(idCol)).withColumn(name, lit(1))
    docs.select(col(idCol))
      .join(flag(st.afterQuality, "f1"), Seq(idCol), "left")
      .join(flag(st.afterExact, "f2"), Seq(idCol), "left")
      .join(flag(st.afterNearDup, "f3"), Seq(idCol), "left")
      .join(flag(st.afterLang, "f4"), Seq(idCol), "left")
      .agg(count(lit(1)).as("c0"), count(col("f1")).as("c1"),
        count(col("f2")).as("c2"), count(col("f3")).as("c3"),
        count(col("f4")).as("c4"))
      .select(expr("stack(5, '0_input', c0, '1_quality', c1, " +
        "'2_exact_dedup', c2, '3_near_dedup', c3, '4_lang', c4) " +
        "AS (stage, n_docs)"))
      .orderBy("stage")
  }
}
