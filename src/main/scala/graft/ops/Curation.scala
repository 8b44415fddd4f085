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
  * per-stage survivor counts — the number every curation run logs.
  */
object Curation {

  /** Documents surviving all four stages. Near-dup removal keeps the
    * lower doc id of each pair above the Jaccard threshold (greedy
    * keep-first, the standard corpus policy).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double, n: Int, jaccardThreshold: Double,
             keepLangs: Seq[String]): DataFrame = {
    val quality = Text.qualityScore(docs, idCol, textCol)
      .filter(col("quality") >= minQuality).select(col(idCol))
    val afterQuality = docs.join(quality, idCol)

    val keepExact = Dedup.exactDedup(afterQuality, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val afterExact = afterQuality.join(keepExact, idCol)

    val dupIds = Dedup.ngramJaccardPairs(afterExact, idCol, textCol, n,
      jaccardThreshold).select(col("id_j").as(idCol)).distinct()
    val afterNearDup = afterExact.join(dupIds, Seq(idCol), "left_anti")

    val langKeep = Text.langId(afterNearDup, idCol, textCol)
      .filter(col("pred_lang").isin(keepLangs.map(x => x: Any): _*))
      .select(col(idCol))
    afterNearDup.join(langKeep, idCol)
  }

  /** Stage-by-stage survivor funnel: (stage, n_docs), ordered by stage. */
  def funnelCounts(docs: DataFrame, idCol: String, textCol: String,
                   minQuality: Double, n: Int, jaccardThreshold: Double,
                   keepLangs: Seq[String]): DataFrame = {
    val quality = Text.qualityScore(docs, idCol, textCol)
      .filter(col("quality") >= minQuality).select(col(idCol))
    val afterQuality = docs.join(quality, idCol)
    val keepExact = Dedup.exactDedup(afterQuality, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val afterExact = afterQuality.join(keepExact, idCol)
    val dupIds = Dedup.ngramJaccardPairs(afterExact, idCol, textCol, n,
      jaccardThreshold).select(col("id_j").as(idCol)).distinct()
    val afterNearDup = afterExact.join(dupIds, Seq(idCol), "left_anti")
    val langKeep = Text.langId(afterNearDup, idCol, textCol)
      .filter(col("pred_lang").isin(keepLangs.map(x => x: Any): _*))
      .select(col(idCol))
    val afterLang = afterNearDup.join(langKeep, idCol)

    def stage(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"),
        col("n_docs"))
    stage("0_input", docs)
      .unionByName(stage("1_quality", afterQuality))
      .unionByName(stage("2_exact_dedup", afterExact))
      .unionByName(stage("3_near_dedup", afterNearDup))
      .unionByName(stage("4_lang", afterLang))
      .orderBy("stage")
  }
}
