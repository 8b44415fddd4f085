package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** IVF-ANN gates. The trained centroids are float-sum order dependent (so
  * no cross-engine oracle), but the SEARCH structure is exactly testable:
  * probing every cell must reproduce the brute-force top-k verbatim,
  * whatever the centroids converged to.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val queries = emb.filter(col("vec_id") % 20 === 0)

  test("ivfCentroids: nCells centroids of the corpus dimensionality") {
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      nCells = 8, iters = 2).collect()
    assert(cents.length === 8)
    val dims = emb.select(size(col("embedding"))).head.getInt(0)
    assert(cents.forall(_.getSeq[Double](1).length === dims))
  }

  test("ivfTopK with nprobe = nCells equals exact brute force verbatim") {
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding",
      k = 5).collect().map(_.toString).toSeq
    val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 4, nprobe = 4, iters = 2)
      .collect().map(_.toString).toSeq
    assert(full === exact)
  }

  test("ivfTopK recall floor at nprobe < nCells") {
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding",
      k = 5).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 8, nprobe = 4, iters = 2)
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@5 (nprobe 4/8) = $recall")
    assert(recall >= 0.4, s"recall $recall below floor")
    // every IVF hit must be a genuine corpus neighbor pair (subset of the
    // candidate universe — no fabricated ids)
    assert(ivf.forall { case (q, c) => q != c })
  }
}
