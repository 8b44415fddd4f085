package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** The multimodal contract: binary payload plumbing, typed metadata,
  * deterministic stub features, partition-preserving batch extraction.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val media = Multimodal.synthesizeMedia(docs, "doc_id")

  test("media schema: binary payload + typed metadata struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName === "binary")
    val meta = sch("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("width", "height", "durationMs", "codec"))
    assert(media.count() === docs.count())
  }

  test("payloads deterministic: 48 md5-derived bytes, stable across runs") {
    val a = media.select("mediaId", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val b = Multimodal.synthesizeMedia(docs, "doc_id")
      .select("mediaId", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(a === b)
    assert(a.values.forall(_.length === 48))
  }

  test("feature extraction: histogram sums to byte count, mean in range") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      media.as[Multimodal.MediaRow]).toDF()
    val bad = feats.filter(
      expr("aggregate(histogram, 0L, (a, x) -> a + x)") =!= col("nBytes") ||
        col("meanByte") < 0 || col("meanByte") > 255).count()
    assert(bad === 0L)
  }

  test("frame sampling: offsets stride the payload") {
    val offs = Multimodal.MediaFeatures.frameOffsets(100, 32)
    assert(offs.toSeq === Seq(0, 32, 64, 96))
  }

  test("mapPartitions extraction preserves partitioning (no shuffle)") {
    val m = media.repartition(7).as[Multimodal.MediaRow]
    val out = Multimodal.extractFeatures(m)
    assert(out.rdd.getNumPartitions === 7)
  }

  test("decode stub is pure: same payload, same features") {
    val p = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val (m1, h1) = Multimodal.MediaFeatures.decodeStub(p)
    val (m2, h2) = Multimodal.MediaFeatures.decodeStub(p.clone())
    assert(m1 === m2)
    assert(h1.toSeq === h2.toSeq)
  }

  test("resize: payloads bounded by the byte budget, metadata rescaled, " +
    "idempotent, under-budget payloads untouched") {
    val m = media.as[Multimodal.MediaRow]
    val target = 24 // synthesized payloads are 48 bytes (3 md5 chains)
    val once = Multimodal.resizeMedia(m, target).collect()
    assert(once.forall(_.payload.length <= target))
    // linear factor sqrt(24/48) ≈ 0.707 shrinks both dimensions
    val orig = m.collect().map(r => r.mediaId -> r.meta).toMap
    assert(once.forall(r => r.meta.width <= orig(r.mediaId).width &&
      r.meta.height <= orig(r.mediaId).height && r.meta.width >= 1))
    // idempotent: already-at-budget media pass through unchanged
    val twice = Multimodal.resizeMedia(
      Multimodal.resizeMedia(m, target), target).collect()
    assert(twice.map(r => (r.mediaId, r.payload.toSeq)).sortBy(_._1).toSeq ===
      once.map(r => (r.mediaId, r.payload.toSeq)).sortBy(_._1).toSeq)
    // deterministic nearest-neighbor sample
    val p = Array.tabulate[Byte](48)(i => i.toByte)
    assert(Multimodal.MediaFeatures.resizeStub(p, 24).toSeq ===
      (0 until 24).map(i => (i * 2).toByte))
  }
}
