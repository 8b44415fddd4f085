package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads plus typed metadata, with decode /
  * feature-extraction / frame-sampling as per-partition batch operators.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (see [[MediaFeatures.decodeStub]]) — the Spark-side
  * contract is real and tested: schema, binary handling, batch iteration
  * shape, partition preservation, and the seam where a JNI/FFI decoder
  * would slot in.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  case class MediaMeta(width: Int, height: Int, durationMs: Long,
                       codec: String)

  case class MediaRow(mediaId: Long, mediaType: String,
                      payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatureRow(mediaId: Long, mediaType: String, nBytes: Int,
                             meanByte: Double, histogram: Array[Long],
                             frameOffsets: Array[Int])

  /** Synthesize a deterministic media table from any id-bearing frame:
    * payload bytes derive from md5 chains over the id (pure built-ins, no
    * RNG), media type round-robins image/audio/video, metadata is typed.
    * Stands in for `spark.read.format("binaryFile")` at the same schema.
    */
  def synthesizeMedia(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    df.select(
      id.as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (id % 3 + 1).cast("int")).as("mediaType"),
      unhex(concat(md5(id.cast("string")),
        md5(concat(id.cast("string"), lit("_2"))),
        md5(concat(id.cast("string"), lit("_3"))))).as("payload"),
      struct(
        (id % 640 + 64).cast("int").as("width"),
        (id % 480 + 48).cast("int").as("height"),
        (id % 90000 + 1000).as("durationMs"),
        element_at(array(lit("png"), lit("opus"), lit("av1")),
          (id % 3 + 1).cast("int")).as("codec")).as("meta"))
  }

  object MediaFeatures {
    /** >>> STUB <<< — a real implementation would decode the payload with
      * an image/audio library here (the batch-iterator shape and output
      * schema would not change). The stand-in derives features from raw
      * bytes so the whole pipeline is deterministic and testable.
      */
    def decodeStub(payload: Array[Byte]): (Double, Array[Long]) = {
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      (if (payload.length == 0) 0.0 else sum.toDouble / payload.length, hist)
    }

    /** Frame sampling offsets: every `stride` bytes — the video-pipeline
      * shape (sample every Nth frame) over an opaque payload.
      */
    def frameOffsets(payloadLen: Int, stride: Int): Array[Int] =
      (0 until payloadLen by stride).toArray

    /** >>> STUB <<< resize kernel: nearest-neighbor byte resample down to
      * `targetBytes` (payloads already at or under budget pass through).
      * A real implementation decodes, resizes pixels, re-encodes — same
      * signature, same batch shape.
      */
    def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      if (payload.length <= targetBytes) payload
      else Array.tabulate(targetBytes)(i =>
        payload((i.toLong * payload.length / targetBytes).toInt))
  }

  /** Per-partition batch feature extraction: one iterator pass per
    * partition (the Scala analogue of a pandas-batch UDF) — partitioning
    * and ordering of the input are preserved, no shuffle, no collect.
    */
  def extractFeatures(media: Dataset[MediaRow],
                      frameStride: Int = 32): Dataset[MediaFeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (mean, hist) = MediaFeatures.decodeStub(r.payload)
        MediaFeatureRow(r.mediaId, r.mediaType, r.payload.length, mean, hist,
          MediaFeatures.frameOffsets(r.payload.length, frameStride))
      }
    }
  }

  /** Per-partition batch resize: payloads resampled to at most
    * `targetBytes`, metadata dimensions rescaled by the realized linear
    * factor. Same iterator shape as [[extractFeatures]] — no shuffle, no
    * collect; a JNI/FFI image resizer drops into
    * [[MediaFeatures.resizeStub]] without touching the plumbing.
    */
  def resizeMedia(media: Dataset[MediaRow],
                  targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = MediaFeatures.resizeStub(r.payload, targetBytes)
        val f = math.sqrt(out.length.toDouble / math.max(r.payload.length, 1))
        MediaRow(r.mediaId, r.mediaType, out,
          MediaMeta(math.max(1, math.round(r.meta.width * f).toInt),
            math.max(1, math.round(r.meta.height * f).toInt),
            r.meta.durationMs, r.meta.codec))
      }
    }
  }

  /** DataFrame-level entry: synthesize → type → extract, returning a flat
    * feature frame. Array outputs are stringified so the DuckDB oracle can
    * recompute the whole path (payload bytes are md5-derived, hence
    * reproducible from SQL) and hash-compare it — the mapPartitions stub
    * kernel is thereby verified against an independent implementation.
    */
  def mediaFeatures(spark: SparkSession, df: DataFrame,
                    idCol: String): DataFrame = {
    import spark.implicits._
    val media = synthesizeMedia(df, idCol).as[MediaRow]
    extractFeatures(media).toDF()
      .select(col("mediaId"), col("mediaType"), col("nBytes"),
        round(col("meanByte"), 6).as("mean_byte"),
        concat_ws(",", col("histogram")).as("hist_csv"),
        size(col("frameOffsets")).as("n_frames"))
      .orderBy("mediaId")
  }
}
