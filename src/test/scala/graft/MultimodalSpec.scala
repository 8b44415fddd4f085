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

  test("feature extraction: stub fallback on undecodable payloads — " +
    "histogram sums to byte count, mean in range, no decoded dims") {
    import spark.implicits._
    // raw md5 payloads are NOT valid PNGs: image rows must fall back to
    // the byte stub instead of failing or fabricating pixel stats
    val feats = Multimodal.extractFeatures(
      media.as[Multimodal.MediaRow]).toDF()
    val bad = feats.filter(
      expr("aggregate(histogram, 0L, (a, x) -> a + x)") =!= col("nBytes") ||
        col("meanVal") < 0 || col("meanVal") > 255 ||
        col("width").isNotNull || col("height").isNotNull).count()
    assert(bad === 0L)
  }

  test("real PNG path: encode → javax.imageio decode reproduces the " +
    "pattern statistics exactly") {
    for (id <- Seq(0L, 3L, 42L, 497L)) {
      val png = Multimodal.MediaFeatures.encodePng(id)
      // a real PNG signature, not a byte stub
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
      val bi = Multimodal.MediaFeatures.decodeImage(png).get
      val (w, h) = Multimodal.MediaFeatures.patternDims(id)
      assert(bi.getWidth === w && bi.getHeight === h)
      val ((ar, ag, ab), (br, bg, bb)) =
        Multimodal.MediaFeatures.bandColors(id)
      val (mean, hist) = Multimodal.MediaFeatures.pixelStats(bi)
      val th = h / 2; val bh = h - th
      val expected = (th.toLong * w * (ar + ag + ab) +
        bh.toLong * w * (br + bg + bb)).toDouble / (3.0 * w * h)
      assert(math.abs(mean - expected) < 1e-12,
        "decoded pixel mean must equal the pattern closed form")
      assert(hist.sum === 3L * w * h)
    }
  }

  test("gate pipeline: image rows carry REAL decoded dimensions, audio " +
    "rows REAL decoded sample counts, video rows REAL decoded frames") {
    val out = Multimodal.mediaFeatures(spark, docs, "doc_id")
    val img = out.filter(col("mediaType") === "image")
    assert(img.filter(col("width").isNull || col("n_frames") =!= 0)
      .count() === 0L)
    assert(img.filter(col("width") =!= (col("mediaId") % 13 + 4).cast("int"))
      .count() === 0L)
    // audio: n_frames strides the DECODED samples (n = id%400+100), so a
    // stub read of the WAV payload bytes could not produce these counts
    val aud = out.filter(col("mediaType") === "audio")
    assert(aud.filter(col("width").isNotNull ||
      col("n_frames") =!= ((col("mediaId") % 400 + 99) / 32 + 1)
        .cast("int")).count() === 0L)
    // video: dims are the DECODED frame dims and n_frames is the DECODED
    // frame count of the multi-frame GIF — a reader that stops at frame
    // 0 (or a stub over the container bytes) cannot produce these
    val vid = out.filter(col("mediaType") === "video")
    assert(vid.filter(
      col("width") =!= (col("mediaId") % 9 + 4).cast("int") ||
        col("height") =!= (col("mediaId") % 7 + 5).cast("int") ||
        col("n_frames") =!= (col("mediaId") % 5 + 2).cast("int"))
      .count() === 0L)
  }

  test("real multi-frame GIF path: encode → javax.imageio sequence " +
    "decode round-trips every frame's gray value exactly") {
    for (id <- Seq(0L, 2L, 44L, 497L)) {
      val gif = Multimodal.MediaFeatures.encodeGif(id)
      // a real GIF container, not a byte stub
      assert(new String(gif.take(3), "US-ASCII") === "GIF")
      val frames = Multimodal.MediaFeatures.decodeGif(gif).get
      val k = Multimodal.MediaFeatures.videoFrameCount(id)
      val (w, h) = Multimodal.MediaFeatures.videoDims(id)
      assert(frames.length === k, "every frame of the sequence decodes")
      frames.zipWithIndex.foreach { case (bi, f) =>
        assert(bi.getWidth === w && bi.getHeight === h)
        val g = Multimodal.MediaFeatures.videoGray(id, f)
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = bi.getRGB(x, y)
          assert(((rgb >> 16) & 0xff) === g && ((rgb >> 8) & 0xff) === g &&
            (rgb & 0xff) === g,
            s"frame $f pixel ($x,$y) must round-trip gray $g bit-exactly")
        }
      }
      val (mean, hist) = Multimodal.MediaFeatures.frameStats(frames)
      val grays = (0 until k).map(Multimodal.MediaFeatures.videoGray(id, _))
      assert(math.abs(mean - grays.sum.toDouble / k) < 1e-12)
      assert(hist.sum === 3L * w * h * k)
    }
    // non-GIF payloads refuse to decode (caller falls back to the stub)
    assert(Multimodal.MediaFeatures.decodeGif(
      Array.fill[Byte](48)(7)).isEmpty)
  }

  test("videoFrameStats: one row per decoded frame with the recipe's " +
    "per-frame gray mean and true dims") {
    val out = Multimodal.videoFrameStats(spark, docs, "doc_id")
    val rows = out.filter(col("mediaId") === 2L).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    val k = Multimodal.MediaFeatures.videoFrameCount(2L)
    val (w, h) = Multimodal.MediaFeatures.videoDims(2L)
    assert(rows.length === k)
    rows.foreach { case (f, ww, hh, mean) =>
      assert(ww === w && hh === h)
      assert(mean === Multimodal.MediaFeatures.videoGray(2L, f).toDouble,
        "a solid frame's channel mean is its gray value, exactly")
    }
    // frame counts across the corpus: every video doc contributes k rows
    val nVideos = docs.filter(col("doc_id") % 3 === 2).count()
    assert(out.select("mediaId").distinct().count() === nVideos)
  }

  test("real WAV path: encode → javax.sound decode round-trips the " +
    "signal exactly; non-WAV audio falls back to the stub") {
    for (id <- Seq(1L, 4L, 103L, 499L)) {
      val wav = Multimodal.MediaFeatures.encodeWav(id)
      // a real RIFF/WAVE container, not a byte stub
      assert(new String(wav.take(4), "US-ASCII") === "RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
      val (samples, rate) = Multimodal.MediaFeatures.decodeWav(wav).get
      assert(rate === Multimodal.AudioRateHz)
      val expect = Multimodal.MediaFeatures.audioSamples(id).map(_ & 0xff)
      assert(samples.toSeq === expect.toSeq,
        "decoded samples must round-trip the recipe bit-exactly")
      val (mean, hist) = Multimodal.MediaFeatures.sampleStats(samples)
      assert(hist.sum === expect.length.toLong)
      assert(math.abs(mean -
        expect.map(_.toLong).sum.toDouble / expect.length) < 1e-12)
    }
    assert(Multimodal.MediaFeatures.decodeWav(
      Array.fill[Byte](48)(7)).isEmpty)
  }

  test("resizeImages: real nearest-neighbor downscale — dims bounded, " +
    "band colors preserved, idempotent, non-image untouched") {
    import spark.implicits._
    // a 40×20 two-band image well over the 10px budget
    val big = Multimodal.MediaFeatures.encodePng(42L)
    val bigger = {
      val bi = new java.awt.image.BufferedImage(40, 20,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 20; x <- 0 until 40)
        bi.setRGB(x, y, if (y < 10) 0xff0000 else 0x0000ff)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", baos)
      baos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", bigger,
        Multimodal.MediaMeta(40, 20, 0L, "png")),
      Multimodal.MediaRow(2L, "audio", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(0, 0, 9L, "opus"))).toDS()
    val out = Multimodal.resizeImages(rows, 10).collect()
      .map(r => r.mediaId -> r).toMap
    val ri = Multimodal.MediaFeatures.decodeImage(out(1L).payload).get
    assert(ri.getWidth === 10 && ri.getHeight === 5)
    assert(out(1L).meta.width === 10 && out(1L).meta.height === 5)
    assert((ri.getRGB(0, 0) & 0xffffff) === 0xff0000, "top band preserved")
    assert((ri.getRGB(9, 4) & 0xffffff) === 0x0000ff, "bottom band preserved")
    assert(out(2L).payload.toSeq === Seq[Byte](1, 2, 3), "audio untouched")
    // idempotent: an already-within-budget image passes through unchanged
    val again = Multimodal.resizeImages(
      Multimodal.resizeImages(rows, 10), 10).collect()
      .map(r => r.mediaId -> r.payload.toSeq).toMap
    assert(again(1L) === out(1L).payload.toSeq)
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

  test("audioBandProfile: REAL WAV decode reproduces the recipe-" +
    "computed square-wave correlations (header bytes cannot leak in)") {
    import spark.implicits._
    val ids = Seq(1L, 4L, 7L)              // id % 3 == 1 → audio rows
    val out = Multimodal.audioBandProfile(spark,
      (ids ++ Seq(3L, 5L)).toDF("doc_id"), "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getInt(6))).toMap
    assert(out.keySet === ids.toSet, "only audio ids profile")
    // independent recipe replay: samples (id·31 + 7i) mod 256
    ids.foreach { id =>
      val n = (id % 400 + 100).toInt
      val s = Array.tabulate(n)(i => ((id * 31 + i * 7) % 256).toInt)
      def corr(b: Int) = s.zipWithIndex
        .map { case (v, i) => if ((i / b) % 2 == 0) v.toLong else -v.toLong }
        .sum.toDouble / n
      val cs = Seq(1, 2, 4, 8).map(corr)
      val expDom = Seq(1, 2, 4, 8)(
        cs.indices.minBy(i => (-math.abs(cs(i)), i)))
      assert(out(id)._1 === n.toLong)
      assert(out(id)._2 === math.round(corr(1) * 1e6) / 1e6)
      assert(out(id)._3 === expDom)
    }
  }

  test("aHash: closed-form hash on a half-black/half-white image, one " +
    "flipped pixel costs Hamming 1, hex is unsigned") {
    import java.awt.image.BufferedImage
    def img(flip: Boolean): BufferedImage = {
      val bi = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        bi.setRGB(x, y, if (x >= 4) 0xffffff else 0x000000)
      if (flip) bi.setRGB(0, 0, 0xffffff)
      bi
    }
    // white cells (gray 765) sit above the mean, black at 0 below:
    // hash = the x>=4 mask = 0xf0 per row
    val a = Multimodal.MediaFeatures.aHash(img(flip = false))
    assert(Multimodal.MediaFeatures.aHashHex(img(flip = false)) ===
      "f0f0f0f0f0f0f0f0")
    val b = Multimodal.MediaFeatures.aHash(img(flip = true))
    assert(Multimodal.MediaFeatures.hammingDist(a, b) === 1)
    assert(Multimodal.MediaFeatures.aHashHex(img(flip = true)) ===
      "f0f0f0f0f0f0f0f1")
    // an image with the sign bit set still prints unsigned hex: all
    // cells equal → no bit above the mean; invert: top row white only
    val top = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      top.setRGB(x, y, if (y == 7) 0xffffff else 0)
    assert(Multimodal.MediaFeatures.aHashHex(top) === "ff00000000000000")
  }

  test("imageDupGroups: REAL decode groups match the closed-form " +
    "band-recipe hash, min id survives, singletons dropped") {
    val groups = Multimodal.imageDupGroups(spark, docs, "doc_id")
      .collect()
    assert(groups.nonEmpty)
    assert(groups.forall(_.getAs[Long]("n_images") >= 2L))
    // replay the recipe: the hash is the top- or bottom-band row mask
    val expected = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 3 == 0).map { id =>
        val h = id % 11 + 4
        val gt = (id * 7) % 256 + (id * 11) % 256 + (id * 13) % 256
        val gb = (id * 17) % 256 + (id * 19) % 256 + (id * 23) % 256
        val hex = (7 to 0 by -1).map { y =>
          val topRow = (y * h / 8) < (h / 2)
          if ((gt > gb && topRow) || (gb > gt && !topRow)) "ff" else "00"
        }.mkString
        (id, hex)
      }
    val byHash = expected.groupBy(_._2).filter(_._2.length >= 2)
    val got = groups.map(r => (r.getAs[String]("phash"),
      r.getAs[Long]("n_images"), r.getAs[Long]("keep_id"))).toSet
    val want = byHash.map { case (hx, ids) =>
      (hx, ids.length.toLong, ids.map(_._1).min) }.toSet
    assert(got === want)
  }
}
