package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.ext.Multimodal.{MediaFeatures, MediaRow}

class MultimodalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private lazy val media = Multimodal.mediaTable(spark, sf).as[MediaRow]

  test("media table: binary content with typed metadata columns") {
    val schema = media.schema
    assert(schema("content").dataType.typeName === "binary")
    assert(media.count() === graft.tables.Tables.documents(spark, sf).count())
    val types = media.select("media_type").distinct().as[String].collect().toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("feature extraction preserves rows and emits fixed-dim features") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === media.count())
    val sample = feats.take(10)
    sample.foreach { f =>
      assert(f.feature.length === Multimodal.MediaCodec.FeatureDim)
      assert(f.width >= 1 && f.width <= 640)
      assert(f.height >= 1 && f.height <= 480)
    }
  }

  test("decode stub is deterministic across partitionings") {
    val a = Multimodal.extractFeatures(media.repartition(8).as[MediaRow])
      .collect().sortBy(_.doc_id).map(_.feature.toSeq)
    val b = Multimodal.extractFeatures(media.coalesce(1).as[MediaRow])
      .collect().sortBy(_.doc_id).map(_.feature.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling fans out only videos, stride respected") {
    val feats = Multimodal.extractFeatures(media)
    val frames = Multimodal.sampleFrames(feats, stride = 10)
    val perDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), first("n_frames").as("f"))
      .collect()
    perDoc.foreach { r =>
      val expected = (r.getAs[Int]("f") + 9) / 10
      assert(r.getAs[Long]("n") === expected)
    }
    assert(frames.count() > 0)
  }

  test("resize stub preserves aspect ratio within the max dimension") {
    val feats = Multimodal.extractFeatures(media)
    val resized = Multimodal.resizeMeta(feats, maxDim = 100).collect()
    resized.foreach { f =>
      assert(f.width <= 100 && f.height <= 100)
      assert(f.width >= 1 && f.height >= 1)
    }
    // un-resized metadata unchanged for already-small media
    val before = feats.collect().map(f => f.doc_id -> f).toMap
    resized.filter(f => before(f.doc_id).width <= 100 &&
      before(f.doc_id).height <= 100).foreach { f =>
      assert(f.width === before(f.doc_id).width)
      assert(f.height === before(f.doc_id).height)
    }
  }

  private def imageBytes(format: String): Array[Byte] = {
    // 8x4, left half black, right half white
    val im = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      im.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, format, bos), s"no $format writer")
    bos.toByteArray
  }

  test("real decode: PNG and BMP bytes yield true dimensions and luminance grid") {
    for (fmt <- Seq("png", "bmp")) {
      val Some((w, h, f, feat)) =
        Multimodal.MediaCodec.decodeImage(imageBytes(fmt))
      assert((w, h, f) === ((8, 4, 1)), s"$fmt metadata wrong")
      // 4x4 luminance grid: columns 0-1 cover the black half, 2-3 the white
      for (cy <- 0 until 4; cx <- 0 until 4) {
        val lum = feat(cy * 4 + cx)
        if (cx < 2) assert(lum < 0.01, s"$fmt cell ($cx,$cy) not black: $lum")
        else assert(lum > 0.99, s"$fmt cell ($cx,$cy) not white: $lum")
      }
    }
    // unrecognizable bytes are NOT an image: caller falls back to the stub
    assert(Multimodal.MediaCodec.decodeImage(
      "definitely not an image".getBytes("UTF-8")).isEmpty)
  }

  test("extractFeatures routes real image bytes through the real decoder") {
    val png = imageBytes("png")
    val textBytes = "plain text payload".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "image", png), // real decode
      MediaRow(2L, "image", textBytes), // image-typed but not an image → stub
      MediaRow(3L, "video", textBytes)) // no JDK codec → stub
      .toDS()
    val out = Multimodal.extractFeatures(rows).collect()
      .map(f => f.doc_id -> f).toMap
    assert((out(1L).width, out(1L).height, out(1L).n_frames) === ((8, 4, 1)))
    assert(out(2L).width === textBytes.length % 640 + 1, "stub fallback lost")
    assert(out(3L).n_frames === textBytes.length % 300 + 1)
    // the real-decoded feature flows the same downstream frame sampler
    val frames = Multimodal.sampleFrames(
      Multimodal.extractFeatures(rows), stride = 2)
    assert(frames.filter(col("doc_id") === 3L).count() ===
      (out(3L).n_frames + 1) / 2)
  }

  test("features feed the similarity operators (cosine over array<float>)") {
    import graft.functions.VectorFunctions.cosine_sim
    val feats = Multimodal.extractFeatures(media).toDF()
    val self = feats.select(cosine_sim(col("feature"), col("feature")).as("c"))
      .agg(min("c"), max("c")).collect()(0)
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-9)
  }

  test("q135: generated BMPs decode to exactly the specified pixels") {
    // the oracle never decodes — it trusts gPixel's closed form; this is
    // the test that pins the writer → ImageIO → raster chain to it
    Seq(0L, 1L, 3L, 17L, 122L).foreach { id =>
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.makeBmp(id)))
      assert(im != null && im.getWidth === 8 && im.getHeight === 8)
      for (y <- 0 until 8; x <- 0 until 8) {
        val got = im.getRGB(x, y) & 0xff
        assert(got === Multimodal.gPixel(id, y * 8L + x),
          s"doc $id pixel ($x,$y): decode disagrees with the closed form")
        // gray: all three channels carry the same value
        assert(((im.getRGB(x, y) >> 8) & 0xff) === got)
        assert(((im.getRGB(x, y) >> 16) & 0xff) === got)
      }
    }
  }

  test("q135: chunk-pigeonhole pairs equal the exhaustive Hamming scan") {
    val fps = Multimodal.imageHashes(SparkSpec.spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every fingerprint stays within the 56-bit budget
    assert(fps.forall { case (_, fp) => (fp >> Multimodal.DHashBits) === 0L })
    val exhaustive = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.imageNearDup(SparkSpec.spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === exhaustive,
      "banded join must be exactly the exhaustive Hamming-<=3 pair set")
    assert(got.nonEmpty, "fixture groups must contain near-duplicate images")
    // in-group perturbations are near-dups; sanity: some pair from group 0
    assert(got.exists { case (a, b, _) => a / 4 === b / 4 },
      "same-group images must collide")
  }

  test("q201: PCM8 decode replays on crafted payloads; pipeline covers every audio row") {
    import graft.ext.Multimodal
    // crafted clip: 300 samples — window 0 = 256 quiet samples (value
    // 81 → s=+1), window 1 = 44 loud samples (32 → s=-48): peak MUST be
    // window 1 despite it being shorter, and ZCR counts the single
    // sign change at the boundary
    val quiet = Array.fill(256)(81.toByte)
    val loud = Array.fill(44)(32.toByte)
    val (n, nw, zc, pw, pe) = Multimodal.decodePcm8(quiet ++ loud)
    assert(n === 300L && nw === 2L)
    assert(zc === 1L, "one sign change at the quiet/loud boundary")
    assert(pw === 1L, "short loud window must out-rank the long quiet one")
    assert(pe === 44L * 48 * 48)
    // alternating signs: ZCR = n-1; peak defaults to first window on ties
    val alt = Array.tabulate(512)(i => (if (i % 2 == 0) 81 else 32).toByte)
    val (_, nwA, zcA, pwA, peA) = Multimodal.decodePcm8(alt)
    assert(nwA === 2L && zcA === 511L && pwA === 0L)
    assert(peA === 256L * (1 + 48 * 48) / 2)
    // empty payload: all-zero features, no crash
    assert(Multimodal.decodePcm8(Array.empty) === ((0L, 0L, 0L, 0L, 0L)))
    // the registered query covers exactly the audio-typed third of docs
    val rows = Multimodal.audioFeatures(spark, sf).collect()
    val audioIds = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1).count()
    assert(rows.length.toLong === audioIds)
    assert(rows.forall(_.getLong(3) > 0),
      "text-byte clips must show zero crossings (space/letter flips)")
  }

  test("WAV codec: encode→decode round-trips samples bit-for-bit") {
    // golden: a deterministic ramp exercising every sample value
    val samples = Array.tabulate(1000)(i => (i % 256).toByte)
    val wav = Multimodal.encodeWavPcm8(samples)
    // a real RIFF/WAVE container, not a re-labelled byte array
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    assert(wav.length > samples.length, "container must add a header")
    val Some((rate, back)) = Multimodal.decodeWavPcm8(wav)
    assert(rate === Multimodal.WavRate)
    assert(back.toSeq === samples.toSeq, "PCM round-trip must be lossless")
    // features over decoded samples == features over the raw samples
    assert(Multimodal.decodePcm8(back) === Multimodal.decodePcm8(samples))
    // empty clip round-trips to an empty (but valid) data chunk
    val Some((_, empty)) = Multimodal.decodeWavPcm8(
      Multimodal.encodeWavPcm8(Array.empty))
    assert(empty.isEmpty)
    // malformed container: a corrupt header is a decode FAILURE, not
    // silence — q201 turns this into a hard per-doc error
    val corrupt = wav.clone(); corrupt(0) = 'X'.toByte
    assert(Multimodal.decodeWavPcm8(corrupt).isEmpty)
    assert(Multimodal.decodeWavPcm8("not a wav".getBytes).isEmpty)
  }

  test("q201 oracle keeps zero-length payloads (LEFT JOIN + COALESCE)") {
    // Spark's decodePcm8 on empty bytes is the all-zero feature row
    // (asserted above). The oracle's `wins` CTE generates NO window
    // rows at nw=0, so only a LEFT JOIN with COALESCE keeps the doc —
    // an inner join would silently drop it and hash-mismatch the pair.
    // Lock the spelling so a rewrite can't regress to the inner join.
    val sql = Multimodal.audioFeaturesSql
    assert(sql.contains("LEFT JOIN peak"), "oracle must LEFT JOIN peak")
    assert(sql.contains("coalesce(p.peak_window, 0)"))
    assert(sql.contains("coalesce(p.peak_energy, 0)"))
  }

  test("AVI codec: encode→decode round-trips frames pixel-for-pixel") {
    import graft.ext.Avi
    // deterministic pseudo-random rasters, including 0 and 255 extremes
    val frames = Array.tabulate(5)(f =>
      Array.tabulate(Avi.Side * Avi.Side)(p => (f * 89 + p * 131 + 7) % 256))
    frames(1)(0) = 0; frames(1)(1) = 255
    val bytes = Avi.encode(frames)
    // a genuine RIFF envelope with the documented size arithmetic
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "AVI ")
    assert(bytes.length === 232 + 216 * frames.length)
    val back = Avi.decode(bytes)
    assert(back.length === frames.length)
    frames.indices.foreach { f =>
      assert(back(f).toSeq === frames(f).toSeq,
        s"frame $f must round-trip bit-exactly")
    }
    // single-frame videos are valid too
    assert(Avi.decode(Avi.encode(frames.take(1))).length === 1)
  }

  test("AVI codec: malformed containers are hard errors, never black frames") {
    import graft.ext.Avi
    val good = Avi.encode(Array.tabulate(3)(f =>
      Array.tabulate(Avi.Side * Avi.Side)(p => (f + p * 13) % 256)))
    def corrupt(at: Int, v: Byte): Array[Byte] = {
      val c = good.clone(); c(at) = v; c
    }
    // RIFF magic, truncation, movi frame fourcc, idx1 offset, trailing junk
    intercept[IllegalArgumentException](Avi.decode(corrupt(0, 'X'.toByte)))
    intercept[IllegalArgumentException](Avi.decode(good.take(good.length - 4)))
    intercept[IllegalArgumentException](Avi.decode(good ++ Array[Byte](0)))
    intercept[IllegalArgumentException](Avi.decode(Array[Byte](1, 2, 3)))
    // flip one byte of the idx1 offset of frame 2 (last 16-byte entry:
    // ckid, flags, offset, length → offset bytes are at -8..-5)
    intercept[IllegalArgumentException](
      Avi.decode(corrupt(good.length - 8, 99)))
    // a non-gray pixel inside a movi chunk (G != B) must be rejected:
    // the movi payload starts after RIFF(12)+hdrl(200)+LIST movi hdr(12)
    // +chunk hdr(8); +1 lands on the G channel of the first pixel
    intercept[IllegalArgumentException](
      Avi.decode(corrupt(12 + 200 + 12 + 8 + 1,
        ((good(12 + 200 + 12 + 8 + 1) & 0xff) ^ 0x80).toByte)))
    // a HOSTILE dwTotalFrames (~2^31/200 would wrap the int movi-size
    // arithmetic into agreement with a crafted size field) must die in
    // the long-arithmetic file-size pin — an IllegalArgumentException,
    // never a multi-GB frames allocation or a BufferUnderflow
    // (dwTotalFrames lives at offset 48: RIFF 12 + LIST hdr 12 +
    // avih hdr 8 + 4 dwords)
    val hostile = good.clone()
    hostile(48 + 3) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](Avi.decode(hostile))
    assert(e.getMessage.contains("inconsistent"), e.getMessage)
  }

  test("q225: decoded-frame shot detection equals the scene structure") {
    // the detector (sum |Δpixel| > ShotCutSum over REAL decoded frames)
    // must reproduce the generator's scene arithmetic exactly: shots of
    // length id%4+2 → 1 + (nf-1) / L boundaries... computed structurally
    val out = Multimodal.videoShotStats(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size.toLong ===
      graft.tables.Tables.documents(spark, sf).count())
    out.foreach { case (id, (nf, shots)) =>
      val l = id % 4 + 2
      assert(nf === id % 24 + 2)
      assert(shots === (nf - 1) / l + 1,
        s"doc $id: detected $shots shots for nf=$nf L=$l")
    }
  }

  test("q226: group-mate frames pair at Hamming ≤ 3; pairs are bounded") {
    val pairs = Multimodal.videoFrameNearDup(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("hamming") <= 3)
      assert(r.getAs[Long]("a_doc") % 8 === 0)
      assert(r.getAs[Long]("b_doc") % 8 === 0)
    }
    // every same-(group, frame) video pair is detected: vid = doc/8,
    // group = vid/4 — group-mates share base patterns at each frame
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 8 == 0).sorted
    val byGroup = docs.groupBy(id => (id / 8) / 4)
    val expected = byGroup.values.flatMap { arr =>
      val g = arr.toSeq
      for {
        a <- g; b <- g if a < b
        nfA = ((a / 8) % 6 + 2).toInt; nfB = ((b / 8) % 6 + 2).toInt
        f <- 0 until math.min(nfA, nfB)
      } yield (a, f.toLong, b, f.toLong)
    }.toSet
    val got = pairs.map(r => (r.getAs[Long]("a_doc"), r.getAs[Long]("a_frame"),
      r.getAs[Long]("b_doc"), r.getAs[Long]("b_frame"))).toSet
    assert(expected.subsetOf(got),
      s"missing ${expected.diff(got).size} in-group frame pairs")
  }
}
