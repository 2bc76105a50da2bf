package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal-column plumbing — north-star extension (SURVEY.md §7.4).
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * alongside; decode/feature-extraction runs as a *batched* per-partition
  * pass over the binary column (the Scala analogue of `mapInPandas`: one
  * iterator per partition, vectorizable batch work inside, no per-row
  * driver involvement).
  *
  * IMAGE decode is REAL ([[MediaCodec.decodeImage]], via the JDK's
  * `javax.imageio` — PNG/BMP/GIF/JPEG, offline-safe). AUDIO decode is
  * REAL in the q201 feature arm ([[decodeWavPcm8]], via the JDK's
  * `javax.sound.sampled` RIFF/WAVE parser — offline-safe). VIDEO decode
  * is REAL in the q225/q226 feature arms ([[graft.ext.Avi]], an
  * uncompressed-DIB RIFF/AVI container codec — offline-safe); only the
  * generic 16-dim [[MediaCodec]] path still routes video through
  * [[MediaCodec.decodeStub]], its clearly-marked deterministic stand-in
  * for lossy third-party codecs, and unrecognizable image bytes (and the
  * generic 16-dim feature path for audio) fall back to it too.
  * Everything around the codecs — schema, binary column handling,
  * partition-local batching, feature array shape, frame-sampling
  * explode — is real and tested; swapping in a lossy video codec touches
  * only [[MediaCodec.decode]]'s dispatch.
  *
  * Scale: content bytes stay columnar until the decode pass; partition
  * counts carry through (no repartition); features are fixed-width
  * `array<float>` feeding directly into [[Similarity]] operators.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** A media table synthesized over the corpus: document text bytes stand
    * in for the media payload (the harness ships no real binaries). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    graft.ops.Par.fan(Tables.documents(s, dir)).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"))

  /** STUB — deterministic fake decode in place of a real codec.
    * Real implementation would parse the container format; the fake
    * derives metadata and a 16-dim feature vector from the bytes alone,
    * so results are reproducible and schema-faithful. */
  object MediaCodec {
    val FeatureDim = 16

    def decodeStub(mediaType: String, content: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val n = content.length
      val width  = n % 640 + 1
      val height = (n * 7) % 480 + 1
      val frames = mediaType match {
        case "video" => n % 300 + 1
        case "audio" => n % 16000 + 1
        case _       => 1
      }
      val feat = new Array[Float](FeatureDim)
      var i = 0
      while (i < n) {
        feat(i % FeatureDim) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      (width, height, frames, feat)
    }

    /** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/GIF/
      * JPEG — any format a registered ImageReader recognizes; JDK-
      * builtin, offline-safe, no native libs). Returns None when the
      * bytes are not a recognizable image, so callers fall back to the
      * stub — the synthesized corpus (text bytes as payload) keeps
      * flowing the stub path while genuine image bytes decode for real.
      *
      * Feature vector = 4×4 grid of mean luminance (Rec. 601 weights) in
      * [0, 1] — deterministic for lossless formats, fixed
      * [[FeatureDim]]-wide like the stub's, so everything downstream
      * (similarity ops over `array<float>`) is shape-compatible. */
    def decodeImage(content: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case _: java.io.IOException => null }
      Option(img).map { im =>
        val w = im.getWidth; val h = im.getHeight
        val sums = new Array[Float](FeatureDim)
        val counts = new Array[Int](FeatureDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val lum = (0.299f * ((rgb >> 16) & 0xff) +
              0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)) / 255.0f
            sums((y * 4 / h) * 4 + (x * 4 / w)) += lum
            counts((y * 4 / h) * 4 + (x * 4 / w)) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < FeatureDim) { if (counts(i) > 0) sums(i) /= counts(i); i += 1 }
        (w, h, 1, sums)
      }
    }

    /** Decode dispatch: image payloads try the REAL decoder first and
      * fall back to the stub for unrecognized bytes; video has no JDK
      * codec so it stays on the documented stub, as does audio's
      * generic 16-dim feature path (its REAL codec lives in the q201
      * arm, [[Multimodal.decodeWavPcm8]]). */
    def decode(mediaType: String, content: Array[Byte]): (Int, Int, Int, Array[Float]) =
      if (mediaType == "image")
        decodeImage(content).getOrElse(decodeStub(mediaType, content))
      else decodeStub(mediaType, content)
  }

  /** STUB — deterministic fake resize: real implementation would rescale
    * pixel data; the fake maps metadata through the same arithmetic a
    * resampler would (aspect-preserving fit into maxDim), so downstream
    * schema/logic is exercised faithfully. */
  def resizeMeta(features: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(
        width = math.max(1, math.round(f.width * scale).toInt),
        height = math.max(1, math.round(f.height * scale).toInt))
    }
  }

  /** Batched per-partition decode + feature extraction (mapInPandas
    * analogue). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a NULL payload (a NULL-text doc casts to NULL binary) has
      // nothing to decode — skip it instead of NPEing the partition;
      // the SQL metadata arms (q26) pass such rows through with NULL
      // metrics, which is their own documented semantics
      rows.filter(_.content != null).map { r =>
        val (w, h, f, feat) = MediaCodec.decode(r.media_type, r.content)
        MediaFeatures(r.doc_id, r.media_type, w, h, f, feat)
      }
    }
  }

  /** Frame sampling: one row per sampled frame index (every `stride`-th
    * frame) — the explode pattern used to fan a video row out to
    * per-frame work items. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(stride))).as("frame_idx"))

  /** q26 — media metadata summary (oracle-able: the fake decode's
    * width/height arithmetic is pure SQL on byte length). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"), col("media_type"),
        length(col("content")).cast("long").as("n_bytes"),
        (length(col("content")) % 640 + 1).cast("long").as("width"),
        (length(col("content")) * 7 % 480 + 1).cast("long").as("height"))
      .orderBy(col("doc_id"))

  /** The oracle equates DuckDB CHARACTER length(text) with the binary
    * payload's BYTE length — true only for ASCII. Asserted in the SQL
    * itself (the fingerprintsSql pattern): a non-ASCII corpus fails with
    * an explicit error() instead of a confusing hash mismatch.
    *
    * This snippet is interpolated into SQL that gets stripMargin'd AGAIN,
    * so no line may start with `|` — a leading `||` concat would lose its
    * first pipe and become bitwise-or. Concats stay at line ends. */
  private def asciiCheckedDocs(q: String): String =
    s"""checked AS (
       |  SELECT doc_id,
       |    CASE WHEN strlen(text) <> length(text)
       |      THEN error('$q oracle precondition violated: non-ASCII text in doc_id=' ||
       |        doc_id ||
       |        ' (this SQL equates char length with the binary payload byte length)')
       |      ELSE text END AS text
       |  FROM documents)""".stripMargin

  val mediaMetaSql: String =
    s"""WITH ${asciiCheckedDocs("q26")}
      |SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |    WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  CAST(length(text) % 640 + 1 AS BIGINT) AS width,
      |  CAST(length(text) * 7 % 480 + 1 AS BIGINT) AS height
      |FROM checked
      |ORDER BY doc_id""".stripMargin

  /** q70 — frame sampling end to end THROUGH the typed decode path
    * (mediaTable → mapPartitions decode → explode every-30th frame), so
    * the oracle pins the whole plumbing chain, not just the metadata
    * projection: the stub's frame count is byte-length arithmetic the
    * SQL recomputes (corpus is ASCII, so DuckDB's char length equals
    * the binary payload length — the same precondition q26 uses). */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir).as[MediaRow]
    sampleFrames(extractFeatures(media), stride = 30)
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** DuckDB spelling: same video selection, same n%300+1 frame count,
    * same stride-30 sampling (range stop-exclusive ≡ sequence to
    * n_frames−1 inclusive). */
  val frameSampleSql: String =
    s"""WITH ${asciiCheckedDocs("q70")},
      |v AS (
      |  SELECT doc_id, CAST(length(text) % 300 + 1 AS BIGINT) AS n_frames
      |  FROM checked WHERE CAST(doc_id % 3 AS INTEGER) = 2)
      |SELECT doc_id, n_frames,
      |  CAST(unnest(range(0, n_frames, 30)) AS BIGINT) AS frame_idx
      |FROM v
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---- q135: perceptual-hash image near-dup through the REAL decoder ------

  /** q135 image geometry: 8×8 grayscale BMPs, so the difference hash
    * compares 7 adjacent-pixel pairs per row × 8 rows = 56 bits. */
  final val ImgSide = 8
  final val DHashBits = 56

  /** Deterministic pixel value for (doc, raster position): documents in
    * the same group of 4 (doc_id div 4) share a base pattern; the
    * doc_id mod 4 low raster positions are brightened by +128 — so each
    * group holds genuine NEAR-duplicate images (identical but for ≤3
    * perturbed pixels) while distinct groups are unrelated. The SAME
    * closed form is what the DuckDB oracle evaluates, which is exactly
    * what makes the REAL decode path oracle-checkable: any disagreement
    * between this arithmetic and what `ImageIO` hands back (row order,
    * channel order, padding) breaks the hash match. */
  private[graft] def gPixel(id: Long, pos: Long): Long = {
    val base = ((id / 4) * 37 + pos) * 97 % 256
    if (pos < id % 4) (base + 128) % 256 else base
  }

  /** One [[ImgSide]]² 24-bit uncompressed BMP for doc `id` — rows
    * bottom-up per the format, 8·3 = 24-byte rows need no padding,
    * B=G=R=[[gPixel]] makes every channel carry the gray value. */
  private[graft] def makeBmp(id: Long): Array[Byte] = {
    val rowBytes = ImgSide * 3
    val dataSize = rowBytes * ImgSide
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
      .putInt(40).putInt(ImgSide).putInt(ImgSide)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = 0
    while (r < ImgSide) {
      val y = ImgSide - 1 - r // BMP rows are bottom-up
      var x = 0
      while (x < ImgSide) {
        val g = gPixel(id, y.toLong * ImgSide + x).toByte
        out.put(g).put(g).put(g)
        x += 1
      }
      r += 1
    }
    out.array()
  }

  /** Difference hash of a decoded image: bit y·7+x is set iff
    * pixel(x,y) < pixel(x+1,y) — the standard dHash, reading the gray
    * value from the low channel (B=G=R here). */
  private[graft] def dhash(im: java.awt.image.BufferedImage): Long = {
    var fp = 0L
    var y = 0
    while (y < ImgSide) {
      var x = 0
      while (x < ImgSide - 1) {
        if ((im.getRGB(x, y) & 0xff) < (im.getRGB(x + 1, y) & 0xff))
          fp |= 1L << (y * (ImgSide - 1) + x)
        x += 1
      }
      y += 1
    }
    fp
  }

  /** (doc_id, fp) difference hashes computed THROUGH the real
    * `javax.imageio` decode of per-doc generated BMPs — partition-local
    * batch work, the q70 plumbing shape with a real codec in the
    * middle. */
  def imageHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ops.Par.fan(Tables.documents(s, dir).select(col("doc_id"))).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val im = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(makeBmp(id)))
          require(im != null, s"BMP decode failed for doc $id")
          (id, dhash(im))
        }
      }.toDF("doc_id", "fp")
  }

  /** q135 — perceptual near-duplicate image detection: dHash
    * fingerprints from the REAL image decode, then Hamming-≤3 pairs via
    * the q25 chunk-pigeonhole equi-join (4×14-bit chunks: ≤3 differing
    * bits leave ≥1 chunk intact, so the banded join is provably
    * complete — no pairwise scan). The oracle recomputes the hash from
    * [[gPixel]]'s closed form WITHOUT any codec, so the gate fails
    * loudly if the writer/decoder/hash chain disagrees with the
    * specified pixels in any way.
    *
    * Scale shape: images decode partition-local (bytes never shuffle);
    * only (doc_id, 8-byte fp) leaves the scan, and the candidate join
    * is chunk-keyed — the q24/q25 banding story applied to pixels
    * instead of tokens. */
  def imageNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.hammingPairs(imageHashes(s, dir),
      chunks = 4, chunkBits = DHashBits / 4, maxDist = 3)

  /** DuckDB spelling: dHash bits from the same closed-form pixels
    * (no decoding — that is the point), O(N²) verify join as in q25's
    * oracle. */
  val imageNearDupSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, p.p AS pos,
       |    ((((doc_id // 4) * 37 + p.p) * 97) % 256 +
       |      CASE WHEN p.p < doc_id % 4 THEN 128 ELSE 0 END) % 256 AS g
       |  FROM documents, range(${ImgSide * ImgSide}) p(p)),
       |bits AS (
       |  SELECT a.doc_id,
       |    (a.pos // $ImgSide) * ${ImgSide - 1} + (a.pos % $ImgSide) AS bit
       |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  WHERE a.pos % $ImgSide < ${ImgSide - 1} AND a.g < b.g),
       |fp AS (
       |  SELECT d.doc_id,
       |    CAST(coalesce(sum(1::BIGINT << CAST(bit AS INTEGER)), 0)
       |      AS BIGINT) AS fp
       |  FROM documents d LEFT JOIN bits ON d.doc_id = bits.doc_id
       |  GROUP BY d.doc_id)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3
       |ORDER BY a_id, b_id""".stripMargin

  // ---- q201: audio feature extraction (windowed energy + ZCR) ------------

  case class AudioFeatures(doc_id: Long, n_samples: Long, n_windows: Long,
      zero_crossings: Long, peak_window: Long, peak_energy: Long)

  /** Sample bias of the PCM8 feature math: samples are read as unsigned
    * 8-bit and centered at [[PcmBias]] (letters land positive,
    * whitespace negative — so zero crossings genuinely occur on the
    * text-byte corpus). The byte→sample step in the q201 path is a REAL
    * RIFF/WAVE container round-trip ([[encodeWavPcm8]] /
    * [[decodeWavPcm8]], JDK `javax.sound.sampled` — offline-safe, no
    * native libs); windowing, ZCR and the energy argmax below are the
    * real feature math either way. */
  final val PcmBias = 80
  /** Samples per analysis window. */
  final val AudioWindow = 256
  /** Container sample rate for the synthesized clips (Hz). */
  final val WavRate = 8000f

  private def wavFormat = new javax.sound.sampled.AudioFormat(
    javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
    WavRate, 8, 1, 1, WavRate, false)

  /** Wrap unsigned 8-bit mono PCM samples in a genuine RIFF/WAVE
    * container (the harness's payload-synthesis step — a production
    * pipeline ingests these bytes from storage instead). */
  private[graft] def encodeWavPcm8(samples: Array[Byte]): Array[Byte] = {
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), wavFormat,
      samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled`: parse the
    * RIFF/WAVE container, validate the format is the 8-bit mono
    * unsigned PCM this pipeline ships, and return (sample rate,
    * samples). None for bytes that are not a well-formed WAV — callers
    * treat that as a corrupt payload, never as silence. */
  private[graft] def decodeWavPcm8(
      wav: Array[Byte]): Option[(Float, Array[Byte])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 8 || f.getChannels != 1 ||
            f.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) None
        else Some((f.getSampleRate, ais.readAllBytes()))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Windowed audio features from one payload: (n_samples, n_windows,
    * zero_crossings, peak_window, peak_energy). Integer arithmetic
    * only — Σs² per window, sign-change count, first-peak argmax. */
  private[graft] def decodePcm8(content: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val n = content.length
    val nw = (n + AudioWindow - 1) / AudioWindow
    val energy = new Array[Long](math.max(nw, 1))
    var zc = 0L
    var prevNeg = false
    var i = 0
    while (i < n) {
      val s = (content(i) & 0xff) - PcmBias
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      energy(i / AudioWindow) += s.toLong * s
      i += 1
    }
    var peak = 0
    var w = 1
    while (w < nw) { if (energy(w) > energy(peak)) peak = w; w += 1 }
    (n.toLong, nw.toLong, zc, peak.toLong,
      if (nw == 0) 0L else energy(peak))
  }

  /** q201 — audio-arm feature extraction: the `audio`-typed payloads
    * through the SAME batched per-partition decode pass as the image
    * arm (mapInPandas analogue), emitting per-clip windowed-energy
    * features: sample/window counts, zero-crossing total (the
    * speech-vs-silence heuristic), and the peak-energy window (where a
    * real pipeline would center a training crop). The byte→sample step
    * is a genuine RIFF/WAVE container round-trip: the partition encodes
    * the fixture's text bytes as 8-bit mono PCM WAV ([[encodeWavPcm8]])
    * and the features run over what `javax.sound.sampled` actually
    * parses back out ([[decodeWavPcm8]]) — a real header, a real data
    * chunk, a hard error on malformed containers. The oracle recomputes
    * every value from the bytes in SQL — so the whole typed chain
    * (binary column → partition-local container decode → feature
    * relation) is value-pinned, the q70 discipline applied to audio.
    *
    * Scale shape: decode is partition-local (no shuffle, payload bytes
    * never leave their partition); the output relation is one fixed-
    * width row per clip. */
  def audioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      // NULL payloads skipped like extractFeatures — no clip, no row
      .filter(r => r.media_type == "audio" && r.content != null)
      .mapPartitions { rows =>
        rows.map { r =>
          // payload synthesis (the fixture ships text bytes, not WAV
          // files) followed by the REAL container decode: a malformed
          // container here is a hard error, never silent silence
          val wav = encodeWavPcm8(r.content)
          val (_, samples) = decodeWavPcm8(wav).getOrElse(
            throw new IllegalStateException(
              s"doc ${r.doc_id}: payload is not a well-formed WAV"))
          val (n, nw, zc, pw, pe) = decodePcm8(samples)
          AudioFeatures(r.doc_id, n, nw, zc, pw, pe)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** DuckDB spelling: byte values via ord() under the ASCII
    * precondition, the same bias/window/argmax arithmetic. `peak` is
    * LEFT-joined with COALESCE(…, 0): a zero-length payload yields
    * nw=0, so `wins` generates no window rows — the left join keeps
    * the doc and matches [[decodePcm8]]'s all-zero feature row where
    * an inner join would silently drop it. */
  val audioFeaturesSql: String =
    s"""WITH ${asciiCheckedDocs("q201")},
       |au AS (
       |  SELECT doc_id,
       |    list_transform(range(1, length(text) + 1),
       |      i -> ord(substr(text, i, 1)) - $PcmBias) AS sm,
       |    CAST(length(text) AS BIGINT) AS n
       |  FROM checked WHERE doc_id % 3 = 1),
       |base AS (
       |  SELECT doc_id, n, (n + ${AudioWindow - 1}) // $AudioWindow AS nw,
       |    CAST(coalesce(list_sum(list_transform(range(1, n),
       |      i -> CASE WHEN (sm[i] < 0) <> (sm[i + 1] < 0)
       |           THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zc,
       |    sm
       |  FROM au),
       |wins AS (
       |  SELECT doc_id, CAST(w AS BIGINT) AS w,
       |    CAST(list_sum(list_transform(
       |      range(w * $AudioWindow + 1, least((w + 1) * $AudioWindow, n) + 1),
       |      i -> sm[i] * sm[i])) AS BIGINT) AS energy
       |  FROM base, unnest(range(0, nw)) AS t(w)),
       |peak AS (
       |  SELECT doc_id, w AS peak_window, energy AS peak_energy,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY energy DESC, w) AS rn
       |  FROM wins)
       |SELECT b.doc_id, b.n AS n_samples, CAST(b.nw AS BIGINT) AS n_windows,
       |  b.zc AS zero_crossings,
       |  CAST(coalesce(p.peak_window, 0) AS BIGINT) AS peak_window,
       |  CAST(coalesce(p.peak_energy, 0) AS BIGINT) AS peak_energy
       |FROM base b LEFT JOIN peak p ON p.doc_id = b.doc_id AND p.rn = 1
       |ORDER BY b.doc_id""".stripMargin

  // ---- q225/q226: video features through the REAL RIFF/AVI codec ---------

  /** q225 shot-cut threshold: a frame starts a new shot when the summed
    * absolute pixel difference to its predecessor exceeds this (mean
    * |Δgray| > 30 over the 64-pixel raster). The synthetic corpus keeps
    * the two classes far apart: within a shot only the ≤2 jitter pixels
    * change (mean ≤ 7.5 even across a mod-256 wrap), across a cut ≥62
    * pixels move by ≥53 (mean ≥ 51) — so the detector is exact on the
    * fixture and both engines agree bit-for-bit. */
  final val ShotCutSum: Long = 30L * Avi.Side * Avi.Side

  /** q225 pixel closed form: doc `id`, frame `f`, raster position `p`.
    * Shots are runs of `L = id%4 + 2` frames sharing a scene pattern;
    * the `f % 3` prefix-brighten is per-frame jitter so consecutive
    * frames inside a shot are near- but not bit-identical. The DuckDB
    * oracle evaluates the SAME closed form — any disagreement in the
    * encoder/decoder/feature chain (row order, channel order, bottom-up
    * flip) breaks the value match, the q135 discipline applied to
    * video. */
  private[graft] def vidScenePixel(id: Long, f: Int, p: Int): Int = {
    val scene = f / ((id % 4) + 2)
    (((id * 31 + scene * 53 + p * 17) % 256 +
      (if (p < f % 3) 16 else 0)) % 256).toInt
  }

  /** q225 — video shot-boundary detection through the REAL container
    * codec: per doc, synthesize `id%24 + 2` frames from
    * [[vidScenePixel]], round-trip them through a genuine RIFF/AVI
    * container ([[Avi.encode]]/[[Avi.decode]] — strict headers, movi
    * chunks, idx1 index), then run the real detector over the DECODED
    * pixels: total luminance and consecutive-frame difference cuts at
    * [[ShotCutSum]]. A malformed container is a hard error, never a
    * black frame. Integer arithmetic only, so the oracle's closed-form
    * recomputation (no codec — that is the point) must match exactly.
    *
    * Scale shape: encode/decode/diff are partition-local (frame bytes
    * never shuffle); one fixed-width row per video leaves the scan. */
  def videoShotStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ops.Par.fan(Tables.documents(s, dir).select(col("doc_id"))).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val nf = (id % 24 + 2).toInt
          val raw = Array.tabulate(nf)(f =>
            Array.tabulate(Avi.Side * Avi.Side)(p => vidScenePixel(id, f, p)))
          val frames = Avi.decode(Avi.encode(raw))
          var totalLuma = 0L
          frames.foreach(fr => fr.foreach(totalLuma += _))
          var shots = 1L
          var f = 1
          while (f < nf) {
            var sumAbs = 0L
            var p = 0
            while (p < Avi.Side * Avi.Side) {
              sumAbs += math.abs(frames(f)(p) - frames(f - 1)(p))
              p += 1
            }
            if (sumAbs > ShotCutSum) shots += 1
            f += 1
          }
          (id, nf.toLong, shots, totalLuma)
        }
      }.toDF("doc_id", "n_frames", "n_shots", "total_luma")
      .orderBy(col("doc_id"))
  }

  /** DuckDB spelling: the same closed-form pixels via correlated
    * `range()` laterals, the same summed-|Δ| cut — no codec anywhere,
    * which is exactly what pins the Spark side's container round-trip. */
  val videoShotStatsSql: String =
    s"""WITH meta AS (
       |  SELECT doc_id, doc_id % 24 + 2 AS nf, doc_id % 4 + 2 AS L
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, f.f AS f, p.p AS p,
       |    ((doc_id * 31 + (f.f // L) * 53 + p.p * 17) % 256
       |      + CASE WHEN p.p < f.f % 3 THEN 16 ELSE 0 END) % 256 AS g
       |  FROM meta, unnest(range(0, nf)) AS f(f),
       |    range(${Avi.Side * Avi.Side}) p(p)),
       |diff AS (
       |  SELECT a.doc_id,
       |    CASE WHEN sum(abs(a.g - b.g)) > $ShotCutSum THEN 1 ELSE 0 END
       |      AS cut
       |  FROM px a JOIN px b
       |    ON a.doc_id = b.doc_id AND b.f = a.f - 1 AND a.p = b.p
       |  GROUP BY a.doc_id, a.f),
       |shots AS (
       |  SELECT doc_id, CAST(1 + sum(cut) AS BIGINT) AS n_shots
       |  FROM diff GROUP BY doc_id),
       |luma AS (
       |  SELECT doc_id, CAST(sum(g) AS BIGINT) AS total_luma
       |  FROM px GROUP BY doc_id)
       |SELECT m.doc_id, CAST(m.nf AS BIGINT) AS n_frames,
       |  CAST(coalesce(s.n_shots, 1) AS BIGINT) AS n_shots, l.total_luma
       |FROM meta m
       |LEFT JOIN shots s ON s.doc_id = m.doc_id
       |JOIN luma l ON l.doc_id = m.doc_id
       |ORDER BY m.doc_id""".stripMargin

  /** q226 pixel closed form: video `vid`, frame `f`, raster position
    * `p`. The q135 grouping applied to video frames: videos in the same
    * group of 4 (`vid / 4`) share per-frame base patterns, and the
    * `vid % 4` low raster positions are brightened by +128 — so frame
    * `f` of group-mates are genuine near-duplicates (≤3 perturbed
    * pixels, all in dHash row 0 → Hamming ≤ 3) while unrelated frames
    * stay apart. The base is QUADRATIC in `p` with two independent
    * 8-bit frame parameters (A, B): an affine-in-p form has a constant
    * adjacent-pixel delta, which would collapse every frame to a
    * handful of dHash classes and blow the pair set up quadratically;
    * a single-parameter form still leaves only 256 classes. Two
    * parameters give ~65k classes, so incidental exact-hash collisions
    * among the corpus's ~10³ frames stay at birthday-bound counts
    * (both engines compute them identically either way). */
  private[graft] def vidGroupPixel(vid: Long, f: Int, p: Int): Int = {
    val a = ((vid / 4) * 37 + f * 29) % 256
    val b = ((vid / 4) * 53 + f * 71 + 11) % 256
    val base = (a * (p + 1) + b * (p + 1) * (p + 1)) % 256
    (if (p < vid % 4) (base + 128) % 256 else base).toInt
  }

  /** dHash of a decoded top-down gray raster: bit `y·7+x` set iff
    * pixel(x,y) < pixel(x+1,y) — [[dhash]]'s convention without the
    * BufferedImage. */
  private[graft] def dhashGray(g: Array[Int]): Long = {
    var fp = 0L
    var y = 0
    while (y < Avi.Side) {
      var x = 0
      while (x < Avi.Side - 1) {
        if (g(y * Avi.Side + x) < g(y * Avi.Side + x + 1))
          fp |= 1L << (y * (Avi.Side - 1) + x)
        x += 1
      }
      y += 1
    }
    fp
  }

  /** (doc_id·100 + frame, dHash) for every frame of the sampled videos
    * (1-in-8 of the corpus, `vid = doc_id/8`, `vid%6 + 2` frames each),
    * computed THROUGH the real AVI round-trip. The composite frame id
    * keys the Hamming join; frame counts stay ≤ 7 so the id is
    * unambiguous and lexicographic in (doc, frame). */
  private[graft] def videoFrameHashesOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.ops.Par.fan(docs
      .filter(col("doc_id") % 8 === 0))  // Column filter: reaches the scan
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val vid = id / 8
          val nf = (vid % 6 + 2).toInt
          val raw = Array.tabulate(nf)(f =>
            Array.tabulate(Avi.Side * Avi.Side)(p => vidGroupPixel(vid, f, p)))
          Avi.decode(Avi.encode(raw)).iterator.zipWithIndex.map {
            case (fr, f) => (id * 100 + f, dhashGray(fr))
          }
        }
      }.toDF("doc_id", "fp")
  }

  private def videoFrameHashes(s: SparkSession, dir: String): DataFrame =
    videoFrameHashesOf(Tables.documents(s, dir))

  /** q226 — cross-video frame near-duplication: dHash fingerprints from
    * the REAL AVI decode, then Hamming-≤3 pairs via the q25/q135
    * chunk-pigeonhole equi-join (4×14-bit chunks) — deduplicating frames
    * across a video corpus before vision-LM training, with no pairwise
    * scan anywhere. The oracle recomputes the hash from
    * [[vidGroupPixel]]'s closed form WITHOUT any codec and verifies the
    * pair set exactly.
    *
    * Scale shape: frames decode partition-local; only (fid, 8-byte fp)
    * leaves the scan, and the candidate join is chunk-keyed — the
    * q24/q25 banding story applied to video frames. */
  def videoFrameNearDup(s: SparkSession, dir: String): DataFrame =
    frameNearDupFrom(videoFrameHashes(s, dir))

  /** The q226 pair report over any (fid, fp) frame-hash relation — the
    * batch core [[graft.streaming.DocStreams.maintainFrameIndex]] serves
    * incrementally over its carried index. */
  private[graft] def frameNearDupFrom(hashes: DataFrame): DataFrame =
    Dedup.hammingPairs(hashes,
      chunks = 4, chunkBits = DHashBits / 4, maxDist = 3)
      .select(expr("a_id DIV 100").as("a_doc"),
        expr("a_id % 100").as("a_frame"),
        expr("b_id DIV 100").as("b_doc"),
        expr("b_id % 100").as("b_frame"),
        col("hamming"))
      .orderBy(col("a_doc"), col("a_frame"), col("b_doc"), col("b_frame"))

  /** DuckDB spelling: dHash bits from the same closed-form pixels via a
    * lead() comparison (no codec — that is the point), O(F²) verify join
    * over the sampled frames as in q135's oracle. */
  val videoFrameNearDupSql: String =
    s"""WITH v AS (
       |  SELECT doc_id, doc_id // 8 AS vid, (doc_id // 8) % 6 + 2 AS nf
       |  FROM documents WHERE doc_id % 8 = 0),
       |ab AS (
       |  SELECT doc_id, vid, nf, f.f AS f,
       |    ((vid // 4) * 37 + f.f * 29) % 256 AS a,
       |    ((vid // 4) * 53 + f.f * 71 + 11) % 256 AS b
       |  FROM v, unnest(range(0, nf)) AS f(f)),
       |px AS (
       |  SELECT doc_id, f, p.p AS p,
       |    CASE WHEN p.p < vid % 4
       |      THEN ((a * (p.p + 1) + b * (p.p + 1) * (p.p + 1)) % 256 + 128)
       |        % 256
       |      ELSE (a * (p.p + 1) + b * (p.p + 1) * (p.p + 1)) % 256
       |    END AS g
       |  FROM ab, range(${Avi.Side * Avi.Side}) p(p)),
       |fp AS (
       |  SELECT doc_id, f, doc_id * 100 + f AS fid,
       |    CAST(coalesce(sum(CASE WHEN p % ${Avi.Side} < ${Avi.Side - 1}
       |        AND g < next_g
       |      THEN 1::BIGINT
       |        << CAST((p // ${Avi.Side}) * ${Avi.Side - 1}
       |          + (p % ${Avi.Side}) AS INTEGER) END), 0) AS BIGINT) AS fp
       |  FROM (SELECT doc_id, f, p, g,
       |          lead(g) OVER (PARTITION BY doc_id, f ORDER BY p) AS next_g
       |        FROM px)
       |  GROUP BY doc_id, f)
       |SELECT a.doc_id AS a_doc, a.f AS a_frame,
       |  b.doc_id AS b_doc, b.f AS b_frame,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM fp a JOIN fp b ON a.fid < b.fid
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3
       |ORDER BY a_doc, a_frame, b_doc, b_frame""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_media_meta" -> (mediaMeta _),
    "q70_frame_sample" -> (frameSample _),
    "q135_image_neardup" -> (imageNearDup _),
    "q201_audio_features" -> (audioFeatures _),
    "q225_video_shots" -> (videoShotStats _),
    "q226_frame_neardup" -> (videoFrameNearDup _))

  val oracles: Map[String, String] = Map(
    "q26_media_meta" -> mediaMetaSql,
    "q70_frame_sample" -> frameSampleSql,
    "q135_image_neardup" -> imageNearDupSql,
    "q201_audio_features" -> audioFeaturesSql,
    "q225_video_shots" -> videoShotStatsSql,
    "q226_frame_neardup" -> videoFrameNearDupSql)
}
