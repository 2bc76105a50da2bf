package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/AVI container codec for the video arm of the multimodal
  * pipeline (q225/q226) — the video analogue of q201's RIFF/WAVE round
  * trip. The JDK ships a RIFF/WAVE parser (`javax.sound.sampled`) but no
  * AVI one, so this implements the container directly: a standard
  * single-stream AVI ('RIFF…AVI ' → 'LIST hdrl' {avih, 'LIST strl'
  * {strh, strf}} → 'LIST movi' {'00db'…} → 'idx1'), carrying
  * UNCOMPRESSED 24-bit BI_RGB DIB frames. Uncompressed frames are the
  * point: JPEG/MPEG payloads are lossy, which would make the decoded
  * pixels codec-version-dependent — BI_RGB keeps every pixel bit-exact,
  * so the DuckDB oracle can recompute features from the pixel closed
  * form with no codec at all (the q135 discipline applied to video).
  *
  * Reference behavior target: the reference repo has no media handling
  * at all (/root/reference/build.sbt:1-9); this extends the engine the
  * way its course queries extend to a corpus pipeline.
  *
  * The decoder is STRICT: every fourcc, chunk size, header field, frame
  * geometry, gray-channel invariant, and idx1 entry is validated, and a
  * malformed container is a hard [[IllegalArgumentException]] — corrupt
  * payloads must never decode as black frames. Scale shape: encode and
  * decode are partition-local byte work; only fixed-width feature rows
  * (or 8-byte frame hashes) ever leave the scan.
  */
object Avi {
  /** Frame geometry: [[Side]]×[[Side]] pixels, 24-bit BGR. A row is
    * Side·3 = 24 bytes — already dword-aligned, so no row padding. */
  final val Side = 8
  final val FrameBytes: Int = Side * Side * 3

  private final val Fps = 10
  private def fcc(s: String): Int = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) |
      ((s(3) & 0xff) << 24)
  }
  private val RIFF = fcc("RIFF"); private val LIST = fcc("LIST")
  private val AVIS = fcc("AVI "); private val HDRL = fcc("hdrl")
  private val AVIH = fcc("avih"); private val STRL = fcc("strl")
  private val STRH = fcc("strh"); private val STRF = fcc("strf")
  private val VIDS = fcc("vids"); private val DIB = fcc("DIB ")
  private val MOVI = fcc("movi"); private val DB00 = fcc("00db")
  private val IDX1 = fcc("idx1")
  private val AVIF_HASINDEX = 0x10
  private val AVIIF_KEYFRAME = 0x10

  /** Encode top-down grayscale rasters (each `Side²` values in 0..255)
    * as a single-stream uncompressed AVI. Gray is stored as B=G=R, rows
    * bottom-up per the DIB convention — exactly the layout the decoder
    * re-validates. */
  def encode(frames: Array[Array[Int]]): Array[Byte] = {
    val n = frames.length
    require(n > 0, "an AVI needs at least one frame")
    frames.foreach(f => require(f.length == Side * Side,
      s"frame raster must be ${Side * Side} pixels, got ${f.length}"))
    val bb = ByteBuffer.allocate(232 + 216 * n)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(RIFF).putInt(224 + 216 * n).putInt(AVIS)
    // LIST hdrl
    bb.putInt(LIST).putInt(192).putInt(HDRL)
    bb.putInt(AVIH).putInt(56)
    bb.putInt(1000000 / Fps)            // dwMicroSecPerFrame
      .putInt(FrameBytes * Fps)         // dwMaxBytesPerSec
      .putInt(0)                        // dwPaddingGranularity
      .putInt(AVIF_HASINDEX)            // dwFlags
      .putInt(n)                        // dwTotalFrames
      .putInt(0)                        // dwInitialFrames
      .putInt(1)                        // dwStreams
      .putInt(FrameBytes)               // dwSuggestedBufferSize
      .putInt(Side).putInt(Side)        // dwWidth, dwHeight
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved
    // LIST strl
    bb.putInt(LIST).putInt(116).putInt(STRL)
    bb.putInt(STRH).putInt(56)
    bb.putInt(VIDS).putInt(DIB)         // fccType, fccHandler
      .putInt(0)                        // dwFlags
      .putShort(0).putShort(0)          // wPriority, wLanguage
      .putInt(0)                        // dwInitialFrames
      .putInt(1).putInt(Fps)            // dwScale, dwRate
      .putInt(0)                        // dwStart
      .putInt(n)                        // dwLength (frames)
      .putInt(FrameBytes)               // dwSuggestedBufferSize
      .putInt(-1)                       // dwQuality (default)
      .putInt(0)                        // dwSampleSize
      .putShort(0).putShort(0)          // rcFrame
      .putShort(Side.toShort).putShort(Side.toShort)
    bb.putInt(STRF).putInt(40)          // BITMAPINFOHEADER
    bb.putInt(40).putInt(Side).putInt(Side)
      .putShort(1).putShort(24)         // biPlanes, biBitCount
      .putInt(0)                        // biCompression = BI_RGB
      .putInt(FrameBytes)               // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST movi
    bb.putInt(LIST).putInt(4 + 200 * n).putInt(MOVI)
    frames.foreach { f =>
      bb.putInt(DB00).putInt(FrameBytes)
      var r = 0
      while (r < Side) {
        val y = Side - 1 - r            // DIB rows are bottom-up
        var x = 0
        while (x < Side) {
          val g = f(y * Side + x)
          require(g >= 0 && g <= 255, s"gray out of range: $g")
          val b = g.toByte
          bb.put(b).put(b).put(b)       // B = G = R
          x += 1
        }
        r += 1
      }
    }
    // idx1: offsets are relative to the 'movi' fourcc
    bb.putInt(IDX1).putInt(16 * n)
    var i = 0
    while (i < n) {
      bb.putInt(DB00).putInt(AVIIF_KEYFRAME)
        .putInt(4 + 200 * i).putInt(FrameBytes)
      i += 1
    }
    require(!bb.hasRemaining, "AVI size arithmetic out of sync")
    bb.array()
  }

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed AVI: $msg")
  private def expect(cond: Boolean, msg: => String): Unit =
    if (!cond) bad(msg)

  /** Decode a single-stream uncompressed AVI back to top-down grayscale
    * rasters. Validates the full container: RIFF envelope, hdrl/strl
    * headers (geometry, BI_RGB, stream/frame counts), every movi chunk,
    * the gray-channel invariant, and each idx1 entry's offset/length.
    * Throws [[IllegalArgumentException]] on any deviation. */
  def decode(bytes: Array[Byte]): Array[Array[Int]] = {
    expect(bytes.length >= 232, s"truncated container: ${bytes.length} B")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    expect(bb.getInt() == RIFF, "missing RIFF magic")
    expect(bb.getInt() == bytes.length - 8, "RIFF size != file size")
    expect(bb.getInt() == AVIS, "RIFF form is not 'AVI '")
    // LIST hdrl { avih, LIST strl { strh, strf } }
    expect(bb.getInt() == LIST && bb.getInt() == 192 &&
      bb.getInt() == HDRL, "missing 'LIST hdrl'")
    expect(bb.getInt() == AVIH && bb.getInt() == 56, "missing avih")
    bb.getInt(); bb.getInt(); bb.getInt()   // usec/frame, bytes/sec, pad
    val flags = bb.getInt()
    val totalFrames = bb.getInt()
    bb.getInt()                             // dwInitialFrames
    expect(bb.getInt() == 1, "dwStreams != 1")
    bb.getInt()                             // dwSuggestedBufferSize
    expect(bb.getInt() == Side && bb.getInt() == Side,
      s"frame geometry is not ${Side}x$Side")
    bb.position(bb.position() + 16)         // dwReserved
    expect((flags & AVIF_HASINDEX) != 0, "AVIF_HASINDEX not set")
    expect(totalFrames > 0, "dwTotalFrames == 0")
    // pin the frame count to the file size in LONG arithmetic BEFORE any
    // use: a hostile dwTotalFrames (~2^31/200) would otherwise wrap the
    // `4 + 200 * totalFrames` movi-size check into agreement with a
    // crafted size field and reach the frames allocation — turning the
    // documented IllegalArgumentException into an OOM/BufferUnderflow.
    // The container layout is exactly 232 + 216 bytes/frame, so this one
    // equality also rejects every truncated or padded body up front.
    expect(232L + 216L * totalFrames == bytes.length.toLong,
      s"dwTotalFrames $totalFrames inconsistent with ${bytes.length} B file")
    expect(bb.getInt() == LIST && bb.getInt() == 116 &&
      bb.getInt() == STRL, "missing 'LIST strl'")
    expect(bb.getInt() == STRH && bb.getInt() == 56, "missing strh")
    expect(bb.getInt() == VIDS, "stream is not 'vids'")
    expect(bb.getInt() == DIB, "handler is not 'DIB ' (uncompressed)")
    bb.position(bb.position() + 24)         // flags..dwStart inclusive
    expect(bb.getInt() == totalFrames, "strh.dwLength != avih frames")
    bb.position(bb.position() + 20)         // bufSize..rcFrame
    expect(bb.getInt() == STRF && bb.getInt() == 40, "missing strf")
    expect(bb.getInt() == 40, "biSize != 40")
    expect(bb.getInt() == Side && bb.getInt() == Side,
      "strf geometry mismatch")
    expect(bb.getShort() == 1, "biPlanes != 1")
    expect(bb.getShort() == 24, "biBitCount != 24")
    expect(bb.getInt() == 0, "biCompression is not BI_RGB")
    expect(bb.getInt() == FrameBytes, "biSizeImage mismatch")
    bb.position(bb.position() + 16)         // pels/meter, clr
    // LIST movi
    expect(bb.getInt() == LIST, "missing 'LIST movi'")
    expect(bb.getInt() == 4 + 200 * totalFrames, "movi size mismatch")
    expect(bb.getInt() == MOVI, "LIST form is not 'movi'")
    val frames = new Array[Array[Int]](totalFrames)
    var i = 0
    while (i < totalFrames) {
      expect(bb.getInt() == DB00, s"frame $i: chunk is not '00db'")
      expect(bb.getInt() == FrameBytes, s"frame $i: bad chunk size")
      val f = new Array[Int](Side * Side)
      var r = 0
      while (r < Side) {
        val y = Side - 1 - r
        var x = 0
        while (x < Side) {
          val b = bb.get() & 0xff
          val g = bb.get() & 0xff
          val rr = bb.get() & 0xff
          expect(g == b && rr == b, s"frame $i: non-gray pixel")
          f(y * Side + x) = b
          x += 1
        }
        r += 1
      }
      frames(i) = f
      i += 1
    }
    // idx1
    expect(bb.getInt() == IDX1, "missing idx1")
    expect(bb.getInt() == 16 * totalFrames, "idx1 size mismatch")
    i = 0
    while (i < totalFrames) {
      expect(bb.getInt() == DB00, s"idx1[$i]: bad ckid")
      expect((bb.getInt() & AVIIF_KEYFRAME) != 0, s"idx1[$i]: not keyframe")
      expect(bb.getInt() == 4 + 200 * i, s"idx1[$i]: bad offset")
      expect(bb.getInt() == FrameBytes, s"idx1[$i]: bad length")
      i += 1
    }
    expect(!bb.hasRemaining, "trailing bytes after idx1")
    frames
  }
}
