package graft.ops

/** Pure-JVM MJPEG-in-AVI video decode — the one video container that
  * needs no native codec stack: AVI is plain RIFF (the public
  * Microsoft container spec), and Motion-JPEG frames are ordinary
  * JPEG streams `javax.imageio` decodes. This upgrades the engine's
  * video posture from "byte-statistics fallback" to real
  * frame-sampling for MJPEG corpora (screen captures, scientific
  * cameras, legacy datasets); codec-bound formats (H.264 …) remain
  * documented out of scope (COVERAGE.md).
  *
  * Decode walks the RIFF tree: `avih` provides frame timing and
  * dimensions, the `movi` LIST holds `##dc`/`##db` chunks — each an
  * encoded frame, decoded lazily by the caller so a frame-SAMPLING
  * kernel touches only the frames it keeps (the 100 TB shape: stride
  * over frame bytes without decoding the rest).
  */
object Avi {

  import Multimodal.DecodedImage

  /** A frame's position inside the container — parse records slices,
    * never copies: a 1-in-N sampling kernel over an M-frame payload
    * allocates M/N frame buffers, not M.
    */
  final case class FrameSlice(offset: Int, length: Int)

  /** Container-level view: frame payloads still encoded, referenced
    * as (offset, length) slices of the original payload. Call
    * [[AviStream.frameBytes]] to materialize one frame's bytes.
    */
  final case class AviStream(width: Int, height: Int,
      microSecPerFrame: Long, payload: Array[Byte], frames: Seq[FrameSlice]) {
    def frameBytes(i: Int): Array[Byte] = {
      val s = frames(i)
      java.util.Arrays.copyOfRange(payload, s.offset, s.offset + s.length)
    }
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parse the RIFF container; frames stay encoded. */
  def parseAvi(payload: Array[Byte]): AviStream = {
    require(payload.length >= 12 && fourcc(payload, 0) == "RIFF" &&
      fourcc(payload, 8) == "AVI ", "not a RIFF/AVI file")
    var width = 0; var height = 0; var uspf = 0L
    val frames = Seq.newBuilder[FrameSlice]
    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = fourcc(payload, pos)
        val size = le32(payload, pos + 4)
        require(size >= 0 && pos + 8 + size <= until,
          s"corrupt AVI chunk '$id' size $size at $pos")
        if (id == "LIST") {
          walk(pos + 12, pos + 8 + size) // skip the 4-byte list type
        } else if (id == "avih") {
          uspf = le32(payload, pos + 8).toLong & 0xffffffffL
          width = le32(payload, pos + 8 + 32)
          height = le32(payload, pos + 8 + 36)
        } else if (id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          frames += FrameSlice(pos + 8, size)
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, payload.length)
    AviStream(width, height, uspf, payload, frames.result())
  }

  /** Decode every `stride`-th frame (JPEG via imageio) — the sampling
    * kernel copies and decodes ONLY the frames it keeps; skipped
    * frames stay as untouched slices of the container buffer.
    */
  def sampleFrames(payload: Array[Byte], stride: Int): (AviStream, Seq[DecodedImage]) = {
    require(stride >= 1, s"stride $stride must be >= 1")
    val avi = parseAvi(payload)
    val decoded = avi.frames.indices.collect {
      case i if i % stride == 0 => Multimodal.decodeJavax(avi.frameBytes(i))
    }
    (avi, decoded)
  }

  /** Deterministic synthetic MJPEG AVI: `nFrames` 16×16 gray frames,
    * quadrant b of frame f holds (id·37 + f·11 + b·29) mod 256 — the
    * closed form the m58 oracle replays (means bounded-error, JPEG is
    * lossy). The writer emits a spec-shaped container (hdrl with
    * avih + vids/MJPG strl, then movi) so foreign AVI parsers accept
    * it too.
    */
  /** [[encodeSyntheticMjpeg]] variant with a PLANTED scene cut for
    * the m64 gate: quadrant b of frame f holds
    * (id·37 + b·29) mod 64 + f·11 + (100 if f ≥ cut else 0),
    * cut = id mod (nFrames−2) + 1. The base stays under 64 and the
    * ramp is +11/frame, so values never wrap mod 256 (max 63 + 11·(n−1)
    * + 100 = 207 at n=5): consecutive smooth frames differ by exactly
    * 11 mean-luma levels and the cut by 111 — a detector threshold of
    * 50 sits 4.9× the JPEG decode noise (±4/mean, ±8/diff) away from
    * both sides, so the closed-form oracle verdict can't flip.
    */
  def encodeSyntheticMjpegCut(id: Long, nFrames: Int): Array[Byte] = {
    require(nFrames >= 3, s"need >= 3 frames to plant an interior cut, got $nFrames")
    // the no-wrap invariant above (63 + 11·(n−1) + 100 ≤ 255) caps n
    require(nFrames <= 9, s"luma ramp wraps past 9 frames, got $nFrames")
    val cut = (id % (nFrames - 2)).toInt + 1
    encodeFrames(nFrames, (f, b) =>
      ((id * 37 + b * 29) % 64 + f * 11 + (if (f >= cut) 100 else 0)).toInt)
  }

  def encodeSyntheticMjpeg(id: Long, nFrames: Int): Array[Byte] =
    encodeFrames(nFrames, (f, b) => ((id * 37 + f * 11 + b * 29) % 256).toInt)

  /** Shared MJPEG-AVI writer: 16×16 gray frames, quadrant b of frame
    * f filled with `level(f, b)`.
    */
  private def encodeFrames(nFrames: Int, level: (Int, Int) => Int): Array[Byte] = {
    def jpegFrame(f: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val b = (y / 8) * 2 + (x / 8)
          raster.setSample(x, y, 0, level(f, b))
          x += 1
        }
        y += 1
      }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.95f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      ios.close()
      writer.dispose()
      bos.toByteArray
    }

    // build inner pieces as byte arrays first (sizes must be known)
    def mkChunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII"))
      val n = body.length
      b.write(n & 0xff); b.write((n >> 8) & 0xff)
      b.write((n >> 16) & 0xff); b.write((n >> 24) & 0xff)
      b.write(body)
      if ((n & 1) == 1) b.write(0)
      b.toByteArray
    }
    def mkList(tpe: String, children: Array[Byte]): Array[Byte] =
      mkChunk("LIST", tpe.getBytes("US-ASCII") ++ children)
    def i32(vs: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(vs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putInt)
      b.array()
    }

    // avih: usPerFrame, maxBytesPerSec, pad, flags, totalFrames,
    // initial, streams, bufSize, width, height, reserved[4]
    val avih = mkChunk("avih", i32(40000, 0, 0, 0, nFrames, 0, 1, 0, 16, 16, 0, 0, 0, 0))
    // strh: fccType 'vids', handler 'MJPG', then the rate fields
    val strh = mkChunk("strh", "vids".getBytes("US-ASCII") ++
      "MJPG".getBytes("US-ASCII") ++ i32(0, 0, 0, 1, 25, 0, nFrames, 0, -1, 0, 0, 0))
    // strf: BITMAPINFOHEADER (biSize..biClrImportant), biCompression 'MJPG'
    val strf = mkChunk("strf", i32(40, 16, 16) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes("US-ASCII") ++ i32(16 * 16 * 3, 0, 0, 0, 0))
    val hdrl = mkList("hdrl", avih ++ mkList("strl", strh ++ strf))
    val movi = mkList("movi",
      (0 until nFrames).map(f => mkChunk("00dc", jpegFrame(f))).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val riff = mkChunk("RIFF", body)
    riff
  }
}
