package graft.ops

/** Pure-JVM FLAC decoder (audio-corpus ingestion — the reference
  * ingests audio through imageio/ffmpeg plugins,
  * `py/ngff_zarr/detect_cli_io_backend.py:21-128`; FLAC is the one
  * codec-bound audio container tractable without native bindings, and
  * the dominant lossless one in speech/music corpora).
  *
  * Implements the public format (RFC 9639): STREAMINFO, frame headers
  * with UTF-8-coded ordinals and CRC-8, subframe types CONSTANT /
  * VERBATIM / FIXED(0-4) / LPC(1-32), rice-coded residuals (4- and
  * 5-bit parameters, escape partitions, multi-partition), wasted
  * bits, stereo decorrelation (left/side, right/side, mid/side), and
  * the trailing frame CRC-16. Corrupt CRCs refuse loudly — never
  * silent garbage. 16-bit output (the engine's PCM-16 posture;
  * other depths refuse with a precise error).
  *
  * Used from [[Multimodal.decodeAudio]]-style kernels: decode is
  * partition-local over binary payload columns, no shuffle.
  */
object Flac {

  import Multimodal.DecodedAudio

  /** MSB-first bit reader over the frame bytes. */
  private final class BitReader(val buf: Array[Byte], var bytePos: Int) {
    var bitPos: Int = 0 // 0..7, MSB first

    def readBit(): Int = {
      val b = (buf(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }

    /** n ≤ 32 unsigned bits. */
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** n ≤ 64 unsigned bits. */
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** n-bit two's-complement signed. */
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n > 0 && (v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }

    /** Unary: count of 0 bits before the terminating 1. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }

    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** CRC-8, polynomial 0x07 (the frame-header checksum). */
  private[graft] def crc8(buf: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= buf(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005 (the whole-frame checksum). */
  private[graft] def crc16(buf: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (buf(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  /** Decode a whole FLAC stream to interleaved 16-bit samples. */
  def decodeFlac(payload: Array[Byte]): DecodedAudio = {
    require(payload.length >= 42 &&
      new String(payload, 0, 4, "US-ASCII") == "fLaC", "not a FLAC stream")
    // metadata blocks: STREAMINFO is mandatory and first
    var pos = 4
    var last = false
    var rate = 0; var channels = 0; var bps = 0; var totalSamples = 0L
    var sawStreamInfo = false
    while (!last) {
      val h = payload(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((payload(pos + 1) & 0xff) << 16) | ((payload(pos + 2) & 0xff) << 8) |
        (payload(pos + 3) & 0xff)
      if (btype == 0) {
        sawStreamInfo = true
        val br = new BitReader(payload, pos + 4)
        br.readBits(16); br.readBits(16) // min/max block size
        br.readBits(24); br.readBits(24) // min/max frame size
        rate = br.readBits(20)
        channels = br.readBits(3) + 1
        bps = br.readBits(5) + 1
        totalSamples = br.readBitsLong(36)
      }
      pos += 4 + len
    }
    require(sawStreamInfo, "FLAC stream without STREAMINFO")
    require(bps == 16, s"FLAC $bps-bit unsupported (16-bit only, the PCM-16 posture)")
    require(rate > 0, "FLAC sample rate 0")

    val out = new java.io.ByteArrayOutputStream()
    val sink = new java.io.DataOutputStream(out)
    var decoded = 0L
    while (pos < payload.length && (totalSamples == 0 || decoded < totalSamples)) {
      val (samples, next) = decodeFrame(payload, pos, rate, channels, bps)
      var i = 0
      while (i < samples(0).length) {
        var c = 0
        while (c < channels) {
          val s = samples(c)(i)
          require(s >= Short.MinValue && s <= Short.MaxValue,
            s"decoded sample $s overflows 16 bits (corrupt stream)")
          sink.writeShort(s)
          c += 1
        }
        i += 1
      }
      decoded += samples(0).length
      pos = next
    }
    require(totalSamples == 0 || decoded == totalSamples,
      s"FLAC stream truncated: $decoded of $totalSamples samples")
    val bytes = out.toByteArray
    val shorts = new Array[Short](bytes.length / 2)
    var i = 0
    while (i < shorts.length) {
      shorts(i) = (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
      i += 1
    }
    DecodedAudio(rate, channels, shorts)
  }

  /** One frame: returns per-channel sample arrays + next byte offset. */
  private def decodeFrame(buf: Array[Byte], start: Int, siRate: Int,
      siChannels: Int, siBps: Int): (Array[Array[Int]], Int) = {
    val br = new BitReader(buf, start)
    require(br.readBits(14) == 0x3ffe, "bad frame sync")
    br.readBit() // reserved
    br.readBit() // blocking strategy (ordinal semantics don't affect decode)
    val bsCode = br.readBits(4)
    val srCode = br.readBits(4)
    val chAsgn = br.readBits(4)
    val ssCode = br.readBits(3)
    br.readBit() // reserved
    // UTF-8-style coded frame/sample ordinal: skip per its length
    val first = br.readBits(8)
    var follow = 0
    var m = 0x80
    while ((first & m) != 0) { follow += 1; m >>= 1 }
    if (follow > 0) follow -= 1
    var k = 0
    while (k < follow) { require((br.readBits(8) & 0xc0) == 0x80, "bad ordinal"); k += 1 }

    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("reserved block size code 0")
      case 6 => br.readBits(8) + 1
      case 7 => br.readBits(16) + 1
      case c => BlockSizes(c)
    }
    srCode match {
      case 12 => br.readBits(8)
      case 13 | 14 => br.readBits(16)
      case 15 => throw new IllegalArgumentException("invalid sample rate code 15")
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case c => throw new IllegalArgumentException(s"reserved sample size code $c")
    }
    // CRC-8 covers the header bytes up to (not including) the crc byte
    require(br.bitPos == 0, "frame header not byte-aligned before CRC")
    val crcByte = br.readBits(8)
    require(crc8(buf, start, br.bytePos - 1) == crcByte, "frame header CRC-8 mismatch")

    val channels = chAsgn match {
      case a if a <= 7 => a + 1
      case 8 | 9 | 10 => 2
      case c => throw new IllegalArgumentException(
        s"reserved channel assignment code $c") // RFC 9639 §9.1.3: 11-15 reserved
    }
    require(channels == siChannels, "frame channel count != STREAMINFO")
    val chans = Array.ofDim[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val extra = chAsgn match {
        case 8 => if (c == 1) 1 else 0 // left/side
        case 9 => if (c == 0) 1 else 0 // right(side)/right: side is ch0
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(br, blockSize, bps + extra)
      c += 1
    }
    br.alignToByte()
    val crc = br.readBits(16)
    require(crc16(buf, start, br.bytePos - 2) == crc, "frame CRC-16 mismatch")

    // undo stereo decorrelation
    chAsgn match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // side/right: left = side + right
        var i = 0
        while (i < blockSize) { chans(0)(i) = chans(0)(i) + chans(1)(i); i += 1 }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val mid2 = (chans(0)(i) << 1) | (side & 1)
          chans(0)(i) = (mid2 + side) >> 1
          chans(1)(i) = (mid2 - side) >> 1
          i += 1
        }
      case _ => ()
    }
    (chans, br.bytePos)
  }

  private def decodeSubframe(br: BitReader, n: Int, bps: Int): Array[Int] = {
    require(br.readBit() == 0, "subframe header padding bit set")
    val tpe = br.readBits(6)
    val wasted =
      if (br.readBit() == 1) br.readUnary() + 1
      else 0
    val eb = bps - wasted
    val out = new Array[Int](n)
    tpe match {
      case 0 => // CONSTANT
        val v = br.readSigned(eb)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { out(i) = br.readSigned(eb); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        var i = 0
        while (i < order) { out(i) = br.readSigned(eb); i += 1 }
        decodeResidual(br, n, order, out)
        restoreFixed(out, order, n)
      case t if t >= 32 => // LPC order 1-32
        val order = (t & 31) + 1
        var i = 0
        while (i < order) { out(i) = br.readSigned(eb); i += 1 }
        val precision = br.readBits(4) + 1
        require(precision <= 15, "invalid LPC precision escape")
        val shift = br.readSigned(5)
        require(shift >= 0, "negative LPC shift")
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
        decodeResidual(br, n, order, out)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) += (acc >> shift).toInt
          i += 1
        }
      case t => throw new IllegalArgumentException(s"reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual into out(order until n). */
  private def decodeResidual(br: BitReader, n: Int, order: Int,
      out: Array[Int]): Unit = {
    val method = br.readBits(2)
    require(method <= 1, s"reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val pOrder = br.readBits(4)
    val partitions = 1 << pOrder
    require(n % partitions == 0, "block size not divisible by partition count")
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = (n >> pOrder) - (if (p == 0) order else 0)
      val param = br.readBits(paramBits)
      if (param == escape) {
        val raw = br.readBits(5)
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0 else br.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.readUnary()
          val r = if (param == 0) 0 else br.readBits(param)
          val u = (q << param) | r
          out(idx) = (u >>> 1) ^ -(u & 1) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** In-place fixed-order prediction reconstruction. */
  private def restoreFixed(s: Array[Int], order: Int, n: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 => while (i < n) { s(i) += s(i - 1); i += 1 }
      case 2 => while (i < n) { s(i) += 2 * s(i - 1) - s(i - 2); i += 1 }
      case 3 => while (i < n) { s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3); i += 1 }
      case 4 => while (i < n) { s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4); i += 1 }
    }
  }

  // ---- minimal encoder (fixtures + synthetic gate payloads) ----

  /** MSB-first bit writer. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0

    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }

    def alignToByte(): Unit = while (nBits != 0) writeBit(0)

    def toBytes: Array[Byte] = { alignToByte(); out.toByteArray }
  }

  /** Encode interleaved 16-bit samples as a single-frame FLAC stream
    * with independent VERBATIM subframes — the layout every decoder
    * must accept; used for synthetic gate payloads and as the encode
    * half of round-trip specs. (Compression is not the point here;
    * fidelity and header/CRC correctness are.)
    */
  def encodeVerbatim(samples: Array[Short], channels: Int, rate: Int): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0, "ragged channels")
    val n = samples.length / channels
    require(n >= 16 && n <= 65536, s"block size $n out of range (16..65536)")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, last metadata block
    val si = new BitWriter
    si.writeBits(n, 16); si.writeBits(n, 16) // min/max block size
    si.writeBits(0, 24); si.writeBits(0, 24) // min/max frame size unknown
    si.writeBits(rate, 20)
    si.writeBits(channels - 1, 3)
    si.writeBits(15, 5) // bps - 1
    si.writeBits(n, 36)
    si.writeBits(0L, 64); si.writeBits(0L, 64) // md5 unset
    val siBytes = si.toBytes
    out.write(0x80) // last-block flag + type 0
    out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes)

    // one frame, fixed blocking, block size via 16-bit end-of-header
    val fw = new BitWriter
    fw.writeBits(0x3ffe, 14)
    fw.writeBit(0) // reserved
    fw.writeBit(0) // fixed blocking
    fw.writeBits(7, 4) // block size follows as 16 bits - 1
    fw.writeBits(0, 4) // sample rate from STREAMINFO
    fw.writeBits(channels - 1, 4) // independent channels
    fw.writeBits(4, 3) // 16-bit samples
    fw.writeBit(0) // reserved
    fw.writeBits(0, 8) // frame number 0 (1-byte UTF-8)
    fw.writeBits(n - 1, 16)
    val headBytes = fw.toBytes
    val withCrc8 = headBytes :+ crc8(headBytes, 0, headBytes.length).toByte

    val body = new BitWriter
    var c = 0
    while (c < channels) {
      body.writeBit(0)
      body.writeBits(1, 6) // VERBATIM
      body.writeBit(0) // no wasted bits
      var i = 0
      while (i < n) { body.writeBits(samples(i * channels + c).toLong & 0xffff, 16); i += 1 }
      c += 1
    }
    val frame = withCrc8 ++ body.toBytes
    val full = frame ++ {
      val crc = crc16(frame, 0, frame.length)
      Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
    }
    out.write(full)
    out.toByteArray
  }
}
