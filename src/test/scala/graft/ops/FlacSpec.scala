package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM FLAC decoder (Flac.scala). No FLAC binding exists in this
  * environment, so parity is pinned two ways: round-trips through our
  * own verbatim encoder, and hand-built frames per the PUBLIC format
  * (RFC 9639) exercising the paths the encoder never emits — CONSTANT,
  * FIXED and LPC prediction, rice residuals (multi-partition + escape),
  * wasted bits, and all three stereo decorrelation modes.
  */
class FlacSpec extends AnyFunSuite {

  /** Test-local MSB-first bit writer (mirror of the encoder's). */
  private final class BW {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit = { var i = w - 1; while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 } }
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bit(0); i += 1 }; bit(1) }
    def rice(v: Int, p: Int): Unit = {
      val u = (v << 1) ^ (v >> 31) // zigzag
      unary(u >>> p)
      if (p > 0) bits(u & ((1 << p) - 1), p)
    }
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** STREAMINFO wrapper for one hand-built frame. */
  private def stream(frame: Array[Byte], nSamples: Int, channels: Int,
      rate: Int = 8000): Array[Byte] = {
    val si = new BW
    si.bits(nSamples, 16); si.bits(nSamples, 16)
    si.bits(0, 24); si.bits(0, 24)
    si.bits(rate, 20); si.bits(channels - 1, 3); si.bits(15, 5)
    si.bits(nSamples.toLong, 36)
    si.bits(0L, 64); si.bits(0L, 64)
    val siB = si.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length)
    out.write(siB)
    out.write(frame)
    out.toByteArray
  }

  /** Frame header for block size n (16-bit end-of-header form),
    * channel assignment `asgn`, rate-from-STREAMINFO, 16-bit samples.
    */
  private def frameHeader(n: Int, asgn: Int): BW = {
    val w = new BW
    w.bits(0x3ffe, 14); w.bit(0); w.bit(0)
    w.bits(7, 4) // block size: 16-bit field follows
    w.bits(0, 4) // rate from STREAMINFO
    w.bits(asgn, 4)
    w.bits(4, 3) // 16-bit
    w.bit(0)
    w.bits(0, 8) // frame 0
    w.bits(n - 1, 16)
    w
  }

  /** Close a frame: header CRC-8 after the header bytes, CRC-16 after
    * everything. `body` must start from the subframe bits.
    */
  private def closeFrame(header: BW, body: BW): Array[Byte] = {
    val h = header.bytes
    val withCrc8 = h :+ Flac.crc8(h, 0, h.length).toByte
    val frame = withCrc8 ++ body.bytes
    val crc = Flac.crc16(frame, 0, frame.length)
    frame ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  test("verbatim mono round-trip") {
    val r = new scala.util.Random(7)
    val samples = Array.fill[Short](256)((r.nextInt(65536) - 32768).toShort)
    val got = Flac.decodeFlac(Flac.encodeVerbatim(samples, 1, 22050))
    assert(got.sampleRate == 22050 && got.channels == 1)
    assert(got.samples.toSeq == samples.toSeq)
  }

  test("verbatim stereo round-trip keeps interleaving") {
    val r = new scala.util.Random(8)
    val samples = Array.fill[Short](2 * 64)((r.nextInt(65536) - 32768).toShort)
    val got = Flac.decodeFlac(Flac.encodeVerbatim(samples, 2, 44100))
    assert(got.channels == 2)
    assert(got.samples.toSeq == samples.toSeq)
  }

  test("CONSTANT subframe fills the block") {
    val n = 64
    val body = new BW
    body.bit(0); body.bits(0, 6); body.bit(0) // CONSTANT, no wasted bits
    body.bits((-1234).toLong & 0xffff, 16)
    val got = Flac.decodeFlac(stream(closeFrame(frameHeader(n, 0), body), n, 1))
    assert(got.samples.toSeq == Seq.fill(n)((-1234).toShort))
  }

  test("FIXED order 2 with two rice partitions reconstructs") {
    val n = 64
    // smooth quadratic-ish signal: fixed-2 residuals are small
    val samples = Array.tabulate(n)(i => 100 + 3 * i + (i * i) / 8)
    val resid = Array.tabulate(n)(i =>
      if (i < 2) 0 else samples(i) - 2 * samples(i - 1) + samples(i - 2))
    val body = new BW
    body.bit(0); body.bits(8 + 2, 6); body.bit(0) // FIXED order 2
    body.bits(samples(0).toLong & 0xffff, 16)
    body.bits(samples(1).toLong & 0xffff, 16)
    body.bits(0, 2) // rice method 0 (4-bit params)
    body.bits(1, 4) // partition order 1 → 2 partitions
    body.bits(2, 4) // partition 0 param
    (2 until n / 2).foreach(i => body.rice(resid(i), 2))
    body.bits(3, 4) // partition 1 param
    (n / 2 until n).foreach(i => body.rice(resid(i), 3))
    val got = Flac.decodeFlac(stream(closeFrame(frameHeader(n, 0), body), n, 1))
    assert(got.samples.map(_.toInt).toSeq == samples.toSeq)
  }

  test("LPC subframe with shift reconstructs") {
    val n = 32
    val samples = new Array[Int](n)
    samples(0) = 1000; samples(1) = 1010
    // choose prediction s[i] ≈ (3*s[i-1] - 1*s[i-2]) >> 1 and derive
    // residuals so ANY values reconstruct exactly
    val coefs = Array(3, -1)
    val shift = 1
    val r = new scala.util.Random(9)
    val resid = new Array[Int](n)
    for (i <- 2 until n) {
      val pred = ((coefs(0).toLong * samples(i - 1) + coefs(1).toLong * samples(i - 2)) >> shift).toInt
      val s = pred + (r.nextInt(9) - 4)
      resid(i) = s - pred
      samples(i) = s
    }
    val body = new BW
    body.bit(0); body.bits(32 + 1, 6); body.bit(0) // LPC order 2 (type 32 + order-1)
    body.bits(samples(0).toLong & 0xffff, 16)
    body.bits(samples(1).toLong & 0xffff, 16)
    body.bits(4, 4) // precision - 1 = 4 → 5-bit coefs
    body.bits(shift, 5)
    body.bits(coefs(0).toLong & 0x1f, 5)
    body.bits(coefs(1).toLong & 0x1f, 5)
    body.bits(1, 2) // rice2 (5-bit params)
    body.bits(0, 4) // one partition
    body.bits(3, 5)
    (2 until n).foreach(i => body.rice(resid(i), 3))
    val got = Flac.decodeFlac(stream(closeFrame(frameHeader(n, 0), body), n, 1))
    assert(got.samples.map(_.toInt).toSeq == samples.toSeq)
  }

  test("escape partition stores raw residuals") {
    val n = 32
    val samples = Array.tabulate(n)(i => i * 7 - 50)
    val body = new BW
    body.bit(0); body.bits(8, 6); body.bit(0) // FIXED order 0: residual = samples
    body.bits(0, 2); body.bits(0, 4) // rice, one partition
    body.bits(15, 4) // 4-bit escape
    body.bits(10, 5) // raw width 10 bits
    samples.foreach(s => body.bits(s.toLong & 0x3ff, 10))
    val got = Flac.decodeFlac(stream(closeFrame(frameHeader(n, 0), body), n, 1))
    assert(got.samples.map(_.toInt).toSeq == samples.toSeq)
  }

  test("wasted bits shift back") {
    val n = 16
    val samples = Array.tabulate(n)(i => (i - 8) * 2) // all even
    val body = new BW
    body.bit(0); body.bits(1, 6) // VERBATIM
    body.bit(1); body.bit(1) // wasted-bits flag, unary 0 → wasted = 1
    samples.foreach(s => body.bits((s >> 1).toLong & 0x7fff, 15))
    val got = Flac.decodeFlac(stream(closeFrame(frameHeader(n, 0), body), n, 1))
    assert(got.samples.map(_.toInt).toSeq == samples.toSeq)
  }

  private def stereoFrame(asgn: Int, ch0: Array[Int], ch0Bits: Int,
      ch1: Array[Int], ch1Bits: Int): Array[Byte] = {
    val n = ch0.length
    val body = new BW
    body.bit(0); body.bits(1, 6); body.bit(0)
    ch0.foreach(s => body.bits(s.toLong & ((1L << ch0Bits) - 1), ch0Bits))
    body.bit(0); body.bits(1, 6); body.bit(0)
    ch1.foreach(s => body.bits(s.toLong & ((1L << ch1Bits) - 1), ch1Bits))
    closeFrame(frameHeader(n, asgn), body)
  }

  test("left/side, right/side and mid/side stereo decorrelate correctly") {
    val n = 16
    val r = new scala.util.Random(11)
    val left = Array.fill(n)(r.nextInt(2000) - 1000)
    val right = Array.fill(n)(r.nextInt(2000) - 1000)
    val inter = (0 until n).flatMap(i => Seq(left(i), right(i)))
    // left/side (8): ch0 = left @16, ch1 = left - right @17
    val ls = stream(stereoFrame(8, left, 16,
      Array.tabulate(n)(i => left(i) - right(i)), 17), n, 2)
    assert(Flac.decodeFlac(ls).samples.map(_.toInt).toSeq == inter)
    // right/side (9): ch0 = left - right @17, ch1 = right @16
    val rs = stream(stereoFrame(9,
      Array.tabulate(n)(i => left(i) - right(i)), 17, right, 16), n, 2)
    assert(Flac.decodeFlac(rs).samples.map(_.toInt).toSeq == inter)
    // mid/side (10): ch0 = (l+r)>>1 @16, ch1 = l-r @17
    val ms = stream(stereoFrame(10,
      Array.tabulate(n)(i => (left(i) + right(i)) >> 1), 16,
      Array.tabulate(n)(i => left(i) - right(i)), 17), n, 2)
    assert(Flac.decodeFlac(ms).samples.map(_.toInt).toSeq == inter)
  }

  test("reserved channel assignment codes 11-15 refuse") {
    // RFC 9639 §9.1.3 reserves 1011-1111; decoding them as two
    // independent channels would silently mangle crafted input
    val n = 8
    val ch = Array.tabulate(n)(i => i * 13 - 40)
    for (asgn <- Seq(11, 15)) {
      val payload = stream(stereoFrame(asgn, ch, 16, ch, 16), n, 2)
      val e = intercept[IllegalArgumentException](Flac.decodeFlac(payload))
      assert(e.getMessage.contains("reserved channel assignment"))
    }
  }

  test("corrupt frame CRC refuses") {
    val samples = Array.tabulate[Short](64)(i => (i * 31).toShort)
    val enc = Flac.encodeVerbatim(samples, 1, 8000)
    val bad = enc.clone()
    bad(bad.length - 10) = (bad(bad.length - 10) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](Flac.decodeFlac(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("non-16-bit streams and non-FLAC payloads refuse precisely") {
    assertThrows[IllegalArgumentException](Flac.decodeFlac("RIFFxxxxWAVE".getBytes))
    // 8-bit STREAMINFO
    val si = new BW
    si.bits(16, 16); si.bits(16, 16); si.bits(0, 24); si.bits(0, 24)
    si.bits(8000, 20); si.bits(0, 3); si.bits(7, 5); si.bits(16L, 36)
    si.bits(0L, 64); si.bits(0L, 64)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(si.bytes.length)
    out.write(si.bytes)
    val e = intercept[IllegalArgumentException](Flac.decodeFlac(out.toByteArray))
    assert(e.getMessage.contains("8-bit"))
  }

  test("skips non-STREAMINFO metadata blocks (padding, vorbis comment)") {
    val samples = Array.tabulate[Short](64)(i => (i * 13 - 400).toShort)
    val enc = Flac.encodeVerbatim(samples, 1, 8000)
    // splice a PADDING block (type 1) between STREAMINFO and the frame:
    // flip STREAMINFO's last-block flag, insert the padding block with
    // its own last-block flag
    val siLen = 34
    val frameStart = 4 + 4 + siLen
    val out = new java.io.ByteArrayOutputStream()
    out.write(enc, 0, 4)
    out.write(enc(4) & 0x7f) // STREAMINFO no longer last
    out.write(enc, 5, 3 + siLen)
    out.write(0x81); out.write(0); out.write(0); out.write(4) // last PADDING, 4 bytes
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(enc, frameStart, enc.length - frameStart)
    val got = Flac.decodeFlac(out.toByteArray)
    assert(got.samples.toSeq == samples.toSeq)
  }
}
