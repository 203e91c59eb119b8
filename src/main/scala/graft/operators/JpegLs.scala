package graft.operators

/** Pure-JVM JPEG-LS (ITU-T T.87 / ISO 14495-1) codec — the LOCO-I
  * predictive coder behind the DICOM JPEG-LS transfer syntaxes
  * (1.2.840.10008.1.2.4.80 lossless, .81 near-lossless), which the
  * reference delegates to ITK/GDCM native codecs
  * (`py/ngff_zarr/detect_cli_io_backend.py:21`). Written from the
  * published T.87 spec: MED prediction, 365 gradient contexts +
  * 2 run-interruption contexts, limited-length Golomb coding with
  * FF bit-stuffing, run mode with the J[] geometric ramp.
  *
  * Scope: single-component scans (ILV=0), 2–16 bit precision,
  * NEAR ≥ 0, default or LSE preset coding parameters. Multi-component
  * interleaved scans and mapping tables refuse loudly — DICOM
  * grayscale frames are single-component by construction here
  * (`DicomIO` enforces SamplesPerPixel=1).
  *
  * Independent ground truth: `tools/make_jpegls_fixture.py` encodes
  * the spec from scratch in Python; `JpegLsSpec` decodes its committed
  * streams bit-exactly, alongside Scala encode→decode roundtrips.
  */
object JpegLs {

  final case class JlsImage(width: Int, height: Int, precision: Int,
      near: Int, samples: Array[Int])

  /** Run-length code ramp, T.87 A.7.1.2. */
  private val J: Array[Int] = Array(
    0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
    4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def ceilLog2(v: Int): Int = {
    var k = 0
    while ((1 << k) < v) k += 1
    k
  }

  /** Coding parameters, defaulted per C.2.4.1.1 when no LSE marker
    * overrides them (an LSE value of 0 also selects the default).
    */
  private final case class Params(maxval: Int, near: Int,
      t1: Int, t2: Int, t3: Int, reset: Int) {
    val range: Int = (maxval + 2 * near) / (2 * near + 1) + 1
    val qbpp: Int = ceilLog2(range)
    val bpp: Int = math.max(2, ceilLog2(maxval + 1))
    val limit: Int = 2 * (bpp + math.max(8, bpp))
  }

  private def defaultThresholds(maxval: Int, near: Int): (Int, Int, Int) = {
    def clampT(i: Int, lo: Int): Int =
      if (i > maxval || i < lo) lo else i
    if (maxval >= 128) {
      val factor = (math.min(maxval, 4095) + 128) / 256
      val t1 = clampT(factor + 2 + 3 * near, near + 1)
      val t2 = clampT(4 * factor + 3 + 5 * near, t1)
      val t3 = clampT(17 * factor + 4 + 7 * near, t2)
      (t1, t2, t3)
    } else {
      val factor = 256 / (maxval + 1)
      val t1 = clampT(math.max(2, 3 / factor + 3 * near), near + 1)
      val t2 = clampT(math.max(3, 7 / factor + 5 * near), t1)
      val t3 = clampT(math.max(4, 21 / factor + 7 * near), t2)
      (t1, t2, t3)
    }
  }

  // ------------------------------------------------------------ bits

  /** MSB-first bit reader with T.87 marker stuffing: a byte following
    * an 0xFF carries only 7 payload bits (its MSB is 0 by
    * construction; 1 would mean a marker, which inside a scan is a
    * refusal, not data).
    */
  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var cur = 0
    private var avail = 0
    private var prevFF = false

    def readBit(): Int = {
      if (avail == 0) load()
      avail -= 1
      (cur >> avail) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    private def load(): Unit = {
      require(pos < b.length, "jpegls: entropy stream truncated")
      val v = b(pos) & 0xff
      pos += 1
      if (prevFF) {
        require(v < 0x80, f"jpegls: marker 0xFF$v%02X inside scan data")
        cur = v; avail = 7; prevFF = false
      } else {
        cur = v; avail = 8; prevFF = v == 0xff
      }
    }
  }

  /** MSB-first bit writer with the matching stuffing rule: after an
    * 0xFF output byte the next byte gets 7 bits. Final partial byte
    * pads with zero bits.
    */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    private var cap = 8

    def writeBit(bit: Int): Unit = {
      cur = (cur << 1) | bit
      nb += 1
      if (nb == cap) {
        out.write(cur)
        cap = if (cur == 0xff) 7 else 8
        cur = 0; nb = 0
      }
    }

    def writeBits(v: Int, n: Int): Unit = {
      // n can exceed 32 (long unary prefixes); JVM int shifts mask the
      // count to 5 bits, so guard — bits above 31 are always 0
      var i = n - 1
      while (i >= 0) { writeBit(if (i < 32) (v >> i) & 1 else 0); i -= 1 }
    }

    def finish(): Array[Byte] = {
      while (nb != 0) writeBit(0)
      out.toByteArray
    }
  }

  // ------------------------------------------------ shared modeling

  /** One scan's adaptive state: 365 gradient contexts (A/B/C/N) plus
    * the two run-interruption contexts at 365/366 (A/N/Nn).
    */
  private final class State(p: Params) {
    val a = Array.fill(367)(math.max(2, (p.range + 32) >> 6))
    val b = new Array[Int](365)
    val c = new Array[Int](365)
    val n = Array.fill(367)(1)
    val nn = new Array[Int](2) // contexts 365, 366
    var runIndex = 0

    def golombK(q: Int): Int = {
      var k = 0
      while ((n(q) << k) < a(q)) k += 1
      k
    }

    /** A.6.2 + A.6.3: accumulate, halve at RESET, nudge C. */
    def updateRegular(q: Int, err: Int): Unit = {
      b(q) += err * (2 * p.near + 1)
      a(q) += math.abs(err)
      if (n(q) == p.reset) {
        a(q) >>= 1
        b(q) = if (b(q) >= 0) b(q) >> 1 else -((1 - b(q)) >> 1)
        n(q) >>= 1
      }
      n(q) += 1
      if (b(q) <= -n(q)) {
        b(q) += n(q)
        if (c(q) > -128) c(q) -= 1
        if (b(q) <= -n(q)) b(q) = -n(q) + 1
      } else if (b(q) > 0) {
        b(q) -= n(q)
        if (c(q) < 127) c(q) += 1
        if (b(q) > 0) b(q) = 0
      }
    }

    def updateRun(ctx: Int, err: Int, emer: Int, ritype: Int): Unit = {
      if (err < 0) nn(ctx - 365) += 1
      a(ctx) += (emer + 1 - ritype) >> 1
      if (n(ctx) == p.reset) {
        a(ctx) >>= 1
        n(ctx) >>= 1
        nn(ctx - 365) >>= 1
      }
      n(ctx) += 1
    }
  }

  private def medPredict(ra: Int, rb: Int, rc: Int): Int = {
    val mx = math.max(ra, rb)
    val mn = math.min(ra, rb)
    if (rc >= mx) mn else if (rc <= mn) mx else ra + rb - rc
  }

  private def quantize(d: Int, p: Params): Int =
    if (d <= -p.t3) -4
    else if (d <= -p.t2) -3
    else if (d <= -p.t1) -2
    else if (d < -p.near) -1
    else if (d <= p.near) 0
    else if (d < p.t1) 1
    else if (d < p.t2) 2
    else if (d < p.t3) 3
    else 4

  private def clampRx(v: Int, p: Params): Int = {
    var rx = v
    if (rx < -p.near) rx += p.range * (2 * p.near + 1)
    else if (rx > p.maxval + p.near) rx -= p.range * (2 * p.near + 1)
    if (rx < 0) 0 else if (rx > p.maxval) p.maxval else rx
  }

  // ------------------------------------------------------------ decode

  def decode(bytes: Array[Byte]): JlsImage = {
    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    require(bytes.length > 4 && u16(0) == 0xffd8, "jpegls: missing SOI")
    var p = 2
    var width = -1; var height = -1; var prec = -1
    var maxval = 0; var t1 = 0; var t2 = 0; var t3 = 0; var reset = 0
    var near = 0
    var scanStart = -1
    while (scanStart < 0) {
      require(p + 4 <= bytes.length && (bytes(p) & 0xff) == 0xff,
        "jpegls: expected a marker segment")
      val m = bytes(p + 1) & 0xff
      require(m != 0xd9, "jpegls: EOI before SOS")
      val len = u16(p + 2)
      m match {
        case 0xf7 => // SOF55
          prec = bytes(p + 4) & 0xff
          height = u16(p + 5); width = u16(p + 7)
          val ncomp = bytes(p + 9) & 0xff
          require(ncomp == 1,
            s"jpegls: $ncomp components unsupported (single-component scans only)")
        case 0xf8 => // LSE
          val id = bytes(p + 4) & 0xff
          require(id == 1, s"jpegls: LSE type $id unsupported (coding params only)")
          maxval = u16(p + 5); t1 = u16(p + 7); t2 = u16(p + 9)
          t3 = u16(p + 11); reset = u16(p + 13)
        case 0xda => // SOS
          val ns = bytes(p + 4) & 0xff
          require(ns == 1, "jpegls: interleaved scans unsupported")
          near = bytes(p + 7) & 0xff
          val ilv = bytes(p + 8) & 0xff
          require(ilv == 0, s"jpegls: ILV $ilv unsupported")
          scanStart = p + 2 + len
        case _ => () // APPn/COM: skip
      }
      if (scanStart < 0) p += 2 + len
    }
    require(width > 0 && height > 0 && prec >= 2 && prec <= 16,
      s"jpegls: bad frame header ${width}x$height @ $prec bits")
    if (maxval == 0) maxval = (1 << prec) - 1
    val (dt1, dt2, dt3) = defaultThresholds(maxval, near)
    val params = Params(maxval, near,
      if (t1 == 0) dt1 else t1, if (t2 == 0) dt2 else t2,
      if (t3 == 0) dt3 else t3, if (reset == 0) 64 else reset)

    val out = new Array[Int](width * height)
    decodeScan(new BitReader(bytes, scanStart), out, width, height, params)
    JlsImage(width, height, prec, near, out)
  }

  private def decodeScan(in: BitReader, out: Array[Int], w: Int, h: Int,
      p: Params): Unit = {
    val st = new State(p)
    val prev = new Array[Int](w)
    val cur = new Array[Int](w)
    var rcFirst = 0
    var row = 0
    while (row < h) {
      val raFirst = if (row > 0) prev(0) else 0
      var col = 0
      while (col < w) {
        val ra = if (col > 0) cur(col - 1) else raFirst
        val rb = if (row > 0) prev(col) else 0
        val rc =
          if (col > 0) { if (row > 0) prev(col - 1) else 0 } else rcFirst
        val rd =
          if (row > 0) { if (col + 1 < w) prev(col + 1) else rb } else 0
        val q1 = quantize(rd - rb, p)
        val q2 = quantize(rb - rc, p)
        val q3 = quantize(rc - ra, p)
        if (q1 == 0 && q2 == 0 && q3 == 0) {
          col = decodeRun(in, st, cur, prev, col, ra, row, w, p)
        } else {
          var q = 81 * q1 + 9 * q2 + q3
          val sign = if (q < 0) { q = -q; -1 } else 1
          var px = medPredict(ra, rb, rc) + sign * st.c(q)
          if (px > p.maxval) px = p.maxval else if (px < 0) px = 0
          val k = st.golombK(q)
          val mer = decodeMapped(in, k, p.limit, p.qbpp)
          var err =
            if (p.near == 0 && k == 0 && 2 * st.b(q) <= -st.n(q)) {
              if ((mer & 1) == 1) (mer - 1) >> 1 else -(mer >> 1) - 1
            } else {
              if ((mer & 1) == 0) mer >> 1 else -((mer + 1) >> 1)
            }
          st.updateRegular(q, err)
          if (p.near > 0) err *= 2 * p.near + 1
          if (sign < 0) err = -err
          cur(col) = clampRx(px + err, p)
          col += 1
        }
      }
      System.arraycopy(cur, 0, out, row * w, w)
      System.arraycopy(cur, 0, prev, 0, w)
      rcFirst = raFirst
      row += 1
    }
  }

  /** Limited-length Golomb decode (A.5.3 inverse): unary high part
    * (zeros, then one), escape to a qbpp-bit literal at the limit.
    */
  private def decodeMapped(in: BitReader, k: Int, limit: Int, qbpp: Int): Int = {
    var high = 0
    while (in.readBit() == 0) {
      high += 1
      require(high <= limit, "jpegls: runaway unary prefix (corrupt stream)")
    }
    if (high < limit - qbpp - 1) (high << k) | in.readBits(k)
    else in.readBits(qbpp) + 1
  }

  /** Run mode, decoder side (A.7). Fills with Ra; a 1-bit extends by
    * 2^J[RUNindex] (incrementing RUNindex on a full segment), a run
    * that reaches end-of-line stops silently, a 0-bit carries the
    * remainder in J[RUNindex] bits and a run-interruption sample.
    * Returns the column after the run (and interruption, if any).
    */
  private def decodeRun(in: BitReader, st: State, cur: Array[Int],
      prev: Array[Int], startCol: Int, ra: Int, row: Int, w: Int,
      p: Params): Int = {
    var col = startCol
    while (true) {
      if (in.readBit() == 1) {
        val seg = 1 << J(st.runIndex)
        if (seg <= w - col) {
          var i = 0
          while (i < seg) { cur(col + i) = ra; i += 1 }
          col += seg
          if (st.runIndex < 31) st.runIndex += 1
          if (col == w) return col // run ended exactly at end of line
        } else {
          // leftover-at-EOL marker: fill to the line end and stop
          while (col < w) { cur(col) = ra; col += 1 }
          return col
        }
      } else {
        val cnt = if (J(st.runIndex) > 0) in.readBits(J(st.runIndex)) else 0
        require(col + cnt < w, "jpegls: run remainder overruns the line")
        var i = 0
        while (i < cnt) { cur(col + i) = ra; i += 1 }
        col += cnt
        // run-interruption sample (A.7.2)
        val rb = if (row > 0) prev(col) else 0
        val ritype = if (math.abs(ra - rb) <= p.near) 1 else 0
        val px = if (ritype == 1) ra else rb
        val sign = if (ritype == 0 && ra > rb) -1 else 1
        val ctx = 365 + ritype
        val temp = st.a(ctx) + (if (ritype == 1) st.n(ctx) >> 1 else 0)
        var k = 0
        while ((st.n(ctx) << k) < temp) k += 1
        val emer = decodeMapped(in, k, p.limit - J(st.runIndex) - 1, p.qbpp)
        val t = emer + ritype
        val map = t & 1
        val absE = (t + map) >> 1
        val cond = k != 0 || 2 * st.nn(ritype) >= st.n(ctx)
        var err = if ((if (cond) 1 else 0) == map) -absE else absE
        st.updateRun(ctx, err, emer, ritype)
        if (p.near > 0) err *= 2 * p.near + 1
        if (sign < 0) err = -err
        cur(col) = clampRx(px + err, p)
        col += 1
        if (st.runIndex > 0) st.runIndex -= 1
        return col
      }
    }
    col // unreachable
  }

  // ------------------------------------------------------------ encode

  /** Encode one single-component frame (fixture/gate producer — the
    * decode path is the product surface). Lossless for near=0;
    * near-lossless reconstructions follow the decoder's rule exactly,
    * so encode→decode agrees with the encoder's internal
    * reconstruction at any NEAR.
    */
  def encode(samples: Array[Int], width: Int, height: Int, precision: Int,
      near: Int = 0): Array[Byte] = {
    require(samples.length == width * height, "jpegls: samples != w*h")
    require(precision >= 2 && precision <= 16, s"jpegls: precision $precision")
    val maxval = (1 << precision) - 1
    samples.foreach(v => require(v >= 0 && v <= maxval,
      s"jpegls: sample $v out of [0,$maxval]"))
    val (t1, t2, t3) = defaultThresholds(maxval, near)
    val p = Params(maxval, near, t1, t2, t3, reset = 64)

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    w16(0xffd8) // SOI
    w16(0xfff7); w16(11) // SOF55, 1 component
    out.write(precision); w16(height); w16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    w16(0xffda); w16(8) // SOS
    out.write(1); out.write(1); out.write(0)
    out.write(near); out.write(0); out.write(0)
    out.write(encodeScan(samples, width, height, p))
    w16(0xffd9) // EOI
    out.toByteArray
  }

  private def encodeScan(samples: Array[Int], w: Int, h: Int,
      p: Params): Array[Byte] = {
    val bw = new BitWriter
    val st = new State(p)
    val prev = new Array[Int](w) // reconstructed previous line
    val cur = new Array[Int](w)
    var rcFirst = 0
    var row = 0
    while (row < h) {
      val raFirst = if (row > 0) prev(0) else 0
      var col = 0
      while (col < w) {
        val ra = if (col > 0) cur(col - 1) else raFirst
        val rb = if (row > 0) prev(col) else 0
        val rc =
          if (col > 0) { if (row > 0) prev(col - 1) else 0 } else rcFirst
        val rd =
          if (row > 0) { if (col + 1 < w) prev(col + 1) else rb } else 0
        val q1 = quantize(rd - rb, p)
        val q2 = quantize(rb - rc, p)
        val q3 = quantize(rc - ra, p)
        if (q1 == 0 && q2 == 0 && q3 == 0) {
          col = encodeRun(bw, st, samples, cur, prev, col, ra, row, w, p)
        } else {
          var q = 81 * q1 + 9 * q2 + q3
          val sign = if (q < 0) { q = -q; -1 } else 1
          var px = medPredict(ra, rb, rc) + sign * st.c(q)
          if (px > p.maxval) px = p.maxval else if (px < 0) px = 0
          val ix = samples(row * w + col)
          var err = ix - px
          if (sign < 0) err = -err
          if (p.near > 0)
            err = if (err > 0) (p.near + err) / (2 * p.near + 1)
            else -((p.near - err) / (2 * p.near + 1))
          cur(col) = clampRx(px + sign * err * (2 * p.near + 1), p)
          // modulo reduction (A.4.5)
          if (err < 0) err += p.range
          if (err >= (p.range + 1) / 2) err -= p.range
          val k = st.golombK(q)
          val mer =
            if (p.near == 0 && k == 0 && 2 * st.b(q) <= -st.n(q)) {
              if (err >= 0) 2 * err + 1 else -2 * (err + 1)
            } else {
              if (err >= 0) 2 * err else -2 * err - 1
            }
          encodeMapped(bw, mer, k, p.limit, p.qbpp)
          st.updateRegular(q, err)
          col += 1
        }
      }
      System.arraycopy(cur, 0, prev, 0, w)
      rcFirst = raFirst
      row += 1
    }
    bw.finish()
  }

  private def encodeMapped(bw: BitWriter, m: Int, k: Int, limit: Int,
      qbpp: Int): Unit = {
    val high = m >> k
    if (high < limit - qbpp - 1) {
      bw.writeBits(1, high + 1) // `high` zeros, then the 1
      if (k > 0) bw.writeBits(m & ((1 << k) - 1), k)
    } else {
      bw.writeBits(1, limit - qbpp) // escape: limit-qbpp-1 zeros, 1
      bw.writeBits(m - 1, qbpp)
    }
  }

  private def encodeRun(bw: BitWriter, st: State, samples: Array[Int],
      cur: Array[Int], prev: Array[Int], startCol: Int, ra: Int, row: Int,
      w: Int, p: Params): Int = {
    var col = startCol
    var runCnt = 0
    while (col < w && math.abs(samples(row * w + col) - ra) <= p.near) {
      cur(col) = ra
      runCnt += 1
      col += 1
    }
    while (runCnt >= (1 << J(st.runIndex))) {
      bw.writeBit(1)
      runCnt -= 1 << J(st.runIndex)
      if (st.runIndex < 31) st.runIndex += 1
    }
    if (col == w) {
      if (runCnt > 0) bw.writeBit(1) // leftover-at-EOL marker
      col
    } else {
      bw.writeBit(0)
      if (J(st.runIndex) > 0) bw.writeBits(runCnt, J(st.runIndex))
      // run-interruption sample
      val rb = if (row > 0) prev(col) else 0
      val ritype = if (math.abs(ra - rb) <= p.near) 1 else 0
      val px = if (ritype == 1) ra else rb
      val sign = if (ritype == 0 && ra > rb) -1 else 1
      val ix = samples(row * w + col)
      var err = ix - px
      if (sign < 0) err = -err
      if (p.near > 0)
        err = if (err > 0) (p.near + err) / (2 * p.near + 1)
        else -((p.near - err) / (2 * p.near + 1))
      cur(col) = clampRx(px + sign * err * (2 * p.near + 1), p)
      if (err < 0) err += p.range
      if (err >= (p.range + 1) / 2) err -= p.range
      val ctx = 365 + ritype
      val temp = st.a(ctx) + (if (ritype == 1) st.n(ctx) >> 1 else 0)
      var k = 0
      while ((st.n(ctx) << k) < temp) k += 1
      val map =
        if (k == 0 && err > 0 && 2 * st.nn(ritype) < st.n(ctx)) 1
        else if (err < 0 && 2 * st.nn(ritype) >= st.n(ctx)) 1
        else if (err < 0 && k != 0) 1
        else 0
      val emer = 2 * math.abs(err) - ritype - map
      encodeMapped(bw, emer, k, p.limit - J(st.runIndex) - 1, p.qbpp)
      st.updateRun(ctx, err, emer, ritype)
      col += 1
      if (st.runIndex > 0) st.runIndex -= 1
      col
    }
  }
}
