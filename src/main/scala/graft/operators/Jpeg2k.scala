package graft.operators

/** Pure-JVM JPEG 2000 decoder (ITU-T T.800) — constrained lossless
  * profile: single tile, single component, reversible 5/3 wavelet, no
  * quantization, one layer, LRCP, default precincts, default
  * code-block style. This is the profile DICOM's "JPEG 2000 Lossless
  * Only" transfer syntax (1.2.840.10008.1.2.4.90) carries for
  * grayscale frames; the reference delegates it to ITK/GDCM native
  * codecs (`py/ngff_zarr/detect_cli_io_backend.py:21`).
  *
  * Spec-complete for the scope: the MQ arithmetic decoder (T.88 state
  * table), EBCOT Tier-1 with all three coding passes and the
  * run-length shortcut, tag-tree coded packet headers (inclusion +
  * zero bit-planes + pass counts + Lblock lengths), and the reversible
  * 5/3 inverse lifting with symmetric extension. Multiple tiles,
  * multiple components, precinct partitions, SOP/EPH, non-default
  * code-block styles, irreversible 9/7, and quantized subbands all
  * refuse loudly by name.
  *
  * Independent ground truth: `tools/j2k.py` implements BOTH sides of
  * the same spec in Python with a roundtrip self-test;
  * `tools/make_j2k_fixture.py` commits its encodings, and
  * `Jpeg2kSpec` decodes them bit-exactly.
  */
object Jpeg2k {

  /** `samples` is pixel-interleaved when components > 1 (r,g,b per
    * pixel — after the inverse reversible color transform when the
    * codestream used MCT).
    */
  final case class J2kImage(width: Int, height: Int, precision: Int,
      signed: Boolean, components: Int, samples: Array[Int])

  // ------------------------------------------------------------- MQ

  private val Qe = Array(0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221,
    0x5601, 0x5401, 0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601,
    0x5601, 0x5401, 0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801,
    0x2401, 0x2201, 0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101,
    0x0AC1, 0x09C1, 0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141,
    0x0111, 0x0085, 0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001,
    0x5601)
  private val Nmps = Array(1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29,
    15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20,
    21, 14, 14, 15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0)

  private val CxRl = 17
  private val CxUni = 18

  private final class MQDecoder(data: Array[Byte], from: Int, until: Int) {
    private val stState = new Array[Int](19)
    private val stMps = new Array[Int](19)
    stState(0) = 4; stState(CxRl) = 3; stState(CxUni) = 46
    private var bp = from
    private var c = 0L
    private var ct = 0
    private var a = 0

    private def byteAt(i: Int): Int =
      if (i < until && i < data.length) data(i) & 0xff else 0xff

    locally {
      c = byteAt(from).toLong << 16
      byteIn()
      c <<= 7
      ct -= 7
      a = 0x8000
    }

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00L; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteIn()
        a = (a << 1) & 0xffff
        c = (c << 1) & 0xffffffffL
        ct -= 1
        (a & 0x8000) == 0
      }) ()
    }

    def decode(cxi: Int): Int = {
      val i = stState(cxi)
      val qe = Qe(i)
      a -= qe
      var d = 0
      if (((c >> 16) & 0xffff) < qe) {
        if (a < qe) { d = stMps(cxi); stState(cxi) = Nmps(i) }
        else {
          d = 1 - stMps(cxi)
          if (Switch(i) == 1) stMps(cxi) = 1 - stMps(cxi)
          stState(cxi) = Nlps(i)
        }
        a = qe
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) {
            d = 1 - stMps(cxi)
            if (Switch(i) == 1) stMps(cxi) = 1 - stMps(cxi)
            stState(cxi) = Nlps(i)
          } else { d = stMps(cxi); stState(cxi) = Nmps(i) }
          renorm()
        } else d = stMps(cxi)
      }
      d
    }
  }

  // ---------------------------------------------------------- Tier-1

  /** Significance context (Table D.1) per orientation. */
  private def sigCtx(band: Int, h0: Int, v0: Int, d: Int): Int = {
    // band: 0 = LL/LH rules, 1 = HL (swap h/v), 2 = HH
    if (band == 2) {
      val hv = h0 + v0
      if (d >= 3) 8
      else if (d == 2) { if (hv >= 1) 7 else 6 }
      else if (d == 1) { if (hv >= 2) 5 else if (hv == 1) 4 else 3 }
      else { if (hv >= 2) 2 else if (hv == 1) 1 else 0 }
    } else {
      val h = if (band == 1) v0 else h0
      val v = if (band == 1) h0 else v0
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else if (v == 2) 4
      else if (v == 1) 3
      else if (d >= 2) 2
      else if (d == 1) 1
      else 0
    }
  }

  /** Sign context + xor bit (Table D.3) from clamped contributions. */
  private def signCtx(hc: Int, vc: Int): (Int, Int) = (hc, vc) match {
    case (1, 1) => (13, 0)
    case (1, 0) => (12, 0)
    case (1, -1) => (11, 0)
    case (0, 1) => (10, 0)
    case (0, 0) => (9, 0)
    case (0, -1) => (10, 1)
    case (-1, 1) => (11, 1)
    case (-1, 0) => (12, 1)
    case (-1, -1) => (13, 1)
    case _ => throw new IllegalStateException("unreachable")
  }

  /** Decode one code-block (band orientation, data segment, w x h,
    * bit-planes, passes) to signed coefficients.
    */
  private def t1Decode(band: Int, data: Array[Byte], from: Int, until: Int,
      w: Int, h: Int, nplanes: Int, npasses: Int): Array[Int] = {
    val n = w * h
    val mags = new Array[Int](n)
    val sig = new Array[Int](n)
    val sgn = new Array[Int](n)
    val vis = new Array[Int](n)
    val ref = new Array[Int](n)
    if (npasses == 0 || nplanes == 0) return mags
    // a pass count past 3*nplanes-2 would drive the bit-plane index
    // negative and (with JVM shift-masking) OR in wrong high bits
    require(nplanes >= 1 && npasses <= 3 * nplanes - 2,
      s"jpeg2000: $npasses passes exceed $nplanes bit-planes")
    val mq = new MQDecoder(data, from, until)

    def sigAt(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h) 0 else sig(y * w + x)
    def sgnContrib(x: Int, y: Int): Int =
      if (sigAt(x, y) == 0) 0
      else if (sgn(y * w + x) == 1) -1 else 1
    def hvd(x: Int, y: Int): (Int, Int, Int) = (
      sigAt(x - 1, y) + sigAt(x + 1, y),
      sigAt(x, y - 1) + sigAt(x, y + 1),
      sigAt(x - 1, y - 1) + sigAt(x + 1, y - 1) + sigAt(x - 1, y + 1) +
        sigAt(x + 1, y + 1))
    def decodeSign(x: Int, y: Int): Int = {
      val hc = math.max(-1, math.min(1, sgnContrib(x - 1, y) + sgnContrib(x + 1, y)))
      val vc = math.max(-1, math.min(1, sgnContrib(x, y - 1) + sgnContrib(x, y + 1)))
      val (cx, xor) = signCtx(hc, vc)
      mq.decode(cx) ^ xor
    }
    def magCtx(x: Int, y: Int): Int = {
      if (ref(y * w + x) == 1) 16
      else {
        val (a, b, c) = hvd(x, y)
        if (a + b + c > 0) 15 else 14
      }
    }

    var done = 0
    var p = nplanes - 1
    var which = 2 // first pass of the first plane is cleanup
    while (done < npasses) {
      if (which == 0) { // significance propagation
        var y0 = 0
        while (y0 < h) {
          var x = 0
          while (x < w) {
            var y = y0
            val ylim = math.min(y0 + 4, h)
            while (y < ylim) {
              val i = y * w + x
              if (sig(i) == 0) {
                val (hh, vv, dd) = hvd(x, y)
                if (hh + vv + dd != 0) {
                  vis(i) = 1
                  if (mq.decode(sigCtx(band, hh, vv, dd)) == 1) {
                    val s = decodeSign(x, y)
                    sig(i) = 1; sgn(i) = s
                    mags(i) |= 1 << p
                  }
                }
              }
              y += 1
            }
            x += 1
          }
          y0 += 4
        }
      } else if (which == 1) { // magnitude refinement
        var y0 = 0
        while (y0 < h) {
          var x = 0
          while (x < w) {
            var y = y0
            val ylim = math.min(y0 + 4, h)
            while (y < ylim) {
              val i = y * w + x
              if (sig(i) == 1 && vis(i) == 0) {
                if (mq.decode(magCtx(x, y)) == 1) mags(i) |= 1 << p
                ref(i) = 1
              }
              y += 1
            }
            x += 1
          }
          y0 += 4
        }
      } else { // cleanup
        var y0 = 0
        while (y0 < h) {
          var x = 0
          while (x < w) {
            var y = y0
            val ylim = math.min(y0 + 4, h)
            var runnable = ylim - y0 == 4
            if (runnable) {
              var k = 0
              while (runnable && k < 4) {
                val i = (y0 + k) * w + x
                if (sig(i) != 0 || vis(i) != 0) runnable = false
                else {
                  val (hh, vv, dd) = hvd(x, y0 + k)
                  if (hh + vv + dd != 0) runnable = false
                }
                k += 1
              }
            }
            var skipStrip = false
            if (runnable) {
              if (mq.decode(CxRl) == 0) skipStrip = true
              else {
                val first = (mq.decode(CxUni) << 1) | mq.decode(CxUni)
                val i = (y0 + first) * w + x
                val s = decodeSign(x, y0 + first)
                sig(i) = 1; sgn(i) = s
                mags(i) |= 1 << p
                y = y0 + first + 1
              }
            }
            if (!skipStrip) {
              var yy = y
              while (yy < ylim) {
                val i = yy * w + x
                if (sig(i) == 0 && vis(i) == 0) {
                  val (hh, vv, dd) = hvd(x, yy)
                  if (mq.decode(sigCtx(band, hh, vv, dd)) == 1) {
                    val s = decodeSign(x, yy)
                    sig(i) = 1; sgn(i) = s
                    mags(i) |= 1 << p
                  }
                }
                yy += 1
              }
            }
            x += 1
          }
          y0 += 4
        }
        java.util.Arrays.fill(vis, 0)
      }
      done += 1
      if (which == 2) { p -= 1; which = 0 } else which += 1
    }
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = if (sgn(i) == 1) -mags(i) else mags(i)
      i += 1
    }
    out
  }

  // --------------------------------------------------------- 5/3 DWT

  /** Inverse 1D lifting: lo/hi → interleaved, symmetric extension. */
  private def inv53(lo: Array[Int], hi: Array[Int]): Array[Int] = {
    val nl = lo.length
    val nh = hi.length
    val n = nl + nh
    if (n == 1) return lo.clone()
    val out = new Array[Int](n)
    def he(k0: Int): Int = {
      var k = k0
      if (k < 0) k = -k - 1
      if (k >= nh) k = 2 * nh - 1 - k
      if (nh == 0) 0 else hi(k)
    }
    var k = 0
    while (k < nl) {
      out(2 * k) = lo(k) - ((he(k - 1) + he(k) + 2) >> 2)
      k += 1
    }
    k = 0
    while (k < nh) {
      var hiI = 2 * k + 2
      if (hiI >= n) hiI = 2 * (n - 1) - hiI
      out(2 * k + 1) = hi(k) + ((out(2 * k) + out(hiI)) >> 1)
      k += 1
    }
    out
  }

  /** Inverse 2D level: columns then rows (mirror of rows-then-cols
    * analysis).
    */
  private def inv53_2d(ll: Array[Int], hl: Array[Int], lh: Array[Int],
      hh: Array[Int], loW: Int, loH: Int, hiW: Int, hiH: Int): Array[Int] = {
    val w = loW + hiW
    val h = loH + hiH
    val rl = Array.ofDim[Int](h, loW)
    val rh = Array.ofDim[Int](h, hiW)
    var x = 0
    while (x < loW) {
      val col = inv53(Array.tabulate(loH)(k => ll(k * loW + x)),
        Array.tabulate(hiH)(k => lh(k * loW + x)))
      var y = 0
      while (y < h) { rl(y)(x) = col(y); y += 1 }
      x += 1
    }
    x = 0
    while (x < hiW) {
      val col = inv53(Array.tabulate(loH)(k => hl(k * hiW + x)),
        Array.tabulate(hiH)(k => hh(k * hiW + x)))
      var y = 0
      while (y < h) { rh(y)(x) = col(y); y += 1 }
      x += 1
    }
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val row = inv53(rl(y), rh(y))
      System.arraycopy(row, 0, out, y * w, w)
      y += 1
    }
    out
  }

  // -------------------------------------------------- header bit I/O

  /** Packet-header bit reader with B.10.1 stuffing (7-bit byte after
    * an 0xFF).
    */
  private final class HdrReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nb = 0
    private var prevFf = false
    def bit(): Int = {
      if (nb == 0) {
        val b = data(pos) & 0xff
        pos += 1
        if (prevFf) {
          require(b < 0x80, "jpeg2000: packet-header stuffed byte with MSB set")
          cur = b; nb = 7
        } else { cur = b; nb = 8 }
        prevFf = b == 0xff
      }
      nb -= 1
      (cur >> nb) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = {
      if (prevFf) {
        require((data(pos) & 0xff) < 0x80, "jpeg2000: missing trailing stuff byte")
        pos += 1
        prevFf = false
      }
      nb = 0
    }
  }

  /** Decoder-side tag tree (B.10.2): per node a coded lower bound and
    * a resolved flag.
    */
  private final class TagTree(w0: Int, h0: Int) {
    private val dims = {
      val b = Seq.newBuilder[(Int, Int)]
      var w = math.max(1, w0)
      var h = math.max(1, h0)
      var go = true
      while (go) {
        b += ((w, h))
        if (w == 1 && h == 1) go = false
        w = (w + 1) / 2
        h = (h + 1) / 2
      }
      b.result()
    }
    private val base = dims.scanLeft(0)((acc, d) => acc + d._1 * d._2)
    private val low = new Array[Int](base.last)
    private val known = new Array[Boolean](base.last)
    private val value = new Array[Int](base.last)

    def decode(in: HdrReader, x: Int, y: Int, threshold: Int): Boolean = {
      var lowBound = 0
      var leaf = -1
      var lev = dims.length - 1
      while (lev >= 0) {
        val i = base(lev) + (y >> lev) * dims(lev)._1 + (x >> lev)
        if (low(i) < lowBound) low(i) = lowBound else lowBound = low(i)
        var go = !known(i) && lowBound < threshold
        while (go) {
          if (in.bit() == 1) { known(i) = true; go = false }
          else {
            lowBound += 1
            go = lowBound < threshold
          }
        }
        value(i) = lowBound
        low(i) = lowBound
        leaf = i
        lev -= 1
      }
      known(leaf) && value(leaf) < threshold
    }
  }

  private def readNPasses(br: HdrReader): Int =
    if (br.bit() == 0) 1
    else if (br.bit() == 0) 2
    else {
      val v = br.bits(2)
      if (v < 3) 3 + v
      else {
        val v2 = br.bits(5)
        if (v2 < 31) 6 + v2 else 37 + br.bits(7)
      }
    }

  // ----------------------------------------------------------- decode

  def decode(data: Array[Byte]): J2kImage = {
    var pos = 0
    def u16(): Int = { val v = ((data(pos) & 0xff) << 8) | (data(pos + 1) & 0xff); pos += 2; v }
    def u32(): Long = { (u16().toLong << 16) | u16() }
    require(data.length > 4 && u16() == 0xff4f, "jpeg2000: missing SOC")

    var w = -1; var h = -1; var prec = -1; var signed = false
    var ncomp = 1; var mct = false
    var levels = -1; var cbw = -1; var cbh = -1
    var useSop = false; var useEph = false
    var mbList = Seq.empty[Int]
    var bodyAt = -1
    while (bodyAt < 0) {
      val mk = u16()
      require(mk != 0xffd9, "jpeg2000: EOC before tile data")
      mk match {
        case 0xff51 => // SIZ
          val len = u16()
          val end = pos + len - 2
          u16() // Rsiz
          w = u32().toInt; h = u32().toInt
          require(u32() == 0 && u32() == 0, "jpeg2000: image offset unsupported")
          require(u32() == w && u32() == h, "jpeg2000: tiling unsupported")
          u32(); u32()
          ncomp = u16()
          require(ncomp == 1 || ncomp == 3,
            s"jpeg2000: $ncomp components unsupported (1 gray / 3 color)")
          val sss = (0 until ncomp).map { c =>
            require((data(pos + 3 * c + 1) & 0xff) == 1 &&
              (data(pos + 3 * c + 2) & 0xff) == 1,
              "jpeg2000: component subsampling unsupported")
            data(pos + 3 * c) & 0xff
          }
          require(sss.distinct.length == 1,
            "jpeg2000: mixed component precisions unsupported")
          prec = (sss.head & 0x7f) + 1
          signed = (sss.head & 0x80) != 0
          pos = end
        case 0xff52 => // COD
          val len = u16()
          val end = pos + len - 2
          val scod = data(pos) & 0xff
          require((scod & 0x1) == 0,
            "jpeg2000: precinct partitions unsupported")
          useSop = (scod & 0x2) != 0
          useEph = (scod & 0x4) != 0
          require((data(pos + 1) & 0xff) == 0, "jpeg2000: LRCP progression only")
          require((((data(pos + 2) & 0xff) << 8) | (data(pos + 3) & 0xff)) == 1,
            "jpeg2000: single-layer codestreams only")
          mct = (data(pos + 4) & 0xff) == 1
          require((data(pos + 4) & 0xff) <= 1, "jpeg2000: unknown MCT value")
          levels = data(pos + 5) & 0xff
          cbw = 1 << ((data(pos + 6) & 0xff) + 2)
          cbh = 1 << ((data(pos + 7) & 0xff) + 2)
          require((data(pos + 8) & 0xff) == 0,
            "jpeg2000: non-default code-block styles unsupported")
          require((data(pos + 9) & 0xff) == 0,
            "jpeg2000: irreversible 9/7 transform unsupported (lossless 5/3 only)")
          pos = end
        case 0xff5c => // QCD
          val len = u16()
          val end = pos + len - 2
          val sq = data(pos) & 0xff
          require((sq & 0x1f) == 0,
            "jpeg2000: quantized subbands unsupported (reversible only)")
          val guard = sq >> 5
          mbList = (pos + 1 until end).map(i => ((data(i) & 0xff) >> 3) + guard - 1)
          pos = end
        case 0xff53 | 0xff5d | 0xff5e | 0xff5f | 0xff60 | 0xff61 =>
          // COC / QCC / RGN / POC / PPM / PPT change coding semantics
          // per-component or reorder packets — skipping them would
          // decode silently-wrong pixels
          throw new UnsupportedOperationException(
            f"jpeg2000: marker 0xFF${mk & 0xff}%02X (COC/QCC/RGN/POC/PPM/PPT) unsupported")
        case 0xff90 => // SOT
          val len = u16()
          // Isot(2) Psot(4) TPsot(1) TNsot(1): a second tile-part
          // would interleave packets we'd misparse — refuse
          require((data(pos + 6) & 0xff) == 0 &&
            ((data(pos + 7) & 0xff) == 1 || (data(pos + 7) & 0xff) == 0),
            "jpeg2000: multiple tile-parts unsupported")
          pos += len - 2
        case 0xff93 => // SOD
          bodyAt = pos
        case _ =>
          val len = u16()
          pos += len - 2
      }
    }
    require(w > 0 && h > 0 && prec >= 1 && prec <= 16 && levels >= 0,
      s"jpeg2000: bad headers ${w}x$h @ $prec bits, $levels levels")

    // resolution/band geometry (tile at origin, so every band starts 0)
    val sizes = {
      val b = Seq.newBuilder[(Int, Int, Int, Int)]
      var cw = w; var ch = h
      (0 until levels).foreach { _ =>
        val loW = (cw + 1) / 2; val hiW = cw / 2
        val loH = (ch + 1) / 2; val hiH = ch / 2
        b += ((loW, loH, hiW, hiH))
        cw = loW; ch = loH
      }
      b.result()
    }
    // per resolution: (bandKind 0=LL/LH-rules..., name, bw, bh)
    val res: Seq[Seq[(Int, Int, Int)]] = { // (bandOrient, bw, bh)
      val llW = if (levels == 0) w else sizes.last._1
      val llH = if (levels == 0) h else sizes.last._2
      Seq(Seq((0, llW, llH))) ++
        (levels - 1 to 0 by -1).map { l =>
          val (loW, loH, hiW, hiH) = sizes(l)
          Seq((1, hiW, loH), (0, loW, hiH), (2, hiW, hiH))
        }
    }

    require(!mct || ncomp == 3, "jpeg2000: MCT requires 3 components")
    var br = new HdrReader(data, bodyAt)
    // band coefficient planes keyed (component, resolution, band index)
    val bandCoefs = scala.collection.mutable.Map.empty[(Int, Int, Int), Array[Int]]
    var qcdI = 0
    for (r <- res.indices) {
      val bands = res(r)
      for (comp <- 0 until ncomp) {
        if (useSop) {
          // SOP: FF91, Lsop = 4, 2-byte packet sequence number
          val at0 = br.pos
          require((data(at0) & 0xff) == 0xff && (data(at0 + 1) & 0xff) == 0x91,
            "jpeg2000: Scod declares SOP but the packet lacks it")
          br = new HdrReader(data, at0 + 6)
        }
        val nonEmpty = br.bit() == 1
        // (bandIdx, bw, bh, x0, y0, cw, ch, orient, nplanes, npasses, len)
        val todo = Seq.newBuilder[(Int, Int, Int, Int, Int, Int, Int, Int, Int, Int, Int)]
        if (nonEmpty) {
          for (bi <- bands.indices) {
            val (orient, bw, bh) = bands(bi)
            if (bw > 0 && bh > 0) {
              val mb = mbList(qcdI + bi)
              val nx = (bw + cbw - 1) / cbw
              val ny = (bh + cbh - 1) / cbh
              val incl = new TagTree(nx, ny)
              val zbp = new TagTree(nx, ny)
              var i = 0
              while (i < nx * ny) {
                val gx = i % nx
                val gy = i / nx
                val x0 = gx * cbw
                val y0 = gy * cbh
                val cw2 = math.min(cbw, bw - x0)
                val ch2 = math.min(cbh, bh - y0)
                if (!incl.decode(br, gx, gy, 1))
                  todo += ((bi, bw, bh, x0, y0, cw2, ch2, orient, 0, 0, 0))
                else {
                  var t = 1
                  while (!zbp.decode(br, gx, gy, t)) t += 1
                  val z = t - 1
                  val npl = mb - z
                  require(npl >= 0, s"jpeg2000: $z zero bit-planes exceed Mb $mb")
                  val nps = readNPasses(br)
                  var lblock = 3
                  while (br.bit() == 1) lblock += 1
                  val nbits = lblock + (31 - Integer.numberOfLeadingZeros(nps))
                  val len = br.bits(nbits)
                  todo += ((bi, bw, bh, x0, y0, cw2, ch2, orient, npl, nps, len))
                }
                i += 1
              }
            }
          }
        } else {
          for (bi <- bands.indices) {
            val (orient, bw, bh) = bands(bi)
            if (bw > 0 && bh > 0) {
              val nx = (bw + cbw - 1) / cbw
              val ny = (bh + cbh - 1) / cbh
              var i = 0
              while (i < nx * ny) {
                val x0 = (i % nx) * cbw
                val y0 = (i / nx) * cbh
                todo += ((bi, bw, bh, x0, y0, math.min(cbw, bw - x0),
                  math.min(cbh, bh - y0), orient, 0, 0, 0))
                i += 1
              }
            }
          }
        }
        br.align()
        if (useEph) {
          // EPH: FF92 terminates the packet header
          require((data(br.pos) & 0xff) == 0xff &&
            (data(br.pos + 1) & 0xff) == 0x92,
            "jpeg2000: Scod declares EPH but the packet header lacks it")
          br = new HdrReader(data, br.pos + 2)
        }
        var at = br.pos
        todo.result().foreach { case (bi, bw, bh, x0, y0, cw2, ch2, orient, npl, nps, len) =>
          val key = (comp, r, bi)
          val plane = bandCoefs.getOrElseUpdate(key, new Array[Int](bw * bh))
          require(at + len <= data.length, "jpeg2000: code-block data overruns codestream")
          val coefs = t1Decode(orient, data, at, at + len, cw2, ch2, npl, nps)
          var yy = 0
          while (yy < ch2) {
            var xx = 0
            while (xx < cw2) {
              plane((y0 + yy) * bw + x0 + xx) = coefs(yy * cw2 + xx)
              xx += 1
            }
            yy += 1
          }
          at += len
        }
        br = new HdrReader(data, at)
      }
      qcdI += bands.length
    }

    // inverse DWT per component, then the inverse reversible color
    // transform when the codestream used MCT
    val planes = (0 until ncomp).map { comp =>
      var cur = bandCoefs.getOrElse((comp, 0, 0),
        new Array[Int](res(0).head._2 * res(0).head._3))
      var cw3 = res(0).head._2
      var ch3 = res(0).head._3
      for (r <- 1 to levels) {
        val hlW = res(r)(0)._2
        val lhH = res(r)(1)._3
        def band(bi: Int, bw: Int, bh: Int): Array[Int] =
          bandCoefs.getOrElse((comp, r, bi), new Array[Int](bw * bh))
        cur = inv53_2d(cur,
          band(0, hlW, ch3), band(1, cw3, lhH), band(2, hlW, lhH),
          cw3, ch3, hlW, lhH)
        cw3 += hlW
        ch3 += lhH
      }
      require(cw3 == w && ch3 == h,
        s"jpeg2000: reconstructed ${cw3}x$ch3, header ${w}x$h")
      cur
    }
    if (mct) {
      val (py, pu, pv) = (planes(0), planes(1), planes(2))
      var i = 0
      while (i < w * h) {
        val g = py(i) - ((pu(i) + pv(i)) >> 2)
        val rr = pv(i) + g
        val bb = pu(i) + g
        py(i) = rr; pu(i) = g; pv(i) = bb
        i += 1
      }
    }
    val shift = if (signed) 0 else 1 << (prec - 1)
    val out = new Array[Int](w * h * ncomp)
    var i = 0
    while (i < w * h) {
      var c = 0
      while (c < ncomp) {
        out(i * ncomp + c) = planes(c)(i) + shift
        c += 1
      }
      i += 1
    }
    J2kImage(w, h, prec, signed, ncomp, out)
  }
}
