package graft.operators

/** Pure-JVM JPEG 2000 ENCODER (single tile, 1 layer, LRCP, default
  * precincts/styles; 1 or 3 components): reversible 5/3 lossless, OR
  * — with `transform = "97"` and a `quant = (e0, mu0)` pair — the
  * irreversible 9/7 with scalar-expounded dead-zone quantization and
  * the irreversible color transform, i.e. the DICOM .4.91 shape.
  * A fixture/gate producer (the decoder [[Jpeg2k]] is the product
  * surface): the i68 gate puts runtime-encoded lossless slices under
  * the DuckDB oracle, the m70 gate feeds runtime lossy codestreams
  * through the distributed extractor, and Jpeg2kSpec roundtrips
  * random frames through encode→decode. Ported from the
  * roundtrip-self-tested Python implementation in `tools/j2k.py`
  * (same T.800 reading).
  */
object Jpeg2kEncode {

  // MQ tables duplicated from the decoder (private there; 47 rows)
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
  private val Guard = 2

  private final class MQEncoder {
    private var c = 0L
    private var a = 0x8000
    private var ct = 12
    private val stState = new Array[Int](19)
    private val stMps = new Array[Int](19)
    stState(0) = 4; stState(CxRl) = 3; stState(CxUni) = 46
    // dummy first byte (never 0xFF) absorbs the no-carry invariant
    private var buf = new Array[Byte](64)
    private var n = 1

    private def append(b: Int): Unit = {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
      buf(n) = b.toByte
      n += 1
    }

    def encode(cxi: Int, d: Int): Unit = {
      val i = stState(cxi)
      val qe = Qe(i)
      if (d == stMps(cxi)) {
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          stState(cxi) = Nmps(i)
          renorm()
        } else c += qe
      } else {
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(i) == 1) stMps(cxi) = 1 - stMps(cxi)
        stState(cxi) = Nlps(i)
        renorm()
      }
    }

    private def renorm(): Unit = {
      while ({
        a = (a << 1) & 0xffff
        c <<= 1
        ct -= 1
        if (ct == 0) byteOut()
        (a & 0x8000) == 0
      }) ()
    }

    private def byteOut(): Unit = {
      if ((buf(n - 1) & 0xff) == 0xff) {
        append(((c >> 20) & 0xff).toInt)
        c &= 0xfffffL
        ct = 7
      } else {
        if (c < 0x8000000L) {
          append(((c >> 19) & 0xff).toInt)
          c &= 0x7ffffL
          ct = 8
        } else {
          buf(n - 1) = (buf(n - 1) + 1).toByte
          require(n > 1 || buf(0) != 1, "jpeg2000-enc: carry into dummy byte")
          if ((buf(n - 1) & 0xff) == 0xff) {
            c &= 0x7ffffffL
            append(((c >> 20) & 0xff).toInt)
            c &= 0xfffffL
            ct = 7
          } else {
            append(((c >> 19) & 0xff).toInt)
            c &= 0x7ffffL
            ct = 8
          }
        }
      }
    }

    def flush(): Array[Byte] = {
      val temp = c + a
      c |= 0xffffL
      if (c >= temp) c -= 0x8000
      c <<= ct
      byteOut()
      c <<= ct
      byteOut()
      var end = n
      while (end > 1 && (buf(end - 1) & 0xff) == 0xff) end -= 1
      java.util.Arrays.copyOfRange(buf, 1, end)
    }
  }

  // ------------------------------- Tier-1 (mirror of the decoder)

  private def sigCtx(band: Int, h0: Int, v0: Int, d: Int): Int =
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

  /** Encode one code-block; returns (bytes, nplanes, npasses). */
  private def t1Encode(band: Int, coefs: Array[Int], w: Int,
      h: Int, style: Int = 0): (Array[Byte], Int, Int) = {
    val n = w * h
    val mags = coefs.map(math.abs)
    val blkSgn = coefs.map(c => if (c < 0) 1 else 0)
    val maxmag = if (n == 0) 0 else mags.max
    if (maxmag == 0) return (Array.emptyByteArray, 0, 0)
    val nplanes = 32 - Integer.numberOfLeadingZeros(maxmag)
    val sig = new Array[Int](n)
    val sgn = new Array[Int](n)
    val vis = new Array[Int](n)
    val ref = new Array[Int](n)
    val mq = new MQEncoder

    // vertically stripe-causal contexts (style 0x08): rows >=
    // causalLim read as insignificant while a stripe is processed
    val causal = (style & 0x08) != 0
    var causalLim = Int.MaxValue
    def sigAt(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h || y >= causalLim) 0
      else sig(y * w + x)
    def sgnContrib(x: Int, y: Int): Int =
      if (sigAt(x, y) == 0) 0 else if (sgn(y * w + x) == 1) -1 else 1
    def hvd(x: Int, y: Int): (Int, Int, Int) = (
      sigAt(x - 1, y) + sigAt(x + 1, y),
      sigAt(x, y - 1) + sigAt(x, y + 1),
      sigAt(x - 1, y - 1) + sigAt(x + 1, y - 1) + sigAt(x - 1, y + 1) +
        sigAt(x + 1, y + 1))
    def encodeSign(x: Int, y: Int): Unit = {
      val i = y * w + x
      val hc = math.max(-1, math.min(1, sgnContrib(x - 1, y) + sgnContrib(x + 1, y)))
      val vc = math.max(-1, math.min(1, sgnContrib(x, y - 1) + sgnContrib(x, y + 1)))
      val (cx, xor) = signCtx(hc, vc)
      mq.encode(cx, blkSgn(i) ^ xor)
      sig(i) = 1
      sgn(i) = blkSgn(i)
    }
    def magCtx(x: Int, y: Int): Int =
      if (ref(y * w + x) == 1) 16
      else {
        val (a, b, c) = hvd(x, y)
        if (a + b + c > 0) 15 else 14
      }

    var npasses = 0
    var p = nplanes - 1
    while (p >= 0) {
      def bit(i: Int): Int = (mags(i) >> p) & 1
      val passes = if (p == nplanes - 1) Seq(2) else Seq(0, 1, 2)
      passes.foreach { which =>
        if (which == 0) {
          var y0 = 0
          while (y0 < h) {
            causalLim = if (causal) y0 + 4 else Int.MaxValue
            var x = 0
            while (x < w) {
              var y = y0
              val ylim = math.min(y0 + 4, h)
              while (y < ylim) {
                val i = y * w + x
                if (sig(i) == 0) {
                  val (hh, vv, dd) = hvd(x, y)
                  if (hh + vv + dd != 0) {
                    mq.encode(sigCtx(band, hh, vv, dd), bit(i))
                    vis(i) = 1
                    if (bit(i) == 1) encodeSign(x, y)
                  }
                }
                y += 1
              }
              x += 1
            }
            y0 += 4
          }
        } else if (which == 1) {
          var y0 = 0
          while (y0 < h) {
            causalLim = if (causal) y0 + 4 else Int.MaxValue
            var x = 0
            while (x < w) {
              var y = y0
              val ylim = math.min(y0 + 4, h)
              while (y < ylim) {
                val i = y * w + x
                if (sig(i) == 1 && vis(i) == 0) {
                  mq.encode(magCtx(x, y), bit(i))
                  ref(i) = 1
                }
                y += 1
              }
              x += 1
            }
            y0 += 4
          }
        } else {
          var y0 = 0
          while (y0 < h) {
            causalLim = if (causal) y0 + 4 else Int.MaxValue
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
              var skip = false
              if (runnable) {
                var first = -1
                var k = 0
                while (first < 0 && k < 4) {
                  if (bit((y0 + k) * w + x) == 1) first = k
                  k += 1
                }
                if (first < 0) { mq.encode(CxRl, 0); skip = true }
                else {
                  mq.encode(CxRl, 1)
                  mq.encode(CxUni, (first >> 1) & 1)
                  mq.encode(CxUni, first & 1)
                  encodeSign(x, y0 + first)
                  y = y0 + first + 1
                }
              }
              if (!skip) {
                var yy = y
                while (yy < ylim) {
                  val i = yy * w + x
                  if (sig(i) == 0 && vis(i) == 0) {
                    val (hh, vv, dd) = hvd(x, yy)
                    mq.encode(sigCtx(band, hh, vv, dd), bit(i))
                    if (bit(i) == 1) encodeSign(x, yy)
                  }
                  yy += 1
                }
              }
              x += 1
            }
            y0 += 4
          }
          if ((style & 0x20) != 0) {
            // segmentation symbol: 1010 on the UNI context ends
            // every cleanup pass (T.800 D.6)
            mq.encode(CxUni, 1); mq.encode(CxUni, 0)
            mq.encode(CxUni, 1); mq.encode(CxUni, 0)
          }
          java.util.Arrays.fill(vis, 0)
        }
        causalLim = Int.MaxValue
        npasses += 1
      }
      p -= 1
    }
    (mq.flush(), nplanes, npasses)
  }

  // --------------------------------------------------- forward DWT

  private def fwd53(x: Array[Int]): (Array[Int], Array[Int]) = {
    val n = x.length
    if (n == 1) return (x.clone(), Array.emptyIntArray)
    def xe(i0: Int): Int = {
      var i = i0
      if (i < 0) i = -i
      if (i >= n) i = 2 * (n - 1) - i
      x(i)
    }
    val nl = (n + 1) / 2
    val nh = n / 2
    val hi = new Array[Int](nh)
    val lo = new Array[Int](nl)
    var k = 0
    while (k < nh) {
      hi(k) = xe(2 * k + 1) - ((xe(2 * k) + xe(2 * k + 2)) >> 1)
      k += 1
    }
    def he(k0: Int): Int = {
      var k1 = k0
      if (k1 < 0) k1 = -k1 - 1
      if (k1 >= nh) k1 = 2 * nh - 1 - k1
      if (nh == 0) 0 else hi(k1)
    }
    k = 0
    while (k < nl) {
      lo(k) = if (nh > 0) xe(2 * k) + ((he(k - 1) + he(k) + 2) >> 2) else xe(2 * k)
      k += 1
    }
    (lo, hi)
  }

  /** One 2D analysis level (rows then columns, mirrored by the
    * decoder's columns-then-rows synthesis). Returns
    * (ll, hl, lh, hh, loW, loH, hiW, hiH).
    */
  private def fwd53_2d(img: Array[Int], w: Int, h: Int)
      : (Array[Int], Array[Int], Array[Int], Array[Int], Int, Int, Int, Int) = {
    val loW = (w + 1) / 2
    val hiW = w / 2
    val rl = Array.ofDim[Int](h, loW)
    val rh = Array.ofDim[Int](h, hiW)
    var y = 0
    while (y < h) {
      val (lo, hi) = fwd53(java.util.Arrays.copyOfRange(img, y * w, (y + 1) * w))
      rl(y) = lo
      rh(y) = hi
      y += 1
    }
    val loH = (h + 1) / 2
    val hiH = h / 2
    val ll = new Array[Int](loW * loH)
    val lh = new Array[Int](loW * hiH)
    val hl = new Array[Int](hiW * loH)
    val hh = new Array[Int](hiW * hiH)
    var x = 0
    while (x < loW) {
      val (lo, hi) = fwd53(Array.tabulate(h)(rl(_)(x)))
      var k = 0
      while (k < loH) { ll(k * loW + x) = lo(k); k += 1 }
      k = 0
      while (k < hiH) { lh(k * loW + x) = hi(k); k += 1 }
      x += 1
    }
    x = 0
    while (x < hiW) {
      val (lo, hi) = fwd53(Array.tabulate(h)(rh(_)(x)))
      var k = 0
      while (k < loH) { hl(k * hiW + x) = lo(k); k += 1 }
      k = 0
      while (k < hiH) { hh(k * hiW + x) = hi(k); k += 1 }
      x += 1
    }
    (ll, hl, lh, hh, loW, loH, hiW, hiH)
  }

  // irreversible 9/7 lifting constants (T.800 Table F.4) — identical
  // literals to Jpeg2k's inverse and tools/j2k.py
  private val K97 = 1.230174104914001
  private val IK97 = 1.0 / K97
  private val A97 = -1.586134342059924
  private val B97 = -0.052980118572961
  private val G97 = 0.882911075530934
  private val D97 = 0.443506852043971

  /** Forward 9/7 on an origin-0 signal: lifting then the lo×(1/K) /
    * hi×K normalization (low-pass DC gain 1, high-pass Nyquist 2).
    */
  private def fwd97(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    if (n == 1) return (x.clone(), Array.emptyDoubleArray)
    val y = x.clone()
    def ref(j0: Int): Int = {
      val p = 2 * (n - 1)
      var k = Math.floorMod(j0, p)
      if (k >= n) k = p - k
      k
    }
    var j = 1
    while (j < n) { y(j) += A97 * (y(ref(j - 1)) + y(ref(j + 1))); j += 2 }
    j = 0
    while (j < n) { y(j) += B97 * (y(ref(j - 1)) + y(ref(j + 1))); j += 2 }
    j = 1
    while (j < n) { y(j) += G97 * (y(ref(j - 1)) + y(ref(j + 1))); j += 2 }
    j = 0
    while (j < n) { y(j) += D97 * (y(ref(j - 1)) + y(ref(j + 1))); j += 2 }
    j = 0
    while (j < n) { y(j) *= (if ((j & 1) == 0) IK97 else K97); j += 1 }
    val lo = Array.tabulate((n + 1) / 2)(k => y(2 * k))
    val hi = Array.tabulate(n / 2)(k => y(2 * k + 1))
    (lo, hi)
  }

  private def fwd97_2d(img: Array[Double], w: Int, h: Int)
      : (Array[Double], Array[Double], Array[Double], Array[Double], Int, Int, Int, Int) = {
    val loW = (w + 1) / 2
    val hiW = w / 2
    val rl = Array.ofDim[Double](h, loW)
    val rh = Array.ofDim[Double](h, hiW)
    var y = 0
    while (y < h) {
      val (lo, hi) = fwd97(java.util.Arrays.copyOfRange(img, y * w, (y + 1) * w))
      rl(y) = lo
      rh(y) = hi
      y += 1
    }
    val loH = (h + 1) / 2
    val hiH = h / 2
    val ll = new Array[Double](loW * loH)
    val lh = new Array[Double](loW * hiH)
    val hl = new Array[Double](hiW * loH)
    val hh = new Array[Double](hiW * hiH)
    var x = 0
    while (x < loW) {
      val (lo, hi) = fwd97(Array.tabulate(h)(rl(_)(x)))
      var k = 0
      while (k < loH) { ll(k * loW + x) = lo(k); k += 1 }
      k = 0
      while (k < hiH) { lh(k * loW + x) = hi(k); k += 1 }
      x += 1
    }
    x = 0
    while (x < hiW) {
      val (lo, hi) = fwd97(Array.tabulate(h)(rh(_)(x)))
      var k = 0
      while (k < loH) { hl(k * hiW + x) = lo(k); k += 1 }
      k = 0
      while (k < hiH) { hh(k * hiW + x) = hi(k); k += 1 }
      x += 1
    }
    (ll, hl, lh, hh, loW, loH, hiW, hiH)
  }

  // ---------------------------------------------- header bit writer

  private final class HdrWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    private var cap = 8
    def bit(b: Int): Unit = {
      cur = (cur << 1) | b
      nb += 1
      if (nb == cap) {
        out.write(cur)
        cap = if (cur == 0xff) 7 else 8
        cur = 0; nb = 0
      }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(if (i < 32) (v >> i) & 1 else 0); i -= 1 }
    }
    def finish(): Array[Byte] = {
      while (nb != 0) bit(0)
      val b = out.toByteArray
      if (b.nonEmpty && (b(b.length - 1) & 0xff) == 0xff) b :+ 0x00.toByte
      else b
    }
  }

  /** Encoder-side tag tree (jasper-style low/known). */
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
    private val value = new Array[Int](base.last)
    private val low = new Array[Int](base.last)
    private val known = new Array[Boolean](base.last)

    def setValues(leaf: Seq[Int]): Unit = {
      leaf.copyToArray(value)
      for (lev <- 1 until dims.length) {
        val (pw, ph) = dims(lev - 1)
        val (w, h) = dims(lev)
        for (y <- 0 until h; x <- 0 until w) {
          var mn = Int.MaxValue
          for (dy <- 0 until 2; dx <- 0 until 2) {
            val cx = 2 * x + dx
            val cy = 2 * y + dy
            if (cx < pw && cy < ph)
              mn = math.min(mn, value(base(lev - 1) + cy * pw + cx))
          }
          value(base(lev) + y * w + x) = mn
        }
      }
    }

    /** Emit bits for leaf (x,y) at `threshold`; true iff value < t. */
    def encode(hw: HdrWriter, x: Int, y: Int, threshold: Int): Boolean = {
      var lowBound = 0
      var lev = dims.length - 1
      while (lev >= 0) {
        val i = base(lev) + (y >> lev) * dims(lev)._1 + (x >> lev)
        if (low(i) < lowBound) low(i) = lowBound else lowBound = low(i)
        var go = lowBound < threshold
        while (go) {
          if (lowBound >= value(i)) {
            if (!known(i)) { hw.bit(1); known(i) = true }
            go = false
          } else {
            hw.bit(0)
            lowBound += 1
            go = lowBound < threshold
          }
        }
        low(i) = lowBound
        lev -= 1
      }
      value(base(0) + y * dims(0)._1 + x) < threshold
    }
  }

  private def writeNPasses(hw: HdrWriter, np: Int): Unit =
    if (np == 1) hw.bit(0)
    else if (np == 2) hw.bits(2, 2)
    else if (np <= 5) { hw.bits(3, 2); hw.bits(np - 3, 2) }
    else if (np <= 36) { hw.bits(0xf, 4); hw.bits(np - 6, 5) }
    else { hw.bits(0x1ff, 9); hw.bits(np - 37, 7) }

  // ----------------------------------------------------------- encode

  /** Encode 1 (gray) or 3 (RGB, `mct` = reversible color transform)
    * planes; planes are row-major w x h, values in [0, 2^prec) (or
    * signed two-sided when `signed`).
    */
  def encode(planes: Seq[Array[Int]], w: Int, h: Int, prec: Int,
      signed: Boolean = false, levels: Int = 2, cbw: Int = 32,
      cbh: Int = 32, mct: Boolean = false, sop: Boolean = false,
      eph: Boolean = false, transform: String = "53",
      quant: Option[(Int, Int)] = None, cbstyle: Int = 0): Array[Byte] = {
    val ncomp = planes.length
    require(ncomp == 1 || ncomp == 3, s"jpeg2000-enc: $ncomp components")
    require(!mct || ncomp == 3, "jpeg2000-enc: MCT needs 3 components")
    require(levels >= 1 && levels <= 6 && cbw >= 4 && cbw <= 64 &&
      cbh >= 4 && cbh <= 64, "jpeg2000-enc: bad parameters")
    require(transform == "53" || transform == "97",
      s"jpeg2000-enc: transform $transform")
    // this encoder implements the CAUSAL (0x08) and SEGSYM (0x20)
    // code-block styles; bypass/reset/restart are decode-only
    // surfaces pinned by the independent Python encoder's fixtures
    require((cbstyle & ~0x28) == 0,
      f"jpeg2000-enc: code-block style 0x$cbstyle%02X unsupported (CAUSAL|SEGSYM only)")
    val lossy = transform == "97"
    // irreversible 9/7 quantizes (scalar expounded, (e0, mu0) —
    // uniform step 2^(prec-e0)*(1+mu0/2048)); reversible 5/3 must not
    require(lossy == quant.nonEmpty, "jpeg2000-enc: quant iff 9/7")
    planes.foreach(p => require(p.length == w * h, "jpeg2000-enc: plane != w*h"))
    val shift = if (signed) 0 else 1 << (prec - 1)

    // per-comp forward DWT; band data per resolution r: 0=LL, then
    // (HL, LH, HH) per level from coarsest to finest. The lossy path
    // runs double 9/7 (after ICT) and dead-zone-quantizes each band
    // to the SAME integer structure the Tier-1 coder consumes.
    val gainOf = (r: Int, bi: Int) => if (r == 0) 0 else if (bi == 2) 2 else 1
    val deltaOf = (r: Int, bi: Int) => {
      val (e0, mu0) = quant.get
      val gain = gainOf(r, bi)
      val eps = e0 + gain
      math.pow(2.0, (prec + gain) - eps) * (1.0 + mu0 / 2048.0)
    }
    val compBands: IndexedSeq[Seq[Seq[(Array[Int], Int, Int)]]] = if (!lossy) {
      var comps = planes.map(_.map(_ - shift)).toIndexedSeq
      if (mct) {
        val n = w * h
        val yy = new Array[Int](n)
        val uu = new Array[Int](n)
        val vv = new Array[Int](n)
        var i = 0
        while (i < n) {
          val r = comps(0)(i); val g = comps(1)(i); val b = comps(2)(i)
          yy(i) = (r + 2 * g + b) >> 2
          uu(i) = b - g
          vv(i) = r - g
          i += 1
        }
        comps = IndexedSeq(yy, uu, vv)
      }
      comps.map { plane =>
        var cur = plane
        var cw = w
        var ch = h
        val stack = new scala.collection.mutable.ArrayBuffer[Seq[(Array[Int], Int, Int)]]
        (0 until levels).foreach { _ =>
          val (ll, hl, lh, hh, loW, loH, hiW, hiH) = fwd53_2d(cur, cw, ch)
          stack += Seq((hl, hiW, loH), (lh, loW, hiH), (hh, hiW, hiH))
          cur = ll; cw = loW; ch = loH
        }
        Seq(Seq((cur, cw, ch))) ++ stack.reverse
      }
    } else {
      var comps = planes.map(_.map(v => (v - shift).toDouble)).toIndexedSeq
      if (mct) {
        val n = w * h
        val yy = new Array[Double](n)
        val uu = new Array[Double](n)
        val vv = new Array[Double](n)
        var i = 0
        while (i < n) {
          val r = comps(0)(i); val g = comps(1)(i); val b = comps(2)(i)
          yy(i) = 0.299 * r + 0.587 * g + 0.114 * b
          uu(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
          vv(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
          i += 1
        }
        comps = IndexedSeq(yy, uu, vv)
      }
      def q(coefs: Array[Double], r: Int, bi: Int): Array[Int] = {
        val d = deltaOf(r, bi)
        coefs.map(v => if (v >= 0) (v / d).toInt else -((-v / d).toInt))
      }
      comps.map { plane =>
        var cur = plane
        var cw = w
        var ch = h
        val stack = new scala.collection.mutable.ArrayBuffer[Seq[(Array[Int], Int, Int)]]
        var r = levels
        (0 until levels).foreach { _ =>
          val (ll, hl, lh, hh, loW, loH, hiW, hiH) = fwd97_2d(cur, cw, ch)
          stack += Seq((q(hl, r, 0), hiW, loH), (q(lh, r, 1), loW, hiH),
            (q(hh, r, 2), hiW, hiH))
          cur = ll; cw = loW; ch = loH
          r -= 1
        }
        Seq(Seq((q(cur, 0, 0), cw, ch))) ++ stack.reverse
      }
    }

    // Tier-1 everything; shared QCD Mb = max over comps per band slot
    // coded(r)(c) = seq of (nx, ny, cbs[(bytes, npl, nps)])
    val nres = levels + 1
    val coded = Array.ofDim[Seq[(Int, Int, Seq[(Array[Byte], Int, Int)])]](nres, ncomp)
    val bandMb = Seq.newBuilder[Int]
    for (r <- 0 until nres) {
      val nBands = compBands.head(r).length
      val mx = Array.fill(nBands)(1)
      for (c <- 0 until ncomp) {
        val rb = compBands(c)(r).zipWithIndex.map { case ((coefs, bw, bh), bi) =>
          // band order per resolution: HL (orient 1), LH (0), HH (2)
          val orient2 = if (r == 0) 0 else (if (bi == 0) 1 else if (bi == 1) 0 else 2)
          val nx = if (bw == 0) 0 else (bw + cbw - 1) / cbw
          val ny = if (bh == 0) 0 else (bh + cbh - 1) / cbh
          val cbs = (0 until nx * ny).map { i =>
            val x0 = (i % nx) * cbw
            val y0 = (i / nx) * cbh
            val cw2 = math.min(cbw, bw - x0)
            val ch2 = math.min(cbh, bh - y0)
            val sub = Array.tabulate(cw2 * ch2) { j =>
              coefs((y0 + j / cw2) * bw + x0 + j % cw2)
            }
            val (bytes, npl, nps) = t1Encode(orient2, sub, cw2, ch2, cbstyle)
            mx(bi) = math.max(mx(bi), npl)
            (bytes, npl, nps)
          }
          (nx, ny, cbs)
        }
        coded(r)(c) = rb
      }
      mx.foreach(bandMb += _)
    }
    val mbs =
      if (!lossy) bandMb.result()
      else {
        val (e0, _) = quant.get
        // Mb = G + eps_b - 1 is FIXED by the signaled exponents; the
        // quantized coefficient magnitudes must fit inside it
        val fixed = (0 until nres).flatMap { r =>
          val nB = if (r == 0) 1 else 3
          (0 until nB).map(bi => Guard + (e0 + gainOf(r, bi)) - 1)
        }
        bandMb.result().zip(fixed).zipWithIndex.foreach { case ((got, mb), i) =>
          require(got <= mb, s"jpeg2000-enc: band $i magnitude $got exceeds Mb $mb")
        }
        fixed
      }

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def w32(v: Int): Unit = { w16(v >>> 16); w16(v) }
    w16(0xff4f) // SOC
    w16(0xff51) // SIZ
    w16(38 + 3 * ncomp)
    w16(0)
    w32(w); w32(h); w32(0); w32(0); w32(w); w32(h); w32(0); w32(0)
    w16(ncomp)
    (0 until ncomp).foreach { _ =>
      w8((prec - 1) | (if (signed) 0x80 else 0)); w8(1); w8(1)
    }
    w16(0xff52) // COD
    w16(12)
    w8((if (sop) 2 else 0) | (if (eph) 4 else 0))
    w8(0); w16(1); w8(if (mct) 1 else 0)
    w8(levels)
    w8((31 - Integer.numberOfLeadingZeros(cbw)) - 2)
    w8((31 - Integer.numberOfLeadingZeros(cbh)) - 2)
    // code-block style (Table A.19); transform per T.800 Table A.20
    // (0 = the irreversible 9/7, 1 = reversible 5/3)
    w8(cbstyle); w8(if (lossy) 0 else 1)
    w16(0xff5c) // QCD
    if (!lossy) {
      w16(3 + mbs.length)
      w8((Guard << 5) | 0)
      mbs.foreach { mb =>
        val eps = mb - Guard + 1
        require(eps >= 0 && eps < 32, s"jpeg2000-enc: epsilon $eps")
        w8((eps & 0x1f) << 3)
      }
    } else {
      // scalar expounded: one 16-bit (eps, mu) pair per band
      val (e0, mu0) = quant.get
      w16(3 + 2 * mbs.length)
      w8((Guard << 5) | 2)
      (0 until nres).foreach { r =>
        val nB = if (r == 0) 1 else 3
        (0 until nB).foreach { bi =>
          val eps = e0 + gainOf(r, bi)
          require(eps >= 0 && eps < 32 && mu0 >= 0 && mu0 < 2048,
            s"jpeg2000-enc: quant ($eps, $mu0)")
          w16((eps << 11) | mu0)
        }
      }
    }

    val body = new java.io.ByteArrayOutputStream()
    var packetSeq = 0
    for (r <- 0 until nres; c <- 0 until ncomp) {
      if (sop) {
        body.write(0xff); body.write(0x91)
        body.write(0); body.write(4)
        body.write((packetSeq >> 8) & 0xff); body.write(packetSeq & 0xff)
        packetSeq = (packetSeq + 1) & 0xffff
      }
      val rb = coded(r)(c)
      val hw = new HdrWriter
      val nonEmpty = rb.exists(_._3.exists(_._2 > 0))
      hw.bit(if (nonEmpty) 1 else 0)
      val payloads = Seq.newBuilder[Array[Byte]]
      if (nonEmpty) {
        rb.zipWithIndex.foreach { case ((nx, ny, cbs), bi) =>
          if (nx > 0 && ny > 0) {
            val idx = if (r == 0) 0 else 1 + 3 * (r - 1) + bi
            val mb = mbs(idx)
            val incl = new TagTree(nx, ny)
            val zbp = new TagTree(nx, ny)
            incl.setValues(cbs.map(cb => if (cb._2 > 0) 0 else 1))
            zbp.setValues(cbs.map(cb => if (cb._2 > 0) mb - cb._2 else 0))
            cbs.zipWithIndex.foreach { case ((bytes, npl, nps), i) =>
              val gx = i % nx
              val gy = i / nx
              val included = incl.encode(hw, gx, gy, 1)
              if (included) {
                var t = 1
                while (!zbp.encode(hw, gx, gy, t)) t += 1
                writeNPasses(hw, nps)
                var lblock = 3
                var nbits = lblock + (31 - Integer.numberOfLeadingZeros(nps))
                while (bytes.length >= (1 << nbits)) {
                  hw.bit(1); lblock += 1; nbits += 1
                }
                hw.bit(0)
                hw.bits(bytes.length, nbits)
                payloads += bytes
              }
            }
          }
        }
      }
      body.write(hw.finish())
      if (eph) { body.write(0xff); body.write(0x92) }
      payloads.result().foreach(body.write)
    }

    val bodyBytes = body.toByteArray
    w16(0xff90) // SOT
    w16(10)
    w16(0)
    w32(12 + 2 + bodyBytes.length)
    w8(0); w8(1)
    w16(0xff93) // SOD
    out.write(bodyBytes)
    w16(0xffd9) // EOC
    out.toByteArray
  }
}
