package graft.operators

/** Pure-JVM 8/12-bit sequential DCT JPEG decoder (ITU-T T.81
  * processes 1, 2 & 4 — SOF0/SOF1) for single-component grayscale
  * frames: the 12-bit mode behind DICOM transfer syntax
  * 1.2.840.10008.1.2.4.51 (JPEG Extended), which 12-bit CT exports
  * use and which `javax.imageio` cannot decode. The reference
  * delegates these to ITK/GDCM native codecs
  * (`py/ngff_zarr/detect_cli_io_backend.py:21`).
  *
  * Spec-complete for the scope: DQT (8- and 16-bit entries), DHT
  * (DC + AC tables), DC difference categories, AC run/size coding
  * with ZRL/EOB, dequantization, and a deterministic double-precision
  * IDCT whose cosine table is rounded to a 2^-20 grid — the
  * independent pure-Python encoder (`tools/make_jpegext_fixture.py`)
  * computes its reconstructions with the SAME table and rounding, so
  * the spec asserts exact parity on a lossy codec. Multi-component
  * scans, progressive/arithmetic modes, and restart intervals refuse
  * loudly.
  */
object JpegExtended {

  final case class JextImage(width: Int, height: Int, precision: Int,
      samples: Array[Int])

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)uπ/16) rounded to 2^-20 — matches the fixture
    * encoder's table exactly, making the float IDCT deterministic
    * across implementations.
    */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    math.round(math.cos((2 * x + 1) * u * math.Pi / 16) * (1 << 20))
      .toDouble / (1 << 20)
  }
  private val Cq: Array[Double] = Array.tabulate(8) { u =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    math.round(c * (1 << 20)).toDouble / (1 << 20)
  }

  private final class Huffman(counts: Array[Int], values: Array[Int]) {
    private val minCode = new Array[Int](16)
    private val maxCode = Array.fill(16)(-1)
    private val valPtr = new Array[Int](16)
    locally {
      var code = 0
      var k = 0
      var l = 0
      while (l < 16) {
        if (counts(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l)
          k += counts(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = in.readBit()
      var l = 0
      while (maxCode(l) < 0 || code > maxCode(l)) {
        require(l < 15, "jpeg-ext: invalid Huffman code (corrupt stream)")
        code = (code << 1) | in.readBit()
        l += 1
      }
      values(valPtr(l) + code - minCode(l))
    }
  }

  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var cur = 0
    private var avail = 0
    def readBit(): Int = {
      if (avail == 0) {
        require(pos < b.length, "jpeg-ext: entropy stream truncated")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < b.length, "jpeg-ext: dangling 0xFF at stream end")
          val nxt = b(pos) & 0xff
          require(nxt == 0x00,
            f"jpeg-ext: marker 0xFF$nxt%02X inside scan (restart markers unsupported)")
          pos += 1
          v = 0xff
        }
        cur = v; avail = 8
      }
      avail -= 1
      (cur >> avail) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  private def extend(extra: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (extra < (1 << (cat - 1))) extra - (1 << cat) + 1
    else extra

  def decode(bytes: Array[Byte]): JextImage = {
    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    require(bytes.length > 4 && u16(0) == 0xffd8, "jpeg-ext: missing SOI")
    var p = 2
    var width = -1; var height = -1; var prec = -1
    var quant = Map.empty[Int, Array[Int]] // natural order
    var dcTabs = Map.empty[Int, Huffman]
    var acTabs = Map.empty[Int, Huffman]
    var dcId = -1; var acId = -1; var tqId = 0
    var scanStart = -1
    while (scanStart < 0) {
      require(p + 4 <= bytes.length && (bytes(p) & 0xff) == 0xff,
        "jpeg-ext: expected a marker segment")
      val m = bytes(p + 1) & 0xff
      require(m != 0xd9, "jpeg-ext: EOI before SOS")
      val len = u16(p + 2)
      m match {
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
          prec = bytes(p + 4) & 0xff
          height = u16(p + 5); width = u16(p + 7)
          val ncomp = bytes(p + 9) & 0xff
          require(ncomp == 1,
            s"jpeg-ext: $ncomp components unsupported (grayscale only)")
          tqId = bytes(p + 12) & 0xff // component's quant-table selector
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"jpeg-ext: SOF marker 0xFF$m%02X is not sequential DCT (SOF0/SOF1)")
        case 0xdb => // DQT: possibly several tables
          var q = p + 4
          while (q < p + 2 + len) {
            val pqTq = bytes(q) & 0xff
            val wide = (pqTq >> 4) == 1
            val tbl = new Array[Int](64)
            var k = 0
            while (k < 64) {
              tbl(Zigzag(k)) =
                if (wide) ((bytes(q + 1 + 2 * k) & 0xff) << 8) |
                  (bytes(q + 2 + 2 * k) & 0xff)
                else bytes(q + 1 + k) & 0xff
              k += 1
            }
            quant += (pqTq & 0x0f) -> tbl
            q += 1 + (if (wide) 128 else 64)
          }
        case 0xc4 => // DHT
          var q = p + 4
          while (q < p + 2 + len) {
            val classId = bytes(q) & 0xff
            val counts = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
            val nv = counts.sum
            val values = Array.tabulate(nv)(i => bytes(q + 17 + i) & 0xff)
            val h = new Huffman(counts, values)
            if ((classId >> 4) == 0) dcTabs += (classId & 0x0f) -> h
            else acTabs += (classId & 0x0f) -> h
            q += 17 + nv
          }
        case 0xdd => throw new UnsupportedOperationException(
          "jpeg-ext: restart intervals (DRI) unsupported")
        case 0xda =>
          val ns = bytes(p + 4) & 0xff
          require(ns == 1, "jpeg-ext: interleaved scans unsupported")
          dcId = (bytes(p + 6) & 0xff) >> 4
          acId = bytes(p + 6) & 0x0f
          scanStart = p + 2 + len
        case _ => () // APPn/COM
      }
      if (scanStart < 0) p += 2 + len
    }
    require(width > 0 && height > 0 && (prec == 8 || prec == 12),
      s"jpeg-ext: bad frame header ${width}x$height @ $prec bits")
    val qt = quant.getOrElse(tqId,
      throw new IllegalArgumentException(s"jpeg-ext: missing quantization table $tqId"))
    val dc = dcTabs.getOrElse(dcId,
      throw new IllegalArgumentException(s"jpeg-ext: undefined DC table $dcId"))
    val ac = acTabs.getOrElse(acId,
      throw new IllegalArgumentException(s"jpeg-ext: undefined AC table $acId"))

    val in = new BitReader(bytes, scanStart)
    val maxval = (1 << prec) - 1
    val shift = 1 << (prec - 1)
    val out = new Array[Int](width * height)
    val coef = new Array[Int](64)
    var pred = 0
    val bh = (height + 7) / 8
    val bw = (width + 7) / 8
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(coef, 0)
        val cat = dc.decode(in)
        require(cat <= 15, s"jpeg-ext: DC category $cat invalid")
        pred += extend(if (cat == 0) 0 else in.readBits(cat), cat)
        coef(0) = pred * qt(0)
        var k = 1
        while (k < 64) {
          val rs = ac.decode(in)
          if (rs == 0x00) k = 64 // EOB
          else if (rs == 0xf0) k += 16 // ZRL
          else {
            k += rs >> 4
            require(k < 64, "jpeg-ext: AC run past block end")
            val size = rs & 0x0f
            val nat = Zigzag(k)
            coef(nat) = extend(in.readBits(size), size) * qt(nat)
            k += 1
          }
        }
        // deterministic IDCT (same table + rounding as the encoder)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var s = 0.0
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                val c = coef(u * 8 + v)
                if (c != 0) s += Cq(u) * Cq(v) * c * Cos(u)(y) * Cos(v)(x)
                v += 1
              }
              u += 1
            }
            val yy = by * 8 + y
            val xx = bx * 8 + x
            if (yy < height && xx < width) {
              val px = math.floor(0.25 * s + 0.5).toInt + shift
              out(yy * width + xx) =
                if (px < 0) 0 else if (px > maxval) maxval else px
            }
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    JextImage(width, height, prec, out)
  }
}
