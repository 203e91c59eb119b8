package graft.operators

/** Pure-JVM JPEG Lossless codec (ITU-T T.81 process 14, SOF3) — the
  * predictive Huffman-coded lossless mode behind the DICOM transfer
  * syntaxes 1.2.840.10008.1.2.4.57 and .70 (selection value 1), which
  * older clinical CT/MR archives still carry; the reference delegates
  * these to ITK/GDCM native codecs
  * (`py/ngff_zarr/detect_cli_io_backend.py:21`). Not to be confused
  * with JPEG-LS (ITU-T T.87, [[JpegLs]]) — this is the original 1992
  * lossless mode: seven spatial predictors, DC-style difference
  * categories with sign-extension bits, canonical Huffman tables,
  * FF00 byte stuffing, modulo-2^16 difference arithmetic.
  *
  * Scope: single-component scans, 2–16 bit precision, point transform
  * 0, no restart intervals. Multi-component scans and DRI refuse
  * loudly — DICOM grayscale frames are single-component here.
  *
  * Independent ground truth: `tools/make_jpeglossless_fixture.py`
  * encodes the spec from scratch in Python; `JpegLosslessSpec`
  * decodes its committed streams bit-exactly alongside Scala
  * encode→decode roundtrips over all seven predictors.
  */
object JpegLossless {

  final case class JloImage(width: Int, height: Int, precision: Int,
      predictor: Int, samples: Array[Int])

  /** One canonical Huffman table parsed from a DHT segment: decode by
    * walking code lengths with the canonical min/max code bounds.
    */
  private final class Huffman(counts: Array[Int], values: Array[Int]) {
    // minCode(l)/maxCode(l): canonical code range at length l+1;
    // valPtr(l): index of the first value of that length
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
        require(l < 15, "jpeg-lossless: invalid Huffman code (corrupt stream)")
        code = (code << 1) | in.readBit()
        l += 1
      }
      values(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first bit reader with JPEG FF00 byte stuffing: a 0x00 after
    * 0xFF is stuffing (skipped); any other byte after 0xFF is a
    * marker, which inside this scan means a refusal (no DRI/RST).
    */
  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var cur = 0
    private var avail = 0
    def readBit(): Int = {
      if (avail == 0) {
        require(pos < b.length, "jpeg-lossless: entropy stream truncated")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < b.length, "jpeg-lossless: dangling 0xFF at stream end")
          val nxt = b(pos) & 0xff
          require(nxt == 0x00,
            f"jpeg-lossless: marker 0xFF$nxt%02X inside scan (restart markers unsupported)")
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

  private def predict(out: Array[Int], w: Int, x: Int, y: Int, psv: Int,
      prec: Int): Int =
    if (y == 0 && x == 0) 1 << (prec - 1)
    else if (y == 0) out(x - 1) // first line falls back to predictor 1
    else if (x == 0) out((y - 1) * w) // first column to predictor 2
    else {
      val ra = out(y * w + x - 1)
      val rb = out((y - 1) * w + x)
      val rc = out((y - 1) * w + x - 1)
      psv match {
        case 1 => ra
        case 2 => rb
        case 3 => rc
        case 4 => ra + rb - rc
        case 5 => ra + ((rb - rc) >> 1)
        case 6 => rb + ((ra - rc) >> 1)
        case 7 => (ra + rb) >> 1
        case p => throw new IllegalArgumentException(
          s"jpeg-lossless: predictor selection $p invalid (1-7)")
      }
    }

  // ------------------------------------------------------------ decode

  def decode(bytes: Array[Byte]): JloImage = {
    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    require(bytes.length > 4 && u16(0) == 0xffd8, "jpeg-lossless: missing SOI")
    var p = 2
    var width = -1; var height = -1; var prec = -1
    var tables = Map.empty[Int, Huffman]
    var psv = -1; var tableId = -1
    var scanStart = -1
    while (scanStart < 0) {
      require(p + 4 <= bytes.length && (bytes(p) & 0xff) == 0xff,
        "jpeg-lossless: expected a marker segment")
      val m = bytes(p + 1) & 0xff
      require(m != 0xd9, "jpeg-lossless: EOI before SOS")
      val len = u16(p + 2)
      m match {
        case 0xc3 => // SOF3
          prec = bytes(p + 4) & 0xff
          height = u16(p + 5); width = u16(p + 7)
          val ncomp = bytes(p + 9) & 0xff
          require(ncomp == 1,
            s"jpeg-lossless: $ncomp components unsupported (single-component scans only)")
        case 0xc0 | 0xc1 | 0xc2 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"jpeg-lossless: SOF marker 0xFF$m%02X is not the lossless process (SOF3)")
        case 0xc4 => // DHT: possibly several tables in one segment
          var q = p + 4
          while (q < p + 2 + len) {
            val classId = bytes(q) & 0xff
            val counts = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
            val nv = counts.sum
            val values = Array.tabulate(nv)(i => bytes(q + 17 + i) & 0xff)
            require((classId >> 4) == 0,
              "jpeg-lossless: AC Huffman table in a lossless stream")
            tables += (classId & 0x0f) -> new Huffman(counts, values)
            q += 17 + nv
          }
        case 0xdd => throw new UnsupportedOperationException(
          "jpeg-lossless: restart intervals (DRI) unsupported")
        case 0xda => // SOS
          val ns = bytes(p + 4) & 0xff
          require(ns == 1, "jpeg-lossless: interleaved scans unsupported")
          tableId = (bytes(p + 6) & 0xff) >> 4
          psv = bytes(p + 7) & 0xff
          val al = bytes(p + 9) & 0x0f
          require(al == 0,
            s"jpeg-lossless: point transform $al unsupported (0 only)")
          scanStart = p + 2 + len
        case _ => () // APPn/COM: skip
      }
      if (scanStart < 0) p += 2 + len
    }
    require(width > 0 && height > 0 && prec >= 2 && prec <= 16,
      s"jpeg-lossless: bad frame header ${width}x$height @ $prec bits")
    require(psv >= 1 && psv <= 7, s"jpeg-lossless: predictor $psv invalid")
    val huff = tables.getOrElse(tableId,
      throw new IllegalArgumentException(
        s"jpeg-lossless: scan uses undefined Huffman table $tableId"))

    val in = new BitReader(bytes, scanStart)
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val cat = huff.decode(in)
        require(cat <= 16, s"jpeg-lossless: difference category $cat invalid")
        val diff =
          if (cat == 0) 0
          else if (cat == 16) 32768 // special: no extension bits
          else {
            val extra = in.readBits(cat)
            // sign extension: values below 2^(cat-1) encode negatives
            if (extra < (1 << (cat - 1))) extra - (1 << cat) + 1 else extra
          }
        out(y * width + x) =
          (predict(out, width, x, y, psv, prec) + diff) & 0xffff
        x += 1
      }
      y += 1
    }
    JloImage(width, height, prec, psv, out)
  }

  // ------------------------------------------------------------ encode

  /** All 17 category symbols at code length 5 — a valid canonical
    * table (max code 10000, never all-ones), deliberately simple:
    * the decode path is the product surface, this encoder feeds
    * fixtures and gates.
    */
  private val EncCounts: Array[Int] =
    Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncValues: Array[Int] = Array.tabulate(17)(identity)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nb += 1
        if (nb == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0; nb = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      while (nb != 0) writeBits(1, 1) // pad with 1s per T.81
      out.toByteArray
    }
  }

  def encode(samples: Array[Int], width: Int, height: Int, precision: Int,
      predictor: Int = 1): Array[Byte] = {
    require(samples.length == width * height, "jpeg-lossless: samples != w*h")
    require(precision >= 2 && precision <= 16,
      s"jpeg-lossless: precision $precision")
    require(predictor >= 1 && predictor <= 7,
      s"jpeg-lossless: predictor $predictor")
    val maxval = (1 << precision) - 1
    samples.foreach(v => require(v >= 0 && v <= maxval,
      s"jpeg-lossless: sample $v out of [0,$maxval]"))
    val bw = new BitWriter
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val px = predict(samples, width, x, y, predictor, precision)
        var diff = (samples(y * width + x) - px) & 0xffff
        if (diff >= 32768) diff -= 65536
        val cat =
          if (diff == -32768) 16
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff)) // bit length
        bw.writeBits(cat, 5) // canonical code of symbol `cat` IS `cat`
        if (cat > 0 && cat < 16) {
          val extra = if (diff >= 0) diff else diff + (1 << cat) - 1
          bw.writeBits(extra, cat)
        }
        x += 1
      }
      y += 1
    }
    val scan = bw.finish()

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    w16(0xffd8) // SOI
    w16(0xffc3); w16(11) // SOF3, 1 component
    out.write(precision); w16(height); w16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    w16(0xffc4); w16(2 + 1 + 16 + 17) // DHT class 0 id 0
    out.write(0x00)
    EncCounts.foreach(out.write)
    EncValues.foreach(out.write)
    w16(0xffda); w16(8) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(predictor); out.write(0); out.write(0)
    out.write(scan)
    w16(0xffd9) // EOI
    out.toByteArray
  }
}
