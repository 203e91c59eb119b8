package graft.zarr

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import NumcodecsFilters._

/** Zarr v2 numcodecs filter decode (NumcodecsFilters.scala). No
  * numcodecs binding exists in this environment, so each test encodes
  * by hand per the PUBLIC numcodecs semantics (delta = first value +
  * successive diffs in astype; fixedscaleoffset = round((x-offset)*scale)
  * as integer astype; shuffle = byte transpose) and asserts our decode
  * inverts it.
  */
class NumcodecsFiltersSpec extends AnyFunSuite {

  private def i4le(vals: Seq[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vals.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putInt)
    bb.array()
  }

  private def i2le(vals: Seq[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vals.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  test("delta int32 cumsums back to the source values") {
    val src = Seq(100, 97, 103, 103, 50, -20)
    val diffs = src.head +: src.sliding(2).map(p => p(1) - p(0)).toSeq
    val got = decodeToDoubles(i4le(diffs), Seq(DeltaF("<i4", "<i4")), "<i4")
    assert(got.toSeq == src.map(_.toDouble))
  }

  test("delta uint8 wraps modulo 256 like numpy") {
    // 10 → 4 is a diff of -6, stored as 250 in uint8; cumsum must wrap
    val src = Seq(10, 4, 200, 3)
    val diffs = Seq(10, 250, 196, 59) // (4-10)&0xff, (200-4)&0xff, (3-200)&0xff
    val raw = diffs.map(_.toByte).toArray
    val got = decodeToDoubles(raw, Seq(DeltaF("|u1", "|u1")), "|u1")
    assert(got.toSeq == src.map(_.toDouble))
  }

  test("fixedscaleoffset recovers values to 1/scale precision") {
    val src = Seq(1000.12, 1000.55, 999.86, 1001.0)
    val scale = 100.0
    val offset = 1000.0
    val enc = src.map(x => math.round((x - offset) * scale).toInt)
    val got = decodeToDoubles(i2le(enc),
      Seq(FixedScaleOffsetF(scale, offset, "<f8", "<i2")), "<f8")
    src.zip(got).foreach { case (x, g) => assert(math.abs(x - g) <= 0.5 / scale + 1e-12) }
  }

  test("shuffle byte-transpose inverts, with leftover passthrough") {
    val vals = Seq(0x01020304, 0x05060708, 0x090a0b0c)
    val plain = i4le(vals)
    val n = vals.length
    val shuffled = new Array[Byte](plain.length)
    for (i <- 0 until n; j <- 0 until 4) shuffled(j * n + i) = plain(i * 4 + j)
    val got = decodeToDoubles(shuffled, Seq(ShuffleF(4)), "<i4")
    assert(got.toSeq == vals.map(_.toDouble))
    // elementsize 1 is the identity
    val id = decodeToDoubles(plain, Seq(ShuffleF(1)), "<i4")
    assert(id.toSeq == vals.map(_.toDouble))
  }

  test("delta then shuffle chain (encode order) decodes reversed") {
    val src = Seq(7, 9, 6, 6, 12, 40, 41, 38)
    val diffs = src.head +: src.sliding(2).map(p => p(1) - p(0)).toSeq
    val plain = i4le(diffs)
    val n = diffs.length
    val shuffled = new Array[Byte](plain.length)
    for (i <- 0 until n; j <- 0 until 4) shuffled(j * n + i) = plain(i * 4 + j)
    val got = decodeToDoubles(shuffled,
      Seq(DeltaF("<i4", "<i4"), ShuffleF(4)), "<i4")
    assert(got.toSeq == src.map(_.toDouble))
  }

  test("delta with astype NARROWER than dtype wraps at the dtype span, not astype") {
    // numcodecs decode cumsums into an out array of DTYPE — numpy
    // wraps stored elements modulo the out span. Pinned against numpy
    // 1.26: uint8 diffs [10,250,196,59] into an int32 out give the
    // UNWRAPPED sums [10,260,456,515], NOT the mod-256 values.
    val raw = Seq(10, 250, 196, 59).map(_.toByte).toArray
    val got = decodeToDoubles(raw, Seq(DeltaF("<i4", "|u1")), "<i4")
    assert(got.toSeq == Seq(10.0, 260.0, 456.0, 515.0))
    // and into an int8 out they wrap at 2^8 signed (numpy: [10,4,-56,3])
    val got8 = decodeToDoubles(raw, Seq(DeltaF("|i1", "|u1")), "|i1")
    assert(got8.toSeq == Seq(10.0, 4.0, -56.0, 3.0))
  }

  test("quantize decode is an astype-aware identity") {
    val stored = Seq(1.25f, -3.5f, 0.0f, 7.75f)
    val bb = ByteBuffer.allocate(stored.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    stored.foreach(bb.putFloat)
    val got = decodeToDoubles(bb.array(), Seq(QuantizeF("<f8", "<f4")), "<f8")
    assert(got.toSeq == stored.map(_.toDouble))
  }

  test("astype casts the stored representation back") {
    val src = Seq(3, -120, 77)
    val got = decodeToDoubles(i2le(src), Seq(AsTypeF("<i2", "<i4")), "<i4")
    assert(got.toSeq == src.map(_.toDouble))
  }

  test("big-endian astype decodes per its own byte order") {
    val src = Seq(258, -2)
    val bb = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
    src.foreach(v => bb.putShort(v.toShort))
    val got = decodeToDoubles(bb.array(), Seq(AsTypeF(">i2", "<i4")), "<i4")
    assert(got.toSeq == src.map(_.toDouble))
  }

  test("encodedItemSize reflects the last value-domain filter") {
    assert(encodedItemSize(Nil, "<f8") == 8)
    assert(encodedItemSize(Seq(FixedScaleOffsetF(10, 0, "<f8", "<i2")), "<f8") == 2)
    assert(encodedItemSize(
      Seq(FixedScaleOffsetF(10, 0, "<f8", "<i2"), ShuffleF(2)), "<f8") == 2)
    assert(encodedItemSize(Seq(ShuffleF(8)), "<f8") == 8)
  }

  test("unknown filter id refuses at parse time") {
    val node = graft.meta.ZarrJson.mapper.readTree(
      """[{"id":"zlib-weirdo","foo":1}]""")
    assertThrows[UnsupportedOperationException](NumcodecsFilters.parse(node))
  }

  test("shuffle between value-domain filters refuses") {
    // encode order delta → shuffle → delta cannot be expressed in the
    // byte/value two-domain decode — must refuse, not garble
    val raw = i4le(Seq(1, 2, 3))
    assertThrows[IllegalArgumentException](decodeToDoubles(raw,
      Seq(DeltaF("<i4", "<i4"), ShuffleF(4), DeltaF("<i4", "<i4")), "<i4"))
  }
}
