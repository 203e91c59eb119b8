package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Jpeg2k against committed fixtures from `tools/make_j2k_fixture.py`
  * — encodings by the independent pure-Python T.800 implementation
  * (`tools/j2k.py`, itself roundtrip-self-tested), so bit-exact
  * agreement is two separate readings of the published spec: MQ
  * coder, EBCOT Tier-1, tag-tree packet headers, 5/3 lifting.
  */
class Jpeg2kSpec extends AnyFunSuite {

  private val fx = "src/test/resources/fixtures/j2k"

  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fx/$name"))

  private def raw(name: String, prec: Int): Seq[Int] = {
    val b = bytes(name)
    if (prec > 8) b.grouped(2).map(p => ((p(0) & 0xff) << 8) | (p(1) & 0xff)).toSeq
    else b.map(_ & 0xff).toSeq
  }

  private def check(name: String, w: Int, h: Int, prec: Int): Unit = {
    val img = Jpeg2k.decode(bytes(s"$name.j2c"))
    assert((img.width, img.height, img.precision) == ((w, h, prec)), name)
    assert(img.samples.toSeq == raw(s"$name.raw", prec), name)
  }

  test("8-bit, 1 level, single code-blocks")(check("g8_l1", 19, 13, 8))
  test("8-bit, 3 levels, 16x16 code-block grids")(check("g8_l3", 37, 29, 8))
  test("12-bit, 2 levels")(check("g12_l2", 24, 16, 12))
  test("16-bit full range, 2 levels")(check("g16_l2", 11, 9, 16))
  test("constant image: empty-packet path")(check("flat_l2", 32, 32, 8))

  test("RGB with the reversible color transform (MCT) decodes exactly") {
    val img = Jpeg2k.decode(bytes("rgb_mct.j2c"))
    assert((img.width, img.height, img.precision, img.components) == ((21, 11, 8, 3)))
    assert(img.samples.toSeq == bytes("rgb_mct.raw").map(_ & 0xff).toSeq)
  }

  private def lcg(seed: Long): Iterator[Int] =
    Iterator.iterate(seed)(s => (s * 1103515245L + 12345L) & 0x7fffffffL)
      .drop(1).map(_.toInt)

  test("Scala encoder roundtrips: sizes, precisions, levels, code-blocks") {
    for ((w, h, prec, levels, cb, seed) <- Seq(
        (8, 8, 8, 1, 4, 1L), (13, 9, 8, 2, 8, 2L), (32, 24, 12, 2, 16, 3L),
        (21, 17, 16, 3, 8, 4L), (64, 48, 8, 2, 32, 5L), (1, 1, 8, 1, 4, 6L))) {
      val r = lcg(seed)
      val img = Array.tabulate(w * h)(_ => math.abs(r.next()) % (1 << prec))
      val dec = Jpeg2k.decode(Jpeg2kEncode.encode(Seq(img), w, h, prec,
        levels = levels, cbw = cb, cbh = cb))
      assert(dec.samples.toSeq == img.toSeq, s"${w}x$h@$prec L$levels cb$cb")
    }
  }

  test("Scala encoder roundtrips: signed component and RGB with/without MCT") {
    val r = lcg(21L)
    val simg = Array.tabulate(11 * 9)(_ => (math.abs(r.next()) % 256) - 128)
    val sdec = Jpeg2k.decode(Jpeg2kEncode.encode(Seq(simg), 11, 9, 8,
      signed = true, levels = 2, cbw = 8, cbh = 8))
    assert(sdec.signed && sdec.samples.toSeq == simg.toSeq)
    for (mct <- Seq(false, true)) {
      val r2 = lcg(if (mct) 31L else 32L)
      val planes = Seq.fill(3)(Array.tabulate(21 * 11)(_ => math.abs(r2.next()) % 256))
      val dec = Jpeg2k.decode(Jpeg2kEncode.encode(planes, 21, 11, 8,
        levels = 2, cbw = 8, cbh = 8, mct = mct))
      val want = Array.tabulate(21 * 11 * 3)(i => planes(i % 3)(i / 3))
      assert(dec.components == 3 && dec.samples.toSeq == want.toSeq, s"mct=$mct")
    }
  }

  test("SOP and EPH marker segments roundtrip") {
    val r = lcg(41L)
    val img = Array.tabulate(23 * 15)(_ => math.abs(r.next()) % 256)
    for ((sop, eph) <- Seq((true, false), (false, true), (true, true))) {
      val dec = Jpeg2k.decode(Jpeg2kEncode.encode(Seq(img), 23, 15, 8,
        levels = 2, cbw = 8, cbh = 8, sop = sop, eph = eph))
      assert(dec.samples.toSeq == img.toSeq, s"sop=$sop eph=$eph")
    }
  }

  test("semantics-changing markers refuse loudly (COC)") {
    // splice a COC (FF53) segment before SOT: skipping it would decode
    // silently-wrong pixels, so the decoder must refuse by name
    val good = bytes("g8_l1.j2c")
    val sot = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      (good(i + 1) & 0xff) == 0x90).get
    val coc = Array[Byte](0xff.toByte, 0x53, 0, 4, 0, 0)
    val spliced = good.take(sot) ++ coc ++ good.drop(sot)
    val e = intercept[UnsupportedOperationException](Jpeg2k.decode(spliced))
    assert(e.getMessage.contains("0xFF53"))
  }

  test("refusals: 9/7 transform, quantized, truncation") {
    val good = bytes("g8_l1.j2c")
    // COD transform byte: find the COD marker and flip the last byte
    def findMarker(m: Int): Int =
      good.indices.find(i => (good(i) & 0xff) == 0xff &&
        (good(i + 1) & 0xff) == (m & 0xff)).get
    val cod = findMarker(0x52)
    val codLen = ((good(cod + 2) & 0xff) << 8) | (good(cod + 3) & 0xff)
    val irr = good.clone()
    irr(cod + 2 + codLen - 1) = 1 // SPcod transform: 9/7
    val e1 = intercept[IllegalArgumentException](Jpeg2k.decode(irr))
    assert(e1.getMessage.contains("9/7"))
    val siz = findMarker(0x51)
    val multi = good.clone()
    multi(siz + 39) = 2 // Csiz = 2: neither gray nor RGB — refused
    assertThrows[IllegalArgumentException](Jpeg2k.decode(multi))
    assertThrows[Exception](Jpeg2k.decode(good.take(good.length / 2)))
  }
}
