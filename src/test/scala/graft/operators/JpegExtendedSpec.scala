package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** JpegExtended against committed fixtures from
  * `tools/make_jpegext_fixture.py` — an independent pure-Python
  * encoder of T.81 process 2&4 whose .raw files hold its OWN
  * reconstruction (dequant + the shared grid-rounded IDCT), so a
  * lossy codec still gets EXACT parity assertions — plus bounded
  * error against the original pixels where the math bounds it.
  */
class JpegExtendedSpec extends AnyFunSuite {

  private val fx = "src/test/resources/fixtures/jext"

  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fx/$name"))

  private def u16be(raw: Array[Byte]): Seq[Int] =
    raw.grouped(2).map(p => ((p(0) & 0xff) << 8) | (p(1) & 0xff)).toSeq

  test("12-bit uniform quadrants: exact reconstruction parity, DC-only error <= 1") {
    val img = JpegExtended.decode(bytes("flat12.jpg"))
    assert((img.width, img.height, img.precision) == ((32, 32, 12)))
    assert(img.samples.toSeq == u16be(bytes("flat12.raw")))
    // uniform 16x16 quadrants are DC-only: reconstruction error is
    // bounded by DC quantization rounding (q00=8 -> <= 1)
    val want = for (y <- 0 until 32; x <- 0 until 32)
      yield (if (y < 16) 1000 else 2500) + (if (x < 16) 0 else 700)
    img.samples.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) <= 1, s"pixel $i: $g vs $w")
    }
  }

  test("12-bit gradient + texture: exact reconstruction parity (AC/ZRL/EOB paths)") {
    val img = JpegExtended.decode(bytes("grad12.jpg"))
    assert((img.width, img.height, img.precision) == ((24, 16, 12)))
    assert(img.samples.toSeq == u16be(bytes("grad12.raw")))
  }

  test("refusals: progressive SOF, multi-component, truncation") {
    val good = bytes("flat12.jpg")
    val prog = good.clone()
    // SOF1 marker is the first 0xFFC1 in the stream
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc1).get
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](JpegExtended.decode(prog))
    assert(e.getMessage.contains("SOF0/SOF1"))
    val multi = good.clone()
    multi(sofAt + 9) = 3 // Nf: marker(2) + len(2) + P(1) + Y(2) + X(2)
    assertThrows[IllegalArgumentException](JpegExtended.decode(multi))
    assertThrows[IllegalArgumentException](
      JpegExtended.decode(good.take(good.length - 6)))
  }
}
