package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** JpegLossless against committed fixtures from
  * `tools/make_jpeglossless_fixture.py` — an independent pure-Python
  * implementation of T.81 process 14 — plus Scala encode→decode
  * roundtrips over every predictor and edge precisions.
  */
class JpegLosslessSpec extends AnyFunSuite {

  private val fx = "src/test/resources/fixtures/jlo"

  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fx/$name"))

  private def u16be(raw: Array[Byte]): Seq[Int] =
    raw.grouped(2).map(p => ((p(0) & 0xff) << 8) | (p(1) & 0xff)).toSeq

  test("decodes the Python-encoded predictor-1 8-bit frame (DICOM SV1)") {
    val img = JpegLossless.decode(bytes("p1_8.jls16"))
    assert((img.width, img.height, img.precision, img.predictor) == ((23, 14, 8, 1)))
    assert(img.samples.toSeq == bytes("p1_8.raw").map(_ & 0xff).toSeq)
  }

  test("decodes the Python-encoded predictor-4 16-bit frame incl. category 16") {
    val img = JpegLossless.decode(bytes("p4_16.jls16"))
    assert((img.precision, img.predictor) == ((16, 4)))
    assert(img.samples.toSeq == u16be(bytes("p4_16.raw")))
  }

  test("decodes the Python-encoded predictor-7 12-bit ramps") {
    val img = JpegLossless.decode(bytes("p7_12.jls16"))
    assert((img.precision, img.predictor) == ((12, 7)))
    assert(img.samples.toSeq == u16be(bytes("p7_12.raw")))
  }

  private def lcg(seed: Long): Iterator[Int] =
    Iterator.iterate(seed)(s => (s * 1103515245L + 12345L) & 0x7fffffffL)
      .drop(1).map(_.toInt)

  test("roundtrip: every predictor on 8-bit noise + gradients") {
    val w = 19; val h = 11
    for (psv <- 1 to 7) {
      val r = lcg(100L + psv)
      val img = Array.tabulate(w * h) { i =>
        if (i % 3 == 0) (i * 5) % 256 else math.abs(r.next()) % 256
      }
      val dec = JpegLossless.decode(JpegLossless.encode(img, w, h, 8, psv))
      assert(dec.predictor == psv && dec.samples.toSeq == img.toSeq, s"psv $psv")
    }
  }

  test("roundtrip: 16-bit full swing (0 <-> 65535 adjacency = category 16)") {
    val w = 8; val h = 6
    val img = Array.tabulate(w * h)(i => if (i % 2 == 0) 0 else 65535)
    for (psv <- Seq(1, 4)) {
      val dec = JpegLossless.decode(JpegLossless.encode(img, w, h, 16, psv))
      assert(dec.samples.toSeq == img.toSeq, s"psv $psv")
    }
  }

  test("roundtrip: 1x1, 1xN, Nx1 degenerate shapes") {
    for ((w, h) <- Seq((1, 1), (9, 1), (1, 7))) {
      val img = Array.tabulate(w * h)(i => (i * 37) % 4096)
      val dec = JpegLossless.decode(JpegLossless.encode(img, w, h, 12, 4))
      assert(dec.samples.toSeq == img.toSeq, s"${w}x$h")
    }
  }

  test("refusals: non-lossless SOF, multi-component, DRI, truncation") {
    val good = JpegLossless.encode(Array.fill(4)(7), 2, 2, 8)
    val baseline = good.clone(); baseline(3) = 0xc0.toByte // SOF3 -> SOF0
    val eBase = intercept[IllegalArgumentException](JpegLossless.decode(baseline))
    assert(eBase.getMessage.contains("SOF3"))
    val multi = good.clone(); multi(11) = 3 // Nf at SOI(2)+marker(2)+len(2)+P(1)+Y(2)+X(2)
    assertThrows[IllegalArgumentException](JpegLossless.decode(multi))
    assertThrows[IllegalArgumentException](
      JpegLossless.decode(good.take(good.length - 4)))
  }
}
