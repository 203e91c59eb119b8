package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** JpegLs against committed fixtures from
  * `tools/make_jpegls_fixture.py` — an independent pure-Python
  * implementation of ITU-T T.87, so an agreement here is two separate
  * readings of the published spec meeting bit-exactly — plus Scala
  * encode→decode roundtrips over adversarial synthetic frames.
  */
class JpegLsSpec extends AnyFunSuite {

  private val fx = "src/test/resources/fixtures/jls"

  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fx/$name"))

  test("decodes the Python-encoded 8-bit textured gradient") {
    val img = JpegLs.decode(bytes("g8.jls"))
    assert((img.width, img.height, img.precision, img.near) == ((29, 17, 8, 0)))
    val expect = bytes("g8.raw").map(_ & 0xff)
    assert(img.samples.toSeq == expect.toSeq)
  }

  test("decodes the Python-encoded 16-bit wide-range frame") {
    val img = JpegLs.decode(bytes("g16.jls"))
    assert((img.width, img.height, img.precision) == ((13, 11, 16)))
    val raw = bytes("g16.raw")
    val expect = raw.grouped(2).map(p => ((p(0) & 0xff) << 8) | (p(1) & 0xff)).toSeq
    assert(img.samples.toSeq == expect)
  }

  test("decodes run-mode-heavy frame: EOL runs, interruptions, ramps") {
    val img = JpegLs.decode(bytes("runs8.jls"))
    assert((img.width, img.height) == ((32, 9)))
    val expect = bytes("runs8.raw").map(_ & 0xff)
    assert(img.samples.toSeq == expect.toSeq)
  }

  test("NEAR=2 stream reproduces the encoder's reconstruction exactly") {
    val img = JpegLs.decode(bytes("near8.jls"))
    assert(img.near == 2)
    val expect = bytes("near8.raw").map(_ & 0xff)
    assert(img.samples.toSeq == expect.toSeq)
  }

  private def lcg(seed: Long): Iterator[Int] =
    Iterator.iterate(seed)(s => (s * 1103515245L + 12345L) & 0x7fffffffL)
      .drop(1).map(_.toInt)

  test("roundtrip: 8-bit noise, gradients, flats at odd sizes") {
    for ((w, h, seed) <- Seq((1, 1, 1L), (7, 1, 2L), (1, 9, 3L), (64, 48, 4L),
        (33, 21, 5L))) {
      val r = lcg(seed)
      val img = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        if ((y / 3) % 2 == 0) (x * 3 + y * 5) % 256 // smooth → runs
        else math.abs(r.next()) % 256               // noise → regular
      }
      val dec = JpegLs.decode(JpegLs.encode(img, w, h, 8))
      assert(dec.samples.toSeq == img.toSeq, s"roundtrip ${w}x$h seed $seed")
    }
  }

  test("roundtrip: 16-bit full-range including maxval and zero") {
    val w = 19; val h = 13
    val r = lcg(17L)
    val img = Array.tabulate(w * h) { i =>
      i % 7 match {
        case 0 => 0
        case 1 => 65535
        case _ => math.abs(r.next()) % 65536
      }
    }
    val dec = JpegLs.decode(JpegLs.encode(img, w, h, 16))
    assert(dec.precision == 16 && dec.samples.toSeq == img.toSeq)
  }

  test("roundtrip: 12-bit (the CT bit depth) with long runs") {
    val w = 40; val h = 11
    val img = Array.tabulate(w * h) { i =>
      val y = i / w
      if (y % 3 == 0) 2048 else (i * 37) % 4096
    }
    val dec = JpegLs.decode(JpegLs.encode(img, w, h, 12))
    assert(dec.precision == 12 && dec.samples.toSeq == img.toSeq)
  }

  test("roundtrip: constant image is one EOL run per line") {
    val img = Array.fill(50 * 20)(123)
    val enc = JpegLs.encode(img, 50, 20, 8)
    assert(enc.length < 60, s"constant frame should compress tiny, got ${enc.length}")
    assert(JpegLs.decode(enc).samples.toSeq == img.toSeq)
  }

  test("near-lossless roundtrip stays within NEAR everywhere") {
    val w = 31; val h = 17
    for (near <- Seq(1, 3)) {
      val r = lcg(1000L + near)
      val img = Array.tabulate(w * h)(i => (i % 200) + math.abs(r.next()) % 56)
      val dec = JpegLs.decode(JpegLs.encode(img, w, h, 8, near))
      assert(dec.samples.zip(img).forall { case (d, o) => math.abs(d - o) <= near },
        s"near=$near bound violated")
    }
  }

  test("refusals: multi-component, interleaved, truncated") {
    val good = JpegLs.encode(Array.fill(4)(7), 2, 2, 8)
    // corrupt component count in SOF55 (offset: SOI 2 + marker 2 + len 2
    // + P 1 + Y 2 + X 2 = 9 → Nf at byte 11)
    val multi = good.clone(); multi(11) = 3
    assertThrows[IllegalArgumentException](JpegLs.decode(multi))
    val trunc = good.take(good.length - 3)
    assertThrows[IllegalArgumentException](JpegLs.decode(trunc))
  }
}
