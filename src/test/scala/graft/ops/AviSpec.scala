package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-AVI container parse + frame sampling (Avi.scala). The
  * encoder emits a spec-shaped RIFF tree (hdrl with avih + vids/MJPG
  * strl, movi with 00dc chunks); the parser is tested against it and
  * against hand-corrupted containers.
  */
class AviSpec extends AnyFunSuite {

  test("synthetic MJPEG AVI parses: dims, timing, frame count") {
    val payload = Avi.encodeSyntheticMjpeg(7L, 4)
    val avi = Avi.parseAvi(payload)
    assert(avi.width == 16 && avi.height == 16)
    assert(avi.microSecPerFrame == 40000L)
    assert(avi.frames.length == 4)
    // every frame is a JPEG stream
    avi.frames.foreach { f =>
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)
    }
  }

  test("frame sampling decodes only kept frames, means track the formula") {
    val id = 11L
    val (avi, sampled) = Avi.sampleFrames(Avi.encodeSyntheticMjpeg(id, 5), stride = 2)
    assert(avi.frames.length == 5)
    assert(sampled.length == 3) // frames 0, 2, 4
    sampled.zip(Seq(0, 2, 4)).foreach { case (img, f) =>
      assert(img.width == 16 && img.height == 16)
      val mean = img.pixels.grouped(img.channels).map(p => p(0) & 0xff).sum / 256.0
      val exp = (0 until 4).map(b => (id * 37 + f * 11 + b * 29) % 256).sum / 4.0
      assert(math.abs(mean - exp) <= 4.0, s"frame $f mean $mean vs $exp")
    }
  }

  test("non-AVI and corrupt containers refuse precisely") {
    assertThrows[IllegalArgumentException](Avi.parseAvi("RIFFxxxxWAVE".getBytes))
    assertThrows[IllegalArgumentException](Avi.parseAvi("nope".getBytes))
    val good = Avi.encodeSyntheticMjpeg(1L, 2)
    // corrupt a chunk size so it overruns the container
    val bad = good.clone()
    bad(16) = 0x7f.toByte // blow up the first inner chunk's size field
    val e = intercept[IllegalArgumentException](Avi.parseAvi(bad))
    assert(e.getMessage.contains("corrupt AVI"))
  }
}
