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
    avi.frames.indices.map(avi.frameBytes).foreach { f =>
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)
    }
  }

  test("parse records slices without copying frame bytes") {
    val payload = Avi.encodeSyntheticMjpeg(3L, 6)
    val avi = Avi.parseAvi(payload)
    // the container buffer is shared by reference — parse allocated no
    // per-frame copies; a 1-in-N sampler then copies only what it keeps
    assert(avi.payload eq payload)
    avi.frames.foreach { s =>
      assert(s.length > 0 && s.offset >= 0 && s.offset + s.length <= payload.length)
      // the slice really points at a JPEG SOI marker in place
      assert((payload(s.offset) & 0xff) == 0xff && (payload(s.offset + 1) & 0xff) == 0xd8)
    }
    // frameBytes materializes fresh, equal copies on demand
    val f0a = avi.frameBytes(0)
    val f0b = avi.frameBytes(0)
    assert(!(f0a eq f0b) && f0a.sameElements(f0b))
  }

  test("zero-frame container parses to an empty sample set") {
    // hand-built RIFF: hdrl(avih) + empty movi — a valid container a
    // sampling kernel must reject downstream with a precise error
    def i32(vs: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(vs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putInt)
      b.array()
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ i32(body.length) ++ body
    val avih = chunk("avih", i32(40000, 0, 0, 0, 0, 0, 1, 0, 16, 16, 0, 0, 0, 0))
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII"))
    val riff = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
    val (avi, sampled) = Avi.sampleFrames(riff, stride = 2)
    assert(avi.frames.isEmpty && sampled.isEmpty)
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

  test("planted-cut encoder: frame means ramp +11 then jump +100, never wrap") {
    val id = 9L
    val (avi, frames) = Avi.sampleFrames(Avi.encodeSyntheticMjpegCut(id, 5), stride = 1)
    assert(avi.frames.length == 5 && frames.length == 5)
    val cut = (id % 3).toInt + 1
    val means = frames.map { img =>
      img.pixels.grouped(img.channels).map(p => p(0) & 0xff).sum / 256.0
    }
    (1 until 5).foreach { f =>
      val jump = math.abs(means(f) - means(f - 1))
      if (f == cut) assert(jump > 100, s"frame $f: planted jump lost ($jump)")
      else assert(jump < 20, s"frame $f: smooth ramp broke ($jump)")
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
