package graft.zarr

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM blosc1 frame codec (Blosc.scala). No c-blosc binding exists
  * in this environment, so interop is pinned two ways: exhaustive
  * round-trips of our own dont-split encoder, and hand-built frames per
  * the PUBLIC c-blosc format — including the SPLIT layout (one stream
  * per typesize plane) that historical c-blosc versions emit and that
  * our encoder never writes, so decode of foreign frames is exercised
  * independently of encode.
  */
class BloscSpec extends AnyFunSuite {

  private def f64(n: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => bb.putDouble(math.sin(i * 0.1) * 1000))
    bb.array()
  }

  test("round-trip across cnames, typesizes, shuffle on/off") {
    val payloads = Seq(
      "f64" -> f64(4096),
      "text" -> Array.tabulate[Byte](30000)(i => ('a' + i % 7).toByte),
      "tiny" -> Array[Byte](1, 2, 3),
      "odd" -> Array.tabulate[Byte](10001)(i => (i % 13).toByte)) // not a typesize multiple
    for ((label, data) <- payloads; cname <- Seq("lz4", "zstd", "zlib", "snappy");
         ts <- Seq(1, 2, 4, 8); sh <- Seq(true, false)) {
      val enc = Blosc.compress(data, ts, cname, 5, sh)
      assert(Blosc.decompress(enc).toSeq == data.toSeq,
        s"$label cname=$cname ts=$ts shuffle=$sh")
    }
  }

  test("empty and incompressible payloads produce valid frames") {
    assert(Blosc.decompress(Blosc.compress(Array.emptyByteArray, 8)).isEmpty)
    val rnd = new scala.util.Random(7)
    val noise = Array.fill[Byte](65536)(rnd.nextInt().toByte)
    val enc = Blosc.compress(noise, 4)
    // incompressible data must fall back to a memcpy frame, not grow unboundedly
    assert(enc.length <= noise.length + 16)
    assert(Blosc.decompress(enc).toSeq == noise.toSeq)
  }

  test("multi-block frames (> 1 MiB) round-trip") {
    val big = f64(300000) // 2.4 MB -> 3 blocks at the 1 MiB cap
    val enc = Blosc.compress(big, 8, "zstd", 3)
    assert(enc.length < big.length)
    assert(Blosc.decompress(enc).toSeq == big.toSeq)
  }

  /** Build a frame the way pre-1.11 c-blosc does: shuffled block split
    * into `typesize` planes, each plane its own length-prefixed zlib
    * stream. Our encoder never emits this layout.
    */
  private def buildSplitFrame(data: Array[Byte], typesize: Int): Array[Byte] = {
    val n = data.length / typesize
    // forward byte-shuffle: plane k byte i = element i byte k
    val planes = Array.tabulate(typesize) { k =>
      Array.tabulate[Byte](n)(i => data(i * typesize + k))
    }
    val streams = planes.map { p =>
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos, new java.util.zip.Deflater(6))
      d.write(p); d.close()
      val c = bos.toByteArray
      if (c.length < p.length) c else p // stored plane: length == raw marker
    }
    val total = 16 + 4 /* one block */ + streams.map(_.length + 4).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    val flags = (3 << 5) | 0x01 // zlib inner codec, byte-shuffle, SPLIT (no dont-split bit)
    bb.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    bb.putInt(data.length).putInt(data.length).putInt(total)
    bb.putInt(16 + 4) // single block starts right after the bstarts table
    streams.foreach { s => bb.putInt(s.length); bb.put(s) }
    bb.array()
  }

  test("decodes foreign SPLIT-layout frames (per-plane streams)") {
    val data = f64(2048)
    assert(Blosc.decompress(buildSplitFrame(data, 8)).toSeq == data.toSeq)
    val i16 = Array.tabulate[Byte](5000 * 2)(i => (i % 251).toByte)
    assert(Blosc.decompress(buildSplitFrame(i16, 2)).toSeq == i16.toSeq)
  }

  test("decodes foreign memcpy frames") {
    val data = Array.tabulate[Byte](777)(i => i.toByte)
    val bb = ByteBuffer.allocate(16 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte).put(0x02.toByte).put(4.toByte)
    bb.putInt(data.length).putInt(data.length).putInt(16 + data.length)
    bb.put(data)
    assert(Blosc.decompress(bb.array()).toSeq == data.toSeq)
  }

  test("precise errors: blosclz, bit-shuffle, truncation") {
    val data = f64(64)
    // blosclz frame: codec bits 0, not memcpy
    val h1 = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    h1.put(2.toByte).put(1.toByte).put(0x00.toByte).put(8.toByte)
    h1.putInt(512).putInt(512).putInt(20).putInt(20)
    val e1 = intercept[UnsupportedOperationException](Blosc.decompress(h1.array()))
    assert(e1.getMessage.contains("blosclz"))
    // bit-shuffle flag
    val h2 = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    h2.put(2.toByte).put(1.toByte).put((0x04 | (1 << 5)).toByte).put(8.toByte)
    h2.putInt(512).putInt(512).putInt(20).putInt(20)
    val e2 = intercept[UnsupportedOperationException](Blosc.decompress(h2.array()))
    assert(e2.getMessage.contains("bit-shuffle"))
    intercept[IllegalArgumentException](Blosc.decompress(Array[Byte](1, 2, 3)))
    val enc = Blosc.compress(data, 8)
    intercept[Exception](Blosc.decompress(java.util.Arrays.copyOf(enc, enc.length - 5)))
  }

  test("Codecs dispatch: blosc id strings with cname/clevel") {
    val data = f64(1024)
    for (id <- Seq("blosc", "blosc:lz4", "blosc:zstd:3", "blosc:zlib:6", "blosc:snappy")) {
      val enc = Codecs.compress(Some(id), data, typesize = 8)
      assert(Codecs.decompress(Some(id), enc, data.length).toSeq == data.toSeq, id)
    }
  }
}
