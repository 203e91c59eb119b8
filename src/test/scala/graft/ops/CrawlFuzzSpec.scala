package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input hardening for the crawl-surface parsers. Two
  * contracts, asserted over deterministic pseudo-random garbage:
  *
  *  - TOTAL parsers ([[Html.extractText]], [[Charsets.decode]]) must
  *    never throw and must terminate on ANY byte/char sequence —
  *    crawl input is attacker-adjacent garbage by default;
  *  - REFUSE-LOUDLY parsers ([[graft.sources.Warc.parseStream]],
  *    [[Exif.parseTiff]]) must throw a CONTROLLED exception type
  *    (IllegalArgumentException/EOFException), never an uncontrolled
  *    NegativeArraySize/IndexOutOfBounds/OOM-by-allocation.
  */
class CrawlFuzzSpec extends AnyFunSuite {

  private def bytes(seed: Int, n: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n); r.nextBytes(b); b
  }

  test("Html.extractText is total on garbage, markup-ish noise, and truncations") {
    val r = new scala.util.Random(1)
    val alphabet = "<>&;/=\"' abc\n\t-!#x0"
    (0 until 500).foreach { i =>
      val s = (0 until r.nextInt(300)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
      Html.extractText(s) // must not throw
    }
    (0 until 100).foreach { i =>
      Html.extractText(new String(bytes(i, 200), "ISO-8859-1"))
    }
    Html.extractText("<" * 10000) // pathological nesting
    Html.extractText("&" * 10000) // entity-scan worst case
    Html.extractText("<script>" + "x" * 10000) // unterminated element
  }

  test("Charsets.decode is total on arbitrary bytes") {
    (0 until 300).foreach { i =>
      val (cs, text) = Charsets.decode(bytes(i, 1 + i % 400))
      assert(cs.nonEmpty && text != null)
    }
    // hostile declarations: unknown names, empty value, quote soup
    Charsets.decode("<meta charset=>x".getBytes("US-ASCII"))
    Charsets.decode("<meta charset='".getBytes("US-ASCII"))
    Charsets.decode(("charset=" + "a" * 2000).getBytes("US-ASCII"))
  }

  test("Warc.parseStream fails controlled on garbage") {
    import graft.sources.Warc
    (0 until 200).foreach { i =>
      val in = new java.io.ByteArrayInputStream(bytes(i, 1 + i % 600))
      try { Warc.parseStream(in, "fuzz").toList; () }
      catch {
        case _: IllegalArgumentException | _: java.io.EOFException
          | _: NumberFormatException => () // controlled refusals
      }
    }
    // hostile Content-Length values must refuse, not allocate
    val huge = "WARC/1.0\r\nContent-Length: 99999999999\r\n\r\n"
    intercept[IllegalArgumentException] {
      Warc.parseStream(new java.io.ByteArrayInputStream(
        huge.getBytes("US-ASCII")), "f").toList
    }
  }

  test("a 2^31 value offset refuses controlled instead of wrapping negative") {
    val bb = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    bb.putShort(1) // one IFD entry
    bb.putShort(0x010F.toShort).putShort(2).putInt(10).putInt(0x80000000)
    bb.putInt(0) // no next IFD
    val e = intercept[IllegalArgumentException] { Exif.parseTiff(bb.array()) }
    assert(e.getMessage.contains("outside EXIF payload"))
  }

  test("a 2^31 ASCII count refuses controlled instead of wrapping negative") {
    val bb = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    bb.putShort(1)
    bb.putShort(0x010F.toShort).putShort(2).putInt(0x80000000).putInt(8)
    bb.putInt(0)
    val e = intercept[IllegalArgumentException] { Exif.parseTiff(bb.array()) }
    assert(e.getMessage.contains("outside EXIF payload"))
  }

  test("Exif.parseTiff fails controlled on garbage") {
    (0 until 200).foreach { i =>
      val b = bytes(i, 8 + i % 300)
      b(0) = 'I'; b(1) = 'I' // force past the BOM so IFD logic runs
      b(2) = 42; b(3) = 0 // little-endian magic 42
      try { Exif.parseTiff(b); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
