package graft.ops

import graft.SparkSpec

class CharsetsSpec extends SparkSpec {

  test("BOM variants decode and consume the BOM") {
    val s = "Grade 1 αβγ café"
    val utf8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ s.getBytes("UTF-8")
    assert(Charsets.decode(utf8) === (("UTF-8", s)))
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE")
    assert(Charsets.decode(le) === (("UTF-16LE", s)))
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-16BE")
    assert(Charsets.decode(be) === (("UTF-16BE", s)))
  }

  test("meta-declared charsets decode through the registry") {
    val lat = "<meta charset=\"iso-8859-1\">café ±"
    assert(Charsets.decode(lat.getBytes("ISO-8859-1")) === (("ISO-8859-1", lat)))
    val win = "<meta content=\"text/html; charset=windows-1252\">“café”"
    assert(Charsets.decode(win.getBytes("windows-1252")) === (("windows-1252", win)))
    // alias resolves to the canonical name
    val ali = "<meta charset=latin1>café"
    assert(Charsets.decode(ali.getBytes("ISO-8859-1"))._1 === "ISO-8859-1")
    // WHATWG: a UTF-16 declaration readable by an ASCII prescan proves
    // the bytes aren't UTF-16 — decode as UTF-8, not mojibake
    val lie = "<meta charset=\"utf-16\">plain ascii body"
    assert(Charsets.decode(lie.getBytes("US-ASCII")) === (("UTF-8", lie)))
  }

  test("strict UTF-8 validation") {
    assert(Charsets.isValidUtf8("Grade αβγ 🎉".getBytes("UTF-8")))
    assert(!Charsets.isValidUtf8(Array(0xC0.toByte, 0xAF.toByte))) // overlong '/'
    assert(!Charsets.isValidUtf8(Array(0x80.toByte))) // lone continuation
    assert(!Charsets.isValidUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte))) // surrogate
    assert(!Charsets.isValidUtf8(Array(0xF8.toByte, 0x80.toByte))) // 5-byte lead
    assert(!Charsets.isValidUtf8("αβ".getBytes("UTF-8").dropRight(1))) // truncated
  }

  test("undeclared payloads: UTF-8 when valid, Latin-1 floor otherwise") {
    val u = "plain αβγ"
    assert(Charsets.decode(u.getBytes("UTF-8")) === (("UTF-8", u)))
    val junk = Array[Byte]('a', 0xE9.toByte, 'b') // é in latin-1, invalid UTF-8
    assert(Charsets.decode(junk) === (("ISO-8859-1", "aéb")))
    // declared-but-unknown charset falls through to validation
    val bad = "<meta charset=zorblatt-7>plain".getBytes("US-ASCII")
    assert(Charsets.decode(bad)._1 === "UTF-8")
  }

  test("distributed transcode") {
    import spark.implicits._
    val media = Seq(
      (1L, "<meta charset=iso-8859-1>café".getBytes("ISO-8859-1")),
      (2L, "plain αβ".getBytes("UTF-8"))).toDF("doc_id", "media")
    val got = Charsets.transcode(spark, media)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "ISO-8859-1", "<meta charset=iso-8859-1>café"),
      (2L, "UTF-8", "plain αβ")))
  }
}
