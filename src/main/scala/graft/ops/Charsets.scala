package graft.ops

import java.nio.charset.Charset

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Charset detection + transcode — the step between raw crawl bytes
  * and every text operator: real web pages arrive in UTF-8,
  * UTF-16(LE/BE), Latin-1 and Windows-1252, and feeding a text
  * pipeline mis-decoded bytes silently corrupts every downstream
  * hash, shingle and token.
  *
  * Detection order (the WHATWG encoding-sniffing algorithm's
  * byte-level core):
  *  1. BOM: EF BB BF → UTF-8, FF FE → UTF-16LE, FE FF → UTF-16BE
  *     (BOM bytes are consumed, not decoded into the text).
  *  2. A `charset=` declaration in the first 1024 bytes (ASCII
  *     case-insensitive scan — covers `<meta charset="x">` and
  *     `<meta http-equiv ... content="text/html; charset=x">`),
  *     value optionally quoted; resolved through the JVM charset
  *     registry (aliases like `latin1` normalize to canonical names).
  *  3. Strict UTF-8 validation of the whole payload → UTF-8.
  *  4. Fallback: ISO-8859-1 (every byte sequence decodes — the
  *     crawl-pragmatic floor, also WHATWG's ultimate default family).
  *
  * Partition-local per page, O(n) single pass; nothing shuffles.
  */
object Charsets {

  /** Strict UTF-8 validity (RFC 3629: no overlongs, no surrogates,
    * max U+10FFFF, complete sequences).
    */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        val (len, min) =
          if (c >= 0xC2 && c <= 0xDF) (2, 0x80)
          else if (c >= 0xE0 && c <= 0xEF) (3, 0x800)
          else if (c >= 0xF0 && c <= 0xF4) (4, 0x10000)
          else return false // 0x80-0xC1 continuation/overlong lead, 0xF5+
        if (i + len > n) return false
        var cp = c & (0x3F >> (len - 1))
        var k = 1
        while (k < len) {
          val cc = b(i + k) & 0xff
          if ((cc & 0xC0) != 0x80) return false
          cp = (cp << 6) | (cc & 0x3F)
          k += 1
        }
        if (cp < min || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF))
          return false
        i += len
      }
    }
    true
  }

  /** Find a `charset=` declaration in the first 1024 bytes; None when
    * absent or naming an unknown charset.
    */
  def declaredCharset(b: Array[Byte]): Option[Charset] = {
    val limit = math.min(b.length, 1024)
    val head = new String(b, 0, limit, "ISO-8859-1").toLowerCase
    val i = head.indexOf("charset=")
    if (i < 0) return None
    var j = i + 8
    if (j < head.length && (head(j) == '"' || head(j) == '\'')) j += 1
    val start = j
    while (j < head.length &&
      (head(j).isLetterOrDigit || head(j) == '-' || head(j) == '_')) j += 1
    val name = head.substring(start, j)
    if (name.isEmpty) None
    // WHATWG: a UTF-16 *declaration* found by an ASCII prescan proves
    // the bytes are NOT UTF-16 (the prescan couldn't have read it
    // otherwise) — honor it as UTF-8, the spec's mapping for exactly
    // this common mislabeling, instead of producing mojibake
    else if (name == "utf-16" || name == "utf-16le" || name == "utf-16be")
      Some(Charset.forName("UTF-8"))
    else try Some(Charset.forName(name)) catch { case _: Exception => None }
  }

  /** (canonical charset name, decoded text); BOM consumed. */
  def decode(payload: Array[Byte]): (String, String) = {
    def txt(off: Int, cs: Charset) =
      new String(payload, off, payload.length - off, cs)
    if (payload.length >= 3 && (payload(0) & 0xff) == 0xEF &&
      (payload(1) & 0xff) == 0xBB && (payload(2) & 0xff) == 0xBF)
      ("UTF-8", txt(3, Charset.forName("UTF-8")))
    else if (payload.length >= 2 && (payload(0) & 0xff) == 0xFF && (payload(1) & 0xff) == 0xFE)
      ("UTF-16LE", txt(2, Charset.forName("UTF-16LE")))
    else if (payload.length >= 2 && (payload(0) & 0xff) == 0xFE && (payload(1) & 0xff) == 0xFF)
      ("UTF-16BE", txt(2, Charset.forName("UTF-16BE")))
    else declaredCharset(payload) match {
      case Some(cs) => (cs.name(), txt(0, cs))
      case None =>
        if (isValidUtf8(payload)) ("UTF-8", txt(0, Charset.forName("UTF-8")))
        else ("ISO-8859-1", txt(0, Charset.forName("ISO-8859-1")))
    }
  }

  /** Distributed transcode over (doc_id, media) →
    * (doc_id, charset, text).
    */
  def transcode(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val (cs, text) = decode(payload)
        (id, cs, text)
      }).toDF("doc_id", "charset", "text")
  }
}
