package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first transform a web-crawl training
  * pipeline runs after the WARC scan ([[graft.sources.Warc]]), before
  * any quality filter or dedup sees the text.
  *
  * One single-pass state machine per document, partition-local (the
  * 100 TB path is `mapPartitions` over crawl pages — no shuffle, no
  * regex backtracking, O(n) per page):
  *
  *  - `<script>`/`<style>` elements drop WITH their contents;
  *    `<!-- -->` comments drop; tags drop (quote-aware, so a `>`
  *    inside a quoted attribute doesn't end the tag).
  *  - Block-level boundaries (p, div, h1-h6, li, tr, td, title, br,
  *    …) become line breaks; inline tags (a, b, span, …) vanish.
  *  - Character entities decode: the core named five + `&nbsp;` and
  *    numeric `&#123;`/`&#x7B;` (code points above the BMP included).
  *    Unknown or unterminated entities pass through literally.
  *  - ASCII whitespace runs ([ \t\n\r\f], the RE2 `\s` class — so an
  *    oracle can replay the collapse) become one space; separators
  *    materialize only when content follows, so no leading/trailing
  *    space, no blank lines, and empty elements emit nothing.
  *
  * Crawl HTML is a dirty format: extraction is TOTAL by design —
  * unterminated tags/comments/scripts consume to end-of-input rather
  * than throwing (the loud-refusal posture applies to binary
  * containers, not to the web). Named entities are matched
  * case-sensitively in their HTML5 canonical (lowercase) forms.
  */
object Html {

  private val blockTags: Set[String] = Set(
    "html", "head", "body", "title", "p", "div", "br", "hr",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th",
    "section", "article", "header", "footer", "nav", "aside",
    "blockquote", "pre", "form", "fieldset", "figure", "figcaption",
    "main", "address", "dl", "dt", "dd", "option", "select", "textarea")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private val named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> "\u00a0") // U+00A0 is content, not collapsible ws

  /** Decode the entity at `i` (html(i) == '&'): (decoded, consumed).
    * Falls back to a literal '&' of length 1.
    */
  private def entity(html: String, i: Int): (String, Int) = {
    val n = html.length
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", 1)
    val body = html.substring(i + 1, semi)
    if (body.startsWith("#")) {
      val num = body.substring(1)
      val cp =
        try {
          if (num.length > 1 && (num(0) == 'x' || num(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else if (num.nonEmpty && num.forall(_.isDigit)) Integer.parseInt(num)
          else -1
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && Character.isValidCodePoint(cp))
        (new String(Character.toChars(cp)), semi - i + 1)
      else ("&", 1)
    } else named.get(body) match {
      case Some(s) => (s, semi - i + 1)
      case None => ("&", 1)
    }
  }

  /** Index just past the tag's closing '>', honoring quoted attribute
    * values; end-of-input when unterminated.
    */
  private def tagEnd(html: String, start: Int): Int = {
    var i = start
    var quote: Char = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    n
  }

  private def indexOfIgnoreCase(html: String, needle: String, from: Int): Int = {
    val n = html.length; val m = needle.length
    var i = from
    while (i + m <= n) {
      if (html.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  /** Extract visible text from one HTML page (spec in the object doc). */
  def extractText(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n / 4)
    var pendingNl = false
    var pendingSp = false
    def emit(s: String): Unit = {
      if (out.length > 0) {
        if (pendingNl) out.append('\n')
        else if (pendingSp) out.append(' ')
      }
      pendingNl = false; pendingSp = false
      out.append(s)
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      // a '<' not opening a tag/comment/declaration is literal text
      // (HTML5 tokenizer behavior for e.g. "a < b")
      val opensMarkup = c == '<' && i + 1 < n && {
        val d = html.charAt(i + 1)
        d.isLetter || d == '/' || d == '!' || d == '?'
      }
      if (opensMarkup) {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          // tag name: optional '/', then letters/digits
          var j = i + 1
          if (j < n && html.charAt(j) == '/') j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          val close = tagEnd(html, j)
          if (name == "script" || name == "style") {
            // HTML5: the element closes only at '</name' followed by
            // whitespace, '/', or '>' — '</scripty>' inside a script
            // must NOT end it (its text would leak into the corpus)
            var endTag = indexOfIgnoreCase(html, "</" + name, close)
            while (endTag >= 0 && {
              val after = endTag + 2 + name.length
              after < n && !isWs(html.charAt(after)) &&
                html.charAt(after) != '/' && html.charAt(after) != '>'
            }) endTag = indexOfIgnoreCase(html, "</" + name, endTag + 1)
            i = if (endTag < 0) n else tagEnd(html, endTag + 2 + name.length)
            pendingNl = true // script/style elements are block-level
          } else {
            if (blockTags.contains(name)) pendingNl = true
            i = close
          }
        }
      } else if (isWs(c)) { pendingSp = true; i += 1 }
      else if (c == '&') {
        val (s, len) = entity(html, i)
        emit(s); i += len
      } else { emit(String.valueOf(c)); i += 1 }
    }
    out.toString
  }

  /** Distributed extraction over (doc_id, html) → (doc_id, text). */
  def extract(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    pages.select(col("doc_id"), col("html")).as[(Long, String)]
      .mapPartitions(_.map { case (id, h) => (id, extractText(h)) })
      .toDF("doc_id", "text")
  }
}
