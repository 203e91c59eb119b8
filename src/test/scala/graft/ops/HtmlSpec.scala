package graft.ops

import graft.SparkSpec

class HtmlSpec extends SparkSpec {
  import Html.extractText

  test("blocks become lines, inline tags vanish, entities decode") {
    val html = "<html><head><title>T</title></head><body>" +
      "<h1>Head</h1><p>a <b>bold</b> word &amp; more</p>" +
      "<div>x &lt;tag&gt; &quot;q&quot; &apos;a&apos;</div></body></html>"
    assert(extractText(html) ===
      "T\nHead\na bold word & more\nx <tag> \"q\" 'a'")
  }

  test("script and style drop with their contents") {
    val html = "<p>before</p><script>if (a < b && c > d) { x('<div>'); }</script>" +
      "<style>p > span { color: red; }</style><p>after</p>"
    assert(extractText(html) === "before\nafter")
    // case-insensitive close tag, attributes on the open tag
    assert(extractText("<p>a</p><SCRIPT type=\"text/javascript\">var x;</ScRiPt><p>b</p>")
      === "a\nb")
    // HTML5 boundary: '</scripty>' does NOT close a script element
    assert(extractText("""<p>a</p><script>x("</scripty>")</script><p>b</p>""")
      === "a\nb")
    assert(extractText("<p>a</p><style>s {}</styleX</style><p>b</p>") === "a\nb")
    // whitespace/slash after the name DO close it
    assert(extractText("<p>a</p><script>x</script ><p>b</p>") === "a\nb")
  }

  test("comments drop, including markup inside them") {
    assert(extractText("<p>a</p><!-- <p>hidden</p> --><p>b</p>") === "a\nb")
  }

  test("quoted attributes may contain '>'") {
    assert(extractText("""<p><a href="x>y" title='a>b'>link</a></p>""") === "link")
  }

  test("whitespace collapses; empty elements emit no blank lines") {
    val html = "<p>  a\t\tb \n c  </p><p></p><p>   </p><div>d</div>"
    assert(extractText(html) === "a b c\nd")
    assert(extractText("  <p>  </p>  ") === "")
  }

  test("numeric entities, hex, astral, invalid forms") {
    assert(extractText("<p>caf&#233;&#x21; &#x1F600;</p>") ===
      "café! " + new String(Character.toChars(0x1F600)))
    // unknown/unterminated entities pass through literally
    assert(extractText("<p>&foo; &amp &#; &#xg;</p>") === "&foo; &amp &#; &#xg;")
    assert(extractText("<p>A&nbsp;B</p>") === "A B")
  }

  test("bare '<' in text is literal; unterminated markup truncates totally") {
    assert(extractText("<p>a < b and 1<2</p>") === "a < b and 1<2")
    assert(extractText("<p>a<!-- never closed") === "a")
    assert(extractText("<p>a<script>never closed") === "a")
    assert(extractText("<p>a</p><div unterminated") === "a")
  }

  test("br and void elements break lines") {
    assert(extractText("line1<br>line2<br/>line3<hr>line4") ===
      "line1\nline2\nline3\nline4")
  }

  test("distributed extract over a pages frame") {
    import spark.implicits._
    val pages = Seq((1L, "<p>one</p>"), (2L, "<p>two&amp;</p>"))
      .toDF("doc_id", "html")
    val got = Html.extract(spark, pages).as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "one"), (2L, "two&")))
  }
}
