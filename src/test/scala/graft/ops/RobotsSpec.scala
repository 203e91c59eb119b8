package graft.ops

import graft.SparkSpec

class RobotsSpec extends SparkSpec {

  private val robots =
    """# example policy
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.pdf$
      |Allow: /articles/
      |Disallow: /articles/draft
      |
      |User-agent: graftbot
      |User-agent: graftbot-image
      |Disallow: /
      |Allow: /articles/
      |Crawl-delay: 10
      |Sitemap: https://x.test/sitemap.xml
      |""".stripMargin

  test("group selection: specific token beats *, merged headers, prefix UA") {
    val star = Robots.rulesFor(robots, "otherbot")
    assert(star.map(_.path) ===
      Seq("/private/", "/private/public/", "/*.pdf$", "/articles/", "/articles/draft"))
    val bot = Robots.rulesFor(robots, "GraftBot/1.2") // case + product token
    assert(bot === Seq(Robots.Rule(false, "/"), Robots.Rule(true, "/articles/")))
    assert(Robots.rulesFor(robots, "graftbot-image") === bot)
  }

  test("path matching: wildcards, end anchor, literal mid-$") {
    assert(Robots.pathMatches("/private/", "/private/x"))
    assert(!Robots.pathMatches("/private/", "/privateer"))
    assert(Robots.pathMatches("/*.pdf$", "/a/b/doc.pdf"))
    assert(!Robots.pathMatches("/*.pdf$", "/a/doc.pdf?x=1")) // anchored
    assert(Robots.pathMatches("/*.pdf", "/a/doc.pdf?x=1")) // unanchored
    assert(Robots.pathMatches("/a*b*c", "/aXXbYYc"))
    assert(!Robots.pathMatches("/a*b*c", "/aXXbYY"))
    assert(Robots.pathMatches("/p$x", "/p$x")) // $ literal unless final
  }

  test("precedence: longest rule wins, allow breaks ties, default allow") {
    val rules = Robots.rulesFor(robots, "otherbot")
    assert(Robots.decide(rules, "/private/x") === (false, "/private/"))
    assert(Robots.decide(rules, "/private/public/y") === (true, "/private/public/"))
    assert(Robots.decide(rules, "/doc.pdf") === (false, "/*.pdf$"))
    assert(Robots.decide(rules, "/articles/1") === (true, "/articles/"))
    assert(Robots.decide(rules, "/articles/draft2") === (false, "/articles/draft"))
    assert(Robots.decide(rules, "/elsewhere") === (true, ""))
    // allow wins an exact length tie
    val tie = Seq(Robots.Rule(false, "/a/bb"), Robots.Rule(true, "/a/b*"))
    assert(Robots.decide(tie, "/a/bb") === (true, "/a/b*"))
  }

  test("empty Disallow and rule-less preludes produce no rules") {
    val r = Robots.rulesFor("Disallow: /pre\nUser-agent: *\nDisallow:\n", "any")
    assert(r === Seq.empty)
    assert(Robots.decide(r, "/anything")._1)
  }

  test("distributed allowFilter applies one parse to every partition") {
    import spark.implicits._
    val urls = Seq((1L, "/private/a"), (2L, "/articles/a"), (3L, "/x"))
      .toDF("doc_id", "path")
    val got = Robots.allowFilter(spark, urls, robots, "otherbot")
      .as[(Long, String, Boolean, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "/private/a", false, "/private/"),
      (2L, "/articles/a", true, "/articles/"),
      (3L, "/x", true, "")))
  }
}
