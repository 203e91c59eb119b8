package graft.sources

import graft.SparkSpec

/** The composed WARC → extract → line-dedup → exact-dedup pipeline at
  * spec scale (1k pages, 4 archives): every structural assertion in
  * [[CrawlRehearsal.run]] (byte-exact extraction, chrome-only line
  * cuts, planted copies recovered) must hold — the bench key
  * `t_crawl200k` runs the same code at 200×.
  */
class CrawlRehearsalSpec extends SparkSpec {

  test("composed crawl pipeline holds its structure at 1k pages") {
    val sec = CrawlRehearsal.run(spark, n = 1000L, nArchives = 4)
    assert(sec > 0.0)
  }

  test("page fixtures plant what the pipeline must recover") {
    // copies are byte-identical pages of their predecessor
    assert(CrawlRehearsal.pageHtml(19L) === CrawlRehearsal.pageHtml(18L))
    assert(CrawlRehearsal.pageHtml(20L) !== CrawlRehearsal.pageHtml(18L))
    // the hand-built expectation matches the real extractor
    for (id <- Seq(0L, 18L, 19L, 37L))
      assert(graft.ops.Html.extractText(CrawlRehearsal.pageHtml(id))
        === CrawlRehearsal.expectedExtract(id))
    // chrome lines are position 1 and last; 9 lines total
    assert(CrawlRehearsal.expectedExtract(5L).split("\n").length === 9)
  }
}
