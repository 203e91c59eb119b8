package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mixture (temperature sampling) and Urls (canonicalization/dedup)
  * unit behavior beyond the oracle gates: the rebalancing direction
  * of τ = 0.5 (small domains gain share, large lose), rate
  * determinism, and the canonicalization table of crawl-variant
  * spellings.
  */
class MixtureUrlsSpec extends SparkSpec {

  import spark.implicits._

  test("temperature rates upweight small domains and bound p_milli at 1000") {
    // 800 docs in 'big', 200 in 'small': proportional sampling at 50%
    // would keep 400/100; temperature τ=0.5 shifts share toward small
    val df = (0 until 1000).map(i =>
      (i.toLong, if (i < 800) "big" else "small")).toDF("doc_id", "source")
    val rates = Mixture.temperatureRates(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val (nBig, pBig) = rates("big")
    val (nSmall, pSmall) = rates("small")
    assert(nBig == 800 && nSmall == 200)
    // small domain's acceptance rate strictly exceeds the big one's,
    // and exceeds the proportional 500‰; big falls below it
    assert(pSmall > pBig)
    assert(pSmall > 500 && pBig < 500)
    assert(pSmall <= 1000)
    // no domain capped here, so Σ n_d·p_d/1000 lands on the target
    // (floor rounding only); a 9:1 split would cap the small domain
    // at 1000‰ and truncate the mass — that is the intended
    // no-oversampling behavior, not redistribution
    val mass = nBig * pBig / 1000.0 + nSmall * pSmall / 1000.0
    assert(math.abs(mass - 500.0) < 5.0, s"sampled mass $mass")
    // capped case: p_milli never exceeds 1000
    val skew = (0 until 1000).map(i =>
      (i.toLong, if (i < 990) "big" else "tiny")).toDF("doc_id", "source")
    val capped = Mixture.temperatureRates(skew).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(capped("tiny") == 1000L && capped("big") < 500L)
  }

  test("sampling is a pure function of the id (stable across reruns)") {
    val df = (0 until 500).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    val a = Mixture.temperatureSample(df).select("doc_id").as[Long].collect().sorted
    val b = Mixture.temperatureSample(df.repartition(7)).select("doc_id")
      .as[Long].collect().sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("URL canonicalization collapses the crawl-variant table") {
    val cases = Seq(
      "HTTPS://Example.COM/a?utm_source=feed&id=7" -> "https://example.com/a?id=7",
      "https://www.example.com/a?id=7" -> "https://example.com/a?id=7",
      "https://example.com:443/a#top" -> "https://example.com/a",
      "https://example.com/a/" -> "https://example.com/a",
      "http://example.com:80/b" -> "http://example.com/b",
      "https://example.com/a?id=7&utm_campaign=x" -> "https://example.com/a?id=7",
      "https://example.com/a?fbclid=abc" -> "https://example.com/a",
      // non-default port and non-tracking params survive
      "https://example.com:8443/a?q=1&r=2" -> "https://example.com:8443/a?q=1&r=2")
    val got = cases.map(_._1).toDF("url")
      .select(Urls.canonicalize(col("url"))).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) => assert(g == want, in) }
  }

  test("urlDedup groups variants and keeps the minimum id") {
    val df = Urls.syntheticUrls((0L until 10L).toDF("doc_id"))
    val got = Urls.urlDedup(df).orderBy("canonical_url").collect()
    // ids 0..9 are pages 0 and 1, each with canonical keys {base, base?id=g}
    assert(got.length == 4)
    val byUrl = got.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byUrl("https://example.com/articles/0") == ((2L, 2L)))  // variants 2,3
    assert(byUrl("https://example.com/articles/0?id=0") == ((3L, 0L))) // 0,1,4
    assert(byUrl("https://example.com/articles/1") == ((2L, 7L)))
    assert(byUrl("https://example.com/articles/1?id=1") == ((3L, 5L)))
  }
}
