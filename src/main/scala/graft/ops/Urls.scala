package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and canonical-URL deduplication — the
  * cheapest and highest-precision dedup pass a web-corpus pipeline
  * runs (CCNet/RefinedWeb dedup by URL before any content hashing):
  * the same page crawled as `HTTPS://Example.COM/a?utm_source=feed`,
  * `https://www.example.com/a` and `https://example.com:443/a#top`
  * must collapse to one canonical key.
  *
  * Canonical form: lowercase scheme+host, `www.` prefix and default
  * `:80`/`:443` ports stripped, fragment dropped, tracking query
  * parameters (`utm_*`, `fbclid`, `gclid`) removed with dangling
  * `?`/`&` tidied, trailing slash stripped. Everything is built-in
  * string/regexp expressions — codegen'd, shuffle-free projection —
  * and deliberately engine-replayable SQL semantics so the dedup key
  * is reproducible outside Spark too.
  */
object Urls {

  /** Canonicalize a URL column (pure projection). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([^:/?#]+)://", 1))
    val hostport = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1))
    val host = regexp_replace(
      regexp_replace(hostport, "^www\\.", ""), ":(443|80)$", "")
    val rest = regexp_replace(url, "^[^:/?#]+://[^/?#]*", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val noTrack = regexp_replace(noFrag, "(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "")
    val tidy = regexp_replace(regexp_replace(noTrack, "[?&]$", ""), "/$", "")
    concat(scheme, lit("://"), host, tidy)
  }

  /** Canonical-URL dedup: one row per canonical key with the
    * duplicate count and the kept (minimum-id) document. One shuffle
    * on the canonical key — the exact-dedup shape.
    */
  def urlDedup(df: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("kept_id"))

  /** Host-level corpus quality aggregation — the RefinedWeb/C4
    * domain-filter precursor: per canonical host, how many pages, how
    * many UNIQUE page texts (md5 identity), the duplicate ratio, and
    * the total character mass. Hosts with extreme dup_ratio are
    * boilerplate farms; hosts with tiny total mass are navigation
    * shells — both are cut at host granularity before any per-doc
    * scoring spends compute on them.
    *
    * Shape: canonical-host extraction is a codegen'd projection; the
    * aggregation is ONE shuffle on the host key with map-side
    * combine (count_distinct goes through Spark's two-level partial
    * distinct aggregation — never a per-host row collection). Hosts
    * are web-scale-many, so the group key is high-cardinality and
    * skew lands on AQE's split-skewed-partitions path.
    *
    * Output: (host, n_docs, n_unique_texts, total_chars, dup_ratio)
    * with dup_ratio = 1 − unique/docs rounded 6dp.
    */
  def hostStats(df: DataFrame, urlCol: String = "url",
      textCol: String = "text"): DataFrame = {
    val host = regexp_extract(canonicalize(col(urlCol)), "^[a-z]+://([^/:?#]+)", 1)
    df.select(host.as("host"), col(textCol).as("_t"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(md5(col("_t"))).as("n_unique_texts"),
        sum(length(col("_t"))).cast("bigint").as("total_chars"))
      .withColumn("dup_ratio", round(
        lit(1.0) - col("n_unique_texts").cast("double") / col("n_docs").cast("double"), 6))
  }

  /** Deterministic per-doc URL synthesis for the gates (the corpus
    * tables carry no URL column): five crawl-variant spellings of the
    * page `doc_id / 5`, so every page collapses to exactly two
    * canonical keys (with and without its `id` query param).
    */
  def syntheticUrls(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val g = (col(idCol) / 5).cast("long").cast("string")
    val url = when(col(idCol) % 5 === 0,
        concat(lit("HTTPS://Example.COM/articles/"), g, lit("?utm_source=feed&id="), g))
      .when(col(idCol) % 5 === 1,
        concat(lit("https://www.example.com/articles/"), g, lit("?id="), g))
      .when(col(idCol) % 5 === 2,
        concat(lit("https://example.com:443/articles/"), g, lit("#top")))
      .when(col(idCol) % 5 === 3,
        concat(lit("https://example.com/articles/"), g, lit("/")))
      .otherwise(
        concat(lit("https://example.com/articles/"), g, lit("?id="), g, lit("&utm_campaign=x")))
    docs.withColumn("url", url)
  }
}
