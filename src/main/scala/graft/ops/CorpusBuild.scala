package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** The one-call corpus build: raw WARC archives → deduped, cleaned,
  * quality-gated training shards — every stage an operator this
  * engine already gates individually (t79 scan, t82 robots, t83
  * charset, t80 extract, d60 URL dedup, d59 line dedup, t53 quality,
  * d40 exact dedup, t78/t85 shards), composed in the order production
  * corpus builds run them (RefinedWeb §3 / CCNet). A user points this
  * at a crawl and gets WebDataset tar shards plus the per-stage
  * attrition report the funnel gate (t69) popularized.
  *
  * Scale shape is the sum of its parts: the scan is file-per-task,
  * robots/charset/extract are partition-local, the two dedups are one
  * hash shuffle each, quality is one kernel pass, and sharding is the
  * single deterministic repartition — no stage materializes an
  * intermediate corpus on disk, and the report costs one aggregate
  * per stage boundary on the already-computed frame.
  */
object CorpusBuild {

  /** URL → robots-matchable path: scheme/authority strip is
    * case-insensitive (schemes are case-insensitive per RFC 3986) and
    * a path-less URL maps to "/" (RFC 9309: the empty path is the
    * root — a `Disallow: /` must block `http://host`).
    */
  def urlPath(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val stripped = regexp_replace(url, "(?i)^[a-z][a-z0-9+.-]*://[^/]*", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Run the build; writes `shard-NNNNN.tar` under `outDir` and
    * returns the attrition report (stage_id, stage, n_docs).
    *
    * `robots` optionally supplies (robots.txt content, user agent) —
    * the single-policy form; multi-host crawls join a per-host rules
    * table instead. `qualityGate=false` skips the Gopher-style rule
    * stage (corpora of synthetic/code text legitimately fail
    * stopword-based gates).
    */
  def fromCrawl(spark: SparkSession, archives: Seq[String], outDir: String,
      nShards: Int = 16, boilerplateMinDocs: Int = 100,
      robots: Option[(String, String)] = None,
      qualityGate: Boolean = true): DataFrame = {
    import spark.implicits._

    // persist BEFORE the first count: the scan (decompress + parse of
    // every archive) is the dominant stage and must run exactly once
    val resp = Warc.httpResponses(Warc.read(spark, archives))
      .select(col("target_uri").as("url"), col("http_status"), col("body"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFetched = resp.count()

    val ok = resp.filter(col("http_status") === 200)
      .select(col("url"), col("body"))
    val nOk = ok.count()

    // stable ids from the canonical URL: dedups re-crawled spellings
    // of one page at the same time (the d60 semantics)
    val withId = ok
      .withColumn("canonical_url", Urls.canonicalize(col("url")))
      .withColumn("doc_id", xxhash64(col("canonical_url")))
    val robotsKept = robots match {
      case Some((txt, agent)) =>
        val decided = Robots.allowFilter(spark,
          withId.select(col("doc_id"), urlPath(col("url")).as("path")), txt, agent)
        withId.join(decided.filter(col("allowed")).select("doc_id"), "doc_id")
      case None => withId
    }
    val urlDeduped = robotsKept
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("url"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("body"))
    val nUrl = urlDeduped.count()

    val texts = Charsets.transcode(spark,
      urlDeduped.select(col("doc_id"), col("body").as("media")))
      .select(col("doc_id"), col("text").as("html"))
    val extracted = Html.extract(spark, texts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val cleaned = TextDedup.lineDedup(extracted, minDocs = boilerplateMinDocs)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("clean_text").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCleaned = cleaned.count()

    val gated =
      if (!qualityGate) cleaned
      else {
        val q = TextStats.qualityRules(cleaned)
          .select(col("doc_id"),
            (col("n_words") >= 50 && col("n_words") <= 100000 &&
              col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
              col("symbol_ratio") < 0.1 &&
              col("stopword_frac") > 0.02 &&
              col("top_bigram_frac") < 0.2).as("keep"))
        cleaned.join(q.filter(col("keep")).select("doc_id"), "doc_id")
      }
    val nGated = gated.count()

    val keeper = gated.groupBy(md5(col("text")).as("th"))
      .agg(min(col("doc_id")).as("keeper_id"))
    val finalDocs = gated
      .withColumn("th", md5(col("text")))
      .join(keeper, "th")
      .filter(col("doc_id") === col("keeper_id"))
      .select(col("doc_id"), col("text"))
    val nFinal = finalDocs.count()

    Shards.writeTarShards(finalDocs, outDir, nShards = nShards)

    resp.unpersist(); extracted.unpersist(); cleaned.unpersist()
    Seq(
      (1, "fetched", nFetched),
      (2, "http_200", nOk),
      (3, "robots_and_url_dedup", nUrl),
      (4, "extracted_nonempty", nCleaned),
      (5, "quality_gate", nGated),
      (6, "exact_dedup_sharded", nFinal))
      .toDF("stage_id", "stage", "n_docs")
  }
}
