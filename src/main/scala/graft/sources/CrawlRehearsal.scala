package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.zarr.SerializableHadoopConf

/** Web-crawl pipeline rehearsal at scale: the composed
  * WARC → HTTP split → HTML extract → boilerplate line-dedup →
  * exact-dedup chain over a 200k-page synthetic crawl — the
  * ingest-side twin of the dedup/pyramid/ANN rehearsals, proving the
  * round-7 crawl surface (`Warc`, `Html`, `TextDedup.lineDedup`)
  * composes end to end at bench scale with verified structure, not
  * just per-operator gates at sf0.01.
  *
  * The crawl is written DISTRIBUTED (one task per archive, the
  * file-per-task layout the reader exploits) and every stage's output
  * is structurally asserted: record counts, byte-exact extraction
  * against an independently reconstructed expectation, the
  * nav/footer boilerplate (planted in every page) fully removed with
  * every content line kept, and the planted exact-copy pages (id
  * ending in 9 duplicates id−1) recovered as exactly n/10 dup groups.
  */
object CrawlRehearsal {

  val nav = "site navigation home about contact language settings"
  val footer = "copyright example site all rights reserved terms privacy"

  /** Effective page id: pages with id % 10 == 9 are exact copies. */
  def eff(id: Long): Long = if (id % 10 == 9) id - 1 else id

  /** Six 10-word body lines, pairwise-unique across effective ids
    * (word index stride 53/17, the [[graft.ops.DedupRehearsal]]
    * disjointness construction).
    */
  def bodyLines(e: Long): Seq[String] =
    (0 until 6).map(l => (0 until 10)
      .map(j => "w" + (e * 53 + (l * 10 + j) * 17)).mkString(" "))

  def pageHtml(id: Long): String = {
    val e = eff(id)
    val lines = bodyLines(e).map(l => s"<p>$l</p>").mkString
    s"""<html><head><title>Page $e</title><script>nav.init(1 < 2);</script>""" +
      s"""<style>div.nav { color: #eee; }</style></head>""" +
      s"""<body><div class="nav">$nav</div>$lines""" +
      s"""<!-- tracking pixel --><div class="footer">$footer</div></body></html>"""
  }

  /** The extraction expectation, reconstructed independently of
    * [[Html.extractText]]'s state machine.
    */
  def expectedExtract(id: Long): String = {
    val e = eff(id)
    (Seq(s"Page $e", nav) ++ bodyLines(e) :+ footer).mkString("\n")
  }

  /** Write the crawl: `nArchives` per-record-gzipped WARC files, one
    * task each (executors write through the Hadoop FS, the same path
    * production re-sharding jobs use).
    */
  def writeCrawl(spark: SparkSession, dir: String, n: Long, nArchives: Int): Unit = {
    import spark.implicits._
    val hconf = SerializableHadoopConf.fromActiveSession()
    val per = n / nArchives
    require(per * nArchives == n, s"nArchives must divide n ($n / $nArchives)")
    spark.range(nArchives).as[Long].foreachPartition { (it: Iterator[Long]) =>
      it.foreach { k =>
        val recs = (k * per until (k + 1) * per).map { id =>
          val html = pageHtml(id).getBytes("UTF-8")
          val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            .getBytes("US-ASCII") ++ html
          Warc.WarcRecord("", "response", s"<urn:uuid:page-$id>",
            s"http://crawl.test/doc/$id", "2026-08-14T00:00:00Z",
            "application/http; msgtype=response", http.length.toLong, http)
        }
        // fixture gen isn't the path under test: fastest deflate
        Warc.writeArchive(s"$dir/crawl-$k.warc.gz", recs, Some(hconf), level = 1)
      }
    }
  }

  /** Run the composed pipeline; returns wall seconds. Throws on any
    * structural divergence.
    */
  def run(spark: SparkSession, n: Long = 200000L, nArchives: Int = 64): Double = {
    val (w, r) = runPhases(spark, n, nArchives)
    w + r
  }

  /** Phase-split run: (fixture-write seconds, read-path seconds).
    * The 200k-member per-record-gzip fixture WRITE has its own
    * variance envelope (19–44 s observed across rounds) and is NOT
    * the surface under test — reporting the phases separately keeps
    * a real read-path regression from hiding inside writer noise.
    */
  def runPhases(spark: SparkSession, n: Long = 200000L,
      nArchives: Int = 64): (Double, Double) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    var tLast = t0
    def stage(name: String): Unit = {
      val now = System.nanoTime()
      System.err.println(f"[crawl-rehearsal] $name: ${(now - tLast) / 1e9}%.1f s")
      tLast = now
    }
    val dir = java.nio.file.Files.createTempDirectory("crawl_rehearsal").toString
    try {
      writeCrawl(spark, dir, n, nArchives)
      stage("write")
      val writeSec = (System.nanoTime() - t0) / 1e9
      val tRead = System.nanoTime()

      val recs = Warc.read(spark, Warc.listArchives(spark, dir))
      val pages = Warc.httpResponses(recs)
        .select(
          regexp_extract(col("target_uri"), "doc/(\\d+)$", 1).cast("long").as("doc_id"),
          col("body").cast("string").as("html"))
      val extracted = graft.ops.Html.extract(spark, pages)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      val nExtracted = extracted.count()
      require(nExtracted == n, s"crawl read/extract lost pages: $nExtracted of $n")
      stage("read+extract")

      // byte-exact extraction vs the independent reconstruction
      val expected = spark.range(n).select(col("id").as("doc_id"))
        .as[Long].map(id => (id, expectedExtract(id))).toDF("doc_id", "expected")
      val mismatches = extracted.join(expected, "doc_id")
        .filter(col("text") =!= col("expected")).count()
      require(mismatches == 0, s"$mismatches pages extracted differently than built")
      stage("verify")

      // boilerplate removal: nav+footer recur n times, content lines
      // at most twice (the exact copies) — minDocs=100 must remove
      // EXACTLY the two chrome lines from every page. Persist: the
      // line-cut check and the exact-dedup stage below both read it —
      // without the cache the whole lineDedup plan re-executes per
      // action (it ran 3× before this round's optimization pass).
      val deduped = graft.ops.TextDedup.lineDedup(extracted, minDocs = 100)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val badLineCuts = deduped
        .filter(col("n_lines") =!= 9 || col("n_kept") =!= 7).count()
      require(badLineCuts == 0,
        s"$badLineCuts pages lost content lines (or kept chrome) in line-dedup")
      stage("line-dedup")

      // exact dedup on the cleaned text recovers the planted copies —
      // both structure counts in ONE aggregation (two separate count()
      // actions re-ran the dedup groupBy twice)
      val groups = graft.ops.TextDedup.exact(
        deduped.select(col("doc_id"), col("clean_text").as("text")))
      val gstats = groups.agg(
        sum(when(col("n_copies") === 2, 1L).otherwise(0L)).as("dups"),
        sum(when(col("n_copies") === 1, 1L).otherwise(0L)).as("lone")).head()
      val dupGroups = gstats.getLong(0)
      val loneDocs = gstats.getLong(1)
      require(dupGroups == n / 10 && loneDocs == n - 2 * (n / 10),
        s"exact-dedup structure off: $dupGroups dup groups (want ${n / 10}), " +
          s"$loneDocs singles (want ${n - 2 * (n / 10)})")
      stage("exact-dedup")

      deduped.unpersist()
      extracted.unpersist()
      (writeSec, (System.nanoTime() - tRead) / 1e9)
    } finally {
      // local temp crawl cleanup (best-effort; Hadoop FS handles dirs)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
  }
}
