package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Containment near-dup join (d62), CCNet perplexity buckets (t87),
  * host-level quality stats (t88): semantics each operator must hold
  * beyond the oracle hash — prefix-filter recall vs the exhaustive
  * pair scan, threshold/boundary behavior, and the asymmetric case
  * Jaccard provably misses.
  */
class ContainmentSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("containmentPairs == exhaustive containment over all co-occurring pairs") {
    // ground truth from the exhaustive co-occurrence scan: containment
    // = inter / min(size). prefix-filter recall must be exact.
    val exact = TextDedup.exactJaccardPairs(docs, minJaccard = 0.0)
      .withColumn("c", col("inter").cast("double") /
        least(col("size_a"), col("size_b")).cast("double"))
      .filter(col("c") >= 0.25)
      .select(
        least(col("doc_a"), col("doc_b")).as("x"),
        greatest(col("doc_a"), col("doc_b")).as("y"),
        col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = TextDedup.containmentPairs(docs, minContainment = 0.25)
      .select(
        least(col("doc_small"), col("doc_big")).as("x"),
        greatest(col("doc_small"), col("doc_big")).as("y"),
        col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "corpus should contain containment pairs")
    assert(got == exact)
  }

  test("containment catches the quote-inside-a-longer-doc pair Jaccard misses") {
    import spark.implicits._
    val quote = "alpha bravo charlie delta echo foxtrot golf hotel"
    val filler = (1 to 200).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, quote),
      (2L, s"$filler $quote $filler"),
      (3L, "zulu yankee xray whiskey victor uniform")).toDF("doc_id", "text")
    val pairs = TextDedup.containmentPairs(df, minContainment = 1.0).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getAs[Long]("doc_small") == 1L && p.getAs[Long]("doc_big") == 2L)
    assert(p.getAs[Double]("containment") == 1.0)
    // the same pair is invisible to Jaccard at any useful threshold
    val j = TextDedup.exactJaccardPairs(df, minJaccard = 0.0)
      .filter(col("doc_a") === 1L && col("doc_b") === 2L)
      .head.getAs[Double]("jaccard")
    assert(j < 0.05, s"planted pair must be Jaccard-invisible, got $j")
  }

  test("containment size-tie pair keeps the lower id as doc_small") {
    import spark.implicits._
    val df = Seq(
      (7L, "one two three four five"),
      (9L, "one two three four five")).toDF("doc_id", "text")
    val p = TextDedup.containmentPairs(df, minContainment = 1.0).head
    assert(p.getAs[Long]("doc_small") == 7L && p.getAs[Long]("doc_big") == 9L)
  }

  test("perplexityBuckets: thirds cover the corpus, thresholds ordered, keep = not tail") {
    val b = LangModel.perplexityBuckets(docs, trainMaxId = 20).cache()
    val n = b.count()
    assert(n > 0)
    val byBucket = b.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    // exact discrete tertiles: head holds ceil(n/3)±ties, every bucket
    // nonempty on a spread of distinct perplexities
    assert(byBucket.values.sum == n)
    assert(byBucket.getOrElse("head", 0L) > 0 && byBucket.getOrElse("tail", 0L) > 0)
    val maxHead = b.filter(col("bucket") === "head").agg(max("ppl")).head.getDouble(0)
    val minMid = b.filter(col("bucket") === "middle").agg(min("ppl")).head.getDouble(0)
    val maxMid = b.filter(col("bucket") === "middle").agg(max("ppl")).head.getDouble(0)
    val minTail = b.filter(col("bucket") === "tail").agg(min("ppl")).head.getDouble(0)
    assert(maxHead <= minMid && maxMid <= minTail)
    assert(b.filter(col("keep") =!= (col("bucket") =!= "tail")).count() == 0)
    b.unpersist()
  }

  test("hostStats counts unique texts and dup ratio per canonical host") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://WWW.A.example.com/x", "same text"),
      (2L, "https://a.example.com:443/y", "same text"),
      (3L, "http://a.example.com/z", "other text"),
      (4L, "https://b.example.com/q", "solo")).toDF("doc_id", "url", "text")
    val rows = Urls.hostStats(df).orderBy("host").collect()
    assert(rows.length == 2)
    val a = rows(0)
    assert(a.getAs[String]("host") == "a.example.com")
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("n_unique_texts") == 2)
    assert(a.getAs[Long]("total_chars") == 9L + 9L + 10L)
    assert(math.abs(a.getAs[Double]("dup_ratio") - 0.333333) < 1e-9)
    val b = rows(1)
    assert(b.getAs[String]("host") == "b.example.com")
    assert(b.getAs[Double]("dup_ratio") == 0.0)
  }
}
