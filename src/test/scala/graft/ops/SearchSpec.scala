package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {

  private def queries(pairs: (Int, String)*) =
    Search.queryTable(spark, pairs)

  test("bm25 ranks docs with more matching, rarer terms first") {
    import spark.implicits._
    // "rare" appears in one doc, "common" in all four
    val docs = Seq(
      (1L, "rare common x y z"),
      (2L, "common common a b c d"),
      (3L, "common e f"),
      (4L, "common g h i j k l m n o p")).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, queries(0 -> "rare common"), k = 4)
      .orderBy(col("rank"))
      .collect()
    // doc 1 matches both terms (one of them rare) — must rank first
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L, 4L))
    // scores strictly ordered with the rank
    val scores = out.map(_.getAs[Long]("score_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25 tf saturation: repeating a term helps sublinearly") {
    import spark.implicits._
    // same length docs; tf 1 vs 3 of the query term
    val docs = Seq(
      (1L, "t a b c d e"),
      (2L, "t t t a b c")).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, queries(0 -> "t"), k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
    assert(out(2L) > out(1L))           // more occurrences score higher...
    assert(out(2L) < 3 * out(1L))       // ...but sublinearly (saturation)
  }

  test("bm25 length normalization: same tf, shorter doc wins") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t a"),
      (2L, "t a b c d e f g h i j k")).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, queries(0 -> "t"), k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
    assert(out(1L) > out(2L))
  }

  test("bm25 only returns docs sharing at least one query term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hit x"), (2L, "miss y"), (3L, "also nothing")).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, queries(0 -> "hit"), k = 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
  }

  test("fuzz: bm25TopK equals a naive in-memory BM25 on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    for (round <- 0 until 4) {
      val corpus = (0 until 30 + rnd.nextInt(40)).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val qterms = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).distinct
      val k1 = 1.2; val b = 0.75
      // naive reference, same arithmetic order as the docstring formula
      val docs = corpus.map { case (id, t) => id -> t.split(' ').filter(_.nonEmpty) }
      val n = docs.length.toLong
      val sumDl = docs.map(_._2.length.toLong).sum
      val avgdl = sumDl.toDouble / n
      val df = qterms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
      val naive = docs.flatMap { case (id, ws) =>
        val microSum = qterms.filter(t => ws.contains(t)).map { t =>
          val tf = ws.count(_ == t).toLong
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val w = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * ws.length / avgdl))
          Math.round(Similarity.round6(w) * 1e6)
        }.sum
        if (microSum != 0L || qterms.exists(ws.contains)) Some(id -> microSum) else None
      }.toMap
      val expected = naive.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)

      val got = Search.bm25TopK(corpus.toDF("doc_id", "text"),
          queries(0 -> qterms.mkString(" ")), k = 10, k1 = k1, b = b)
        .orderBy(col("rank"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toSeq
      assert(got == expected, s"round $round terms=$qterms")
    }
  }

  test("multiple queries rank independently") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple fruit"), (2L, "banana fruit"), (3L, "apple banana")).toDF("doc_id", "text")
    val out = Search.bm25TopK(
        docs, queries(0 -> "apple", 1 -> "banana"), k = 2)
      .collect()
      .groupBy(_.getAs[Int]("query_id"))
      .map { case (q, rs) => q -> rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq }
    assert(out(0).toSet == Set(1L, 3L))
    assert(out(1).toSet == Set(2L, 3L))
  }

  test("tfIdfTopTerms: corpus-wide terms score zero, rare terms rank first") {
    import spark.implicits._
    // "common" is in every doc -> idf = ln(4/4) = 0 -> score 0;
    // "rare" is in one doc -> idf = ln(4/2); tf breaks the rest.
    val df = Seq(
      (1L, "common rare rare other"),
      (2L, "common other other"),
      (3L, "common filler")).toDF("doc_id", "text")
    val out = Search.tfIdfTopTerms(df, k = 2).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[String]("term")).toSeq }
    assert(out(1L) == Seq("rare", "other"))
    assert(out(2L).head == "other")
    // per-doc: every doc yields at most k rows and zero-idf terms sink
    val doc1 = Search.tfIdfTopTerms(df, k = 3).filter(col("doc_id") === 1L)
      .orderBy(col("rank")).collect()
    assert(doc1.last.getAs[String]("term") == "common")
    assert(doc1.last.getAs[Long]("score_micro") == 0L)
    val expectedIdf = math.round(
      BigDecimal(math.log(4.0 / 2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e6)
    assert(doc1.head.getAs[Long]("score_micro") == 2L * expectedIdf)
  }

  test("sourceOverlap counts shared distinct grams and exact jaccard") {
    import spark.implicits._
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9"  // 9 words -> 2 distinct 8-grams
    val df = Seq(
      (1L, s"$passage xa xb xc xd xe xf xg", "crawl_a"),  // 2 shared + 8 own
      (2L, s"$passage ya yb yc yd ye yf yg", "crawl_b"),
      (3L, "za zb zc zd ze zf zg zh zi", "crawl_c"))      // disjoint
      .toDF("doc_id", "text", "source")
    val rows = TextDedup.sourceOverlap(df, n = 8).collect()
    assert(rows.length == 1) // only a-b share anything
    val r = rows.head
    assert(r.getAs[String]("source_a") == "crawl_a")
    assert(r.getAs[String]("source_b") == "crawl_b")
    assert(r.getAs[Long]("shared_grams") == 2L)
    assert(r.getAs[Long]("n_grams_a") == 9L)
    assert(r.getAs[Long]("n_grams_b") == 9L)
    assert(math.abs(r.getAs[Double]("jaccard") - 2.0 / 16.0) < 1e-15)
  }

  test("sourceOverlap: a gram in 3 sources yields all 3 pairs once") {
    import spark.implicits._
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val df = Seq(
      (1L, shared, "a"), (2L, shared, "b"), (3L, shared, "c"))
      .toDF("doc_id", "text", "source")
    val rows = TextDedup.sourceOverlap(df, n = 8).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Long]("shared_grams"))).toSet
    assert(rows == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("rrfFuse: integer contributions sum across lists, doc in both lists wins") {
    import spark.implicits._
    // doc 10 is rank 2 in both lists; doc 20 is rank 1 lexical only,
    // doc 30 rank 1 dense only. 1e6 div 62 (×2) > 1e6 div 61 (×1).
    val lex = Seq((0, 20L, 1), (0, 10L, 2)).toDF("query_id", "doc_id", "rank")
    val den = Seq((0, 30L, 1), (0, 10L, 2)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(Seq(lex, den), topK = 3).collect()
      .map(r => r.getAs[Int]("rank") ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_micro"), r.getAs[Int]("n_lists")))
      .toMap
    val c61 = 1000000L / 61
    val c62 = 1000000L / 62
    assert(out(1) == ((10L, 2 * c62, 2)))
    // equal single-list scores tie-break on doc_id
    assert(out(2) == ((20L, c61, 1)))
    assert(out(3) == ((30L, c61, 1)))
  }
}
