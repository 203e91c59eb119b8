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
}
