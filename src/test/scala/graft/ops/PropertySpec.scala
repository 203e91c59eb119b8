package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based cross-checks (ScalaCheck generators, fixed seed so
  * failures reproduce): each property generates a few hundred cases
  * and evaluates them in ONE Spark pass, comparing two independent
  * implementations or an algebraic invariant.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic sample list from a Gen (fixed seed → same corpus
    * every run; bump `n` freely, the cost is one Spark job).
    */
  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  // word chars beyond ASCII letters: digits, punctuation, a non-ASCII
  // letter — everything except the space separator itself
  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(('a' to 'z') ++ ('0' to '9') ++ "._-é"))
        .map(_.mkString))

  private val textGen: Gen[String] =
    for {
      nWords <- Gen.chooseNum(0, 12)
      words <- Gen.listOfN(nWords, wordGen)
      // random separator runs: single and multiple spaces, leading +
      // trailing space noise
      seps <- Gen.listOfN(nWords + 1, Gen.chooseNum(0, 3).map(" " * _))
    } yield seps.zipAll(words, "", "").map { case (s, w) => s + w }.mkString

  test("shinglesOf kernel == the wordShingles Column expression on random texts") {
    import spark.implicits._
    val texts = samples(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    for (k <- Seq(2, 3, 5)) {
      val viaColumn = df.select(col("doc_id"),
          TextDedup.wordShingles(col("text"), k).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      val viaKernel = TextDedup.shingleSets(df, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      assert(viaColumn.keySet == viaKernel.keySet)
      viaColumn.foreach { case (id, sh) =>
        assert(sh == viaKernel(id), s"k=$k doc $id text '${texts(id.toInt)._2}'")
      }
    }
  }

  private val urlGen: Gen[String] =
    for {
      scheme <- Gen.oneOf("http", "https", "HTTPS", "Http")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("example.com", "Sub.Example.ORG", "a-b.net")
      port <- Gen.oneOf("", ":443", ":80", ":8080")
      path <- Gen.oneOf("", "/", "/a", "/a/b", "/a/b/")
      query <- Gen.oneOf("", "?id=7", "?utm_source=x", "?utm_source=x&id=7",
        "?id=7&utm_campaign=y&q=2", "?fbclid=z", "?gclid=1&gclid=2")
      frag <- Gen.oneOf("", "#", "#top", "#a?b=1")
    } yield s"$scheme://$www$host$port$path$query$frag"

  test("URL canonicalization is idempotent and scheme/host-lowercasing") {
    import spark.implicits._
    val urls = samples(urlGen, 400).distinct.toDF("url")
    val once = urls.select(col("url"), Urls.canonicalize(col("url")).as("c1"))
    val twice = once.select(col("url"), col("c1"),
      Urls.canonicalize(col("c1")).as("c2")).collect()
    twice.foreach { r =>
      val (u, c1, c2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(c1 == c2, s"not idempotent: '$u' -> '$c1' -> '$c2'")
      val hostPart = c1.substring(c1.indexOf("://") + 3)
        .takeWhile(ch => ch != '/' && ch != '?')
      assert(c1.take(c1.indexOf("://")) == c1.take(c1.indexOf("://")).toLowerCase)
      assert(hostPart == hostPart.toLowerCase, s"host not lowered in '$c1'")
      assert(!hostPart.startsWith("www."), s"www. survives in '$c1'")
      assert(!c1.contains("#"), s"fragment survives in '$c1'")
      assert(!c1.contains("utm_") && !c1.contains("fbclid") && !c1.contains("gclid"),
        s"tracking param survives in '$c1'")
    }
  }

  test("hash-split buckets stay in [0,1000) and are independent of partitioning") {
    import spark.implicits._
    val ids = samples(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2), 500)
      .distinct
    val df = ids.toDF("doc_id")
    val a = Splits.hashSplit(df).select("doc_id", "bucket_milli")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Splits.hashSplit(df.repartition(13)).select("doc_id", "bucket_milli")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(v => v >= 0 && v < 1000))
  }

  test("PassJoin edit-distance join has exact recall on random short strings") {
    import spark.implicits._
    val strGen = Gen.chooseNum(0, 9).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val strs = samples(strGen, 120).distinct.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("doc_id", "text")
    val d = 2
    val got = EditJoin.editJoin(df, col("text"), d = d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val expected = (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && lev(sa, sb) <= d
    } yield (ia, ib)).toSet
    assert(got == expected,
      s"missing ${(expected -- got).take(5)}; extra ${(got -- expected).take(5)}")
  }
}
