package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class WinnowPrefixSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  // --- reference winnowing (textbook form: per-window min, rightmost
  // tie-break on equal hashes) used to prove the packed-key column
  // implementation selects the same fingerprints ---
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refWinnow(text: String, k: Int = 5, w: Int = 4): Set[(Int, Long)] = {
    val n = text.length - k + 1
    if (n < 1) return Set.empty
    val h = Array.tabulate(n)(i =>
      java.lang.Long.parseLong(md5hex(text.substring(i, i + k)).take(10), 16))
    (0 to math.max(n - w, 0)).map { s =>
      val end = math.min(s + w, n)
      var best = s
      var i = s + 1
      while (i < end) {
        if (h(i) < h(best) || (h(i) == h(best) && i > best)) best = i
        i += 1
      }
      (best, h(best))
    }.toSet
  }

  private def refFpHash(text: String): String =
    md5hex(refWinnow(text).toSeq.sortBy(p => "%07d".format(p._1) + ":" + p._2)
      .map(p => "%07d".format(p._1) + ":" + p._2).mkString(","))

  test("winnowing matches the textbook reference selection exactly") {
    import spark.implicits._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaa"), // all k-grams identical: tie-breaks everywhere
      (3L, "abc"),              // shorter than k: zero grams
      (4L, "abcde"),            // exactly one gram
      (5L, "abcdefg"),          // fewer grams than w: one clamped window
      (6L, "x" * 300 + " shared middle segment " + "y" * 300))
    val out = TextDedup.winnowFingerprints(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Int]("n_fp"), r.getAs[String]("fp_hash"))).toMap
    texts.foreach { case (id, t) =>
      val ref = refWinnow(t)
      val (ngrams, nfp, fpHash) = out(id)
      assert(ngrams == math.max(t.length - 4, 0), s"doc $id gram count")
      assert(nfp == ref.size, s"doc $id fingerprint count")
      assert(fpHash == refFpHash(t), s"doc $id selection diverged from reference")
    }
  }

  test("winnowing matches the reference on real corpus docs") {
    val rows = docs.filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text")).collect()
    val out = TextDedup.winnowFingerprints(docs.filter(col("doc_id") < 40))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp_hash")).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(out(r.getAs[Long]("doc_id")) == refFpHash(r.getAs[String]("text")))
    }
  }

  test("winnowing guarantee: a shared substring of length >= k+w-1 shares a fingerprint") {
    // substring matches of length t = k+w-1 = 8 must surface as a
    // shared selected HASH (position-independent) — the MOSS
    // guarantee the density argument (~2/(w+1) kept) rides on
    val shared = "GUARANTEED-SEGMENT-0123456789"
    val a = "left context blob " + shared + " tail of document a"
    val b = "completely different opening " + shared + " and another ending"
    val ha = refWinnow(a).map(_._2)
    val hb = refWinnow(b).map(_._2)
    assert(shared.length >= 8)
    assert(ha.intersect(hb).nonEmpty, "no shared fingerprint for a shared segment")
    // and the selected fraction is near the 2/(w+1) density bound
    val frac = ha.size.toDouble / (a.length - 4)
    assert(frac < 0.8, s"winnowing kept almost everything: $frac")
  }

  test("prefix-filtered jaccard join equals the brute-force co-occurrence join") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("inter"))
    val brute = TextDedup.exactJaccardPairs(docs, minJaccard = 0.2)
      .select(col("doc_a"), col("doc_b"), col("inter")).collect().map(key).toSet
    val prefixed = TextDedup.prefixJaccardPairs(docs, minJaccard = 0.2)
      .select(col("doc_a"), col("doc_b"), col("inter")).collect().map(key).toSet
    assert(brute.nonEmpty, "test corpus should contain planted near-dups")
    assert(prefixed == brute,
      s"prefix filter changed the result: missing=${(brute -- prefixed).take(5)} " +
        s"extra=${(prefixed -- brute).take(5)}")
  }

  test("prefix join: boundary pairs at exactly tau are kept (micro-exact threshold)") {
    import spark.implicits._
    // 3-shingle sets of size 3 sharing exactly 2 shingles: jaccard =
    // 2/4 = 0.5, exactly micro-representable, so the pair sits ON the
    // threshold and the >= must keep it
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 zz")).toDF("doc_id", "text")
    val brute = TextDedup.exactJaccardPairs(df, minJaccard = 0.0)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(brute == Set((1L, 2L, 0.5)))
    val out = TextDedup.prefixJaccardPairs(df, minJaccard = 0.5).collect()
    assert(out.length == 1, "pair at exactly tau=0.5 must be kept")
  }
}
