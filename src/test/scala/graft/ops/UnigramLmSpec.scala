package graft.ops

import graft.SparkSpec

/** Unigram-LM Viterbi semantics: optimality against brute-force
  * enumeration, the deterministic per-prefix tie-break, and the
  * whole-word UNK rule.
  */
class UnigramLmSpec extends SparkSpec {

  private val vocab: Seq[(String, Long)] = Seq(
    "a" -> 500L, "b" -> 1200L, "d" -> 1200L, "t" -> 1200L, "w" -> 1200L,
    "i" -> 1200L, "n" -> 1200L, "o" -> 1200L,
    "da" -> 700L, "ta" -> 700L, "dat" -> 900L,
    "win" -> 800L, "dow" -> 700L, "wind" -> 900L, "ow" -> 600L)

  /** All segmentations of w over the vocab (exponential — test only). */
  private def allSegs(w: String): Seq[(Seq[String], Long)] = {
    if (w.isEmpty) Seq((Seq.empty, 0L))
    else vocab.flatMap { case (p, c) =>
      if (w.startsWith(p)) allSegs(w.substring(p.length))
        .map { case (t, tc) => (p +: t, tc + c) }
      else Seq.empty
    }
  }

  test("Viterbi cost equals the brute-force minimum over all segmentations") {
    for (w <- Seq("data", "window", "dat", "ta", "a", "wind", "dow")) {
      val (toks, cost) = UnigramLm.encodeWord(w, vocab)
      val best = allSegs(w).map(_._2).min
      assert(cost == best, s"$w: viterbi $cost vs brute $best")
      assert(toks.mkString == w)
    }
  }

  test("exact-cost ties break to fewest tokens then lexicographically smallest") {
    // data: da+ta = dat+a = 1400; both 2 tokens; 'da' < 'dat' → da+ta
    assert(UnigramLm.encodeWord("data", vocab)._1 == Seq("da", "ta"))
    // window: win+dow = wind+ow = 1500; 'win' < 'wind' → win+dow
    assert(UnigramLm.encodeWord("window", vocab)._1 == Seq("win", "dow"))
  }

  test("unreachable words collapse to [UNK] at UnkCost") {
    val (toks, cost) = UnigramLm.encodeWord("xyz", vocab)
    assert(toks == Seq("[UNK]") && cost == UnigramLm.UnkCost)
    // partial coverage (prefix matches, tail does not) is still UNK
    val (t2, c2) = UnigramLm.encodeWord("dax", vocab)
    assert(t2 == Seq("[UNK]") && c2 == UnigramLm.UnkCost)
  }

  test("tokenStats aggregates cost, tokens and UNKs in document order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "data xyz window")).toDF("doc_id", "text")
    val r = UnigramLm.tokenStats(df, vocab).orderBy(col("doc_id")).head
    assert(r.getAs[Int]("n_words") == 3)
    assert(r.getAs[Long]("n_tokens") == 2 + 1 + 2)
    assert(r.getAs[Int]("n_unk") == 1)
    assert(r.getAs[Long]("total_cost") == 1400L + UnigramLm.UnkCost + 1500L)
    assert(r.getAs[String]("token_str") == "da ta [UNK] win dow")
  }
}
