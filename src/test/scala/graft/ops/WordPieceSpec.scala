package graft.ops

import graft.SparkSpec

/** WordPiece greedy-encode semantics: longest-match preference, `##`
  * continuation handling, and the whole-word UNK rule — the branches
  * a vocab-table lookup could fake but the t89 oracle replay cannot.
  */
class WordPieceSpec extends SparkSpec {

  private val vocab = Set("un", "##aff", "##able", "##ff", "affable",
    "a", "##b", "b", "##a")
  private def enc(w: String) = WordPiece.encodeWord(w, vocab, 7)

  test("greedy longest-match prefers the longest piece at every position") {
    // 'unaffable': 'un' + longest continuation '##aff' (not '##a') + '##able'
    assert(enc("unaffable") == Seq("un", "##aff", "##able"))
    // first position prefers the whole-word piece over 'a'
    assert(enc("affable") == Seq("affable"))
  }

  test("continuations only match under ##; missing tail UNKs the WHOLE word") {
    // 'ab' = 'a' + '##b'
    assert(enc("ab") == Seq("a", "##b"))
    // 'ba' = 'b' + '##a'
    assert(enc("ba") == Seq("b", "##a"))
    // 'abc': matches 'a', '##b', then 'c' has no piece — whole word UNK,
    // not a partial [a, ##b, UNK]
    assert(enc("abc") == Seq("[UNK]"))
    // no first-position piece at all
    assert(enc("zzz") == Seq("[UNK]"))
  }

  test("tokenStats counts words, tokens, UNKs and emits in-order token_str") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "ab affable zzz"),
      (2L, "unaffable ba")).toDF("doc_id", "text")
    val rows = WordPiece.tokenStats(df, vocab.toSeq).orderBy(col("doc_id")).collect()
    val r1 = rows(0)
    assert(r1.getAs[Int]("n_words") == 3)
    assert(r1.getAs[Long]("n_tokens") == 2 + 1 + 1)
    assert(r1.getAs[Int]("n_unk") == 1)
    assert(r1.getAs[String]("token_str") == "a ##b affable [UNK]")
    val r2 = rows(1)
    assert(r2.getAs[Int]("n_unk") == 0)
    assert(r2.getAs[String]("token_str") == "un ##aff ##able b ##a")
  }
}
