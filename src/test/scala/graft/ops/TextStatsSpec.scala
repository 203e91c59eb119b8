package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {

  test("stats on a known document") {
    import spark.implicits._
    val df = Seq((1L, "aa bb aa cccc")).toDF("doc_id", "text")
    val r = TextStats.stats(df).head
    assert(r.getAs[Int]("n_words") == 4)
    assert(r.getAs[Int]("n_distinct") == 3)
    assert(r.getAs[Int]("sum_word_len") == 10)
    assert(r.getAs[Double]("avg_word_len") == 2.5)
    assert(r.getAs[Double]("ttr") == 0.75)
  }

  test("redactPii replaces emails/phones with typed placeholders and counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.org or x@y.io call 555-1234 not 55-123"),
      (2L, "clean text only")).toDF("doc_id", "text")
    val out = TextStats.redactPii(df).collect().map(r =>
      r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_emails") == 2)
    assert(out(1L).getAs[Int]("n_phones") == 1)
    assert(out(1L).getAs[String]("redacted") ==
      "mail <EMAIL> or <EMAIL> call <PHONE> not 55-123")
    assert(out(2L).getAs[Int]("n_emails") == 0)
    assert(out(2L).getAs[String]("redacted") == "clean text only")
  }

  test("langId picks the lexicon with most hits; tie → lexicon order") {
    import spark.implicits._
    val df = Seq(
      (1L, "x", "the of and xyz"),      // en
      (2L, "x", "der und la la"),        // de=2 vs fr(la,la)=2 tie → de
      (3L, "x", "zz qq ww")).toDF("doc_id", "lang", "text") // none → und
    val out = TextStats.langId(df).select("doc_id", "predicted_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("token counts: regex tokenizer splits punctuation runs") {
    import spark.implicits._
    val df = Seq((1L, "ab,cd ef12 - gh")).toDF("doc_id", "text")
    val r = TextStats.tokenCounts(df).head
    assert(r.getAs[Int]("ws_tokens") == 4) // "ab,cd" "ef12" "-" "gh"
    assert(r.getAs[Int]("re_tokens") == 5) // ab cd ef 12 gh
  }

  test("fingerprint collides for bag-of-words permutations only") {
    import spark.implicits._
    val df = Seq(
      (1L, "b a c"), (2L, "c b a a a"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("ngramRows matches the column-expression n-gram construction") {
    import spark.implicits._
    val r = new scala.util.Random(41)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = (0 until 50).map { i =>
      val n = r.nextInt(8)
      (i.toLong, Seq.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (k <- Seq(2, 3, 4)) {
      val kernel = TextDedup.ngramRows(docs, "doc_id", "text", k)
        .collect().map(row => (row.getLong(0), row.getString(1))).sorted.toSeq
      val expr0 = docs
        .select(col("doc_id"), TextDedup.words(col("text")).as("ws"))
        .filter(size(col("ws")) >= k)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("ws")) - k),
            i => concat_ws(" ", (0 until k).map(j =>
              element_at(col("ws"), (i + j + 1).cast("int"))): _*))).as("ng"))
        .collect().map(row => (row.getLong(0), row.getString(1))).sorted.toSeq
      assert(kernel == expr0, s"k=$k")
    }
  }

  test("typed kernels drop null-text rows like the column-expression forms") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(TextDedup.ngramRows(docs, "doc_id", "text", 2).count() == 4L)
    val qr = TextStats.repetitionStats(docs, n = 2).collect()
    assert(qr.map(_.getLong(0)).toSet == Set(1L))
    val q = TextStats.qualityRules(docs).collect()
    assert(q.map(_.getLong(0)).toSet == Set(1L))
  }

  test("repetitionStats counts duplicate 4-grams exactly") {
    import spark.implicits._
    val df = Seq(
      // "a b a b a b a b": 4-grams = abab, baba, abab, baba, abab
      //   → total 5, distinct 2, max repeat 3
      (1L, "a b a b a b a b"),
      // all distinct: "p q r s t" → 2 distinct 4-grams, no repeats
      (2L, "p q r s t"),
      // below n: no row
      (3L, "x y z")).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(df, n = 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).getAs[Long]("n_ngrams") == 5L)
    assert(out(1L).getAs[Long]("n_distinct") == 2L)
    assert(out(1L).getAs[Double]("dup_frac") == 3.0 / 5.0)
    assert(out(1L).getAs[Long]("max_repeat") == 3L)
    assert(out(2L).getAs[Long]("n_ngrams") == 2L)
    assert(out(2L).getAs[Long]("n_distinct") == 2L)
    assert(out(2L).getAs[Double]("dup_frac") == 0.0)
    assert(out(2L).getAs[Long]("max_repeat") == 1L)
  }

  test("lineProfile: dup-line and dup-char fractions exact; empty lines drop") {
    import spark.implicits._
    val df = Seq(
      // 3 lines, "aa" twice: dup occurrences 1/3, dup chars 4/6
      (1L, "aa\nbb\naa"),
      // blank interior line drops: 2 lines, both dups
      (2L, "xyz\n\nxyz"),
      // single line: nothing duplicated
      (3L, "solo line here")).toDF("doc_id", "text")
    val out = TextStats.lineProfile(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_lines") == 3)
    assert(out(1L).getAs[Int]("n_distinct_lines") == 2)
    assert(out(1L).getAs[Long]("dup_line_frac_milli") == 333L)
    assert(out(1L).getAs[Long]("dup_char_frac_milli") == 666L)
    assert(out(2L).getAs[Int]("n_lines") == 2)
    assert(out(2L).getAs[Long]("dup_line_frac_milli") == 500L)
    assert(out(2L).getAs[Long]("dup_char_frac_milli") == 1000L)
    assert(out(3L).getAs[Long]("dup_line_frac_milli") == 0L)
    assert(out(3L).getAs[Long]("dup_char_frac_milli") == 0L)
  }

  test("charEntropy: closed-form values and the integer-micro keep band") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaaaaaa"),          // H = 0
      (2L, "abababab"),          // H = 1
      (3L, "abcdabcd"),          // H = 2
      (4L, "abcdefgh")           // H = 3
    ).toDF("doc_id", "text")
    val out = TextStats.charEntropy(df, lowEntropy = 2.0, highEntropy = 8.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("entropy_micro") == 0L)
    assert(out(2L).getAs[Long]("entropy_micro") == 1000000L)
    assert(out(3L).getAs[Long]("entropy_micro") == 2000000L)
    assert(out(4L).getAs[Long]("entropy_micro") == 3000000L)
    assert(!out(1L).getAs[Boolean]("keep") && !out(2L).getAs[Boolean]("keep"))
    // the band is inclusive on the integer micro value
    assert(out(3L).getAs[Boolean]("keep") && out(4L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Long]("n_distinct") == 8L)
    assert(out(4L).getAs[Long]("n_chars2") == 8L)
  }

  test("blocklistScreen: leet fold catches obfuscations, word-exact never substrings") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain spark mention"),             // natural hit
      (2L, "obfuscated Sp4rk and j01n here"),  // folds to spark + join
      (3L, "sparkle joining windowsill"),      // substrings must NOT match
      (4L, "nothing to see"),                  // clean
      (5L, "w1ndow w!ndow WINDOW"))            // 1→i, !→i, case fold: all 3 hit
      .toDF("doc_id", "text")
    val out = TextStats.blocklistScreen(docs, Seq("spark", "join", "window"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_hits") == 1L &&
      out(1L).getAs[String]("hit_terms") == "spark")
    assert(out(2L).getAs[Long]("n_hits") == 2L &&
      out(2L).getAs[String]("hit_terms") == "join,spark")
    assert(out(3L).getAs[Long]("n_hits") == 0L &&
      !out(3L).getAs[Boolean]("flagged"),
      "substring matches are the Scunthorpe bug — must be word-exact")
    assert(out(4L).getAs[Long]("n_hits") == 0L &&
      out(4L).getAs[String]("hit_terms") == "")
    assert(out(5L).getAs[Long]("n_hits") == 3L &&
      out(5L).getAs[String]("hit_terms") == "window")
  }

  test("vocabGrowth: hand-checked prefix counts; repeats never re-count") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a"),        // tokens 3, vocab {a,b}
      (1L, "b c"),          // +2 tokens, +{c}
      (2L, "a  d"),         // +2 tokens (double space drops), +{d}
      (3L, "d d d"))        // +3 tokens, vocab unchanged
      .toDF("doc_id", "text")
    val got = TextStats.vocabGrowth(docs, checkpoints = Seq(1L, 2L, 3L, 4L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 2L), (2L, 5L, 3L), (3L, 7L, 4L), (4L, 10L, 4L)))
    // monotone by construction; a checkpoint past the corpus is the total
    val tail = TextStats.vocabGrowth(docs, checkpoints = Seq(100L)).head()
    assert(tail.getLong(1) == 10L && tail.getLong(2) == 4L)
  }
}
