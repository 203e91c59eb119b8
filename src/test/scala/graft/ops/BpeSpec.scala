package graft.ops

import graft.SparkSpec

/** BPE trainer + encoder (Bpe.scala). The distributed trainer is
  * pinned against an independent in-test reference implementation
  * (naive in-memory loops, Sennrich semantics) on corpora where the
  * merge sequence is fully determined, plus property checks on the
  * encode path (concatenation invariant, merge-order sensitivity).
  */
class BpeSpec extends SparkSpec {

  /** Naive reference trainer: same tie-break (count desc, then
    * lexicographic), same left-to-right merge application.
    */
  private def refTrain(corpus: Seq[String], nMerges: Int): Seq[(String, String)] = {
    var words: Map[Seq[String], Long] = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w.map(_.toString): Seq[String], g.size.toLong) }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < nMerges) {
      val counts = words.toSeq.flatMap { case (s, n) =>
        (0 until s.length - 1).map(j => ((s(j), s(j + 1)), n))
      }.groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
      if (counts.isEmpty || counts.values.max < 2) i = nMerges
      else {
        val (a, b) = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head._1
        merges += ((a, b))
        words = words.toSeq.map { case (s, n) => (Bpe.mergeOnce(s, a, b), n) }
          .groupBy(_._1).map { case (s, g) => (s, g.map(_._2).sum) }
        i += 1
      }
    }
    merges.result()
  }

  test("capped-histogram trainer matches the in-memory reference merge-for-merge") {
    val corpus = Seq(
      "low low low low low", "lower lower newest newest",
      "newest newest newest newest", "widest widest widest",
      "low lower newest widest")
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.train(docs, nMerges = 10)
    val want = refTrain(corpus, nMerges = 10)
    assert(got == want)
    assert(got.nonEmpty && got.head._1.nonEmpty)
  }

  test("driver trainer == distributed spec trainer, incl. overlap pathologies") {
    // 'aaaa'/'aaa' exercise position-multiplicity pair counts and the
    // left-to-right non-overlapping merge; the mixed tail exercises
    // count changes cascading through the incremental bookkeeping
    val corpus = Seq(
      "aaaa aaa aaaa aa", "abab abab ababab", "banana banana bandana",
      "aaaa abab banana", "cccc cccc cc cc cc")
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val driver = Bpe.train(docs, nMerges = 15)
    val dist = Bpe.trainDistributed(docs, nMerges = 15)
    assert(driver == dist)
    assert(driver == refTrain(corpus, nMerges = 15))
  }

  test("trainer stops early when no pair repeats") {
    import spark.implicits._
    val docs = Seq((0L, "ab cd ef")).toDF("doc_id", "text")
    assert(Bpe.train(docs, nMerges = 5).isEmpty)
    assert(Bpe.trainDistributed(docs, nMerges = 5).isEmpty)
  }

  test("byteToUnicode: printable identity, bijection, space -> Ġ") {
    val t = Bpe.byteToUnicode
    assert(t.distinct.length == 256, "byte->unicode must be a bijection")
    assert(t('a'.toInt) == 'a' && t('~'.toInt) == '~' && t(0xFF) == 'ÿ')
    assert(t(0x20) == 'Ġ', "space must map to the Ġ marker")
    assert(t(0x0A) != '\n', "control bytes must shift to printables")
  }

  test("byteSymbols: leading-space marker, multi-byte chars split per byte") {
    assert(Bpe.byteSymbols("ab", leadingSpace = false) == Seq("a", "b"))
    assert(Bpe.byteSymbols("ab", leadingSpace = true) == Seq("Ġ", "a", "b"))
    // 'é' is two UTF-8 bytes (0xC3 0xA9) -> two printable symbols;
    // nothing is ever out-of-vocabulary at the byte level
    val e = Bpe.byteSymbols("é", leadingSpace = false)
    assert(e.length == 2 && e == Seq("Ã", "©"))
    assert(Bpe.byteSymbols("a\nb", leadingSpace = false).length == 3)
  }

  test("byte-level train: the space marker participates in merges") {
    import spark.implicits._
    // pretokens: 'ab' x1 (first), 'Ġab' x2 -> pairs (a,b)=3, (Ġ,a)=2
    val docs = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainBytes(docs, nMerges = 5)
    assert(merges == Seq(("a", "b"), ("Ġ", "ab")))
    val stats = Bpe.byteTokenStats(docs, merges).collect().head
    assert(stats.getAs[Int]("n_words") == 3)
    assert(stats.getAs[Long]("n_tokens") == 3L)
    assert(stats.getAs[String]("token_str") == "ab Ġab Ġab")
  }

  test("topWords cap and minCount floor restrict which words feed pair counts") {
    import spark.implicits._
    // 'zz' x3 dominates; 'qy' x2 is next; 'pp' appears once
    val docs = Seq((0L, "zz zz zz qy qy pp")).toDF("doc_id", "text")
    // cap to the single most frequent word: only (z,z) is countable
    assert(Bpe.train(docs, nMerges = 5, topWords = 1) == Seq(("z", "z")))
    // count floor 3 drops 'qy' and 'pp' the same way
    assert(Bpe.train(docs, nMerges = 5, minCount = 3L) == Seq(("z", "z")))
    // uncapped learns both repeated pairs
    assert(Bpe.train(docs, nMerges = 5) == Seq(("z", "z"), ("q", "y")))
  }

  test("encodeWord: concatenation invariant and merge-order semantics") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    assert(Bpe.encodeWord("lowest", merges) == Seq("low", "est"))
    assert(Bpe.encodeWord("lowest", merges).mkString == "lowest")
    // left-to-right non-overlap: 'aaa' under (a,a) -> [aa, a]
    assert(Bpe.encodeWord("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // order matters: (a,a) then (aa,a) regroups the remainder
    assert(Bpe.encodeWord("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    // 'aaaaa': (a,a) gives [aa, aa, a]; (aa,a) then merges at position 1
    assert(Bpe.encodeWord("aaaaa", Seq(("a", "a"), ("aa", "a"))) == Seq("aa", "aaa"))
  }

  test("tokenStats: per-doc counts and document-order token string") {
    import spark.implicits._
    val docs = Seq((0L, "low lowest low"), (1L, "west west")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"))
    val rows = Bpe.tokenStats(docs, merges).orderBy("doc_id")
      .as[(Long, Int, Long, String)].collect()
    assert(rows(0) == ((0L, 3, 4L, "low low est low")))
    assert(rows(1) == ((1L, 2, 4L, "w est w est")))
  }

  test("fertility: exact per-group token/word/char ratios in milli units") {
    import spark.implicits._
    // srcA: "low lowest" → tokens [low], [low, est] = 3 tokens,
    // 2 words, 9 chars → fertility 1500, chars/token 3000.
    // srcB: "west" → [w, est] = 2 tokens, 1 word, 4 chars →
    // fertility 2000, chars/token 2000.
    val docs = Seq(("srcA", "low lowest"), ("srcB", "west"))
      .toDF("source", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"))
    val rows = Bpe.fertility(docs, merges).orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows(0) == (("srcA", 2L, 3L, 9L, 1500L, 3000L)))
    assert(rows(1) == (("srcB", 1L, 2L, 4L, 2000L, 2000L)))
  }

  test("fertility: repeated words re-use one encode, occurrences still count") {
    import spark.implicits._
    // the same word 5 times in one group: n_words counts occurrences
    // (5), tokens = 5 × per-word tokens — the distinct-encode + join
    // shape must not collapse occurrence counts.
    val docs = Seq(("s", "west west west west west")).toDF("source", "text")
    val merges = Seq(("e", "s"), ("es", "t"))
    val r = Bpe.fertility(docs, merges).head()
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_tokens") == 10L) // [w, est] × 5
    assert(r.getAs[Long]("fertility_milli") == 2000L)
  }

  test("decodeByteTokenStr: round trip over merges, multi-byte UTF-8, empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // multi-byte chars and the space marker both survive the loop
    val texts = Seq("the cat sat", "naïve café — über", "a", "ab  cd")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainBytes(docs, nMerges = 20)
    val rt = Bpe.byteTokenStats(docs, merges)
      .select(col("doc_id"), col("token_str")).as[(Long, String)]
      .collect().map { case (id, ts) => id -> Bpe.decodeByteTokenStr(ts) }
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val norm = t.split(' ').filter(_.nonEmpty).mkString(" ")
      assert(rt(i.toLong) == norm, s"doc $i")
    }
    assert(Bpe.decodeByteTokenStr("") == "")
    // decode is the exact inverse of byteSymbols on raw symbols
    val syms = Bpe.byteSymbols("überß", leadingSpace = true)
    assert(Bpe.decodeByteTokenStr(syms.mkString(" ")) == " überß")
  }
}
