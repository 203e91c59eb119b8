package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed merge training and
  * greedy encode — the real subword regime a training-data pipeline
  * runs before packing (t50's regex counting estimates token budgets;
  * this LEARNS the vocabulary).
  *
  * Scale posture: the corpus-sized pass happens exactly once (word
  * histogram), and NOTHING else scales with the corpus. [[train]]
  * caps the histogram to the `topWords` most frequent words (top-K is
  * a TakeOrdered, no global sort) and runs the merge loop driver-side
  * with incremental pair counts and a lazily-validated heap — the
  * classic subword trainer shape, because a production vocabulary is
  * 30k–50k merges and one Spark job per merge is not a runnable plan
  * at that depth. 10^6 (word, count) rows is a few hundred MB of
  * driver state; each merge touches only the words containing the
  * winning pair. [[trainDistributed]] keeps the original
  * one-aggregation-per-merge loop as the executable semantic spec —
  * `BpeSpec` pins the two trainers merge-for-merge, and the
  * [[BpeRehearsal]] re-pins the first merges at 200k docs every
  * bench round. Encoding reuses the distinct-word trick: distinct
  * words are tokenized once, then joined back to occurrences, so the
  * per-word merge scan never repeats per occurrence.
  *
  * Merge-application semantics are Sennrich's reference `apply_bpe`
  * (arXiv:1508.07909): merges apply in training order; within one
  * merge, occurrences merge left-to-right, non-overlapping. The t63
  * oracle replays exactly that with chained string replaces over a
  * `|sym||sym|` word representation (delimiters make adjacent matches
  * well-defined, mirroring the left-to-right scan).
  */
object Bpe {

  /** Split a text column into its whitespace words (empties dropped). */
  private def words(docs: DataFrame, textCol: String) =
    filter(split(col(textCol), "\\s+"), w => length(w) > 0)

  /** Learn `nMerges` merges — the production path. ONE distributed
    * job builds the word histogram, capped to the `topWords` most
    * frequent words (deterministic: count desc, word asc) above the
    * `minCount` floor; the merge loop then runs driver-side over that
    * bounded state via [[trainOnHistogram]]. Deterministic: ties on
    * pair count break to the lexicographically smallest (left,
    * right) — identical semantics to [[trainDistributed]], which
    * `BpeSpec` proves merge-for-merge. The default cap (2^20 words,
    * no count floor) leaves any gate-scale corpus uncapped; at 100 TB
    * the cap is the point — rare-word mass contributes negligibly to
    * pair statistics, exactly the trade production tokenizer trainers
    * make.
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text",
      topWords: Int = 1 << 20, minCount: Long = 1L): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(topWords > 0, s"topWords must be positive, got $topWords")
    val hist = docs
      .select(explode(words(docs, textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w").asc)
      .limit(topWords)
      .as[(String, Long)]
      .collect()
    trainOnHistogram(hist.toIndexedSeq, nMerges)
  }

  // ---- byte-level (GPT-2 regime) ----

  /** GPT-2's byte↔unicode table (the public `bytes_to_unicode`
    * construction, re-derived): the 188 printable latin-1 bytes map
    * to themselves; the other 68 shift to U+0100 + counter, so EVERY
    * byte has a printable one-char symbol and byte-level BPE never
    * needs an UNK. Space (0x20) lands on 'Ġ' (U+0120) — the
    * leading-space marker visible in every GPT-2-family vocabulary.
    */
  private[graft] val byteToUnicode: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
      .map(_.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** Inverse byte↔unicode table — decode is table lookup, never
    * search.
    */
  private[graft] val unicodeToByte: Map[Char, Int] =
    byteToUnicode.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Decode a [[byteTokenStats]] `token_str` back to text: split the
    * space-joined token symbols (no symbol char is ever 0x20 — the
    * GPT-2 table maps every byte to a printable non-space char, space
    * itself to Ġ), inverse-map each char to its byte, UTF-8 decode.
    * decode ∘ encode is the identity on single-space-normalized text
    * (the pretokenizer's whitespace canonicalization is the one
    * lossy step, by design — same as GPT-2's).
    */
  def decodeByteTokenStr(tokenStr: String): String = {
    if (tokenStr.isEmpty) return ""
    val syms = tokenStr.split(' ')
    val bytes = new Array[Byte](syms.iterator.map(_.length).sum)
    var w = 0
    syms.foreach { sym =>
      var i = 0
      while (i < sym.length) {
        bytes(w) = unicodeToByte(sym.charAt(i)).toByte
        w += 1; i += 1
      }
    }
    new String(bytes, 0, w, "UTF-8")
  }

  /** One pretoken's byte symbols: the UTF-8 bytes of the word (with
    * its leading space for every word but the document's first — the
    * GPT-2 pretokenization convention) mapped through the table.
    * Multi-byte characters become several symbols, which is the
    * point: the base alphabet is bytes, so nothing is ever
    * out-of-vocabulary.
    */
  private[graft] def byteSymbols(word: String, leadingSpace: Boolean): Seq[String] = {
    val s = (if (leadingSpace) " " else "") + word
    s.getBytes("UTF-8").toSeq.map(b => byteToUnicode(b & 0xff).toString)
  }

  /** Tokenize one pretoken's symbol sequence under an ordered merge
    * list — [[encodeWord]] generalized past char symbols.
    */
  private[graft] def encodeSymbols(syms: Seq[String],
      merges: Seq[(String, String)]): Seq[String] = {
    var s = syms
    merges.foreach { case (a, b) => if (s.length > 1) s = mergeOnce(s, a, b) }
    s
  }

  /** Learn `nMerges` BYTE-level merges — [[train]]'s shape (one
    * histogram pass, capped, driver-side incremental trainer) over
    * GPT-2 pretokens: the histogram keys on (word, is-first-in-doc)
    * because the leading-space marker makes " word" and "word"
    * different byte sequences, exactly as GPT-2 counts them.
    */
  def trainBytes(docs: DataFrame, nMerges: Int, textCol: String = "text",
      topWords: Int = 1 << 20, minCount: Long = 1L): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(topWords > 0, s"topWords must be positive, got $topWords")
    val hist = docs
      .select(posexplode(words(docs, textCol)).as(Seq("pos", "w")))
      .select((col("pos") === 0).as("first"), col("w"))
      .groupBy("first", "w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w").asc, col("first").asc)
      .limit(topWords)
      .as[(Boolean, String, Long)]
      .collect()
    trainOnSymbols(hist.toIndexedSeq.map { case (first, w, n) =>
      (byteSymbols(w, leadingSpace = !first), n)
    }, nMerges)
  }

  /** Per-doc byte-level tokenization stats under a frozen merge list
    * — [[tokenStats]]'s distinct-pretoken encode trick with the
    * (word, is-first) key. Output token_str joins token symbols in
    * document order.
    */
  def byteTokenStats(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergesB = spark.sparkContext.broadcast(merges)
    val occ = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(words(docs, textCol)).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), (col("pos") === 0).as("first"), col("w"))
    val uniq = occ.select(col("first"), col("w")).distinct()
      .as[(Boolean, String)]
      .map { case (first, w) =>
        (first, w, encodeSymbols(byteSymbols(w, leadingSpace = !first), mergesB.value))
      }
      .toDF("first", "w", "toks")
    occ.join(uniq, Seq("first", "w"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_words"),
        sum(size(col("toks"))).cast("bigint").as("n_tokens"),
        array_join(flatten(array_sort(
          collect_list(struct(col("pos"), col("toks"))))
          .getField("toks")), " ").as("token_str"))
  }

  /** Driver-side incremental trainer over a (word, count) histogram:
    * pair counts and a pair→words index update only for the words
    * containing each winning pair (O(Σ affected word length) per
    * merge), with a lazily-validated max-heap for the argmax — stale
    * entries are discarded on pop by comparing against the live
    * count. Stops early when no pair reaches count 2, like both
    * Spark trainers.
    */
  private[graft] def trainOnHistogram(hist: IndexedSeq[(String, Long)],
      nMerges: Int): Seq[(String, String)] =
    trainOnSymbols(hist.map { case (w, n) =>
      (w.map(_.toString): Seq[String], n)
    }, nMerges)

  /** The trainer core over pre-split symbol sequences — shared by the
    * char-level [[train]] and byte-level [[trainBytes]] paths.
    */
  private[graft] def trainOnSymbols(hist: IndexedSeq[(Seq[String], Long)],
      nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val nW = hist.length
    val syms: Array[mutable.ArrayBuffer[String]] =
      Array.tabulate(nW)(i => mutable.ArrayBuffer(hist(i)._1: _*))
    val freqs: Array[Long] = Array.tabulate(nW)(i => hist(i)._2)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def pairsOf(s: mutable.ArrayBuffer[String]): Iterator[(String, String)] =
      (0 until s.length - 1).iterator.map(j => (s(j), s(j + 1)))

    var i = 0
    while (i < nW) {
      pairsOf(syms(i)).foreach { p =>
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + freqs(i))
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
      }
      i += 1
    }
    val heap = new java.util.PriorityQueue[(Long, String, String)](
      math.max(1, pairCounts.size),
      new java.util.Comparator[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(y._1, x._1)
          if (c != 0) c
          else {
            val ca = x._2.compareTo(y._2)
            if (ca != 0) ca else x._3.compareTo(y._3)
          }
        }
      })
    pairCounts.foreach { case ((a, b), n) => heap.add((n, a, b)) }

    val merges = Seq.newBuilder[(String, String)]
    var made = 0
    var done = false
    while (made < nMerges && !done) {
      var best: (Long, String, String) = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        if (pairCounts.getOrElse((e._2, e._3), 0L) == e._1) best = e
      }
      if (best == null || best._1 < 2) done = true
      else {
        val (_, a, b) = best
        merges += ((a, b))
        val affected = pairWords.getOrElse((a, b), mutable.Set.empty).toArray
        val changed = mutable.HashSet.empty[(String, String)]
        affected.foreach { wi =>
          val f = freqs(wi)
          pairsOf(syms(wi)).foreach { p =>
            val nn = pairCounts(p) - f
            if (nn == 0L) pairCounts.remove(p) else pairCounts.update(p, nn)
            changed += p
            pairWords.get(p).foreach(_ -= wi)
          }
          val merged = mutable.ArrayBuffer(mergeOnce(syms(wi).toSeq, a, b): _*)
          syms(wi) = merged
          pairsOf(merged).foreach { p =>
            pairCounts.update(p, pairCounts.getOrElse(p, 0L) + f)
            changed += p
            pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
          }
        }
        changed.foreach(p =>
          pairCounts.get(p).foreach(n => heap.add((n, p._1, p._2))))
        made += 1
      }
    }
    merges.result()
  }

  /** The original one-Spark-job-per-merge trainer, kept as the
    * EXECUTABLE SEMANTIC SPEC of [[train]] (BpeSpec pins them
    * merge-for-merge; [[BpeRehearsal]] re-pins the head of the merge
    * list at 200k docs). Fine for a handful of merges; at production
    * vocabulary depth (30k–50k merges) use [[train]]. Deterministic:
    * ties on pair count break to the lexicographically smallest
    * (left, right). Each iteration is one aggregation job over the
    * distinct-word histogram; the symbols table is
    * localCheckpoint'ed every 8 merges so lineage (and recomputation)
    * cannot grow with the merge count.
    */
  def trainDistributed(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var syms: Dataset[(Seq[String], Long)] = docs
      .select(explode(words(docs, textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (w.map(_.toString): Seq[String], n) }
      .localCheckpoint()

    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < nMerges) {
      val best = syms.flatMap { case (s, n) =>
        (0 until s.length - 1).map(j => ((s(j), s(j + 1)), n))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (n, a, b) }
        .toDF("n", "a", "b")
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).as[(Long, String, String)]
        .collect()
      if (best.isEmpty || best(0)._1 < 2) i = nMerges // no pair worth merging
      else {
        val (_, a, b) = best(0)
        merges += ((a, b))
        syms = syms.map { case (s, n) => (mergeOnce(s, a, b), n) }
        if ((i + 1) % 8 == 0) syms = syms.localCheckpoint()
        i += 1
      }
    }
    merges.result()
  }

  /** One left-to-right, non-overlapping merge pass over a symbol seq. */
  private[graft] def mergeOnce(s: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == a && s(j + 1) == b) { out += a + b; j += 2 }
      else { out += s(j); j += 1 }
    }
    out.result()
  }

  /** Tokenize one word under an ordered merge list (Sennrich apply). */
  private[graft] def encodeWord(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var s: Seq[String] = w.map(_.toString)
    merges.foreach { case (a, b) => if (s.length > 1) s = mergeOnce(s, a, b) }
    s
  }

  /** Per-doc tokenization stats under a fixed merge list: distinct
    * words encode once (broadcast merge ranks, one scan per word),
    * then join back to per-doc occurrences. Output token_str is the
    * full tokenization in document order — a strong whole-result
    * equality surface for the oracle.
    */
  def tokenStats(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergesB = spark.sparkContext.broadcast(merges)

    val occ = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(words(docs, textCol)).as(Seq("pos", "w")))
    val wordToks = occ.select(col("w")).distinct().as[String]
      .map(w => (w, encodeWord(w, mergesB.value)))
      .toDF("w", "toks")
    occ.join(wordToks, "w")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_words"),
        sum(size(col("toks"))).cast("bigint").as("n_tokens"),
        array_join(flatten(array_sort(
          collect_list(struct(col("pos"), col("toks"))))
          .getField("toks")), " ").as("token_str"))
  }

  /** Tokenizer-fit (fertility) report per corpus slice — the table a
    * team reads when choosing a vocabulary: fertility (tokens/word)
    * and compression (chars/token) per group, under a frozen merge
    * list. High fertility on a language means the vocab fragments it
    * (and its documents pay more sequence positions per word of
    * content); chars/token is the effective compression ratio the
    * context window sees.
    *
    * Same scale shape as [[tokenStats]]: each DISTINCT word is
    * encoded once (with its token count and char length), then joined
    * back to occurrences, so the merge scan never repeats per
    * occurrence; the group aggregation is map-side combinable over
    * (group, word) rows. Ratios stay exact integers in milli units
    * (floor division) so an oracle replays them bit-for-bit.
    *
    * Output: (group, n_words, n_tokens, n_chars, fertility_milli,
    * chars_per_token_milli) — one row per distinct `groupCol` value.
    */
  def fertility(docs: DataFrame, merges: Seq[(String, String)],
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergesB = spark.sparkContext.broadcast(merges)

    val occ = docs.select(col(groupCol).as("grp"),
      explode(words(docs, textCol)).as("w"))
    val wordToks = occ.select(col("w")).distinct().as[String]
      .map(w => (w, encodeWord(w, mergesB.value).size, w.length))
      .toDF("w", "n_toks", "n_chars")
    occ.join(wordToks, "w")
      .groupBy(col("grp").as(groupCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_words"),
        sum(col("n_toks")).cast("bigint").as("n_tokens"),
        sum(col("n_chars")).cast("bigint").as("n_chars"))
      .withColumn("fertility_milli", expr("(n_tokens * 1000) div n_words"))
      .withColumn("chars_per_token_milli", expr("(n_chars * 1000) div n_tokens"))
  }
}
