package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed merge training and
  * greedy encode — the real subword regime a training-data pipeline
  * runs before packing (t50's regex counting estimates token budgets;
  * this LEARNS the vocabulary).
  *
  * Scale posture: the corpus-sized pass happens exactly once (word
  * histogram). The merge loop iterates over the DISTINCT-WORD table
  * only — at 100 TB that is ~10^8 rows against ~10^11 documents, a
  * 1000x reduction — with one shuffle per merge (pair count + argmax)
  * and a map-side merge application. Driver traffic per iteration is
  * ONE row (the winning pair). Encoding reuses the same trick:
  * distinct words are tokenized once, then joined back to occurrences,
  * so the per-word merge scan never repeats per occurrence.
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

  /** Learn `nMerges` merges. Deterministic: ties on pair count break
    * to the lexicographically smallest (left, right). Each iteration
    * is one aggregation job over the distinct-word histogram; the
    * symbols table is localCheckpoint'ed every 8 merges so lineage
    * (and recomputation) cannot grow with the merge count.
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text"): Seq[(String, String)] = {
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
