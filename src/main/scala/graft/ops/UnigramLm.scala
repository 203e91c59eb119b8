package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword encoding (Kudo 2018, the SentencePiece
  * default): Viterbi-optimal segmentation of each word against a
  * vocabulary of (piece, cost) — the segmentation minimizing total
  * piece cost, unlike [[WordPiece]]'s greedy longest-match and
  * [[Bpe]]'s merge-order replay. Completes the tokenizer triple a
  * training pipeline actually encounters (BPE: GPT-family; WordPiece:
  * BERT-family; Unigram: T5/SentencePiece-family).
  *
  * Costs are EXACT INTEGERS (micro-nats, = round(−ln p · 10⁶) for a
  * real model): the DP, all comparisons, and both tie-breaks (fewer
  * pieces, then lexicographically smallest token sequence) run in
  * integer/string arithmetic, so segmentations are bit-reproducible
  * on any engine — a float-scored Viterbi could flip on ulp noise and
  * no SQL oracle could replay it. A word with no segmentation
  * collapses to `[UNK]` at [[UnkCost]].
  *
  * Scale posture mirrors [[Bpe.tokenStats]]: distinct words Viterbi
  * once against the broadcast vocabulary (O(len·|vocab|) per word),
  * then join back to occurrences.
  */
object UnigramLm {

  /** Cost charged for a whole-word [UNK] (micro-nats). */
  val UnkCost = 2000000L

  /** Viterbi-optimal segmentation of one word. Returns (tokens,
    * totalCost); unreachable words → (Seq("[UNK]"), UnkCost).
    * Tie-break is PER PREFIX STATE: each DP position keeps the one
    * candidate minimizing (cost, token count so far, token sequence
    * lexicographically) — a deterministic left-to-right rule an
    * oracle replays exactly, chosen over "globally smallest sequence"
    * because the latter has no optimal substructure.
    */
  private[graft] def encodeWord(w: String,
      vocab: Seq[(String, Long)]): (Seq[String], Long) = {
    val L = w.length
    // best(j) = optimal (cost, toks) for the prefix w[0, j)
    val cost = Array.fill(L + 1)(Long.MaxValue)
    val toks = Array.fill[List[String]](L + 1)(Nil) // reversed
    cost(0) = 0L
    var j = 1
    while (j <= L) {
      vocab.foreach { case (p, c) =>
        val l = p.length
        if (l <= j && cost(j - l) != Long.MaxValue &&
            w.regionMatches(j - l, p, 0, l)) {
          val cand = cost(j - l) + c
          val candToks = p :: toks(j - l)
          if (cand < cost(j) || (cand == cost(j) && better(candToks, toks(j)))) {
            cost(j) = cand
            toks(j) = candToks
          }
        }
      }
      j += 1
    }
    if (cost(L) == Long.MaxValue) (Seq("[UNK]"), UnkCost)
    else (toks(L).reverse, cost(L))
  }

  /** Is reversed token list `a` preferred over `b` at equal cost?
    * Fewer tokens first, then lexicographically smaller sequence
    * (in forward order).
    */
  private def better(a: List[String], b: List[String]): Boolean = {
    if (a.length != b.length) return a.length < b.length
    val fa = a.reverse
    val fb = b.reverse
    val it = fa.iterator.zip(fb.iterator)
    while (it.hasNext) {
      val (x, y) = it.next()
      val c = x.compareTo(y)
      if (c != 0) return c < 0
    }
    false
  }

  /** Per-doc Viterbi tokenization stats under a fixed (piece, cost)
    * vocabulary: distinct words encode once, join back. Output:
    * (doc_id, n_words, n_tokens, n_unk, total_cost, token_str).
    */
  def tokenStats(docs: DataFrame, vocab: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabB = spark.sparkContext.broadcast(vocab)

    val ws = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val occ = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(ws).as(Seq("pos", "w")))
    val wordToks = occ.select(col("w")).distinct().as[String]
      .map { w =>
        val (t, c) = encodeWord(w, vocabB.value)
        (w, t, c)
      }
      .toDF("w", "toks", "cost")
    occ.join(wordToks, "w")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_words"),
        sum(size(col("toks"))).cast("bigint").as("n_tokens"),
        sum(when(col("toks") === array(lit("[UNK]")), 1).otherwise(0))
          .cast("int").as("n_unk"),
        sum(col("cost")).cast("bigint").as("total_cost"),
        array_join(flatten(array_sort(
          collect_list(struct(col("pos"), col("toks"))))
          .getField("toks")), " ").as("token_str"))
  }
}
