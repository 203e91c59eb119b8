package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece subword encoding (Wu et al. 2016, the BERT tokenizer):
  * greedy longest-match-first against a FIXED vocabulary — first
  * piece matched bare, continuation pieces matched under the `##`
  * prefix, and a word with any unmatchable tail collapsing to
  * `[UNK]` wholesale. Complements [[Bpe]]: BPE learns merges from
  * the corpus; WordPiece ENCODE is what runtime tokenizers do with a
  * shipped vocabulary, and its greedy-longest semantics (not BPE's
  * merge-order semantics) is its own correctness surface.
  *
  * Scale posture mirrors [[Bpe.tokenStats]]: the corpus-sized pass is
  * word occurrence extraction; each DISTINCT word encodes exactly
  * once against the broadcast vocabulary (a hash-set probe per
  * candidate prefix, longest-first), then joins back to occurrences.
  * At 100 TB that is ~10^8 distinct-word encodes against ~10^11
  * occurrences. The vocabulary is model-shipped — kilobytes, never
  * corpus-derived state.
  */
object WordPiece {

  /** Greedy longest-match tokenization of one word. Returns
    * Seq("[UNK]") when any position has no matching piece — the
    * whole-word UNK rule (HuggingFace WordPiece semantics).
    */
  private[graft] def encodeWord(w: String, vocab: Set[String], maxRaw: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var cur = 0
    while (cur < w.length) {
      val prefix = if (cur == 0) "" else "##"
      var end = math.min(w.length, cur + maxRaw)
      var found = -1
      while (end > cur && found < 0) {
        if (vocab.contains(prefix + w.substring(cur, end))) found = end
        else end -= 1
      }
      if (found < 0) return Seq("[UNK]")
      out += prefix + w.substring(cur, found)
      cur = found
    }
    out.result()
  }

  /** Per-doc WordPiece stats under a fixed vocabulary: distinct words
    * encode once, join back to occurrences. Output: (doc_id, n_words,
    * n_tokens, n_unk, token_str) with token_str the full document
    * tokenization in order — the whole-result equality surface.
    */
  def tokenStats(docs: DataFrame, vocab: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vset = vocab.toSet
    val maxRaw = vocab.map(p => p.stripPrefix("##").length).max
    val vocabB = spark.sparkContext.broadcast((vset, maxRaw))

    val ws = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val occ = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(ws).as(Seq("pos", "w")))
    val wordToks = occ.select(col("w")).distinct().as[String]
      .map { w =>
        val (vs, mr) = vocabB.value
        (w, encodeWord(w, vs, mr))
      }
      .toDF("w", "toks")
    occ.join(wordToks, "w")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_words"),
        sum(size(col("toks"))).cast("bigint").as("n_tokens"),
        sum(when(col("toks") === array(lit("[UNK]")), 1).otherwise(0))
          .cast("int").as("n_unk"),
        array_join(flatten(array_sort(
          collect_list(struct(col("pos"), col("toks"))))
          .getField("toks")), " ").as("token_str"))
  }
}
