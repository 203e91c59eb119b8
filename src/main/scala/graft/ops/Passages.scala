package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window passage chunking with overlap — the retrieval/RAG
  * counterpart of [[SequencePack]]'s training-side packing and the
  * content-defined (t110) chunker: every document splits into
  * `window`-word passages advancing by `stride` words, so consecutive
  * passages overlap by `window − stride` words and no word is more
  * than one window from a passage boundary. The last window starts at
  * the final stride step that still has unseen words (a short tail
  * passage, never a dropped one); an empty document emits nothing.
  *
  * Scale posture: one projection — the window math is a pure
  * per-row `transform(sequence(...))` over the word array, ZERO
  * shuffles, trivially codegen'd. Passage identity is the md5 of the
  * passage text, which is what downstream exact-dedup joins on.
  */
object Passages {

  def windows(docs: DataFrame, window: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        expr(s"filter(split($textCol, ' '), x -> x <> '')").as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
      .filter(col("n") > 0)
      // starts: 0, stride, 2·stride, … while start < n and the window
      // ending before it did not already cover the whole doc
      .select(col("doc_id"), col("n"),
        posexplode(expr(
          s"transform(sequence(0, int(greatest(ceil((n - $window) / ${stride}.0), 0))), " +
            s"i -> slice(ws, i * $stride + 1, $window))"))
          .as(Seq("win_id", "pw")))
      .select(col("doc_id"), col("win_id"),
        (col("win_id") * stride).as("start_word"),
        size(col("pw")).as("n_words"),
        element_at(col("pw"), 1).as("head_word"),
        element_at(col("pw"), -1).as("tail_word"),
        md5(array_join(col("pw"), " ")).as("passage_hash"))
  }
}
