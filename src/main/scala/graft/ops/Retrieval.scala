package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval scoring over a document corpus — the lexical
  * side of the hybrid (dense + sparse) search a training-data
  * pipeline runs for decontamination probes and targeted corpus
  * slicing, next to the ANN family in [[Similarity]].
  *
  * Scoring is a BM25 surrogate in EXACT integer milli so the t114
  * oracle replays it bit-for-bit: the tf saturation and length
  * normalization are Robertson's, with k1 = 6/5 and b = 3/4 kept as
  * rationals and the whole term score evaluated in one integer
  * expression; the idf is the monotone rational surrogate
  * (N − df + 1)·1000 div (df + 1) instead of the log form (floating
  * logs cannot be hash-pinned across engines — same trade the KN
  * perplexity gate documents). Production scoring at 100 TB would
  * flip the idf to the float log form; every plan shape below is
  * unchanged by that swap.
  */
object Retrieval {

  /** Top-k docs for a bag of query terms.
    *
    * Plan: one explode pass builds per-(doc, term) tf for the query
    * terms only (the IN filter prunes before the shuffle, so the agg
    * is query-sized, not corpus-vocabulary-sized); df and idf are a
    * terms-cardinality aggregate broadcast back onto tf; doc length
    * joins in as a projection of the same scan; corpus totals (N, W)
    * are one 1-row aggregate. No corpus-sized join, no window.
    *
    * Term scores floor-divide BEFORE summing (deterministic on both
    * engines); ties at the cut break to the smaller doc_id.
    *
    * Output: (doc_id, n_hits, bm25_milli), top `k` by score.
    */
  def bm25Lite(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Lite needs at least one query term")
    val spark = docs.sparkSession
    val ws = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val base = docs.select(col(idCol).cast("long").as("doc_id"), ws.as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("dl"))

    val totals = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("dl")).cast("long").as("w")).collect().head
    val n = totals.getLong(0); val w = totals.getLong(1)

    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val idf = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
      .select(col("term"),
        expr(s"(${n}L - df + 1) * 1000 div (df + 1)").as("idf_milli"))

    tf.join(broadcast(idf), "term")
      // Robertson tf·length normalization with k1=6/5, b=3/4, cleared
      // of denominators by 20·W·N: tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
      .select(col("doc_id"),
        expr(s"idf_milli * (tf * 44 * ${w}L) div " +
          s"(20 * ${w}L * tf + 6 * ${w}L + 18 * dl * ${n}L)").as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_hits"),
        sum(col("s")).cast("long").as("bm25_milli"))
      .orderBy(col("bm25_milli").desc, col("doc_id"))
      .limit(k)
  }
}
