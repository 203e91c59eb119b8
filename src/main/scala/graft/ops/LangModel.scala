package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the CCNet/Gopher-style perplexity
  * quality filter: train token statistics on a reference slice, score
  * every document by its average bigram log-probability, keep the
  * low-perplexity tail. Rule-based gates (t53) measure surface shape;
  * this measures how LM-like the text is, which is the filter
  * production corpora actually rank on (CCNet, arXiv:1911.00359).
  *
  * Scale posture: one corpus pass explodes adjacent bigrams straight
  * out of the split array (no window shuffle, no self-join); counts
  * are two aggregations on token keys; scoring is two LEFT joins of
  * corpus bigrams against the (much smaller) distinct-bigram and
  * distinct-left-token count tables plus a broadcast 1-row vocabulary
  * scalar. Everything is linear in corpus tokens; nothing enumerates
  * pairs of documents.
  *
  * Determinism: probabilities are exact integer ratios evaluated in
  * one IEEE division; only the per-doc sum of logs is order-sensitive
  * (ulp-level), so `avg_logp`/`ppl` round to 6dp on both engines per
  * the house oracle-parity rules.
  */
object LangModel {

  private def words(textCol: Column): Column =
    filter(split(textCol, "\\s+"), w => length(w) > 0)

  /** Add-one-smoothed bigram perplexity of every doc, trained on the
    * `doc_id < trainMaxId` slice: p(b|a) = (c2(a,b)+1) / (c1(a)+V)
    * with c1 the count of `a` as a bigram left and V the trained
    * vocabulary size. Docs shorter than one bigram drop out.
    */
  def perplexity(docs: DataFrame, trainMaxId: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val d = docs
      .select(col(idCol).cast("long").as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
    val bg = d.select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("a"),
          element_at(col("ws"), i + 2).as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

    val train = bg.filter(col("doc_id") < trainMaxId)
    val c2 = train.groupBy("a", "b").agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy("a").agg(count(lit(1)).as("c1"))
    // V is ONE number — collect it (metadata-sized, the d42-stats
    // precedent) so an empty training slice refuses loudly instead of
    // emitting Infinity scores, and the plan loses a 1-row join
    val v: Long = docs
      .select(col(idCol).cast("long").as("doc_id"), words(col(textCol)).as("ws"))
      .filter(col("doc_id") < trainMaxId)
      .select(explode(col("ws")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
      .head().getLong(0)
    require(v > 0, s"empty LM training slice (no docs below id $trainMaxId " +
      "have words) — every score would be meaningless")

    val scored = bg
      .join(c2, Seq("a", "b"), "left")
      .join(c1, Seq("a"), "left")
      .select(col("doc_id"),
        coalesce(col("c2"), lit(0L)).as("c2n"),
        coalesce(col("c1"), lit(0L)).as("c1n"))
      .withColumn("logp",
        log((col("c2n") + lit(1)).cast("double") / (col("c1n") + lit(v))))

    scored.groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_bigrams"),
        sum(when(col("c2n") === 0, 1).otherwise(0)).cast("int").as("n_unseen"),
        sum(col("c2n")).cast("bigint").as("sum_c2"),
        round(sum(col("logp")) / count(lit(1)), 6).as("avg_logp"),
        round(exp(-sum(col("logp")) / count(lit(1))), 6).as("ppl"))
  }
}
