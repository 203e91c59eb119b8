package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fill-in-the-middle sample generation (Bavarian et al. 2022,
  * arXiv:2207.14255 — the code-model pretraining transform): a
  * deterministic fraction of documents split into (prefix, middle,
  * suffix) at md5-derived word boundaries and reassembled in PSM
  * (`<PRE> p <SUF> s <MID> m`) or SPM (`<SUF> s <PRE> p <MID> m`)
  * sentinel order, alternating by hash; the rest pass through
  * untransformed. The t84 span-corruption sibling: same pure-Column,
  * md5-keyed determinism (identical output on any cluster,
  * partitioning, or rerun), different objective.
  *
  * All randomness is the established md5 construction (the
  * Splits/s47 pattern: first 14 hex digits as a 56-bit integer), so
  * any SQL engine replays rate gating, both split points, and the
  * mode choice exactly. Pure projection: no shuffle, no kernel, no
  * state — codegen'd built-ins end to end.
  */
object Fim {

  private def h(idCol: String, salt: String) =
    expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING) || ':$salt'), 1, 14), " +
      "16, 10) AS BIGINT)")

  /** Transform `rateMilli`/1000 of documents (word count ≥ 3) into
    * FIM samples. Output: (doc_id, mode psm|spm|none, n_words,
    * split_a, split_b, fim_text); untransformed docs carry the
    * original text with split_a = split_b = -1.
    */
  def transform(docs: DataFrame, rateMilli: Int = 500,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(rateMilli >= 0 && rateMilli <= 1000,
      s"rateMilli must be in [0, 1000], got $rateMilli")
    val ws = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("_text"), ws.as("_ws"))
      .withColumn("n_words", size(col("_ws")))
      .withColumn("_gate", h("doc_id", "fim0") % 1000)
      // split points over word boundaries: a ∈ [1, n−1] cuts off a
      // nonempty prefix, b ∈ [a, n] may leave middle/suffix empty —
      // real FIM trains on empty middles too
      .withColumn("_a", (h("doc_id", "fim1") % (col("n_words") - 1) + 1).cast("int"))
      .withColumn("_b",
        (col("_a") + h("doc_id", "fim2") % (col("n_words") - col("_a") + 1)).cast("int"))
      .withColumn("_fim", col("n_words") >= 3 && col("_gate") < rateMilli)
    val prefix = array_join(slice(col("_ws"), lit(1), col("_a")), " ")
    val middle = array_join(
      slice(col("_ws"), col("_a") + 1, col("_b") - col("_a")), " ")
    val suffix = array_join(
      slice(col("_ws"), col("_b") + 1, col("n_words") - col("_b")), " ")
    base
      .withColumn("mode",
        when(!col("_fim"), "none")
          .when(h("doc_id", "fim3") % 2 === 0, "psm")
          .otherwise("spm"))
      .withColumn("split_a", when(col("_fim"), col("_a")).otherwise(lit(-1)))
      .withColumn("split_b", when(col("_fim"), col("_b")).otherwise(lit(-1)))
      .withColumn("fim_text",
        when(col("mode") === "psm",
          concat(lit("<PRE> "), prefix, lit(" <SUF> "), suffix,
            lit(" <MID> "), middle))
          .when(col("mode") === "spm",
            concat(lit("<SUF> "), suffix, lit(" <PRE> "), prefix,
              lit(" <MID> "), middle))
          .otherwise(col("_text")))
      .select("doc_id", "mode", "n_words", "split_a", "split_b", "fim_text")
  }
}
