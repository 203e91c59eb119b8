package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-corruption sample generation (T5, Raffel et al. 2020 §3.1.4;
  * the BERT-family MLM objective is the single-token special case) —
  * the transform that turns a cleaned corpus into (input, target)
  * pretraining pairs: a deterministic ~15% of tokens mask out,
  * consecutive masked tokens merge into one numbered sentinel in the
  * input, and the target lists each sentinel followed by the tokens
  * it replaced.
  *
  * Everything is a codegen'd Column program — no UDF, no kernel:
  * token selection is an md5 keyed on (doc_id, position), so the
  * SAME document always corrupts identically on any cluster, any
  * partitioning, any Spark version (reproducible pretraining data),
  * and a SQL oracle replays every mask decision. Span numbering is
  * one window (cumulative count of span starts); reassembly is one
  * groupBy with order-preserving piece concatenation. Shuffle cost:
  * the window + the rebuild — both keyed on doc_id, linear in corpus
  * tokens.
  */
object SpanCorrupt {

  /** Mask predicate: first two md5 hex chars of "doc_id:pos" below
    * `maskHex` ("26" → 38/256 ≈ 14.8%).
    */
  private def maskedCol(maskHex: String): Column =
    substring(md5(concat_ws(":", col("doc_id"), col("pos"))), 1, 2) < lit(maskHex)

  /** (doc_id, masked_text, target_text, n_tokens, n_masked, n_spans)
    * per document. Sentinels are `<extra_id_K>`, K 0-based in span
    * order, capped nowhere (real pipelines cap ~100; capping is a
    * filter on n_spans the caller applies).
    */
  def corrupt(docs: DataFrame, maskHex: String = "26",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(filter(split(col(textCol), " "), t => length(t) > 0)))
      .withColumnRenamed("pos", "pos").withColumnRenamed("col", "tok")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val marked = toks
      .withColumn("masked", maskedCol(maskHex))
      .withColumn("start",
        col("masked") && !coalesce(lag(col("masked"), 1).over(w), lit(false)))
      .withColumn("span_id",
        sum(when(col("start"), 1L).otherwise(0L)).over(w))
    val sentinel = concat(lit("<extra_id_"), (col("span_id") - 1).cast("string"), lit(">"))
    val pieces = marked
      .withColumn("in_piece",
        when(!col("masked"), col("tok"))
          .when(col("start"), sentinel)
          .otherwise(lit(null: String)))
      .withColumn("tgt_piece",
        when(col("masked") && col("start"), concat(sentinel, lit(" "), col("tok")))
          .when(col("masked"), col("tok"))
          .otherwise(lit(null: String)))
    pieces.groupBy("doc_id").agg(
      array_join(filter(array_sort(collect_list(
        struct(col("pos"), col("in_piece").as("p")))).getField("p"),
        p => p.isNotNull), " ").as("masked_text"),
      array_join(filter(array_sort(collect_list(
        struct(col("pos"), col("tgt_piece").as("p")))).getField("p"),
        p => p.isNotNull), " ").as("target_text"),
      count(lit(1)).cast("int").as("n_tokens"),
      sum(when(col("masked"), 1).otherwise(0)).cast("int").as("n_masked"),
      max(col("span_id")).cast("int").as("n_spans"))
  }
}
