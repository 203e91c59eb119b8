package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every document by how much more likely its
  * hashed-n-gram feature distribution is under a small TARGET corpus
  * than under the RAW pool, then keep/sample the high-weight docs.
  *
  * The feature space is `buckets` hashed unigram bins (md5 → 32 hash
  * bits → mod buckets, the same deterministic bucket function as the
  * quality classifier). Per-bucket add-one-smoothed log ratios
  *
  *   w(b) = ln( (ct(b)+1)·(Traw+B) / ((Ttgt+B)·(cr(b)+1)) )
  *
  * form a B-row weight table (kilobytes at ANY corpus size — this is
  * the whole model); each document's log importance weight is the
  * n-weighted sum of its bucket counts against that broadcast table.
  * Per-bucket weights quantize to exact micro-unit BIGINTs after a
  * 6dp round (the BM25 pattern), so the per-doc sum is
  * order-independent and bit-identical across engines.
  *
  * Execution shape: one explode + one (doc, bucket) aggregation; the
  * global bucket histograms re-aggregate those partials (tiny), and
  * the scoring join broadcasts the B-row weight table — no shuffle
  * touches anything wider than (doc_id, bucket, n). Linear at 100 TB.
  *
  * Output: (doc_id, n_tokens, logw_micro, logw, keep) — keep is
  * logw > 0, i.e. the doc looks more target-like than pool-like.
  */
object Dsir {

  def importanceWeights(docs: DataFrame, targetSource: String,
      buckets: Int = 64, idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"bucket count $buckets out of range")
    val spark = docs.sparkSession
    val b = buckets

    // (doc, source, bucket) token counts — the one wide aggregation
    val perDoc = docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        explode(TextDedup.words(col(textCol))).as("w"))
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % b)
          .cast("int").as("bucket"))
      .groupBy("doc_id", "source", "bucket").agg(count(lit(1)).as("n"))

    // global target/raw bucket histograms (≤ 2·B rows) + their totals
    val glob = perDoc
      .groupBy(col("bucket"), (col("source") === targetSource).as("is_tgt"))
      .agg(sum(col("n")).as("n"))
    val tgt = glob.filter(col("is_tgt")).select(col("bucket"), col("n").as("ct"))
    val raw = glob.filter(!col("is_tgt")).select(col("bucket"), col("n").as("cr"))
    val totals = glob.agg(
      sum(when(col("is_tgt"), col("n")).otherwise(lit(0L))).as("t_tgt"),
      sum(when(!col("is_tgt"), col("n")).otherwise(lit(0L))).as("t_raw"))

    // the B-row weight table: add-one-smoothed log ratio, 6dp-rounded,
    // micro-quantized so doc sums are exact integers
    val spine = spark.range(b).select(col("id").cast("int").as("bucket"))
    val weights = spine
      .join(tgt, Seq("bucket"), "left")
      .join(raw, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(totals)) // 1-row aggregate combine
      .select(col("bucket"),
        round(round(
          log((col("ct") + lit(1.0)) * (col("t_raw") + lit(b.toDouble))
            / ((col("t_tgt") + lit(b.toDouble)) * (col("cr") + lit(1.0)))), 6)
          * lit(1e6)).cast("long").as("w_micro"))

    perDoc
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        sum(col("n") * col("w_micro")).cast("long").as("logw_micro"))
      .select(col("doc_id"), col("n_tokens"), col("logw_micro"),
        (col("logw_micro").cast("double") / lit(1e6)).as("logw"),
        (col("logw_micro") > 0L).as("keep"))
  }
}
