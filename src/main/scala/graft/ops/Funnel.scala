package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-cleaning funnel: the staged filter chain a training-data
  * build runs (dedup → length → quality rules → repetition), reported
  * as per-stage attrition — the table a pipeline owner reads to see
  * WHERE documents die before tuning any threshold.
  *
  * Stages apply sequentially (a doc reaches stage k only if it
  * survived 1..k−1), mirroring production corpus builds (Gopher §A,
  * RefinedWeb §3: dedup and rule gates compose in order, and the
  * reported "% removed" is per-stage on the surviving set).
  *
  * Scale shape: each stage's flag is one linear pass over the corpus
  * (the same passes t48/t53/t60/d40 make individually); flags join on
  * doc_id and collapse into ONE map-side-combinable aggregate row —
  * conditional sums, no per-stage recount of the corpus and no
  * materialized intermediate corpora. The output is |stages| rows.
  */
object Funnel {

  /** Output: (stage_id, stage, n_in, n_out, drop_frac), one row per
    * stage in application order. Thresholds are the t53/t60 gate
    * values; `drop_frac` is a raw double of exact BIGINT counts.
    */
  def qualityFunnel(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // stage 1 — exact dedup: keep the min-id doc of each distinct text
    val keeper = docs
      .groupBy(md5(col(textCol)).as("th"))
      .agg(min(col(idCol)).as("keeper_id"))
    val dedupFlag = docs
      .select(col(idCol).as("doc_id"), md5(col(textCol)).as("th"))
      .join(keeper, "th")
      .select(col("doc_id"), (col("doc_id") === col("keeper_id")).as("k1"))

    // stages 2+3 — length band, then the remaining rule gates (one
    // shared metrics pass; qualityRules folds length into its own
    // pass flag, so the stage split re-derives the components)
    val q = TextStats.qualityRules(docs, idCol, textCol)
      .select(col("doc_id"),
        (col("n_words") >= 50 && col("n_words") <= 100000).as("k2"),
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") < 0.1 &&
          col("stopword_frac") > 0.02 &&
          col("top_bigram_frac") < 0.2).as("k3"))

    // stage 4 — within-doc repetition (docs too short for a 4-gram
    // have nothing to repeat: pass)
    val rep = TextStats.repetitionStats(docs, n = 4, idCol, textCol)
      .select(col("doc_id"), col("dup_frac"))
    val flags = dedupFlag
      .join(q, "doc_id")
      .join(rep, Seq("doc_id"), "left")
      .select(col("k1"), col("k2"), col("k3"),
        (coalesce(col("dup_frac"), lit(0.0)) < 0.2).as("k4"))

    val agg = flags.agg(
      count(lit(1)).as("n0"),
      sum(when(col("k1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("k1") && col("k2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("k1") && col("k2") && col("k3"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("k1") && col("k2") && col("k3") && col("k4"), 1L)
        .otherwise(0L)).as("n4"))

    agg.selectExpr(
        """stack(4,
             1, 'exact_dedup',   n0, n1,
             2, 'length_band',   n1, n2,
             3, 'quality_rules', n2, n3,
             4, 'repetition',    n3, n4) AS (stage_id, stage, n_in, n_out)""")
      .withColumn("drop_frac",
        (col("n_in") - col("n_out")).cast("double") / col("n_in"))
      .orderBy(col("stage_id"))
  }
}
