package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus statistics report — the "data card" table every corpus
  * release ships (source × language composition, mass, duplication,
  * length distribution): one row per (source, lang) with counts,
  * character/word mass, exact distinct-text counts, the EXACT
  * discrete median document length, and the dup ratio.
  *
  * Scale shape: one groupBy on the (source, lang) key with map-side
  * combine (distinct counts through Spark's two-level partial
  * distinct aggregation); the median comes from the two-phase
  * discrete percentile job ([[Percentiles.twoPhaseDiscrete]]) — never
  * a per-group sort or a single-task window — joined back on the
  * group key. Group count is sources × languages (thousands at most),
  * so the final join broadcasts.
  */
object CorpusReport {

  /** One row per (source, lang): n_docs, n_unique_texts, total_chars,
    * total_words, median_words (exact discrete p50), dup_ratio
    * (1 − unique/docs, 6dp).
    */
  def bySourceLang(docs: DataFrame, sourceCol: String = "source",
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val base = docs.select(
      col(sourceCol).as("source"), col(langCol).as("lang"),
      col(textCol).as("_t"),
      size(filter(split(col(textCol), "\\s+"), w => length(w) > 0))
        .cast("long").as("_nw"))
    val agg = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(md5(col("_t"))).as("n_unique_texts"),
        sum(length(col("_t"))).cast("bigint").as("total_chars"),
        sum(col("_nw")).cast("bigint").as("total_words"))
      .withColumn("dup_ratio", round(
        lit(1.0) - col("n_unique_texts").cast("double") / col("n_docs").cast("double"), 6))
    val med = Percentiles.twoPhaseDiscrete(
        base.withColumn("g", concat_ws("\u0001", col("source"), col("lang"))),
        "g", "_nw", qs = Seq(0.5))
      .select(col("g"), col("value").as("median_words"))
    agg
      .withColumn("g", concat_ws("\u0001", col("source"), col("lang")))
      .join(broadcast(med), "g")
      .select("source", "lang", "n_docs", "n_unique_texts", "total_chars",
        "total_words", "median_words", "dup_ratio")
  }
}
