package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Release-side privacy screens for corpus exports — the k-anonymity
  * generalization step (Sweeney 2002) run before a dataset with
  * quasi-identifier columns leaves the pipeline; complements the
  * row-level PII redaction surface ([[TextStats]] `t52`), which
  * scrubs values inside text but cannot see identifying COMBINATIONS
  * across columns.
  *
  * Scale shape: one map-side-combinable groupBy on the quasi-id tuple
  * (group-cardinality rows, ≪ input), then the sizes re-join the rows
  * on the same keys — AQE broadcasts the size table whenever group
  * cardinality is small, and the equi-join partitioning matches the
  * aggregation's, so the worst case is one shuffle class over the
  * input. No window over the whole table, no driver state.
  */
object Privacy {

  /** Suppress quasi-identifier combinations shared by fewer than `k`
    * rows: every quasi-id column of such rows generalizes to `"*"`.
    * Non-key columns pass through untouched; output column order is
    * the input's, with quasi-ids cast to string (the generalized
    * domain).
    *
    * Semantics of the `"*"` rows: `"*"` is the FULLY GENERALIZED
    * value — it matches every value of that attribute, so a record
    * suppressed to all-`"*"` is indistinguishable from any released
    * record and the output satisfies k-anonymity under that standard
    * generalization-lattice reading. Under the stricter literal
    * reading where `"*"` only equals `"*"`, the suppressed rows form
    * their own equivalence class which can itself hold fewer than k
    * rows; callers who need that property should drop groups with
    * `__group_n < k` instead of generalizing them.
    */
  def kAnonymize(df: DataFrame, keys: Seq[String], k: Long): DataFrame = {
    require(keys.nonEmpty, "kAnonymize needs at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    val sizes = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__group_n"))
    val joined = df.join(sizes, keys)
    val outCols = df.columns.map { c =>
      if (keys.contains(c))
        when(col("__group_n") >= k, col(c).cast("string"))
          .otherwise(lit("*")).as(c)
      else col(c)
    }
    joined.select(outCols.toIndexedSeq: _*)
  }
}
