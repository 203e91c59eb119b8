package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) set-operation sketches over shingle sets —
  * the SKETCH path for cross-source overlap at 100 TB, complementing
  * the exact paths ([[TextDedup.sourceOverlap]] for the matrix,
  * `benchmarkOverlap*` for decontamination): when the question is
  * "how much do two crawls overlap?" rather than "which documents?",
  * a pair of k-sized sketches answers it from ONE pass per side —
  * no cross-source shuffle of the gram tables at all.
  *
  * The estimator is Beyer et al.'s KMV set algebra (SIGMOD'07, same
  * family as the theta sketch): with shingle hashes uniform on
  * [0, 2^56), the k-th smallest distinct hash θ of a set estimates
  * its cardinality as (k−1)·2^56/θ, and the k smallest of the UNION
  * of two sketches is exactly the union's sketch. The fraction ρ of
  * those union-sketch members present in both sides estimates the
  * Jaccard, so intersection ≈ ρ · union_est.
  *
  * Everything is data-deterministic (md5-derived hashes, no
  * engine-private sketch state), so an oracle replays the estimate
  * bit-for-bit — same contract as the q46 KMV distinct gate.
  *
  * Scale shape: per side, shingle → hash → distinct (one shuffle) →
  * k smallest, which Spark plans as TakeOrderedAndProject — k values
  * per partition, k merged, never a global sort. Downstream algebra
  * touches ≤ 2k rows.
  */
object KmvSketch {

  /** 56-bit md5-derived hash of every distinct shingle of a corpus
    * slice, as a 1-column (h) DataFrame.
    */
  private def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame =
    TextDedup.shingleSets(docs, idCol, textCol, shingleK)
      .select(explode(col("sh")).as("shingle"))
      .select(expr("CAST(conv(substring(md5(shingle), 1, 14), 16, 10) AS BIGINT)").as("h"))
      .distinct()

  /** Estimate |A∪B| and |A∩B| of two slices' distinct shingle sets
    * from two k-sized sketches. Output is ONE row:
    * (k_union, theta, k_inter, union_est, inter_est) — k_union < k
    * means the union sketch held every value and the estimates are
    * exact counts.
    */
  def overlapEstimate(docsA: DataFrame, docsB: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, k: Int = 256): DataFrame = {
    def sketch(d: DataFrame) =
      shingleHashes(d, idCol, textCol, shingleK).orderBy(col("h")).limit(k)
    // the sketches are k-sized: the full join + re-limit below move
    // at most 2k rows, whatever the corpus size
    val a = sketch(docsA).select(col("h"), lit(1L).as("in_a"))
    val b = sketch(docsB).select(col("h"), lit(1L).as("in_b"))
    val unionSketch = a.join(b, Seq("h"), "full")
      .select(col("h"),
        coalesce(col("in_a"), lit(0L)).as("in_a"),
        coalesce(col("in_b"), lit(0L)).as("in_b"))
      .orderBy(col("h")).limit(k)
    unionSketch
      .agg(count(lit(1)).as("k_union"), max(col("h")).as("theta"),
        sum(col("in_a") * col("in_b")).as("k_inter"))
      .select(col("k_union").cast("bigint"), col("theta"),
        col("k_inter").cast("bigint"),
        when(col("k_union") < k, col("k_union").cast("double"))
          .otherwise((col("k_union") - 1).cast("double") *
            lit(72057594037927936.0) / col("theta"))
          .as("union_est"))
      .withColumn("inter_est",
        col("k_inter").cast("double") / col("k_union") * col("union_est"))
  }
}
