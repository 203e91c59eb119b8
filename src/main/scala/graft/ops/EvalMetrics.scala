package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation metrics for generation pipelines. Everything is exact
  * integer arithmetic (micro-units where a ratio is reported) so any
  * engine reproduces the numbers bit-for-bit — the same discipline
  * as the rest of the oracle surface.
  */
object EvalMetrics {

  /** Unbiased pass@k (Chen et al. 2021, the HumanEval estimator):
    * for a task with n samples of which c passed,
    * pass@k = 1 − C(n−c, k)/C(n, k), computed as the exact rational
    * Π_{i<k}(n−c−i) / Π_{i<k}(n−i) in BigInt and floored to
    * micro-units — no float raggedness, no lgamma approximation.
    *
    * Input: one row per sample with (idCol, passedCol). Scale shape:
    * ONE groupBy on the task key reduces samples to (n, c); the per-k
    * combinatorics run over the task-count-sized table in a typed
    * map. Output: (task_id, k, n, c, pass_micro).
    */
  def passAtK(samples: DataFrame, ks: Seq[Int], idCol: String = "task_id",
      passedCol: String = "passed"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val spark = samples.sparkSession
    import spark.implicits._
    val agg = samples.groupBy(col(idCol).cast("long").as("task_id"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(passedCol), 1L).otherwise(0L)).cast("long").as("c"))
      .as[(Long, Long, Long)]
    val ksB = ks.toArray
    agg.flatMap { case (task, n, c) =>
      ksB.iterator.filter(_ <= n).map { k =>
        val micro =
          if (n - c < k) 1000000L // fewer failures than k ⇒ certain pass
          else {
            var num = BigInt(1); var den = BigInt(1)
            var i = 0L
            while (i < k) { num *= BigInt(n - c - i); den *= BigInt(n - i); i += 1 }
            ((den - num) * 1000000 / den).toLong
          }
        (task, k, n, c, micro)
      }
    }.toDF("task_id", "k", "n", "c", "pass_micro")
  }
}
