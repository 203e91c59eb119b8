package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget mixture sampling — the "data mixture" step of a
  * training-data pipeline: given a per-source token budget (the
  * mixture weights × total token target), deterministically select a
  * prefix of each source's documents, in a pseudo-random but
  * engine-replayable order, whose cumulative token count stays within
  * the source's budget.
  *
  * Selection order within a source is md5(doc_id) (then doc_id) — a
  * uniform shuffle any engine reproduces, so the sample is unbiased
  * w.r.t. document order in the files yet bit-identical everywhere.
  *
  * Scale shape: the naive form — a cumulative-sum window partitioned
  * by source — serializes EACH SOURCE through one task, a straggler
  * when a source is terabytes. This implementation computes the same
  * cumulative sums with a distributed prefix-sum instead:
  *
  *  1. range-repartition on (source, priority, doc_id) — the total
  *     selection order — and sort within partitions;
  *  2. one pass computes per-(partition, source) subtotals — a tiny
  *     (≤ partitions × sources) table collected to the driver (the
  *     same metadata-sized reduce as a centroid update, NOT a data
  *     collect);
  *  3. per-(partition, source) OFFSETS (sum of earlier partitions'
  *     subtotals) broadcast back; a second pass adds each row's
  *     partition-local running sum to its offset — giving the exact
  *     global per-source cumulative sum with every partition working
  *     in parallel.
  *
  * All counts are exact BIGINTs, so parity with a window-function
  * oracle is exact by construction.
  */
object BudgetSample {

  /** Greedy prefix sample per source: keep each source's documents,
    * in md5-priority order, while the running token total stays
    * ≤ the source's budget. Sources absent from `budgets` are
    * excluded entirely.
    *
    * Output: (doc_id, source, n_tokens, cum_tokens) for kept rows.
    */
  def tokenBudgetSample(docs: DataFrame, budgets: Map[String, Long],
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs.select(
        col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        size(TextDedup.words(col(textCol))).cast("long").as("n_tokens"),
        md5(col(idCol).cast("string")).as("pri"))
      .filter(col("source").isInCollection(budgets.keys.toSeq))

    // the total selection order, range-partitioned so every partition
    // holds a contiguous slice of it
    val ordered = base
      .repartitionByRange(col("source"), col("pri"), col("doc_id"))
      .sortWithinPartitions(col("source"), col("pri"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-(partition, source) subtotals — metadata-sized
    val subtotals = ordered.groupBy(col("pid"), col("source"))
      .agg(sum(col("n_tokens")).as("t"))
      .as[(Int, String, Long)]
      .collect()

    // offset(pid, source) = Σ subtotals of earlier partitions
    val offsets: Map[(Int, String), Long] = {
      val bySource = subtotals.groupBy(_._2)
      bySource.flatMap { case (src, rows) =>
        val sorted = rows.sortBy(_._1)
        var acc = 0L
        sorted.map { case (pid, _, t) =>
          val o = ((pid, src), acc)
          acc += t
          o
        }
      }
    }
    val offBc = spark.sparkContext.broadcast(offsets)
    val budBc = spark.sparkContext.broadcast(budgets)

    // pass 2: partition-local running sums + the broadcast offset =
    // exact global cumulative sum; then the budget filter
    val out = ordered.select("doc_id", "source", "n_tokens", "pid")
      .as[(Long, String, Long, Int)]
      .mapPartitions { it =>
        val off = offBc.value
        val bud = budBc.value
        val local = scala.collection.mutable.HashMap.empty[String, Long]
        it.flatMap { case (id, src, n, pid) =>
          val cum = off.getOrElse((pid, src), 0L) + local.getOrElse(src, 0L) + n
          local(src) = local.getOrElse(src, 0L) + n
          if (cum <= bud.getOrElse(src, 0L)) Iterator.single((id, src, n, cum))
          else Iterator.empty
        }
      }
      .toDF("doc_id", "source", "n_tokens", "cum_tokens")
      // kept rows only — orders smaller than the cached ordered table
      .localCheckpoint(eager = true)
    ordered.unpersist()
    out
  }
}
