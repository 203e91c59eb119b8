package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the "sample packing" step of a training-data
  * pipeline: documents are concatenated (in deterministic doc-id
  * order) into one token stream and cut into fixed-length training
  * sequences; each document lands at a byte-exact offset, possibly
  * spanning sequences (the GPT-style concat-and-chunk regime).
  *
  * Scale shape: the naive form — a global cumulative-sum window —
  * serializes the WHOLE CORPUS through one task. This implementation
  * computes the same offsets with the distributed prefix-sum pattern
  * shared with [[BudgetSample]]:
  *
  *  1. range-repartition on doc_id (the concatenation order) and sort
  *     within partitions;
  *  2. one pass computes per-partition token subtotals — a
  *     ≤-#partitions-row table collected to the driver (metadata, not
  *     data);
  *  3. per-partition offsets broadcast back; a second pass adds each
  *     row's partition-local running sum — the exact global offset
  *     with every partition working in parallel.
  *
  * Token counts are exact BIGINTs (whitespace tokens, the engine's
  * shared tokenizer), so parity with a window-function oracle is
  * exact by construction.
  */
object SequencePack {

  /** Pack documents into `seqLen`-token sequences. Zero-token docs
    * contribute nothing to the stream and are excluded.
    *
    * Output per doc: (doc_id, n_tokens, start_offset, first_seq,
    * last_seq) with seq ids = offset / seqLen.
    */
  def packSequences(docs: DataFrame, seqLen: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs.select(
        col(idCol).cast("long").as("doc_id"),
        size(TextDedup.words(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)

    val ordered = base
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-partition subtotals (≤ #partitions rows)
    val subtotals = ordered.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      subtotals.map { case (pid, t) =>
        val o = pid -> acc
        acc += t
        o
      }.toMap
    }
    val offBc = spark.sparkContext.broadcast(offsets)
    val len = seqLen

    // pass 2: offset + partition-local running sum = global offset
    val out = ordered.select("doc_id", "n_tokens", "pid")
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        val off = offBc.value
        var local = 0L
        it.map { case (id, n, pid) =>
          val start = off.getOrElse(pid, 0L) + local
          local += n
          (id, n, start, start / len, (start + n - 1) / len)
        }
      }
      .toDF("doc_id", "n_tokens", "start_offset", "first_seq", "last_seq")
      .localCheckpoint(eager = true)
    ordered.unpersist()
    out
  }
}
