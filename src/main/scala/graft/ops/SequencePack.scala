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

  /** Materialize the training sequences themselves — the per-WINDOW
    * view dual to [[packSequences]]'s per-document offsets: the
    * corpus token stream (docs concatenated in doc-id order) cut into
    * `seqLen`-token windows, each window row carrying its assembled
    * token text and provenance span.
    *
    * Execution shape: [[packSequences]] provides each document's
    * exact global start offset (distributed prefix sum — never a
    * corpus-wide window function); tokens then explode ONCE with
    * their global position and hash-aggregate by `window_id = pos /
    * seqLen` — one corpus-sized exchange keyed on the window id,
    * which is dense and uniform by construction (every window holds
    * exactly `seqLen` tokens except the tail), so no skew machinery
    * is needed. Window text rebuilds with the d52 sort-in-aggregate
    * idiom.
    *
    * Output per window: (window_id, n_tokens, n_docs, first_doc,
    * last_doc, text). All windows carry seqLen tokens except the
    * final partial one.
    */
  def chunkWindows(docs: DataFrame, seqLen: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val offsets = packSequences(docs, seqLen, idCol, textCol)
      .select(col("doc_id"), col("start_offset"))
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextDedup.words(col(textCol))))
      .withColumnRenamed("col", "w")
      .join(offsets, Seq("doc_id")) // offsets carries only nonzero-token docs
      .withColumn("gpos", col("start_offset") + col("pos"))
      // integer division: exact at any corpus size (a double divide
      // would round above 2^53 tokens)
      .withColumn("window_id", expr(s"gpos div $seqLen"))
    toks.groupBy(col("window_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        countDistinct(col("doc_id")).cast("long").as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        array_join(array_sort(collect_list(struct(col("gpos"), col("w"))))
          .getField("w"), " ").as("text"))
  }
}
