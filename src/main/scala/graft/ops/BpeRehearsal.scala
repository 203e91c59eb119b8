package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE-training-at-scale rehearsal: the capped-histogram driver-side
  * trainer ([[Bpe.train]]) learning a REAL vocabulary depth (1000
  * merges, the regime where the old one-Spark-job-per-merge loop
  * stops being a runnable plan) over a distributed 200k-doc corpus —
  * and pinned for correctness, not just timed: the head of the merge
  * list must match [[Bpe.trainDistributed]] (the executable semantic
  * spec, run for its first merges on the same corpus), so the
  * incremental pair-count/heap bookkeeping is re-proven against the
  * recount-from-scratch semantics at rehearsal scale every round.
  *
  * Lives in main (not test) so [[graft.Bench]] reports its wall time
  * per round (`t_bpe200k`) alongside the other rehearsal keys;
  * `BpeSpec` pins the same equivalence merge-for-merge at spec size.
  *
  * Generation is one `spark.range` map — no driver-side corpus, no
  * files; the only driver state is the capped (word, count)
  * histogram, which is the production trainer's design point.
  */
object BpeRehearsal {

  /** Deterministic synthetic corpus: `n` docs × 50 words over a
    * 50k-word vocabulary with a quadratic (Zipf-ish) skew toward low
    * word ids, so pair statistics have the long-tailed shape real
    * text has. Word ids come from an exact integer square of a
    * multiplicative hash (`(h%M)²·V div M²` — no floats anywhere);
    * each id renders as 6 base-8 letters a–h, so initial symbols are
    * single letters and merges have real depth to learn.
    */
  def synth(spark: SparkSession, n: Long): DataFrame = {
    spark.range(n).select(col("id").as("doc_id"),
      expr("""array_join(transform(sequence(0, 49), j ->
          translate(lpad(conv(
            ((id * 1315423911L + j * 2654435761L) % 1000003)
              * ((id * 1315423911L + j * 2654435761L) % 1000003)
              * 50000 div 1000003 div 1000003, 10, 8),
            6, '0'), '01234567', 'abcdefgh')), ' ')""").as("text"))
  }

  /** Run the trainer at depth; returns wall seconds. Throws if the
    * full vocabulary fails to materialize, if any merge repeats, or
    * if the driver-side head diverges from the distributed spec
    * trainer on the same corpus.
    */
  def run(spark: SparkSession, n: Long = 200000L, nMerges: Int = 1000): Double = {
    val t0 = System.nanoTime()
    val docs = synth(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = Bpe.train(docs, nMerges)
    require(merges.size == nMerges,
      s"corpus exhausted at ${merges.size} of $nMerges merges")
    require(merges.distinct.size == merges.size,
      "a merge pair repeated — pair bookkeeping corrupted")
    // cross-check the head against the recount-from-scratch spec
    // trainer (5 distributed jobs over the ~50k-row distinct-word
    // table — cheap, and any count drift anywhere surfaces here)
    val head = Bpe.trainDistributed(docs, 5)
    require(merges.take(5) == head,
      s"driver trainer head ${merges.take(5)} != distributed spec $head")
    // concatenation invariant under the learned vocabulary
    val w = "abcdef"
    require(Bpe.encodeWord(w, merges).mkString == w,
      "encode under the learned merges broke the concatenation invariant")
    docs.unpersist()
    (System.nanoTime() - t0) / 1e9
  }
}
