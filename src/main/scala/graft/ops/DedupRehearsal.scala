package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-dedup-at-scale rehearsal: the cascade a 100 TB corpus build
  * runs — MinHash signatures → banded LSH candidates → exact verify →
  * connected components → canonical selection — driven end-to-end
  * over a DISTRIBUTED synthetic corpus with planted near-duplicates,
  * and checked against the plant (every planted pair recovered, no
  * false pairs, cluster count exactly `docs − pairs`).
  *
  * Lives in main (not test) so [[graft.Bench]] reports its wall time
  * per round (`t_dedup200k`) alongside the query timings — the text
  * analogue of the `i_pyramid512` imaging rehearsal; `DedupScaleSpec`
  * runs the same cascade at a spec-sized corpus.
  *
  * Generation is one `spark.range` map — no driver-side corpus, no
  * files; every stage downstream is the production operator itself.
  */
object DedupRehearsal {

  /** Deterministic synthetic corpus: `n` docs × 50 words. Every doc
    * with `id % 10 == 9` is a near-copy of `id − 1` (last 3 of 50
    * words replaced → shingle Jaccard 45/51 ≈ 0.88); all other docs
    * are pairwise shingle-disjoint by construction (word index
    * `id·53 + j·17` collides across docs only at sequence offsets
    * ±53, far outside the 50-word window).
    */
  def synth(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).select(col("id").as("doc_id"),
      expr("""array_join(transform(sequence(0, 49), j ->
          CASE WHEN id % 10 = 9 AND j >= 47
               THEN concat('u', id, '_', j)
               ELSE concat('t', (CASE WHEN id % 10 = 9 THEN id - 1 ELSE id END)
                            * 53L + j * 17L) END), ' ')""").as("text"))
  }

  /** Run the full cascade; returns wall seconds. Throws if the
    * recovered structure diverges from the plant beyond the LSH
    * recall floor (miss probability ≈ 4e-7 per planted pair).
    */
  def run(spark: SparkSession, n: Long = 200000L): Double = {
    val t0 = System.nanoTime()
    val docs = synth(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val planted = n / 10

    val pairs = TextDedup.minHashNearDups(docs, minJaccard = 0.8,
      hotBucketThreshold = -1)
    val nPairs = pairs.count()
    require(nPairs <= planted,
      s"false near-dup pairs: found $nPairs, planted only $planted")
    require(nPairs >= planted - math.max(1L, planted / 1000),
      s"LSH recall collapsed: found $nPairs of $planted planted pairs")

    val cc = TextDedup.connectedComponents(
      pairs.select("doc_a", "doc_b"), docs.select("doc_id"))
    val nClusters = cc.agg(countDistinct(col("cluster_id"))).head.getLong(0)
    require(nClusters == n - nPairs,
      s"expected ${n - nPairs} clusters (pair merges only), got $nClusters")

    // canonical selection: per-cluster argmax(n_chars, tie → min id)
    val sized = docs.select(col("doc_id"), length(col("text")).as("n_chars"))
    val keepers = cc.join(sized, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(min(struct(negate(col("n_chars")), col("doc_id")))
        .getField("doc_id").as("canonical_id"))
    val nKeep = keepers.count()
    require(nKeep == nClusters, s"one canonical per cluster: $nKeep != $nClusters")

    docs.unpersist()
    (System.nanoTime() - t0) / 1e9
  }
}
