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
  * The SKEWED variant (`boilerplate > 0`, bench key `t_dedup200k_skew`)
  * additionally plants a clique of identical boilerplate documents
  * sized past the AUTO hot-bucket threshold `max(64, ⌈√(2·rows)⌉)` —
  * the license-header/template pathology of real crawls, which drops
  * the whole clique into ONE bucket of every band. The run asserts the
  * salted hot-bucket path actually armed, that all C(B,2) clique pairs
  * were recovered exactly (identical signatures — recall 1 by
  * construction), and that the near-dup plant still comes back at the
  * LSH recall floor. A uniform run asserts the machinery did NOT arm,
  * so the stats job's threshold is pinned from both sides.
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
    * ±53, far outside the 50-word window). `boilerplate` extra docs
    * (ids ≥ n) share one constant 50-word text — the hot-bucket
    * clique; the 'b' word prefix keeps them shingle-disjoint from
    * every normal doc.
    */
  def synth(spark: SparkSession, n: Long, boilerplate: Long = 0L): DataFrame = {
    import spark.implicits._
    spark.range(n + boilerplate).select(col("id").as("doc_id"),
      expr(s"""CASE WHEN id >= ${n}L
          THEN array_join(transform(sequence(0, 49), j -> concat('b', j)), ' ')
          ELSE array_join(transform(sequence(0, 49), j ->
          CASE WHEN id % 10 = 9 AND j >= 47
               THEN concat('u', id, '_', j)
               ELSE concat('t', (CASE WHEN id % 10 = 9 THEN id - 1 ELSE id END)
                            * 53L + j * 17L) END), ' ') END""").as("text"))
  }

  /** Run the full cascade; returns wall seconds. Throws if the
    * recovered structure diverges from the plant beyond the LSH
    * recall floor (miss probability ≈ 4e-7 per planted near-pair;
    * boilerplate pairs are exact-recall), or if the AUTO salted
    * hot-bucket decision disagrees with the corpus shape.
    */
  def run(spark: SparkSession, n: Long = 200000L, boilerplate: Long = 0L): Double = {
    val t0 = System.nanoTime()
    val docs = synth(spark, n, boilerplate)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearPlanted = n / 10
    val boilerPairs = boilerplate * (boilerplate - 1) / 2

    val (pairs, armed) = TextDedup.minHashNearDupsWithDecision(docs,
      minJaccard = 0.8, hotBucketThreshold = -1)
    // the arming decision must TRACK the corpus shape: a uniform corpus
    // keeps the plain single-join plan, the boilerplate clique (sized
    // past max(64, ⌈√(2·rows)⌉)) must trip the salted path
    require(armed == (boilerplate > 0),
      s"salted hot-bucket path armed=$armed with boilerplate=$boilerplate")
    val nPairs = pairs.count()
    require(nPairs >= boilerPairs,
      s"boilerplate clique pairs lost: found $nPairs of $boilerPairs exact-recall pairs")
    val nearFound = nPairs - boilerPairs
    require(nearFound <= nearPlanted,
      s"false near-dup pairs: found $nearFound, planted only $nearPlanted")
    require(nearFound >= nearPlanted - math.max(1L, nearPlanted / 1000),
      s"LSH recall collapsed: found $nearFound of $nearPlanted planted pairs")

    val cc = TextDedup.connectedComponents(
      pairs.select("doc_a", "doc_b"), docs.select("doc_id"))
    // pair merges from the near-dup plant, one (B−1)-merge clique from
    // the boilerplate — any other count means CC invented or lost edges
    val expectClusters = (n + boilerplate) - nearFound -
      (if (boilerplate > 0) boilerplate - 1 else 0L)
    val nClusters = cc.agg(countDistinct(col("cluster_id"))).head.getLong(0)
    require(nClusters == expectClusters,
      s"expected $expectClusters clusters, got $nClusters")

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

  /** The collapsed-pipeline twin of the skewed run
    * ([[TextDedup.collapsedNearDupClusters]]): exact-collapse first,
    * so the boilerplate clique becomes ONE representative and its
    * C(B,2) pairs are never materialized — the production shape for
    * template-heavy corpora. Asserts the IDENTICAL final structure
    * the direct path recovers (same cluster count, the whole clique
    * in one cluster labeled by its min id, near-dup plant at the
    * same recall floor) at a fraction of the cost; bench key
    * `t_dedup200k_skew_collapsed` tracks the ratio.
    */
  def runCollapsed(spark: SparkSession, n: Long = 200000L,
      boilerplate: Long = 3000L): Double = {
    val t0 = System.nanoTime()
    val docs = synth(spark, n, boilerplate)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearPlanted = n / 10

    val cc = TextDedup.collapsedNearDupClusters(docs, minJaccard = 0.8,
      hotBucketThreshold = -1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClusters = cc.agg(countDistinct(col("cluster_id"))).head.getLong(0)
    // every boilerplate doc (ids >= n) must land in ONE cluster,
    // labeled by the clique's min id = n (reps are per-group min ids)
    val boilerClusters = cc.filter(col("doc_id") >= n)
      .agg(countDistinct(col("cluster_id")).as("c"),
        min(col("cluster_id")).as("lbl"), count(lit(1)).as("rows")).head()
    require(boilerClusters.getLong(2) == boilerplate,
      s"boilerplate rows lost: ${boilerClusters.getLong(2)} of $boilerplate")
    require(boilerClusters.getLong(0) == 1 && boilerClusters.getLong(1) == n,
      s"boilerplate clique split: ${boilerClusters.getLong(0)} clusters, " +
        s"label ${boilerClusters.getLong(1)} (expected 1 cluster labeled $n)")
    // same global structure as the direct path: n + boilerplate docs,
    // one (B−1)-merge clique, nearFound pair merges
    val nearFound = (n + boilerplate) - (boilerplate - 1) - nClusters
    require(nearFound <= nearPlanted,
      s"false near-dup merges: $nearFound, planted only $nearPlanted")
    require(nearFound >= nearPlanted - math.max(1L, nearPlanted / 1000),
      s"LSH recall collapsed: $nearFound of $nearPlanted planted pairs")
    cc.unpersist()
    docs.unpersist()
    (System.nanoTime() - t0) / 1e9
  }
}
