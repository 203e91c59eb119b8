package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Image-dedup-at-scale rehearsal: 1M perceptual hashes through the
  * production [[ImageDedup.dupClusters]] path (exact-collapse →
  * banded Hamming join → union-find → expand), structure-asserted —
  * the multimodal twin of `t_dedup200k`. Hash-level on purpose: the
  * decode→hash stage is embarrassingly parallel and benched by the
  * m-gates; what needs an at-scale rehearsal is the JOIN+CC shape —
  * 4M banded rows, a 10k-member identical-hash clique that must
  * collapse instead of banding its 50M pairs, and 100k planted
  * 5-variant families that must come back exactly.
  *
  * Corpus layout (deterministic, md5-derived):
  *  - ids with id mod 10 < 5 → family f = id/10: base hash B(f),
  *    member v = id mod 10 flips bit (f·7+v) mod 64 for v ≥ 1 —
  *    pairwise Hamming ≤ 2, so banded recall at radius 3 is exact
  *    and each family must land in ONE cluster;
  *  - ids with id mod 10 ≥ 5 → scatter: md5-random 64-bit hashes
  *    (coincidental ≤3-bit pairs across 1M hashes are ~1e-3 expected,
  *    so assertions tolerate merges but never splits);
  *  - `clique` extra ids (≥ n) share ONE hash — the exact-collapse
  *    stress; the direct path would band C(10k,2) ≈ 50M zero-XOR
  *    pairs, the collapsed path must recover it as one cluster for
  *    the cost of one representative.
  */
object ImgDedupRehearsal {

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d).getLong(0)
  }

  def synth(spark: SparkSession, n: Long, clique: Long): DataFrame = {
    import spark.implicits._
    spark.range(n + clique).as[Long].mapPartitions(_.map { id =>
      val h =
        if (id >= n) md5Long("clique")
        else if (id % 10 < 5) {
          val f = id / 10; val v = id % 10
          val base = md5Long(s"fam:$f")
          if (v == 0) base else base ^ (1L << ((f * 7 + v) % 64))
        } else md5Long(s"doc:$id")
      (id, h)
    }).toDF("doc_id", "dhash")
  }

  /** Run + structure checks; returns wall seconds. */
  def run(spark: SparkSession, n: Long = 1000000L, clique: Long = 10000L): Double = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val hashes = synth(spark, n, clique)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clusters = ImageDedup.dupClusters(hashes, maxHamming = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = clusters.count()
    require(total == n + clique, s"lost rows: $total of ${n + clique}")

    // every planted family coheres into exactly one cluster
    val nFam = n / 10
    val famOk = clusters.filter(col("doc_id") < n && col("doc_id") % 10 < 5)
      .groupBy((col("doc_id") / 10).cast("long").as("f"))
      .agg(countDistinct(col("cluster_id")).as("k"), count(lit(1)).as("m"))
      .filter(col("k") === 1 && col("m") === 5).count()
    require(famOk == nFam, s"family cohesion broken: $famOk of $nFam families intact")

    // the exact clique collapses to one cluster...
    val cliqueLabels = clusters.filter(col("doc_id") >= n)
      .agg(countDistinct(col("cluster_id")).as("k"), count(lit(1)).as("m"))
      .head()
    require(cliqueLabels.getLong(0) == 1 && cliqueLabels.getLong(1) == clique,
      s"clique broken: ${cliqueLabels.getLong(1)} members in ${cliqueLabels.getLong(0)} clusters")
    // ...and only ONE representative of it ever entered the banded join
    val cliqueReps = clusters.filter(col("doc_id") >= n)
      .agg(countDistinct(col("rep_id"))).head().getLong(0)
    require(cliqueReps == 1, s"collapse failed: $cliqueReps clique representatives")

    // cluster count: families + clique + scatter singletons, tolerating
    // only rare coincidental MERGES (which can only lower the count)
    val nClusters = clusters.agg(countDistinct(col("cluster_id"))).head().getLong(0)
    val expect = nFam + 1 + (n - 5 * nFam)
    require(nClusters <= expect && nClusters >= expect - 20,
      s"cluster count $nClusters outside [${expect - 20}, $expect]")

    hashes.unpersist(); clusters.unpersist()
    (System.nanoTime() - t0) / 1e9
  }
}
