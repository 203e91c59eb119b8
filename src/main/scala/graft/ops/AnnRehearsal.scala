package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN-at-scale rehearsal — the embedding analogue of the imaging
  * (`i_pyramid512`) and text-dedup (`t_dedup200k`) rehearsals: a
  * million-vector corpus through the IVF cascade
  * ([[Similarity.kmeansCentroids]] quantizer → inverted-list probe →
  * exact rerank), recall-checked against distributed brute force on
  * the same queries. Proves the bucketed path holds its recall
  * contract at a scale where brute force per query is already 64M
  * multiply-adds — the regime IVF exists for.
  *
  * The corpus is clustered by construction (mixture of `clusters`
  * deterministic centers + bounded noise — real embedding corpora
  * cluster; uniform random vectors are the one distribution IVF is
  * NOT for). Everything derives from splitmix64 arithmetic, so any
  * executor regenerates any row and the run is reproducible
  * bit-for-bit.
  */
object AnnRehearsal {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** hash → double in [-1, 1) with millionths resolution. */
  private def unit(h: Long): Double =
    (java.lang.Math.floorMod(h, 2000000L) - 1000000L) / 1e6

  /** Deterministic clustered corpus: vector `i` = center(i mod
    * clusters) + noise(i)·amplitude, built per-partition (no driver
    * data, no files).
    */
  def synth(spark: SparkSession, n: Long, dim: Int = 64,
      clusters: Int = 64, noise: Double = 0.3): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions(_.map { id =>
      val c = (id % clusters) * 1315423911L
      val v = Array.tabulate(dim) { j =>
        unit(splitmix64(c + j)) + noise * unit(splitmix64(id * 2654435761L + j))
      }
      (id, v)
    }).toDF("id", "vec")
  }

  /** Run brute-force, IVF, and SQ8 top-k for the same queries;
    * require recall@k ≥ `minRecall` on both approximate paths.
    * Returns wall seconds.
    */
  def run(spark: SparkSession, n: Long = 1000000L, nQueries: Int = 32,
      k: Int = 10, dim: Int = 64, clusters: Int = 64, nlist: Int = 64,
      nprobe: Int = 8, minRecall: Double = 0.9): Double = {
    val t0 = System.nanoTime()
    val vecs = synth(spark, n, dim, clusters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    val queries = vecs.filter(col("id") < nQueries)

    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect() // ≤ nQueries·k rows
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    def checkRecall(name: String, exact: Map[Long, Set[Long]],
        approx: Map[Long, Set[Long]]): Unit = {
      require(exact.size == nQueries && approx.size == nQueries,
        s"missing query results: exact ${exact.size}, $name ${approx.size} of $nQueries")
      val hit = exact.map { case (q, ex) => (ex & approx(q)).size }.sum
      val recall = hit.toDouble / (nQueries.toLong * k)
      require(recall >= minRecall,
        f"$name recall@$k collapsed: $recall%.3f < $minRecall%.2f " +
          s"($hit of ${nQueries * k} exact neighbors recovered)")
    }
    val exact = topSets(Similarity.bruteForceTopK(queries, vecs, k))
    checkRecall("IVF", exact, topSets(
      Similarity.ivfTopK(queries, vecs, k, nlist, nprobe, lloydRounds = 2)))
    // the int8 compression tier at the same scale: integer-dot
    // shortlists over the full million, float rerank on 4k only
    checkRecall("SQ8", exact, topSets(Similarity.sqTopK(queries, vecs, k)))
    vecs.unpersist()
    (System.nanoTime() - t0) / 1e9
  }
}
