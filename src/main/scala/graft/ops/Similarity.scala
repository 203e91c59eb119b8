package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and a
  * sign-random-projection (SRP) LSH bucketed variant as the scale
  * path — at 100 TB the bucket join touches only colliding vectors
  * instead of the full n×m cross product.
  *
  * All vector math runs through codegen'd higher-order functions
  * (`zip_with` + `aggregate`), never a Scala UDF.
  */
object Similarity {

  /** Elementwise float→double cast so downstream arithmetic is
    * double-precision everywhere (and matches any SQL oracle).
    */
  def asDouble(arr: Column): Column = transform(arr, _.cast("double"))

  /** Sequential-fold dot product of two equal-length arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k: for each query vector, scan all
    * candidates, rank by cosine rounded to 6dp with id tiebreak (so
    * the ranking is deterministic across summation orders), keep k.
    *
    * `queries` and `candidates`: (id, vec) with vec already double.
    * Queries are broadcast — the candidate scan stays partition-local
    * with no shuffle until the final per-query top-k (k rows/query).
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val joined = broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv")))
      .join(candidates.select(col("id").as("neighbor_id"), col("vec").as("cv")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for plane j,
    * dimension i, in [-0.5, 0.5): derived from xxhash64 so every
    * executor regenerates the same planes with no broadcast state.
    */
  private def planeComponent(j: Int, i: Column): Column =
    pmod(xxhash64(concat(lit(s"plane$j:"), i.cast("string"))), lit(1000000L))
      .cast("double") / 1000000.0 - 0.5

  /** SRP-LSH bucket id: `numPlanes` sign bits of plane dot products. */
  def srpBucket(vec: Column, dim: Int, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { j =>
      val planeDot = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (x, i) => x * planeComponent(j, i)),
        lit(0.0), (acc, v) => acc + v)
      when(planeDot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: queries join candidates only
    * within the same SRP bucket, then rank as in brute force. Trades
    * recall (bucket collisions required) for a join that scales —
    * the shuffle key is the bucket id, not the cross product.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, dim: Int,
      k: Int, numPlanes: Int = 8): DataFrame = {
    val qb = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      srpBucket(col("vec"), dim, numPlanes).as("bucket"))
    val cb = candidates.select(col("id").as("neighbor_id"), col("vec").as("cv"),
      srpBucket(col("vec"), dim, numPlanes).as("bucket"))
    val joined = qb.join(cb, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup dedup).
    * Brute-force form for oracle checking; the LSH bucket variant is
    * the scale path.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("id").as("id_a"), col("vec").as("va"))
    val b = vectors.select(col("id").as("id_b"), col("vec").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
