package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (SURVEY §2.7 partitioning notes):
  * when a handful of hot keys dominate a fact-fact join, salt the
  * skewed side with a random-but-deterministic bucket and explode the
  * other side across all buckets — the hot key's rows spread over
  * `saltBuckets` reducers instead of one. AQE's skew-join handles the
  * sort-merge case adaptively; explicit salting remains the tool for
  * aggregations and for joins AQE can't split (e.g. bucketed inputs).
  */
object Salting {

  /** Deterministic salt in [0, buckets) — hash of the whole row's key
    * plus a disambiguator column set, so re-runs reproduce.
    */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Equi-join `left` (skewed) with `right` on `key`, spreading each
    * key across `buckets` partitions. `leftSaltBy` columns feed the
    * salt hash (default: whole-row uniqueness via
    * monotonically_increasing_id is avoided — callers pass stable
    * columns).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, leftSaltBy: Seq[String]): DataFrame = {
    val salted = left.withColumn("_salt",
      salt(buckets, leftSaltBy.map(col): _*))
    val exploded = right
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-proof aggregation: partial aggregate on
    * (key, salt), then final aggregate on key — the map-side-combine
    * pattern made explicit for extreme key skew.
    */
  def saltedCount(df: DataFrame, key: String, buckets: Int,
      saltBy: Seq[String]): DataFrame =
    df.withColumn("_salt", salt(buckets, saltBy.map(col): _*))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))
}
