package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as a RELATIONAL object: the sketch is a
  * (seed, bucket, n) table of depth×width rows, built by one
  * map-side-combinable aggregation — the mergeable frequency summary
  * for dashboards/monitors where the exact heavy-hitter pass
  * ([[HeavyHitters]], `t71`) is too much machinery and the full
  * dictionary too wide to keep. Guarantees (Cormode & Muthukrishnan
  * 2005): estimates never undercount; overcount ≤ εN with ε = e/width
  * at probability 1−(1/e)^depth.
  *
  * The hash family is the engine-portable md5 idiom (seed ':' token →
  * first 14 hex digits mod width), so estimates are bit-deterministic
  * and an oracle can replay the ENTIRE sketch relationally — a
  * correctness gate compares estimated values, not just error bands.
  *
  * Scale shape: tokens × depth rows enter ONE partial-aggregated
  * shuffle whose output is capped at depth×width rows regardless of
  * corpus size; point queries broadcast the (tiny) key set against
  * the (tiny) sketch.
  */
object Cms {

  /** Row of the md5 hash family: bucket of `token` under `seed`. */
  def bucket(token: Column, seed: Column, width: Int): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), token)), 1, 14),
      16, 10).cast("long") % width

  /** Build the sketch table (seed, bucket, n) from a token column.
    * Output ≤ depth×width rows; input shuffles once, partially
    * aggregated map-side.
    */
  def sketch(tokens: DataFrame, tokenCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth $depth out of [1,16]")
    require(width >= 2, s"width $width too small")
    tokens.select(col(tokenCol).as("token"))
      .select(col("token"), explode(array((0 until depth).map(lit): _*)).as("seed"))
      .select(col("seed"), bucket(col("token"), col("seed"), width).as("bucket"))
      .groupBy(col("seed"), col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** [[sketch]] over a pre-aggregated (token, weight) histogram:
    * bucket counts are Σ weight instead of row counts — bit-identical
    * to feeding the expanded token stream (a bucket's n is the sum of
    * its tokens' multiplicities either way), but the md5 hash family
    * runs once per DISTINCT token rather than once per occurrence
    * (guide §1.2 step 2: for Zipfian text the vocabulary is a small
    * fraction of the token stream, and the md5+conv chain is the
    * dominant per-row cost of the sketch build).
    */
  def sketchWeighted(hist: DataFrame, tokenCol: String, weightCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth $depth out of [1,16]")
    require(width >= 2, s"width $width too small")
    hist.select(col(tokenCol).as("token"), col(weightCol).as("w"))
      .select(col("token"), col("w"),
        explode(array((0 until depth).map(lit): _*)).as("seed"))
      .select(col("seed"), bucket(col("token"), col("seed"), width).as("bucket"),
        col("w"))
      .groupBy(col("seed"), col("bucket")).agg(sum(col("w")).as("n"))
  }

  /** Point estimates for `keys` (a `token` column): min over the
    * depth rows of each key's bucket counts. The key set and the
    * sketch are both small — Catalyst broadcasts, nothing large
    * shuffles.
    */
  def estimate(sketchTab: DataFrame, keys: DataFrame, depth: Int, width: Int): DataFrame = {
    keys.select(col("token"))
      .select(col("token"), explode(array((0 until depth).map(lit): _*)).as("seed"))
      .select(col("token"), col("seed"), bucket(col("token"), col("seed"), width).as("bucket"))
      .join(sketchTab, Seq("seed", "bucket"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
  }
}
