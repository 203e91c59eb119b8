package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based dataset splitting — the train/val/test
  * assignment a corpus build makes ONCE and must reproduce forever
  * (any engine, any partitioning, any rerun): a document's split is a
  * pure function of its id, so late-arriving shards land in the same
  * splits and no coordination or persisted assignment table exists.
  *
  * The bucket is the established md5 construction (the s47/t59
  * pattern): first 14 hex digits of `md5(CAST(id AS STRING))` as a
  * 56-bit integer, reduced mod 1000 — deterministic, uniform enough
  * for split weights, and replayable in any SQL engine. Pure
  * projection: no shuffle, no state, codegen'd built-ins end-to-end.
  */
object Splits {

  /** Assign every row a split label. `weights` are ordered
    * (name, milli) pairs summing to 1000 — e.g. train/val/test
    * 800/100/100. Output: input columns + (bucket_milli, split).
    */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
      weights: Seq[(String, Int)] =
        Seq("train" -> 800, "val" -> 100, "test" -> 100)): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0) &&
      weights.map(_._2).sum == 1000,
      s"split weights must be positive millis summing to 1000, got $weights")
    val bucket =
      expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 14), 16, 10) AS BIGINT) % 1000")
    val bounds = weights.map(_._1).zip(weights.scanLeft(0)(_ + _._2).tail)
    val split = bounds.init.foldRight(lit(bounds.last._1): Column) {
      case ((name, hi), els) => when(col("bucket_milli") < hi, name).otherwise(els)
    }
    df.withColumn("bucket_milli", bucket).withColumn("split", split)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, IPL 2006): every row gets key = ln(u)/w for a uniform u
    * and weight w, and the global top-k by key IS a weighted
    * without-replacement sample — the quality-weighted corpus
    * subsample (w = quality score or token count) a training build
    * draws when it can't keep everything.
    *
    * Deterministic end to end: u derives from the id's md5
    * milli-bucket (the [[hashSplit]] construction, so the sample is a
    * pure function of the ids — reproducible on any engine, any
    * partitioning, any rerun), keys round to 6dp with id tie-breaks
    * (the s46 ranking discipline). Pure projection + ONE global top-k
    * (TakeOrdered — no full sort materializes); no state.
    *
    * Output: the k selected rows as (doc_id, w, key6, rank), rank 1 =
    * first draw.
    */
  def weightedSample(df: DataFrame, k: Int, idCol: String = "doc_id",
      weightCol: String = "w"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // u ∈ (0,1): (h + 0.5)/10⁶ over the 56-bit md5 prefix mod 10⁶ —
    // never 0 or 1, so ln(u) is finite and negative
    val u =
      (expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 14), 16, 10) AS BIGINT) % 1000000")
        .cast("double") + 0.5) / 1000000.0
    // the global top-k plans as TakeOrderedAndProject (per-partition
    // partial top-k, never a full sort); only the k SURVIVORS enter
    // the rank window, so the single-partition window is k-bounded
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key6").desc, col(idCol).asc)
    df.select(col(idCol), col(weightCol).cast("double").as("w"))
      .filter(col("w") > 0)
      .withColumn("key6", round(log(u) / col("w"), 6))
      .orderBy(col("key6").desc, col(idCol).asc).limit(k)
      .withColumn("rank", row_number().over(w))
  }
}
