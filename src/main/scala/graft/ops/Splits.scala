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
}
