package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-shard layout — the last step of a corpus
  * build: write the final dataset as `nShards` shards in a fixed
  * pseudo-random global order, so training jobs stream shards
  * sequentially and still see a well-shuffled corpus, and ANY engine
  * can reproduce the exact layout from document ids alone (no
  * persisted permutation, no RNG state — the [[Splits]] md5
  * construction, so split/shard/sample decisions all derive from one
  * id-hash family).
  *
  * Shard = 56-bit md5 bucket mod nShards; within-shard order = (md5
  * hex of the id, id) — a deterministic permutation uncorrelated with
  * ingest order. One shuffle: repartition on the shard key +
  * sort-within-partitions, then a partitioned write; no global sort,
  * no driver state, shards stay balanced by hash uniformity at any
  * corpus size.
  */
object Shards {

  private def md5Key(idCol: String) = md5(col(idCol).cast("string"))

  private def bucket56(idCol: String) =
    expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 14), 16, 10) AS BIGINT)")

  /** The layout as a relation: input columns + (shard, pos), pos =
    * 1-based position within the shard's fixed order.
    */
  def shardPlan(docs: DataFrame, idCol: String = "doc_id",
      nShards: Int = 16): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5Key(idCol), col(idCol))
    docs.withColumn("shard", (bucket56(idCol) % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Materialize the layout as parquet, one directory per shard
    * (`shard=N/`), rows stored in shard order.
    */
  def writeShards(docs: DataFrame, path: String, idCol: String = "doc_id",
      nShards: Int = 16): Unit =
    shardPlan(docs, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
}
