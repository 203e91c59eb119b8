package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-version diff — the release-over-release audit every
  * managed corpus ships (what changed between snapshot N and N+1):
  * per-id classification into added / removed / changed / unchanged
  * by CONTENT hash, so a re-crawled page with identical text is
  * "unchanged" even if it was re-ingested.
  *
  * Scale shape: both sides project to (id, md5) BEFORE the full
  * outer join, so only 8-byte ids + 32-char hashes shuffle — never
  * document bodies; the join is id-co-partitioned. Output is one row
  * per id in either snapshot.
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def hashed(df: DataFrame, h: String) = df.select(
      col(idCol).cast("long").as("doc_id"), md5(col(textCol)).as(h))
    hashed(oldSnap, "old_hash")
      .join(hashed(newSnap, "new_hash"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
