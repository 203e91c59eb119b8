package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable query: a Spark implementation plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same
  * parquet tables. Column names and row order must match between the
  * two sides; computed doubles are rounded on both sides so IEEE
  * summation-order differences can't flip the hash compare.
  *
  * `headline = true` marks the flagship subset — Bench times every
  * query but also reports the headline total separately, and the
  * driver smoke path (`SparkEntry.entry`) draws from it.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    headline: Boolean = false)

trait QModule {
  def queries: Seq[Q]
}

/** Table-loading helpers shared by the query modules (one definition
  * of the documents/embeddings normalization so modules can't drift).
  */
private[queries] object QTables {
  import org.apache.spark.sql.functions.col

  def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "documents")

  /** embeddings normalized to (id, vec: array<double>). */
  def emb(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"),
        graft.ops.Similarity.asDouble(col("embedding")).as("vec"))

  /** applicationId-keyed scratch dir for gates that write local
    * fixtures (WARC archives, tar shards, …): deleted and recreated
    * per call, so repeated bench executions reuse ONE path instead of
    * leaking a fresh createTempDirectory per run (the q53 lesson).
    */
  def gateTmp(s: SparkSession, key: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(
      s"/tmp/graft_gate_${key}_${s.sparkContext.applicationId}")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    java.nio.file.Files.createDirectories(p)
  }
}
