package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every oracle-checkable query module. Each module is a
  * `QModule` exposing `Seq[Q]`; a Q pairs the Spark implementation
  * with the DuckDB oracle SQL (column names aliased identically on
  * both sides, total ORDER BY, doubles rounded).
  */
object SparkEntry {

  /** Every registered query module. */
  def modules: Seq[QModule] = Seq(Relational, Events, LlmOps, Pipeline, Imaging)

  def all: Seq[Q] = modules.flatMap(_.queries)

  /** Queries included in the Bench run. */
  def headline: Seq[Q] = all.filter(_.headline)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03JoinAgg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
