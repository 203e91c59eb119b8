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
