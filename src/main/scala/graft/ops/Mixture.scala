package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-flattened mixture sampling — the standard multilingual
  * / multi-domain rebalancing step (the τ=0.5 "temperature sampling"
  * of the mBERT/XLM-R recipes): domain d gets target share
  * ∝ n_d^τ, which upweights small domains relative to proportional
  * sampling without letting any single domain dominate. Complements
  * the proportional token-budget sampler ([[BudgetSample]]) and the
  * composition report the weights come from.
  *
  * Everything is deterministic and engine-replayable:
  *  - per-domain acceptance rates derive from exact integer counts;
  *    the one irrational step (√n at τ = 0.5) is quantized to micro
  *    units BEFORE the cross-domain sum, so the total is an integer
  *    sum — immune to double summation order across partitions;
  *  - acceptance itself is the established md5 milli-bucket of the id
  *    (the [[Splits]] construction): a pure projection, so membership
  *    is reproducible from the id alone under any partitioning.
  *
  * Scale shape: one count aggregation (map-side combinable, output =
  * |domains| rows), a 2-value global total on those rows, then a
  * broadcast join of kilobyte rates back onto the corpus — the corpus
  * itself never shuffles.
  */
object Mixture {

  /** Per-domain acceptance rates at τ = 0.5: (domain, n_docs,
    * target_total, p_milli). `targetMilli` is the overall sampled
    * fraction target in millis (500 = keep ~half the corpus,
    * redistributed toward small domains).
    */
  def temperatureRates(docs: DataFrame, domainCol: String = "source",
      targetMilli: Int = 500): DataFrame = {
    require(targetMilli > 0 && targetMilli <= 1000,
      s"targetMilli must be in (0, 1000], got $targetMilli")
    val counts = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum(col("n_docs")).as("total"),
      // √n quantized to micro units per domain, THEN summed: integer
      // sum, so the denominator is independent of reduce order
      sum(floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0)).cast("long"))
        .as("s_micro"))
    counts.crossJoin(broadcast(tot))
      .withColumn("target_total",
        floor(col("total") * lit(targetMilli) / lit(1000.0)).cast("long"))
      .withColumn("p_milli",
        least(lit(1000L),
          floor(lit(1000.0) * col("target_total")
            * sqrt(col("n_docs").cast("double")) * lit(1000000.0)
            / col("s_micro") / col("n_docs")).cast("long")))
      .select(col(domainCol), col("n_docs"), col("target_total"), col("p_milli"))
  }

  /** Sample the corpus at the temperature rates: keep a row iff its
    * id's milli-bucket clears its domain's acceptance rate.
    */
  def temperatureSample(docs: DataFrame, idCol: String = "doc_id",
      domainCol: String = "source", targetMilli: Int = 500): DataFrame =
    sampleAtRates(docs, temperatureRates(docs, domainCol, targetMilli),
      idCol, domainCol)

  /** Sample against precomputed rates (reuse when the caller already
    * materialized [[temperatureRates]] — saves a second corpus count
    * scan).
    */
  def sampleAtRates(docs: DataFrame, rates: DataFrame,
      idCol: String = "doc_id", domainCol: String = "source"): DataFrame = {
    val bucket = expr(
      s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 14), 16, 10) AS BIGINT) % 1000")
    docs.join(broadcast(rates.select(col(domainCol), col("p_milli"))), domainCol)
      .where(bucket < col("p_milli"))
      .drop("p_milli")
  }
}
