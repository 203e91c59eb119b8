package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two integer
  * dimensions so that rows close in BOTH dimensions land close in the
  * one-dimensional sort order. Writing a table clustered by z-value
  * gives parquet row-group min/max ranges that are tight in every
  * interleaved dimension at once, so scans filtering on ANY of them
  * prune row groups — the OPTIMIZE ZORDER primitive of lakehouse
  * engines, here as a plain column expression + range repartition.
  *
  * The interleave is a fixed fold of shift/mask built-ins, fully
  * inside whole-stage codegen (no UDF), and exactly reproducible in
  * SQL for the oracle.
  */
object ZOrder {

  /** Morton code of two non-negative ints using the low `bits` bits
    * of each: bit i of x lands at position 2i, bit i of y at 2i+1.
    *
    * Keys wider than `bits` are TRUNCATED to their low bits, which
    * collapses distinct high-key values into one z bucket and
    * degrades (never breaks) min/max pruning along that dimension.
    * The default of 21 bits per dimension (42-bit z, exact in a
    * LONG — and in a DOUBLE, for engines whose bit ops work there)
    * covers keys to ~2.1M; size `bits` to ceil(log2(max key + 1))
    * for wider domains.
    */
  def zValue(x: Column, y: Column, bits: Int = 21): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Cluster `df` for multi-dimensional data skipping: range-partition
    * on the z-value of (xCol, yCol) into `numPartitions` output
    * splits and sort each split by it. One shuffle; downstream
    * `df.write.parquet` produces one tight-z-range file per
    * partition.
    */
  def clusterBy(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 21): DataFrame = {
    val withZ = df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
    withZ
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
