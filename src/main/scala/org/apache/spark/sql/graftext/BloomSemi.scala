// In the org.apache.spark.sql namespace for the Column↔Expression
// bridge and the catalyst bloom expressions (private[sql] surface).

package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-API access to Spark's runtime-filter bloom machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the
  * expressions `InjectRuntimeFilter` plants under
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`), so an operator
  * can build the semi-join reduction EXPLICITLY when it knows the
  * small side up front instead of hoping the optimizer's heuristics
  * fire.
  *
  * The aggregate runs distributed (map-side partial blooms OR-merged
  * in the reduce); the probe is a codegen'd bitset test that
  * deserializes the filter once per task. `mightContain`'s bloom
  * operand must be foldable (Spark's own check — the filter is
  * task-constant state, not a per-row column), so callers collect the
  * one-row aggregate and pass the binary as a literal: kilobytes-to-
  * megabytes of driver traffic for a filter that then prunes the big
  * side map-side, before any shuffle.
  */
object BloomSemi {

  /** Aggregate a LongType column into a serialized bloom filter
    * (one binary row). `numBits` defaults to 10 bits/item ≈ 0.9%
    * false-positive rate at `expectedItems` insertions.
    */
  def bloomFilterAgg(child: Column, expectedItems: Long,
      numBits: Long = -1L): Column = {
    val bits = if (numBits > 0) numBits else expectedItems * 10
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(child),
      Literal(expectedItems), Literal(bits), 0, 0).toAggregateExpression())
  }

  /** Probe: true iff `value` (LongType) may be in the serialized
    * filter. No false negatives; false positives at the configured
    * rate. `bloom` must be foldable (pass `lit(bytes)`).
    */
  def mightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom),
      ExpressionUtils.expression(value)))
}
