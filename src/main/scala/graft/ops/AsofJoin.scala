package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join: attach to every left row the most recent
  * right row for the same key at or before the left row's time — the
  * event-attribution / point-in-time-lookup operator OLAP engines ship
  * natively and Spark lacks.
  *
  * Implementation is the scale-correct union-sort form, not a join:
  * both sides are tagged and unioned, one hash shuffle on the key
  * co-locates each key's full timeline, and a running
  * `last(right_payload, ignoreNulls)` window over
  * (time, side, tie) order picks the latest right row visible to each
  * left row. Cost is one shuffle + one sort over |L| + |R| rows —
  * a naive `left.join(right, key && r.t <= l.t)` enumerates every
  * (left row × right history) pair first, which is quadratic per key
  * and dies on 100 TB timelines. Right rows sort before left rows at
  * the same timestamp, so the match is inclusive (`r.t <= l.t`), and
  * equal-timestamp right rows resolve to the greatest `tie` value.
  */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightTie: String,
      rightPrefix: String = "asof_", tolerance: Long = Long.MaxValue): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val rightPayload = right.columns.filterNot(_ == key).toSeq
    val rStruct = struct(rightPayload.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("l")).schema("l").dataType
    val tieType = right.schema(rightTie).dataType

    val lNorm = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    // join semantics for NULLs: a right row with a null key or null
    // time can never satisfy `r.key = l.key AND r.t <= l.t`, so it is
    // dropped here — otherwise the null-key window partition would
    // hand null-key left rows a match no equivalent join produces
    // (left rows always survive; unmatched ones carry null payloads)
    val rNorm = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
        col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightTie).as("__tie"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = lNorm.unionByName(rNorm)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance: a match older than `tolerance` time units is no
    // match at all (sensor-join semantics — pandas merge_asof's
    // `tolerance`); the stale payload nulls out, the left row stays.
    // Times must be numeric (e.g. epoch micros) for the subtraction.
    val matched =
      if (tolerance == Long.MaxValue) matched0
      else matched0.withColumn("__asof",
        when(col("__asof").isNotNull &&
          col("__t") - col("__asof").getField(rightTime) <= tolerance,
          col("__asof")))

    val leftCols: Seq[Column] = left.columns.toIndexedSeq.map(c => col("__l").getField(c).as(c))
    val rightCols: Seq[Column] = rightPayload.map(c => col("__asof").getField(c).as(rightPrefix + c))
    matched.select(leftCols ++ rightCols: _*)
  }
}
