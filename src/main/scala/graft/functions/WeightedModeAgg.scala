package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF for (optionally weighted) label mode — the SURVEY §2.8
  * aggregation extension point: buffer = label→weight histogram,
  * merge = histogram add, finish = argmax with smallest-label
  * tiebreak (np.unique-order parity with the imaging mode kernel).
  *
  * Usable as a `TypedColumn` on grouped Datasets or registered via
  * `spark.udf.register("weighted_mode", udaf(WeightedModeAgg))` for
  * relational plans (e.g. label-image downsampling on the voxel
  * view: GROUP BY z/k, y/k, x/k).
  */
object WeightedModeAgg extends Aggregator[(Double, Double), Map[Double, Double], Double] {

  override def zero: Map[Double, Double] = Map.empty

  override def reduce(buf: Map[Double, Double], in: (Double, Double)): Map[Double, Double] =
    buf.updated(in._1, buf.getOrElse(in._1, 0.0) + in._2)

  override def merge(a: Map[Double, Double], b: Map[Double, Double]): Map[Double, Double] =
    b.foldLeft(a) { case (acc, (k, w)) => acc.updated(k, acc.getOrElse(k, 0.0) + w) }

  override def finish(buf: Map[Double, Double]): Double =
    if (buf.isEmpty) Double.NaN
    else buf.minBy { case (v, w) => (-w, v) }._1

  override def bufferEncoder: Encoder[Map[Double, Double]] =
    Encoders.kryo[Map[Double, Double]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
