package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue interleaves bits (x even positions, y odd)") {
    val df = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (255L, 0L), (0L, 255L))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) == 0L)
    assert(z((1L, 0L)) == 1L)     // x bit 0 -> position 0
    assert(z((0L, 1L)) == 2L)     // y bit 0 -> position 1
    assert(z((3L, 1L)) == 7L)     // 1 + 4 (x bits) + 2 (y bit)
    // interleaving 8 set bits of one dim spreads over even/odd slots
    assert(z((255L, 0L)) == 0x5555L)
    assert(z((0L, 255L)) == 0xAAAAL)
  }

  test("clusterBy yields non-overlapping z ranges per output partition") {
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val clustered = ZOrder.clusterBy(df, "x", "y", numPartitions = 8)
    val ranges = clustered
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    assert(ranges.map(_._4).sum == 4096)
    // range partitioning: each partition's z interval is disjoint, so a
    // z-range predicate (equivalently a filter on either dimension)
    // prunes whole partitions/files by min-max stats
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"overlap: $a vs $b")
      case _ =>
    }
  }
}
