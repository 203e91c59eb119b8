package graft.operators

import graft.SparkSpec
import graft.meta.Model._
import graft.zarr.ZarrStore
import org.apache.spark.sql.functions._

class ComplexViewSpec extends SparkSpec {
  test("complex voxel view exposes (re, im) columns") {
    import spark.implicits._
    val m = ImageMeta(Seq("y", "x"), Seq(2, 2), Seq(2, 2), "complex64",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val interleaved = Array(1.0, -1.0, 2.0, 0.5, 3.0, 0.0, 4.0, 2.0)
    val row = ChunkOps.ChunkRow(Seq(0, 0), Seq(0L, 0L), Seq(2, 2),
      ZarrStore.encodeComplex(interleaved, "complex64"))
    val ds = spark.createDataset(Seq(row))
    val vv = ChunkOps.complexVoxelView(spark, ds, m)
    assert(vv.count() == 4)
    val r = vv.filter(col("y") === 0 && col("x") === 1).head
    assert(r.getAs[Double]("re") == 2.0 && r.getAs[Double]("im") == 0.5)
    // magnitude as a relational expression over the struct columns
    val mag = vv.select(sqrt(col("re") * col("re") + col("im") * col("im")).as("m"))
      .agg(max(col("m"))).head.getDouble(0)
    assert(math.abs(mag - math.sqrt(20.0)) < 1e-12)
  }
}
