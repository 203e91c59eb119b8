package graft.operators

import graft.SparkSpec
import graft.meta.Model._
import graft.meta.Converters

class RestructureSpec extends SparkSpec {

  private def meta(shape: Seq[Long], dims: Seq[String], chunks: Seq[Int]): ImageMeta =
    ImageMeta(dims, shape, chunks, "float64",
      dims.map(_ -> 1.0).toMap, dims.map(_ -> 0.0).toMap)

  test("transpose permutes axes like numpy (P1)") {
    val m = meta(Seq(2, 3, 4), Seq("z", "y", "x"), Seq(2, 3, 2))
    val vals = Array.tabulate(24)(_.toDouble) // v(z,y,x) = z*12 + y*4 + x
    val ds = ChunkOps.fromArray(spark, vals, m)
    val (om, ods) = Restructure.transpose(spark, ds, m, Seq("x", "z", "y"))
    assert(om.shape == Seq(4L, 2L, 3L))
    val got = ChunkOps.toArray(ods, om) // got(x,z,y)
    for (z <- 0 until 2; y <- 0 until 3; x <- 0 until 4)
      assert(got(x * 6 + z * 3 + y) == vals(z * 12 + y * 4 + x))
  }

  test("spatialDimsLast moves c before spatial dims") {
    val m = meta(Seq(3, 4, 2), Seq("y", "x", "c"), Seq(3, 4, 2))
    val ds = ChunkOps.fromArray(spark, Array.tabulate(24)(_.toDouble), m)
    val (om, _) = Restructure.spatialDimsLast(spark, ds, m)
    assert(om.dims == Seq("c", "y", "x"))
  }

  test("take drops a plane with chunk pruning (P2)") {
    val m = meta(Seq(4, 4, 4), Seq("t", "y", "x"), Seq(1, 4, 4))
    val vals = Array.tabulate(64)(_.toDouble)
    val ds = ChunkOps.fromArray(spark, vals, m)
    val (om, ods) = Restructure.take(spark, ds, m, "t", 2)
    assert(om.dims == Seq("y", "x") && om.shape == Seq(4L, 4L))
    assert(ChunkOps.toArray(ods, om).toSeq == vals.slice(32, 48).toSeq)
    // pruning: only one of four t-chunks survives
    assert(ods.rdd.partitions.nonEmpty && ods.count() == 1)
  }

  test("slice clips a region (P2)") {
    val m = meta(Seq(8, 8), Seq("y", "x"), Seq(4, 4))
    val vals = Array.tabulate(64)(_.toDouble)
    val ds = ChunkOps.fromArray(spark, vals, m)
    val (om, ods) = Restructure.slice(spark, ds, m, Seq(2, 3), Seq(6, 7))
    assert(om.shape == Seq(4L, 4L))
    val got = ChunkOps.toArray(ods, om)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(got(y * 4 + x) == vals((y + 2) * 8 + (x + 3)))
  }

  test("arraySplit sections unevenly like numpy (P3)") {
    val m = meta(Seq(10, 4), Seq("y", "x"), Seq(2, 4))
    val ds = ChunkOps.fromArray(spark, Array.tabulate(40)(_.toDouble), m)
    val parts = Restructure.arraySplit(spark, ds, m, 3, "y")
    assert(parts.map(_._1.shape.head) == Seq(4L, 3L, 3L)) // 10 = 4+3+3
    assert(parts.map(p => ChunkOps.toArray(p._2, p._1).length).sum == 40)
  }

  test("backend detection routes by extension (S9)") {
    import Converters._, Converters.ConversionBackend._
    assert(detectBackend(Seq("/a/b/img.ome.zarr")) == NgffZarr)
    assert(detectBackend(Seq("/a/b/scan.nii.gz")) == Nibabel)
    assert(detectBackend(Seq("/a/b/img.png"), fileSize = _ => 1000) == Itkwasm)
    assert(detectBackend(Seq("/a/b/img.png"), fileSize = _ => 3e9.toLong) == Itk)
    assert(detectBackend(Seq("/a/b/slide.svs")) == Tifffile)
    // compound suffixes route on tifffile's EXPLICIT list (the
    // reference matches "".join(Path.suffixes) against it): .ome.tif
    // is listed, arbitrary dotted names are not
    assert(detectBackend(Seq("/a/b/stack.ome.tif")) == Tifffile)
    assert(detectBackend(Seq("/a/b/stack.ome.tiff")) == Tifffile)
    assert(detectBackend(Seq("/a/b/img.2024.01.tif")) == Imageio)
    assert(detectBackend(Seq("/a/b/photo.webp")) == Imageio)
    assert(detectBackend(Seq("/a/b/arr"), isZarrArrayDir = _ => true) == ZarrArray)
  }

  test("affine decomposition: pure scale+translation round-trips (S10)") {
    val affine = Array(
      Array(2.0, 0.0, 0.0, 10.0),
      Array(0.0, 3.0, 0.0, -5.0),
      Array(0.0, 0.0, 4.0, 0.5),
      Array(0.0, 0.0, 0.0, 1.0))
    val d = Converters.decomposeAffine(affine)
    assert(d.scale.toSeq == Seq(2.0, 3.0, 4.0))
    assert(d.translation.toSeq == Seq(10.0, -5.0, 0.5))
    assert(d.shear.forall(math.abs(_) < 1e-12))
    // orientation = identity
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(d.orientation(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-12)
    // flipped z axis → superior-to-inferior
    val flipped = affine.map(_.clone())
    flipped(2)(2) = -4.0
    val o = Converters.orientationToRfc4(Converters.decomposeAffine(flipped).orientation)
    assert(o("z").value == "superior-to-inferior")
    assert(o("x").value == "left-to-right")
  }

  test("affine decomposition extracts shear") {
    // x column unit, y column sheared towards x
    val affine = Array(
      Array(1.0, 0.5, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0),
      Array(0.0, 0.0, 0.0, 1.0))
    val d = Converters.decomposeAffine(affine)
    val expectedShear = 0.5 / math.sqrt(1.25) // after column normalization
    assert(math.abs(d.shear(0) - expectedShear) < 1e-12)
  }

  test("task count estimator = chunk grid size (C2)") {
    val m = meta(Seq(100, 65), Seq("y", "x"), Seq(64, 64))
    assert(Converters.taskCount(m) == 4L)
  }
}
