package graft.operators

import graft.SparkSpec

/** MINC1 / NetCDF-classic reader (MincIO.scala) against committed
  * fixtures from `tools/make_minc_fixture.py` — an independent Python
  * construction of the CDF-1 layout. Covers real-value normalization
  * from scalar image-min/image-max (slope/intercept, float32 output),
  * raw float images, the gzip twin, step/start/units mapping with the
  * slowest-first dim reversal, and the per-slice refusal.
  */
class MincIOSpec extends SparkSpec {

  private val fx = "src/test/resources/fixtures/vol"
  private val NX = 6; private val NY = 5; private val NZ = 4

  private def expected(f: Double => Double = identity): Seq[Double] =
    for (x <- 0 until NX; y <- 0 until NY; z <- 0 until NZ)
      yield f(((x * 7 + y * 11 + z * 13) % 200).toDouble)

  private def values(img: VolumeFormats.VolumeImage): Seq[Double] =
    ChunkOps.toArray(img.chunks, img.meta).toSeq

  test("short image with scalar normalization: real = raw * 819/4095, float32") {
    val img = VolumeFormats.read(spark, s"$fx/vol.mnc")
    assert(img.meta.dims == Seq("x", "y", "z")) // reversed from (z,y,x)
    assert(img.meta.shape == Seq(NX.toLong, NY, NZ))
    assert(img.meta.dtype == "float32")
    assert(img.meta.scale == Map("x" -> 0.5, "y" -> 0.75, "z" -> 1.25))
    assert(img.meta.translation == Map("x" -> 1.0, "y" -> 2.0, "z" -> 3.0))
    assert(img.meta.axesUnits == Map("x" -> "mm", "y" -> "mm", "z" -> "mm"))
    val s = 819.0 / 4095.0
    assert(values(img) == expected(raw => (raw * s + 0.0).toFloat.toDouble))
  }

  test(".mnc.gz twin decodes identically") {
    val a = VolumeFormats.read(spark, s"$fx/vol.mnc")
    val b = VolumeFormats.read(spark, s"$fx/vol.mnc.gz")
    assert(b.meta == a.meta && values(b) == values(a))
  }

  test("float image reads raw, no normalization") {
    val img = VolumeFormats.read(spark, s"$fx/volf.mnc")
    assert(img.meta.dtype == "float32")
    assert(values(img) == expected())
  }

  test("per-slice image-min refuses loudly") {
    val e = intercept[IllegalArgumentException](
      VolumeFormats.read(spark, s"$fx/slice.mnc"))
    assert(e.getMessage.contains("per-slice"))
  }

  test("MINC2/HDF5 and non-NetCDF payloads refuse with a precise error") {
    val e = intercept[IllegalArgumentException](
      MincIO.parseNetcdf("HDF-payload".getBytes("US-ASCII")))
    assert(e.getMessage.contains("MINC2"))
  }

  test("negative step (MNI direction-in-sign) maps to a positive scale") {
    import MincIO.{NcAtt, NcDim, NcFile, NcVar}
    def num(v: Double) = NcAtt("a", None, Some(Array(v)))
    val nc = NcFile(
      dims = Seq(NcDim("zspace", 4), NcDim("yspace", 5), NcDim("xspace", 6)),
      gatts = Map.empty,
      vars = Seq(
        NcVar("image", Seq(0, 1, 2), Map.empty, ncType = 5, begin = 0L),
        NcVar("xspace", Nil, Map("step" -> num(-0.5), "start" -> num(1.0)), 5, 0L),
        NcVar("yspace", Nil, Map("step" -> num(0.75)), 5, 0L),
        NcVar("zspace", Nil, Map("step" -> num(-1.25)), 5, 0L)))
    val (header, _, dims) = MincIO.plan(nc)
    assert(dims == Seq("x", "y", "z"))
    assert(header.spacing == Seq(0.5, 0.75, 1.25),
      "negative MINC step must not leak a negative voxel spacing")
  }

  test("multi-chunk positioned reads over the NetCDF data region") {
    val img = VolumeFormats.read(spark, s"$fx/vol.mnc", chunkShape = Some(Seq(4, 3, 2)))
    assert(img.chunks.count() == 8)
    val s = 819.0 / 4095.0
    assert(values(img) == expected(raw => (raw * s + 0.0).toFloat.toDouble))
  }
}
