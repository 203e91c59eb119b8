package graft.operators

import graft.SparkSpec

/** Constrained DICOM reader (DicomIO.scala) against committed
  * fixtures from `tools/make_dicom_fixture.py` — an INDEPENDENT
  * Python construction of the Part 10 layout, covering the explicit
  * LE series path (shuffled InstanceNumbers), implicit VR with a
  * nested undefined-length sequence + rescale, the retired explicit
  * BE syntax, and the compressed-syntax refusal. Round-trips through
  * the JVM encoder close the loop.
  */
class DicomIOSpec extends SparkSpec {

  private val fx = "src/test/resources/fixtures/dicom"
  private val NX = 6; private val NY = 5

  private def v(x: Int, y: Int, z: Int) = (3 * x + 7 * y + 11 * z) % 126

  /** C-order expectation over dims (x,y,z). */
  private def expected(nz: Int, f: Double => Double = identity): Seq[Double] =
    for (x <- 0 until NX; y <- 0 until NY; z <- 0 until nz)
      yield f(v(x, y, z).toDouble)

  test("explicit-LE series: shuffled InstanceNumbers sort into z, spacing mapped") {
    val img = DicomIO.readSeriesDir(spark, s"$fx/series")
    assert(img.meta.dims == Seq("x", "y", "z"))
    assert(img.meta.shape == Seq(NX.toLong, NY, 4L))
    assert(img.meta.dtype == "int16")
    assert(img.meta.scale == Map("x" -> 1.5, "y" -> 2.5, "z" -> 3.0))
    assert(img.meta.translation("z") == 0.0) // slice with InstanceNumber 1
    assert(ChunkOps.toArray(img.chunks, img.meta).toSeq == expected(4))
  }

  test("implicit VR multi-frame: undefined-length SQ skipped, rescale to float32") {
    val img = DicomIO.read(spark, s"$fx/mf.dcm")
    assert(img.meta.shape == Seq(NX.toLong, NY, 3L))
    assert(img.meta.dtype == "float32")
    assert(ChunkOps.toArray(img.chunks, img.meta).toSeq
      == expected(3, raw => (raw * 2.0 + 10.0).toFloat.toDouble))
  }

  test("explicit big-endian slice decodes identically") {
    val img = DicomIO.read(spark, s"$fx/be.dcm")
    assert(img.meta.shape == Seq(NX.toLong, NY, 1L))
    assert(ChunkOps.toArray(img.chunks, img.meta).toSeq == expected(1))
  }

  test("compressed transfer syntax refuses loudly") {
    // the header pass is distributed, so the precise refusal arrives
    // wrapped in the task failure — the message must survive verbatim
    val e = intercept[Exception](DicomIO.read(spark, s"$fx/jpeg.dcm"))
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(e).exists(_.contains("1.2.840.10008.1.2.4.50")))
  }

  test("JVM encoder round-trips through the reader (series of 3)") {
    val dir = java.nio.file.Files.createTempDirectory("dcm")
    for (z <- 0 until 3) {
      val px = Array.tabulate[Short](NY * NX)(i => v(i % NX, i / NX, z).toShort)
      java.nio.file.Files.write(dir.resolve(s"z$z.dcm"),
        DicomIO.encodeSliceInt16(NY, NX, instanceNumber = z + 1, ippZ = z * 2.0,
          pixelSpacingRowCol = (0.7, 0.4), sliceThickness = 2.0, pixels = px))
    }
    val img = DicomIO.readSeriesDir(spark, dir.toString)
    assert(img.meta.scale == Map("x" -> 0.4, "y" -> 0.7, "z" -> 2.0))
    assert(ChunkOps.toArray(img.chunks, img.meta).toSeq == expected(3))
  }

  test("not-DICOM payloads refuse with the magic error") {
    assert(intercept[IllegalArgumentException](
      DicomIO.parse(new Array[Byte](200))).getMessage.contains("DICM"))
  }
}
