package graft.operators

import graft.SparkSpec
import graft.meta.Model._
import org.apache.spark.sql.functions._

/** Cross-implementation interop: the committed fixture store was
  * written by an INDEPENDENT Zarr v2 implementation
  * (tools/make_interop_fixture.py — numpy + zlib + hand-built JSON),
  * exercising big-endian uint16 with zlib chunks + '/' separator and
  * raw float32 with '.' separator, ragged edge chunks padded on disk,
  * omero attrs and axis units. Checksums printed by the generator
  * are pinned here.
  */
class InteropSpec extends SparkSpec {

  private val fixture = "src/test/resources/fixtures/interop.zarr"

  test("reads a store written by an independent zarr implementation") {
    val ms = OmeZarrIO.readMultiscales(spark, fixture, validate = true)
    assert(ms.levels.length == 2)
    val l0 = ms.levels.head
    assert(l0.meta.shape == Seq(48L, 80L))
    assert(l0.meta.dtype == "uint16") // >u2 normalized
    assert(l0.meta.axesUnits == Map("y" -> "micrometer", "x" -> "micrometer"))
    assert(l0.meta.scale == Map("y" -> 0.5, "x" -> 0.5))
    val a0 = ChunkOps.toArray(l0.chunks, l0.meta)
    assert(a0.sum == 116130149.0) // generator-pinned checksum
    assert(a0(5 * 80 + 7) == 19940.0)

    val l1 = ms.levels(1)
    assert(l1.meta.dtype == "float32")
    assert(l1.meta.translation == Map("y" -> 0.25, "x" -> 0.25))
    val a1 = ChunkOps.toArray(l1.chunks, l1.meta)
    assert(a1.sum == 7137432.0)
    assert(a1(3 * 40 + 3) == 9278.25)

    assert(ms.method == Method.ItkwasmBinShrink)
    assert(ms.omero.exists(_.channels.head.label.contains("green")))
    assert(ms.omero.exists(_.channels.head.window == OmeroWindow(0, 60000, 100, 50000)))
  }

  test("DSv2 reads the independent store with scale pruning") {
    val df = spark.read.format("omezarr").load(fixture)
    assert(df.count() == 6 + 1) // 2x3 ragged grid + single scale1 chunk
    val s1 = df.filter(col("scale") === 1)
    assert(s1.count() == 1)
    assert(s1.head.getAs[String]("dtype") == "float32")
  }

  test("downsampling the foreign store matches its own precomputed level") {
    // scale1 in the fixture is exactly scale0[::2,::2]/4 — nearest
    // picks the same voxels, so nearest(scale0)/4 must equal scale1
    val ms = OmeZarrIO.readMultiscales(spark, fixture)
    val l0 = ms.levels.head
    val (om, ods) = Downsample.step(spark, l0.chunks, l0.meta,
      Map("y" -> 2, "x" -> 2), Method.DaskImageNearest)
    val got = ChunkOps.toArray(ods, om).map(_ / 4.0f.toDouble)
    val want = ChunkOps.toArray(ms.levels(1).chunks, ms.levels(1).meta)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-3) }
  }
}
