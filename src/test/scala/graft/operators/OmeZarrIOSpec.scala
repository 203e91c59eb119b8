package graft.operators

import graft.SparkSpec
import graft.meta.Model._
import java.nio.file.Files

/** The §7.3 minimum slice, end-to-end: build a pyramid from a 64×64
  * uint8 image, write OME-Zarr, re-read, and assert data + metadata
  * parity (scale' = 2·scale, translation' = translation + 0.5·scale,
  * chunk bytes stable).
  */
class OmeZarrIOSpec extends SparkSpec {

  private def mkImage(): (ImageMeta, Array[Double]) = {
    val m = ImageMeta(Seq("y", "x"), Seq(64, 64), Seq(32, 32), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val r = new scala.util.Random(123)
    (m, Array.fill(64 * 64)(r.nextInt(256).toDouble))
  }

  test("minimum slice: pyramid → write v0.4 → read → verify data and metadata") {
    val (m, vals) = mkImage()
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))
    val ms = MultiscaleBuilder.toMultiscales(spark, base,
      Some(Seq(Map("y" -> 2, "x" -> 2))), Method.ItkwasmBinShrink, cache = false)
    val dir = Files.createTempDirectory("omezarr").toString + "/img.zarr"
    val counts = OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.4")
    assert(counts == Seq(4L, 1L))

    val back = OmeZarrIO.readMultiscales(spark, dir, validate = true)
    assert(back.levels.length == 2)
    val l0 = back.levels.head
    val l1 = back.levels(1)
    assert(l0.meta.shape == Seq(64L, 64L) && l0.meta.dtype == "uint8")
    assert(l1.meta.shape == Seq(32L, 32L))
    // A14 invariants through write/read
    assert(l1.meta.scale == Map("y" -> 2.0, "x" -> 2.0))
    assert(l1.meta.translation == Map("y" -> 0.5, "x" -> 0.5))
    assert(back.method == Method.ItkwasmBinShrink)
    // pixel parity both levels
    assert(ChunkOps.toArray(l0.chunks, l0.meta).toSeq == vals.toSeq)
    assert(ChunkOps.toArray(l1.chunks, l1.meta).toSeq ==
      ChunkOps.toArray(ms.levels(1).chunks, ms.levels(1).meta).toSeq)
  }

  test("v0.5 (zarr v3) write/read round-trip with c/ chunk keys") {
    val (m, vals) = mkImage()
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))
    val ms = MultiscaleBuilder.toMultiscales(spark, base,
      Some(Seq(Map("y" -> 2, "x" -> 2))), Method.ItkwasmGaussian, cache = false)
    val dir = Files.createTempDirectory("omezarr3").toString + "/img.zarr"
    OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.5", compressor = Some("gzip"))
    assert(new java.io.File(s"$dir/scale0/image/c/0/0").exists())
    assert(new java.io.File(s"$dir/zarr.json").exists())
    val back = OmeZarrIO.readMultiscales(spark, dir)
    assert(back.levels.map(_.meta.shape) == Seq(Seq(64L, 64L), Seq(32L, 32L)))
    assert(ChunkOps.toArray(back.levels.head.chunks, back.levels.head.meta).toSeq == vals.toSeq)
  }

  test("blosc compressor: v0.4 and v0.5 write/read round-trip") {
    val (m, vals) = mkImage()
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))
    val ms = MultiscaleBuilder.toMultiscales(spark, base,
      Some(Seq(Map("y" -> 2, "x" -> 2))), Method.ItkwasmBinShrink, cache = false)
    for ((version, comp) <- Seq("0.4" -> "blosc", "0.5" -> "blosc:zstd:3",
        "0.4" -> "blosc:blosclz", "0.5" -> "blosc:blosclz:5:bit",
        "0.4" -> "blosc:lz4:5:bit")) {
      val dir = Files.createTempDirectory("omezarr").toString + "/img.zarr"
      OmeZarrIO.writeMultiscales(spark, dir, ms, version = version,
        compressor = Some(comp))
      // the store advertises blosc in its metadata, with zarr-python's shape
      val metaDoc = if (version == "0.4")
        new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "scale0/image/.zarray")))
      else
        new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "scale0/image/zarr.json")))
      assert(metaDoc.contains("blosc") && metaDoc.contains("cname"))
      val back = OmeZarrIO.readMultiscales(spark, dir)
      assert(ChunkOps.toArray(back.levels.head.chunks, back.levels.head.meta).toSeq
        == vals.toSeq, s"version $version")
    }
  }

  test("full pyramid write/read through a foreign-scheme FileSystem (S3 contract)") {
    // executors resolve mockfs:// through the serialized hadoop conf,
    // exactly the route s3a:// credentials take on a real cluster
    spark.sparkContext.hadoopConfiguration.set("fs.mockfs.impl",
      classOf[graft.zarr.MockRemoteFileSystem].getName)
    val (m, vals) = mkImage()
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))
    val ms = MultiscaleBuilder.toMultiscales(spark, base,
      Some(Seq(Map("y" -> 2, "x" -> 2))), Method.ItkwasmBinShrink, cache = false)
    val local = Files.createTempDirectory("omezarr-remote").toString
    val dir = s"mockfs://bucket$local/img.zarr"
    OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.4",
      compressor = Some("blosc"))
    val back = OmeZarrIO.readMultiscales(spark, dir)
    assert(back.levels.map(_.meta.shape) == Seq(Seq(64L, 64L), Seq(32L, 32L)))
    assert(ChunkOps.toArray(back.levels.head.chunks, back.levels.head.meta).toSeq
      == vals.toSeq)
  }

  test("fuzz: random shapes/chunks/dtypes/codecs round-trip both zarr versions") {
    val rnd = new scala.util.Random(42L)
    val dtypes = Seq("uint8", "int16", "uint16", "int32", "float32", "float64")
    val comps = Seq(None, Some("gzip"), Some("zstd"), Some("blosc"),
      Some("blosc:blosclz"), Some("blosc:zstd:3:bit"), Some("blosc:lz4:5:none"))
    for (trial <- 0 until 10) {
      val h = 3 + rnd.nextInt(48)
      val w = 3 + rnd.nextInt(48)
      val ch = 1 + rnd.nextInt(h)
      val cw = 1 + rnd.nextInt(w)
      val dtype = dtypes(rnd.nextInt(dtypes.length))
      val comp = comps(rnd.nextInt(comps.length))
      val version = if (rnd.nextBoolean()) "0.4" else "0.5"
      val m = ImageMeta(Seq("y", "x"), Seq(h, w), Seq(ch, cw), dtype,
        Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
      val vals = Array.fill(h * w)(dtype match {
        case "uint8" => rnd.nextInt(256).toDouble
        case "uint16" => rnd.nextInt(65536).toDouble
        case "int16" => (rnd.nextInt(65536) - 32768).toDouble
        case "int32" => rnd.nextInt().toDouble
        case "float32" => rnd.nextFloat().toDouble
        case _ => rnd.nextDouble()
      })
      val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))
      val ms = MultiscaleBuilder.toMultiscales(spark, base, Some(Seq.empty),
        Method.ItkwasmBinShrink, cache = false)
      val dir = Files.createTempDirectory("omezarr-fuzz").toString + "/img.zarr"
      OmeZarrIO.writeMultiscales(spark, dir, ms, version = version, compressor = comp)
      val back = OmeZarrIO.readMultiscales(spark, dir)
      assert(back.levels.head.meta.shape == Seq(h.toLong, w.toLong),
        s"trial $trial $dtype $comp $version ${h}x$w/${ch}x$cw")
      assert(ChunkOps.toArray(back.levels.head.chunks, back.levels.head.meta).toSeq
        == vals.toSeq, s"trial $trial $dtype $comp $version ${h}x$w/${ch}x$cw")
    }
  }

  test("consolidated metadata written for v0.4 (S8)") {
    val (m, vals) = mkImage()
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, vals, m))
    val ms = MultiscaleBuilder.toMultiscales(spark, base, Some(Seq.empty),
      Method.ItkwasmBinShrink, cache = false)
    val dir = Files.createTempDirectory("omezarrc").toString + "/img.zarr"
    OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.4")
    val zm = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/.zmetadata")))
    assert(zm.contains("zarr_consolidated_format"))
    assert(zm.contains("scale0/image/.zarray"))
  }

  test("rechunk preserves content (P4)") {
    val (m, vals) = mkImage()
    val ds = ChunkOps.fromArray(spark, vals, m)
    val (m2, ds2) = ChunkOps.rechunk(spark, ds, m, Seq(48, 16))
    assert(ChunkOps.toArray(ds2, m2).toSeq == vals.toSeq)
    assert(ds2.collect().map(_.shape).toSet == Set(Seq(48, 16), Seq(16, 16)))
  }
}
