package graft.operators

import graft.SparkSpec

/** S10 — baseline TIFF ingestion against committed fixtures written
  * by `tools/make_tiff_fixture.py` (stdlib-only TIFF 6.0 / BigTIFF
  * bytes). Expected voxel values replay the generator formulas;
  * every codec path (none/deflate/packbits/LZW), the horizontal
  * predictor, big-endian samples, tile padding crop, multipage
  * stacking and BigTIFF IFDs are pinned.
  */
class TiffIOSpec extends SparkSpec {

  private val fx = "src/test/resources/fixtures"

  test("gray8 strips uncompressed: shape, grid, values") {
    val img = TiffIO.read(spark, s"$fx/gray8_strips.tif")
    assert(img.meta.dims == Seq("y", "x"))
    assert(img.meta.shape == Seq(17L, 21L))
    assert(img.meta.dtype == "uint8")
    assert(img.meta.chunks == Seq(5, 21))
    assert(img.chunks.count() == 4) // ceil(17/5) strips
    val got = ChunkOps.toArray(img.chunks, img.meta)
    for (y <- 0 until 17; x <- 0 until 21)
      assert(got(y * 21 + x) == ((3 * x + 7 * y) % 256).toDouble, s"($x,$y)")
  }

  test("gray16 deflate + predictor 2, big-endian") {
    val img = TiffIO.read(spark, s"$fx/gray16_deflate.tif")
    assert(img.meta.dtype == "uint16")
    assert(img.meta.shape == Seq(12L, 16L))
    val got = ChunkOps.toArray(img.chunks, img.meta)
    for (y <- 0 until 12; x <- 0 until 16)
      assert(got(y * 16 + x) == ((x * 801 + y * 1203) % 65536).toDouble, s"($x,$y)")
  }

  test("RGB packbits: trailing c dim") {
    val img = TiffIO.read(spark, s"$fx/rgb_packbits.tif")
    assert(img.meta.dims == Seq("y", "x", "c"))
    assert(img.meta.shape == Seq(7L, 9L, 3L))
    val got = ChunkOps.toArray(img.chunks, img.meta)
    for (y <- 0 until 7; x <- 0 until 9) {
      val base = (y * 9 + x) * 3
      assert(got(base) == ((x * 20) % 256).toDouble)
      assert(got(base + 1) == ((y * 30) % 256).toDouble)
      assert(got(base + 2) == (((x + y) * 15) % 256).toDouble)
    }
  }

  test("LZW strip decodes (early-change code widths)") {
    val img = TiffIO.read(spark, s"$fx/gray8_lzw.tif")
    assert(img.meta.shape == Seq(9L, 33L))
    val got = ChunkOps.toArray(img.chunks, img.meta)
    for (y <- 0 until 9; x <- 0 until 33)
      assert(got(y * 33 + x) == ((x / 3 + y) % 7).toDouble, s"($x,$y)")
  }

  test("LZW round-trips a dictionary-heavy synthetic buffer") {
    // long repetitive payload pushes the code width through 10 bits
    val data = Array.tabulate[Byte](20000)(i => ((i / 7) % 11).toByte)
    val enc = lzwEncodeRef(data)
    assert(TiffIO.lzwDecode(enc, data.length).toSeq == data.toSeq)
  }

  /** Mirror of the generator's encoder, to stress widths beyond what
    * the small fixture reaches.
    */
  private def lzwEncodeRef(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    def write(code: Int, width: Int): Unit = {
      acc = (acc << width) | code; nbits += width
      while (nbits >= 8) { out.write(((acc >> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
      acc &= (1L << nbits) - 1
    }
    var table = scala.collection.mutable.HashMap[Seq[Byte], Int]()
    (0 until 256).foreach(i => table(Seq(i.toByte)) = i)
    var nextCode = 258; var width = 9
    write(256, width)
    var w = Vector.empty[Byte]
    data.foreach { b =>
      val wc = w :+ b
      if (table.contains(wc)) w = wc
      else {
        write(table(w), width)
        table(wc) = nextCode; nextCode += 1
        if (nextCode == (1 << width) - 1 && width < 12) width += 1
        if (nextCode > 4093) {
          write(256, width)
          table = scala.collection.mutable.HashMap[Seq[Byte], Int]()
          (0 until 256).foreach(i => table(Seq(i.toByte)) = i)
          nextCode = 258; width = 9
        }
        w = Vector(b)
      }
    }
    if (w.nonEmpty) write(table(w), width)
    write(257, width)
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZW tolerates consecutive Clear codes") {
    // stream: Clear, Clear, 'A', EOI at 9-bit width
    var acc = 0L; var nbits = 0
    val out = new java.io.ByteArrayOutputStream()
    def w(code: Int): Unit = {
      acc = (acc << 9) | code; nbits += 9
      while (nbits >= 8) { out.write(((acc >> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
      acc &= (1L << nbits) - 1
    }
    w(256); w(256); w(65); w(257)
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    assert(TiffIO.lzwDecode(out.toByteArray, 1).toSeq == Seq(65.toByte))
  }

  test("tiled float32: padded edge tiles crop to image bounds") {
    val img = TiffIO.read(spark, s"$fx/tiled_f32.tif")
    assert(img.meta.dtype == "float32")
    assert(img.meta.shape == Seq(30L, 40L))
    assert(img.meta.chunks == Seq(16, 16))
    assert(img.chunks.count() == 6) // 2x3 tile grid
    val got = ChunkOps.toArray(img.chunks, img.meta)
    for (y <- 0 until 30; x <- 0 until 40)
      assert(got(y * 40 + x) == (x * 0.5f - y * 0.25f).toDouble, s"($x,$y)")
  }

  test("multipage stacks as z; BigTIFF parses") {
    val img = TiffIO.read(spark, s"$fx/multipage.tif")
    assert(img.meta.dims == Seq("z", "y", "x"))
    assert(img.meta.shape == Seq(3L, 6L, 8L))
    val got = ChunkOps.toArray(img.chunks, img.meta)
    for (z <- 0 until 3; y <- 0 until 6; x <- 0 until 8)
      assert(got((z * 6 + y) * 8 + x) == ((x + 2 * y + 10 * z) % 256).toDouble, s"($x,$y,$z)")

    val big = TiffIO.read(spark, s"$fx/big.tif")
    assert(big.meta.shape == Seq(5L, 10L))
    val bgot = ChunkOps.toArray(big.chunks, big.meta)
    for (y <- 0 until 5; x <- 0 until 10)
      assert(bgot(y * 10 + x) == ((5 * x + y) % 256).toDouble)
  }

  test("TIFF feeds the pyramid + OME-Zarr write path end-to-end") {
    import graft.meta.Model._
    val img = TiffIO.read(spark, s"$fx/gray8_strips.tif")
    val base = MultiscaleBuilder.Level(img.meta, img.chunks)
    val ms = MultiscaleBuilder.toMultiscales(spark, base,
      Some(Seq(Map("y" -> 2, "x" -> 2))), Method.ItkwasmBinShrink, cache = false)
    val dir = java.nio.file.Files.createTempDirectory("tiff2zarr").toString + "/img.zarr"
    OmeZarrIO.writeMultiscales(spark, dir, ms, version = "0.4", compressor = Some("blosc"))
    val back = OmeZarrIO.readMultiscales(spark, dir, validate = true)
    assert(ChunkOps.toArray(back.levels.head.chunks, back.levels.head.meta).toSeq
      == ChunkOps.toArray(img.chunks, img.meta).toSeq)
  }

  test("precise errors: palette, JPEG, bad magic") {
    val ok = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fx/gray8_strips.tif"))
    intercept[IllegalArgumentException](TiffIO.parseInfo("NOPE".getBytes ++ ok.drop(4)))
    assert(TiffIO.dtypeFor(16, 1) == "uint16")
    intercept[UnsupportedOperationException](TiffIO.dtypeFor(1, 1)) // bilevel
    intercept[UnsupportedOperationException](TiffIO.decodeRegion(7, Array[Byte](1), 4))
  }
}
