package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.meta.Model.ImageMeta
import graft.operators.ChunkOps.ChunkRow
import graft.zarr.{SerializableHadoopConf, ZarrStore}

/** Shared machinery for "header + Fortran-ordered raw array" volume
  * formats (NIfTI, NRRD, MetaImage, MGH — the scientific-imaging
  * lingua franca): a distributed positioned-read path for
  * uncompressed payloads (one Spark task per output chunk, each task
  * reading only its chunk's x-runs) and a scatter path for formats
  * whose payload had to be stream-decoded on the driver (gzip/zlib
  * are not splittable). Extracted from the NIfTI reader so every
  * format shares one tested implementation of the stride math.
  */
object RawVolume {

  /** Uncompressed path: one Spark task per chunk; each task
    * positioned-reads only its chunk's x-runs (file layout is
    * Fortran-ordered — first dim fastest — so a chunk is contiguous
    * runs of `chunks(0)` voxels). Optional affine rescale
    * (`v*slope + inter`, float32-rounded, the NIfTI scl contract).
    */
  def readDistributed(spark: SparkSession, path: String,
      hconf: Option[SerializableHadoopConf], dataOffset: Long, srcDtype: String,
      itemSize: Int, bigEndian: Boolean, meta: ImageMeta,
      slope: Double = 1.0, inter: Double = 0.0): Dataset[ChunkRow] = {
    import spark.implicits._
    val grid = ZarrStore.chunkGrid(meta.shape, meta.chunks)
    val idxs = ZarrStore.gridPositions(grid).toSeq
    val shape = meta.shape
    val chunks = meta.chunks
    val outDtype = meta.dtype
    val rescale = (slope, inter) != ((1.0, 0.0))
    // Fortran strides: dim 0 fastest
    val fstride = shape.scanLeft(1L)(_ * _).init
    spark.createDataset(idxs)
      .repartition(math.min(idxs.length, spark.sparkContext.defaultParallelism))
      .map { idx =>
        val st = new ZarrStore(path, hconf)
        val cShape = ZarrStore.chunkShapeAt(shape, chunks, idx)
        val origin = ZarrStore.chunkOriginAt(chunks, idx)
        val n = cShape.product
        val out = new Array[Double](n)
        // iterate non-x local coordinates in C order of the chunk
        val rest = cShape.drop(1)
        val runLen = cShape.head
        val restCount = rest.product
        val li = new Array[Int](rest.length)
        var r = 0
        while (r < restCount) {
          var fileIdx = origin.head * fstride.head
          var cBase = 0L // C-order base: strides over dims 1..n-1
          var cstride = 1L
          var d = rest.length - 1
          while (d >= 0) {
            fileIdx += (origin(d + 1) + li(d)) * fstride(d + 1)
            cBase += li(d) * cstride
            cstride *= rest(d)
            d += -1
          }
          val raw = st.readRange("", dataOffset + fileIdx * itemSize, runLen * itemSize)
          val vals = ZarrStore.decodeToDoubles(raw, srcDtype, bigEndian)
          // x varies fastest in the file run; in C order (x first dim)
          // consecutive x are `restCount` apart
          var i = 0
          while (i < runLen) {
            val v = if (rescale) (vals(i) * slope + inter).toFloat.toDouble else vals(i)
            out((i.toLong * restCount + cBase).toInt) = v
            i += 1
          }
          // increment odometer over rest dims (last fastest)
          var k = rest.length - 1
          var carry = true
          while (k >= 0 && carry) {
            li(k) += 1
            if (li(k) == rest(k)) { li(k) = 0; k -= 1 } else carry = false
          }
          r += 1
        }
        ChunkRow(idx, origin, cShape, ZarrStore.encodeFromDoubles(out, outDtype))
      }
  }

  /** Scatter a decoded Fortran-order payload into C-order chunk rows
    * (with optional scl rescale), distributing the per-chunk encode.
    */
  def scatterFortran(spark: SparkSession, fvals: Array[Double], meta: ImageMeta,
      slope: Double = 1.0, inter: Double = 0.0): Dataset[ChunkRow] = {
    val shape = meta.shape
    val rescale = (slope, inter) != ((1.0, 0.0))
    val fstride = shape.scanLeft(1L)(_ * _).init
    // C-order global array, then reuse the existing scatter machinery
    val n = shape.product.toInt
    val cvals = new Array[Double](n)
    val cstrideArr = shape.scanRight(1L)(_ * _).tail
    val idx = new Array[Long](shape.length)
    var done = false
    while (!done) {
      var fi = 0L; var ci = 0L
      var d = 0
      while (d < shape.length) {
        fi += idx(d) * fstride(d); ci += idx(d) * cstrideArr(d); d += 1
      }
      val v = fvals(fi.toInt)
      cvals(ci.toInt) = if (rescale) (v * slope + inter).toFloat.toDouble else v
      // odometer: first dim fastest (any order covers all cells)
      var k = 0
      var carry = true
      while (k < shape.length && carry) {
        idx(k) += 1
        if (idx(k) == shape(k)) { idx(k) = 0; k += 1 } else carry = false
      }
      done = carry
    }
    ChunkOps.fromArray(spark, cvals, meta)
  }
}
