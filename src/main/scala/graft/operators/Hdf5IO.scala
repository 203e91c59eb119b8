package graft.operators

import org.apache.spark.sql.{Dataset => SDataset, SparkSession}
import graft.meta.Model.ImageMeta
import graft.operators.ChunkOps.ChunkRow
import graft.operators.VolumeFormats.{RawHeader, VolumeImage}
import graft.zarr.{SerializableHadoopConf, ZarrStore}

/** S10 — HDF5-backed volume ingestion on top of the [[Hdf5]] subset
  * parser: generic `.hdf5` datasets and the MINC2 `.mnc2` layout
  * (`/minc-2.0/image/0/image` + per-dimension step/start attributes),
  * closing the "needs an HDF5 stack" boundary for default-layout
  * files (the reference routes both through itk,
  * `py/ngff_zarr/detect_cli_io_backend.py:40-47`).
  *
  * HDF5 datasets are C-ordered (slowest dim first); the engine's
  * fastest-axis-first ImageMeta is the exact reverse, so a C-order
  * (z,y,x) payload IS the Fortran (x,y,z) layout the shared
  * [[RawVolume]] machinery expects — no transpose on the contiguous
  * path, which positioned-reads per output chunk exactly like NIfTI.
  * Chunked datasets fan out ONE SPARK TASK PER HDF5 CHUNK RECORD:
  * the v1 chunk B-tree (kilobytes) parses on the driver, each task
  * range-reads its stored chunk, reverses the filter pipeline
  * (deflate, byte-shuffle), clips edge padding, and reorders the
  * chunk into the engine layout — voxels never transit the driver.
  * Chunks absent from the B-tree materialize as fill (the HDF5
  * sparse-allocation contract). The metadata parse does read the
  * file image once on the driver (group tables are scattered through
  * the file); the CLI routing caps these inputs at 2 GB, and voxel
  * DECODE cost — the real work — is fully distributed.
  */
object Hdf5IO {

  /** Read a dataset from an HDF5 file as a VolumeImage. With no
    * `dataset` name, the file must contain exactly one numeric
    * dataset (the `.hdf5` CLI contract); MINC2 files route through
    * [[readMinc2]] automatically.
    */
  def read(spark: SparkSession, path: String, dataset: Option[String] = None,
      chunkShape: Option[Seq[Int]] = None): VolumeImage = {
    val hconf = Some(SerializableHadoopConf.fromActiveSession())
    val bytes = new ZarrStore(path, hconf).readBytes("")
    val tree = Hdf5.parse(bytes)
    if (dataset.isEmpty && tree.groups.contains("minc-2.0"))
      return minc2Of(spark, path, hconf, bytes, tree, chunkShape)
    if (dataset.isEmpty && tree.groups.contains("ITKImage"))
      return itkImageOf(spark, path, hconf, bytes, tree, chunkShape)
    val ds = dataset match {
      case Some(name) => tree.dataset(name)
      case None =>
        val numeric = tree.allDatasets.filter(d => d.dtype.nonEmpty && d.dims.product > 0)
        require(numeric.length == 1,
          s"$path holds ${numeric.length} numeric datasets " +
            s"(${numeric.map(_.path).sorted.mkString(", ")}) — name one explicitly")
        numeric.head
    }
    readDataset(spark, path, hconf, bytes, ds,
      spacing = Seq.fill(ds.dims.length)(1.0),
      origin = Seq.fill(ds.dims.length)(0.0), chunkShape)
  }

  /** ITK HDF5ImageIO layout — what `itk.imwrite(img, "x.hdf5")`
    * produces (itkHDF5ImageIO.cxx, public ITK): group `/ITKImage/0`
    * with `VoxelData` (C-order, slowest dim first), plus small
    * float64 datasets `Spacing`/`Origin` in ITK order (FASTEST axis
    * first — the reverse of VoxelData's dim order).
    */
  private def itkImageOf(spark: SparkSession, path: String,
      hconf: Option[SerializableHadoopConf], bytes: Array[Byte],
      tree: Hdf5.Group, chunkShape: Option[Seq[Int]]): VolumeImage = {
    val itk = tree.groups("ITKImage")
    val zero = itk.groups.getOrElse("0",
      throw new UnsupportedOperationException(s"$path: no /ITKImage/0 group"))
    val vox = zero.datasets.getOrElse("VoxelData",
      throw new UnsupportedOperationException(s"$path: no /ITKImage/0/VoxelData dataset"))
    def smallVec(name: String): Seq[Double] = zero.datasets.get(name) match {
      case Some(d) => d.layout match {
        case Hdf5.Contiguous(addr, size) =>
          graft.zarr.ZarrStore.decodeToDoubles(
            java.util.Arrays.copyOfRange(bytes, addr.toInt, (addr + size).toInt),
            d.dtype, d.bigEndian).toSeq
        case Hdf5.Compact(data) =>
          graft.zarr.ZarrStore.decodeToDoubles(data, d.dtype, d.bigEndian).toSeq
        case _ => throw new UnsupportedOperationException(
          s"$path: /ITKImage/0/$name is chunked — unexpected for a metadata vector")
      }
      case None => Seq.fill(vox.dims.length)(if (name == "Spacing") 1.0 else 0.0)
    }
    // ITK metadata vectors are fastest-first; VoxelData dims are
    // slowest-first — reverse the vectors to match the file dim order
    val spacing = smallVec("Spacing").reverse
    val origin = smallVec("Origin").reverse
    require(spacing.length == vox.dims.length && origin.length == vox.dims.length,
      s"$path: Spacing/Origin rank != VoxelData rank ${vox.dims.length}")
    readDataset(spark, path, hconf, bytes, vox, spacing, origin, chunkShape)
  }

  /** MINC2: dataset `/minc-2.0/image/0/image`, spacing |step| and
    * translation `start` from `/minc-2.0/dimensions/<name>` attrs in
    * `dimorder` order (slowest first, matching the dataset dims).
    * Negative steps take |step| as scale — the same normalize-to-
    * positive posture as the MINC1 reader. Files carrying image-min/
    * image-max normalization datasets refuse loudly (same boundary
    * as MINC1 per-slice normalization).
    */
  def readMinc2(spark: SparkSession, path: String,
      chunkShape: Option[Seq[Int]] = None): VolumeImage = {
    val hconf = Some(SerializableHadoopConf.fromActiveSession())
    val bytes = new ZarrStore(path, hconf).readBytes("")
    minc2Of(spark, path, hconf, bytes, Hdf5.parse(bytes), chunkShape)
  }

  private def minc2Of(spark: SparkSession, path: String,
      hconf: Option[SerializableHadoopConf], bytes: Array[Byte],
      tree: Hdf5.Group, chunkShape: Option[Seq[Int]]): VolumeImage = {
    val minc = tree.groups.getOrElse("minc-2.0",
      throw new UnsupportedOperationException(s"$path: no /minc-2.0 group"))
    val imageGrp = minc.groups.getOrElse("image",
      throw new UnsupportedOperationException(s"$path: no /minc-2.0/image group"))
    val zero = imageGrp.groups.getOrElse("0",
      throw new UnsupportedOperationException(s"$path: no /minc-2.0/image/0 group"))
    require(!zero.datasets.contains("image-min") && !zero.datasets.contains("image-max"),
      s"$path: MINC2 image-min/image-max normalization unsupported (same boundary as MINC1 per-slice normalization)")
    val img = zero.datasets.getOrElse("image",
      throw new UnsupportedOperationException(s"$path: no /minc-2.0/image/0/image dataset"))
    val dimNames: Seq[String] = img.attrs.get("dimorder") match {
      case Some(Hdf5.AStr(s)) => s.split(",").toSeq
      case _ =>
        throw new UnsupportedOperationException(s"$path: image dataset has no dimorder attribute")
    }
    require(dimNames.length == img.dims.length,
      s"$path: dimorder $dimNames arity != dataset rank ${img.dims.length}")
    val dimsGrp = minc.groups.getOrElse("dimensions",
      throw new UnsupportedOperationException(s"$path: no /minc-2.0/dimensions group"))
    def dimAttr(dim: String, attr: String): Double =
      dimsGrp.datasets.get(dim).orElse(dimsGrp.datasets.get(dim)) match {
        case Some(d) => d.attrs.get(attr) match {
          case Some(Hdf5.ANums(v)) => v.head
          case _ => throw new UnsupportedOperationException(
            s"$path: dimension $dim has no numeric '$attr' attribute")
        }
        case None => throw new UnsupportedOperationException(
          s"$path: no /minc-2.0/dimensions/$dim")
      }
    // |step| as spacing: MINC encodes direction in the step sign
    val spacing = dimNames.map(d => math.abs(dimAttr(d, "step")))
    val origin = dimNames.map(d => dimAttr(d, "start"))
    readDataset(spark, path, hconf, bytes, img, spacing, origin, chunkShape)
  }

  /** Shared payload path: spacing/origin arrive in FILE dim order
    * (slowest first) and are reversed alongside the dims.
    */
  private def readDataset(spark: SparkSession, path: String,
      hconf: Option[SerializableHadoopConf], bytes: Array[Byte], ds: Hdf5.Dataset,
      spacing: Seq[Double], origin: Seq[Double],
      chunkShape: Option[Seq[Int]]): VolumeImage = {
    require(ds.dtype.nonEmpty, s"${ds.path}: non-numeric dataset")
    require(ds.dims.nonEmpty && ds.dims.length <= 4,
      s"${ds.path}: rank ${ds.dims.length} outside 1..4")
    val rank = ds.dims.length
    // reverse C-order dims → fastest-first; trailing file dim 0 of a
    // rank-4 dataset becomes the trailing t axis here
    val shape = ds.dims.reverse
    val spatial = Seq.fill(math.min(rank, 3))(true) ++ Seq.fill(math.max(0, rank - 3))(false)
    val raw = RawHeader(
      shape = shape, dtype = ds.dtype, bigEndian = ds.bigEndian,
      encoding = "raw", dataOffset = 0L, dataFile = None, spatial = spatial,
      spacing = spacing.reverse, origin = origin.reverse)
    val dims = VolumeFormats.dimNames(spatial)
    ds.layout match {
      case Hdf5.Contiguous(addr, size) =>
        require(addr != -1L && size == shape.product * ds.typeSize,
          s"${ds.path}: contiguous payload $size bytes != ${shape.product * ds.typeSize}")
        val meta = VolumeFormats.metaForDims(raw, dims, chunkShape)
        VolumeImage(meta, RawVolume.readDistributed(spark, path, hconf, addr,
          ds.dtype, ds.typeSize, ds.bigEndian, meta))
      case Hdf5.Compact(data) =>
        val meta = VolumeFormats.metaForDims(raw, dims, chunkShape)
        val vals = ZarrStore.decodeToDoubles(data, ds.dtype, ds.bigEndian)
        VolumeImage(meta, RawVolume.scatterFortran(spark, vals, meta))
      case Hdf5.Chunked(chunkDimsC, btreeAddr) =>
        // engine chunk grid = the HDF5 chunk grid, reversed
        val ourChunks = chunkDimsC.reverse.map(_.toInt)
        val meta = VolumeFormats.metaForDims(raw, dims, Some(ourChunks))
        VolumeImage(meta, readChunked(spark, path, hconf, bytes, ds, meta, btreeAddr))
    }
  }

  /** One Spark task per HDF5 chunk-grid position: present records
    * range-read + defilter + clip + reorder; absent ones materialize
    * as fill (zero). The record table (B-tree walk) is kilobytes and
    * rides the task closure.
    */
  private def readChunked(spark: SparkSession, path: String,
      hconf: Option[SerializableHadoopConf], bytes: Array[Byte], ds: Hdf5.Dataset,
      meta: ImageMeta, btreeAddr: Long): SDataset[ChunkRow] = {
    import spark.implicits._
    val rank = ds.dims.length
    val records = Hdf5.chunkRecords(bytes, btreeAddr, rank)
    val chunkC = ds.layout.asInstanceOf[Hdf5.Chunked].chunkDims.map(_.toInt)
    val byIdx: Map[Seq[Long], (Long, Int, Int)] = records.map { r =>
      r.offsets.zip(chunkC).map { case (o, c) => o / c } -> ((r.addr, r.nbytes, r.filterMask))
    }.toMap
    val grid = ZarrStore.chunkGrid(meta.shape, meta.chunks)
    val idxs = ZarrStore.gridPositions(grid).toSeq
    val shape = meta.shape
    val chunks = meta.chunks
    val dtype = ds.dtype
    val be = ds.bigEndian
    val filters = ds.filters
    val outDtype = meta.dtype
    spark.createDataset(idxs)
      .repartition(math.min(idxs.length, spark.sparkContext.defaultParallelism))
      .map { idx =>
        val cShape = ZarrStore.chunkShapeAt(shape, chunks, idx)   // our order, clipped
        val origin = ZarrStore.chunkOriginAt(chunks, idx)
        val n = cShape.product.toInt
        val out = new Array[Double](n)
        val idxC = idx.reverse.map(_.toLong)                      // file-order grid pos
        byIdx.get(idxC).foreach { case (addr, nbytes, mask) =>
          val st = new ZarrStore(path, hconf)
          val stored = st.readRange("", addr, nbytes)
          val rawC = Hdf5.defilter(stored, filters, mask)
          val full = ZarrStore.decodeToDoubles(rawC, dtype, be)   // full chunk, C file order
          val fullC = chunkC                                      // file-order chunk dims
          require(full.length == fullC.map(_.toLong).product,
            s"hdf5 chunk at $idxC decodes to ${full.length} elements, want ${fullC.product}")
          // valid extent in our (fastest-first) order is cShape;
          // iterate our C-order output and pull from the file-order buffer
          val r = cShape.length
          val li = new Array[Int](r)
          var o = 0
          while (o < n) {
            // file-order coordinates are our coordinates reversed
            var h = 0L
            var d = r - 1
            var strideAcc = 1L
            // compute h = sum over file dims of coord * stride, file C-order:
            // file dim k (slowest first) corresponds to our dim r-1-k
            h = 0L
            var k = r - 1
            strideAcc = 1L
            while (k >= 0) {
              h += li(r - 1 - k) * strideAcc  // our dim index for file dim k
              strideAcc *= fullC(k)
              k -= 1
            }
            out(o) = full(h.toInt)
            // odometer over our dims, last fastest (C order)
            d = r - 1
            var carry = true
            while (d >= 0 && carry) {
              li(d) += 1
              if (li(d) == cShape(d)) { li(d) = 0; d -= 1 } else carry = false
            }
            o += 1
          }
        }
        ChunkRow(idx, origin, cShape, ZarrStore.encodeFromDoubles(out, outDtype))
      }
  }
}
