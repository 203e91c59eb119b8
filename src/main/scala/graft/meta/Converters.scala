package graft.meta

import graft.meta.Model._

/** Ingestion-adapter surface (SURVEY S9/S10): input-format detection
  * registry and the pure conversion math — NIfTI affine decomposition
  * with shear/orientation extraction (Gram–Schmidt) and the ITK
  * spacing/origin → scale/translation mapping. Pixel decoding for the
  * ~30 bioimaging codecs needs native libraries absent here; the
  * detection + metadata math is the engine-owned part, and decoded
  * arrays enter through `ChunkOps.fromArray` / the omezarr source.
  */
object Converters {

  /** Conversion backends (`detect_cli_io_backend.py:9-18`). */
  sealed trait ConversionBackend
  object ConversionBackend {
    case object NgffZarr extends ConversionBackend
    case object ZarrArray extends ConversionBackend
    case object Nibabel extends ConversionBackend
    case object Itkwasm extends ConversionBackend
    case object Itk extends ConversionBackend
    case object Tifffile extends ConversionBackend
    case object Imageio extends ConversionBackend
  }
  import ConversionBackend._

  private val itkwasmExts = Set(
    ".bmp", ".dcm", ".gipl", ".gipl.gz", ".hdf5", ".jpg", ".jpeg", ".iwi",
    ".iwi.cbor", ".iwi.cbor.zst", ".lsm", ".mnc", ".mnc.gz", ".mnc2", ".mgh",
    ".mhz", ".mha", ".mhd", ".mrc", ".nia", ".nii", ".nii.gz", ".hdr",
    ".nrrd", ".nhdr", ".png", ".pic", ".vtk", ".aim", ".isq", ".fdf",
    // not in the reference's table (it lists the likely-typo ".mhz" and
    // no ".mgz") — added so gzipped FreeSurfer volumes route to the
    // native MGH reader instead of falling through to IMAGEIO
    ".mgz")
  private val tiffExts = Set(
    ".tif", ".tiff", ".ptif", ".svs", ".qptiff", ".ndpi",
    // compound suffixes from tifffile's explicit FILE_EXTENSIONS list
    // (the reference joins ALL of Path.suffixes and matches against
    // it, so `x.ome.tif` routes to tifffile but `img.2024.01.tif`
    // does NOT — only the listed compounds may carry extra dots)
    ".ome.tif", ".ome.tiff", ".ome.tf2", ".ome.tf8", ".ome.btf")

  /** Extension/stat-based backend routing
    * (`detect_cli_io_backend.py:21-128`): zarr array dir → ZARR_ARRAY;
    * .zarr → NGFF_ZARR; NIfTI → NIBABEL (prioritized); single
    * small (<2 GB) itkwasm-supported file → ITKWASM; else ITK; TIFF
    * family → TIFFFILE; anything else → IMAGEIO.
    */
  def detectBackend(inputs: Seq[String],
      isZarrArrayDir: String => Boolean = _ => false,
      fileSize: String => Long = _ => 0L): ConversionBackend = {
    val first = inputs.head
    if (isZarrArrayDir(first)) return ZarrArray
    val name = first.substring(first.lastIndexOf('/') + 1).toLowerCase
    val ext = name.dropWhile(_ != '.')
    if (ext == ".zarr" || ext == ".ome.zarr") NgffZarr
    else if (ext == ".nii" || ext == ".nii.gz") Nibabel
    else if (itkwasmExts.contains(ext) && inputs.length == 1 && fileSize(first) < 2e9.toLong)
      Itkwasm
    else if (itkwasmExts.contains(ext)) Itk
    else if (tiffExts.contains(ext)) Tifffile
    else Imageio
  }

  final case class AffineDecomposition(
      translation: Array[Double],      // length 3
      scale: Array[Double],            // column norms, x/y/z spacing
      shear: Array[Double],            // [shear_xy, shear_xz, shear_yz]
      orientation: Array[Array[Double]]) // 3×3 orthonormal, columns x,y,z

  /** S10 — decompose a 4×4 NIfTI affine into translation, scale,
    * shear and orthonormal orientation via Gram–Schmidt
    * (`nibabel_image_to_ngff_image.py:10-54`).
    */
  def decomposeAffine(affine: Array[Array[Double]]): AffineDecomposition = {
    require(affine.length >= 3 && affine.forall(_.length >= 4), "need a 3x4+ affine")
    def col(j: Int): Array[Double] = Array(affine(0)(j), affine(1)(j), affine(2)(j))
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    def sub(a: Array[Double], b: Array[Double], f: Double) =
      Array(a(0) - f * b(0), a(1) - f * b(1), a(2) - f * b(2))
    def div(a: Array[Double], f: Double) = a.map(_ / f)

    val translation = col(3)
    val scale = Array(norm(col(0)), norm(col(1)), norm(col(2)))
    val nx = div(col(0), scale(0))
    val ny0 = div(col(1), scale(1))
    val nz0 = div(col(2), scale(2))
    val shearXY = dot(nx, ny0)
    val yOrth = sub(ny0, nx, shearXY)
    val shearY = norm(yOrth)
    val shearXZ = dot(nx, nz0)
    val shearYZ = dot(ny0, nz0)
    val zOrth = sub(sub(nz0, nx, shearXZ), ny0, shearYZ)
    val shearZ = norm(zOrth)
    val y = div(yOrth, shearY)
    val z = div(zOrth, shearZ)
    val orientation = Array(
      Array(nx(0), y(0), z(0)),
      Array(nx(1), y(1), z(1)),
      Array(nx(2), y(2), z(2)))
    AffineDecomposition(translation, scale, Array(shearXY, shearXZ, shearYZ), orientation)
  }

  /** Map an orientation matrix's dominant directions to RFC 4
    * anatomical orientations (columns x,y,z against the NIfTI RAS+
    * frame), used when ingesting NIfTI into OME-Zarr axes.
    */
  def orientationToRfc4(orientation: Array[Array[Double]]): Map[String, AnatomicalOrientation] = {
    val axisNames = Seq("x", "y", "z")
    val rasPositive = Seq(
      "left-to-right", "posterior-to-anterior", "inferior-to-superior")
    val rasNegative = Seq(
      "right-to-left", "anterior-to-posterior", "superior-to-inferior")
    axisNames.zipWithIndex.map { case (ax, j) =>
      // dominant world axis of column j
      val colv = Array(orientation(0)(j), orientation(1)(j), orientation(2)(j))
      val dom = colv.map(math.abs).zipWithIndex.maxBy(_._1)._2
      val value = if (colv(dom) >= 0) rasPositive(dom) else rasNegative(dom)
      ax -> AnatomicalOrientation("anatomical", value)
    }.toMap
  }

  /** ITK image metadata → NgffImage scale/translation
    * (`itk_image_to_ngff_image.py:11-82`): spacing → per-dim scale,
    * origin → translation, spatial dims reversed from xyz to zyx.
    */
  def itkToImageMeta(spacingXyz: Seq[Double], originXyz: Seq[Double],
      shapeZyx: Seq[Long], dtype: String): ImageMeta = {
    val nd = shapeZyx.length
    val dims = defaultDims(nd)
    val spatial = dims.filter(SpatialDims.contains)
    val scale = spatial.reverse.zip(spacingXyz).map { case (d, s) => d -> s }.toMap
    val translation = spatial.reverse.zip(originXyz).map { case (d, t) => d -> t }.toMap
    ImageMeta(dims, shapeZyx,
      dims.zip(shapeZyx).map { case (d, s) =>
        math.min(defaultChunks(dims)(d).toLong, s).toInt
      },
      dtype,
      dims.map(d => d -> scale.getOrElse(d, 1.0)).toMap,
      dims.map(d => d -> translation.getOrElse(d, 0.0)).toMap)
  }

  /** C2 — task-count estimator: with Spark the unit of work is the
    * chunk, so graph size ≈ chunks per level summed over the cascade
    * (the reference's dask-graph proxy, `task_count.py:8-20`).
    */
  def taskCount(meta: ImageMeta): Long =
    graft.zarr.ZarrStore.chunkGrid(meta.shape, meta.chunks).map(_.toLong).product

  /** ITK-side image description produced by [[imageMetaToItk]] —
    * the `imageType` + geometry dict of
    * `ngff_image_to_itk_image.py:98-133`.
    */
  final case class ItkImageInfo(
      dimension: Int,
      componentType: String,
      pixelType: String,
      components: Int,
      itkDims: Seq[String],
      spacing: Seq[Double],
      origin: Seq[Double],
      size: Seq[Long])

  /** NgffImage metadata → ITK image description — the reverse of
    * [[itkToImageMeta]] (`ngff_image_to_itk_image.py:39-133`):
    *
    *  - ITK dims are the spatial/time subset sorted x, y, z with `t`
    *    moved last (`:97-102`); spacing/origin/size follow that order
    *    (`:103-106`);
    *  - component type maps the element dtype 1:1, rejecting dtypes
    *    ITK has no scalar for — bool, float16, complex
    *    (`_dtype_to_component_type`, `:12-36`);
    *  - pixel type: `c` present with 3 uint8 components → RGB, any
    *    other `c` → VariableLengthVector, no `c` → Scalar
    *    (`:111-118`).
    *
    * Metadata-only by design: the data side composes from existing
    * operators (`Restructure.take` for t/c index selection,
    * `Restructure.spatialDimsLast` for the channel-last layout the
    * reference applies via `_channel_dim_last`).
    */
  def imageMetaToItk(meta: ImageMeta): ItkImageInfo = {
    val componentType = meta.dtype match {
      case "uint8" | "int8" | "uint16" | "int16" | "uint32" | "int32" |
           "uint64" | "int64" | "float32" | "float64" => meta.dtype
      case other => throw new IllegalArgumentException(
        s"dtype $other has no ITK component type (ngff_image_to_itk_image.py:35)")
    }
    val itkNames = Set("x", "y", "z", "t")
    val sorted = meta.dims.filter(itkNames.contains).sorted
    val itkDims = if (sorted.contains("t")) sorted.filterNot(_ == "t") :+ "t" else sorted
    val components =
      if (meta.dims.contains("c")) meta.shape(meta.dims.indexOf("c")) else 1L
    val pixelType =
      if (!meta.dims.contains("c")) "Scalar"
      else if (components == 3L && componentType == "uint8") "RGB"
      else "VariableLengthVector"
    ItkImageInfo(
      dimension = itkDims.length,
      componentType = componentType,
      pixelType = pixelType,
      components = components.toInt,
      itkDims = itkDims,
      spacing = itkDims.map(d => meta.scale.getOrElse(d, 1.0)),
      origin = itkDims.map(d => meta.translation.getOrElse(d, 0.0)),
      size = itkDims.map(d => meta.shape(meta.dims.indexOf(d))))
  }
}
