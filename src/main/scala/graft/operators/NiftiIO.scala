package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.meta.Model._
import graft.meta.Converters
import graft.zarr.{SerializableHadoopConf, ZarrStore}
import ChunkOps.ChunkRow

/** S10 — pure-JVM NIfTI ingestion: the 348-byte NIfTI-1 or 540-byte
  * NIfTI-2 header plus a raw Fortran-ordered voxel payload, optionally
  * gzip-wrapped (.nii.gz). NIfTI-2 carries the same fields with
  * widened types (int64 dims, double pixdim/affine) — nibabel reads
  * both transparently, so do we.
  * Mirrors the reference's nibabel path
  * (`py/ngff_zarr/nibabel_image_to_ngff_image.py:93-238`):
  *  - dims are named x,y,z(,t,c) in that order — NIfTI's i,j,k axes;
  *  - scale/translation come from the affine decomposition
  *    ([[Converters.decomposeAffine]]; sform preferred, then the
  *    quaternion qform, then pixdim);
  *  - scl_slope/scl_inter ≠ identity rescales voxels and the image
  *    becomes float32, exactly nibabel's `get_fdata(dtype=float32)`
  *    policy; slope 0/NaN means 1, inter NaN means 0;
  *  - cal_min/cal_max ≠ (0,0) produce an OMERO window whose start/end
  *    are the calibration bounds and min/max the data extrema
  *    (`extract_omero_metadata_from_nibabel`, `:186-238`);
  *  - RFC 4 anatomical orientations derive from the affine's dominant
  *    directions against RAS+ ([[Converters.orientationToRfc4]]).
  *
  * Scale posture: an uncompressed .nii is chunk-range-readable, so
  * executors fetch only their chunk's runs via positioned reads — the
  * file never transits the driver. Gzip is not splittable: .nii.gz
  * decodes in one streaming pass and is then scattered; convert large
  * volumes to .nii (or zarr) for parallel ingest.
  */
object NiftiIO {

  final case class NiftiHeader(
      dims: Seq[Int],                  // dim[1..dim[0]]
      datatype: Int, bitpix: Int,
      pixdim: Seq[Double],             // pixdim[0..7]; [0] is qfac
      voxOffset: Long,
      sclSlope: Double, sclInter: Double,
      calMin: Double, calMax: Double,
      qformCode: Int, sformCode: Int,
      quatern: (Double, Double, Double), // b, c, d
      qoffset: (Double, Double, Double),
      srow: Array[Array[Double]],      // 3×4
      littleEndian: Boolean) {

    /** Effective slope/inter with nibabel's defaulting: slope of 0 or
      * NaN → 1.0, inter of NaN → 0.0.
      */
    def effectiveScaling: (Double, Double) = {
      val s = if (sclSlope == 0.0 || sclSlope.isNaN) 1.0 else sclSlope
      val i = if (sclInter.isNaN) 0.0 else sclInter
      (s, i)
    }
    def needsScaling: Boolean = effectiveScaling != ((1.0, 0.0))
  }

  final case class NiftiImage(
      meta: ImageMeta,
      chunks: Dataset[ChunkRow],
      orientations: Map[String, AnatomicalOrientation],
      omero: Option[Omero])

  /** NIfTI-1 datatype codes → engine dtype names. */
  def dtypeName(datatype: Int): String = datatype match {
    case 2 => "uint8"
    case 4 => "int16"
    case 8 => "int32"
    case 16 => "float32"
    case 64 => "float64"
    case 256 => "int8"
    case 512 => "uint16"
    case 768 => "uint32"
    case 1024 => "int64"
    case other => throw new UnsupportedOperationException(
      s"NIfTI datatype code $other unsupported")
  }

  /** Header length from the first 4 bytes: sizeof_hdr reads 348
    * (NIfTI-1) or 540 (NIfTI-2) in the file's own byte order.
    */
  def headerSize(first4: Array[Byte]): Int = {
    require(first4.length >= 4, "NIfTI header probe needs 4 bytes")
    val le = ByteBuffer.wrap(first4).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
    val be = ByteBuffer.wrap(first4).order(ByteOrder.BIG_ENDIAN).getInt(0)
    if (le == 348 || be == 348) 348
    else if (le == 540 || be == 540) 540
    else throw new IllegalArgumentException(
      s"not a NIfTI-1/2 header (sizeof_hdr $le)")
  }

  /** Parse a NIfTI-1 (348-byte) or NIfTI-2 (540-byte) header;
    * endianness is probed via sizeof_hdr (== 348/540 in the file's
    * own byte order). NIfTI-2 is the same logical record with int64
    * dims and double pixdim/scl/cal/affine (the public nifti2.h
    * layout); both parse into the one widened [[NiftiHeader]].
    */
  def parseHeader(raw: Array[Byte], allowAnalyze: Boolean = false): NiftiHeader = {
    val size = headerSize(raw)
    require(raw.length >= size, s"NIfTI header needs $size bytes, got ${raw.length}")
    val le = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN).getInt(0) == size
    val bb = ByteBuffer.wrap(raw).order(
      if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    if (size == 348) {
      val magic = new String(raw.slice(344, 347), "US-ASCII")
      // a 348-byte header without the NIfTI magic is Analyze 7.5 (the
      // historical .hdr/.img pair layout NIfTI-1 extended): dims,
      // datatype/bitpix, pixdim and cal_min/max sit at the same
      // offsets, but the qform/sform/scl fields do NOT exist there —
      // they must read as absent, not as whatever bytes overlap them
      val analyze = magic != "n+1" && magic != "ni1"
      require(!analyze || allowAnalyze,
        s"bad NIfTI magic '$magic' (Analyze 7.5 accepted only via .hdr/.img)")
      if (analyze) {
        val ndim = bb.getShort(40).toInt
        require(ndim >= 1 && ndim <= 7, s"Analyze dim[0] out of range: $ndim")
        val dims = (1 to ndim).map(i => bb.getShort(40 + 2 * i).toInt)
        return NiftiHeader(
          dims = dims,
          datatype = bb.getShort(70).toInt,
          bitpix = bb.getShort(72).toInt,
          pixdim = (0 to 7).map(i => bb.getFloat(76 + 4 * i).toDouble),
          voxOffset = 0L,
          sclSlope = 1.0, sclInter = 0.0,
          calMin = bb.getFloat(128).toDouble, calMax = bb.getFloat(124).toDouble,
          qformCode = 0, sformCode = 0,
          quatern = (0.0, 0.0, 0.0), qoffset = (0.0, 0.0, 0.0),
          srow = Array.fill(3, 4)(0.0),
          littleEndian = le)
      }
      val ndim = bb.getShort(40).toInt
      require(ndim >= 1 && ndim <= 7, s"NIfTI dim[0] out of range: $ndim")
      val dims = (1 to ndim).map(i => bb.getShort(40 + 2 * i).toInt)
      NiftiHeader(
        dims = dims,
        datatype = bb.getShort(70).toInt,
        bitpix = bb.getShort(72).toInt,
        pixdim = (0 to 7).map(i => bb.getFloat(76 + 4 * i).toDouble),
        voxOffset = bb.getFloat(108).toLong,
        sclSlope = bb.getFloat(112).toDouble, sclInter = bb.getFloat(116).toDouble,
        calMin = bb.getFloat(128).toDouble, calMax = bb.getFloat(124).toDouble,
        qformCode = bb.getShort(252).toInt, sformCode = bb.getShort(254).toInt,
        quatern = (bb.getFloat(256).toDouble, bb.getFloat(260).toDouble,
          bb.getFloat(264).toDouble),
        qoffset = (bb.getFloat(268).toDouble, bb.getFloat(272).toDouble,
          bb.getFloat(276).toDouble),
        srow = Array.tabulate(3, 4)((r, c) => bb.getFloat(280 + 16 * r + 4 * c).toDouble),
        littleEndian = le)
    } else {
      val magic = new String(raw.slice(4, 7), "US-ASCII")
      require(magic == "n+2" || magic == "ni2", s"bad NIfTI-2 magic '$magic'")
      val ndim = bb.getLong(16).toInt
      require(ndim >= 1 && ndim <= 7, s"NIfTI dim[0] out of range: $ndim")
      val dims = (1 to ndim).map { i =>
        val d = bb.getLong(16 + 8 * i)
        require(d > 0 && d <= Int.MaxValue, s"NIfTI-2 dim[$i] out of range: $d")
        d.toInt
      }
      NiftiHeader(
        dims = dims,
        datatype = bb.getShort(12).toInt,
        bitpix = bb.getShort(14).toInt,
        pixdim = (0 to 7).map(i => bb.getDouble(104 + 8 * i)),
        voxOffset = bb.getLong(168),
        sclSlope = bb.getDouble(176), sclInter = bb.getDouble(184),
        calMin = bb.getDouble(200), calMax = bb.getDouble(192),
        qformCode = bb.getInt(344), sformCode = bb.getInt(348),
        quatern = (bb.getDouble(352), bb.getDouble(360), bb.getDouble(368)),
        qoffset = (bb.getDouble(376), bb.getDouble(384), bb.getDouble(392)),
        srow = Array.tabulate(3, 4)((r, c) => bb.getDouble(400 + 32 * r + 8 * c)),
        littleEndian = le)
    }
  }

  /** The voxel→RAS affine: sform rows when sform_code > 0, else the
    * quaternion qform (NIfTI-1 method 2: R from (b,c,d), columns
    * scaled by pixdim, k column by qfac), else pixdim diagonal.
    */
  def affine(h: NiftiHeader): Array[Array[Double]] = {
    if (h.sformCode > 0) {
      Array.tabulate(4, 4)((r, c) =>
        if (r < 3) h.srow(r)(c).toDouble else if (c == 3) 1.0 else 0.0)
    } else if (h.qformCode > 0) {
      val (b, c, d) = (h.quatern._1.toDouble, h.quatern._2.toDouble, h.quatern._3.toDouble)
      val a = math.sqrt(math.max(0.0, 1.0 - b * b - c * c - d * d))
      val qfac = if (h.pixdim.head < 0f) -1.0 else 1.0
      val p = (1 to 3).map(i => h.pixdim.lift(i).map(_.toDouble).getOrElse(1.0))
      val r = Array(
        Array(a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)),
        Array(2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)),
        Array(2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c))
      val off = Seq(h.qoffset._1.toDouble, h.qoffset._2.toDouble, h.qoffset._3.toDouble)
      Array.tabulate(4, 4)((i, j) =>
        if (i == 3) { if (j == 3) 1.0 else 0.0 }
        else if (j == 3) off(i)
        else r(i)(j) * p(j) * (if (j == 2) qfac else 1.0))
    } else {
      val p = (1 to 3).map(i => h.pixdim.lift(i).map(_.toDouble).getOrElse(1.0))
      Array.tabulate(4, 4)((i, j) =>
        if (i == j && i < 3) p(i) else if (i == 3 && j == 3) 1.0 else 0.0)
    }
  }

  /** Dimension names by rank, the reference's mapping: 3D → x,y,z;
    * 4D adds t; 5D adds c.
    */
  def dimNames(rank: Int): Seq[String] = rank match {
    case 3 => Seq("x", "y", "z")
    case 4 => Seq("x", "y", "z", "t")
    case 5 => Seq("x", "y", "z", "t", "c")
    case n => throw new IllegalArgumentException(s"NIfTI rank $n unsupported (3-5)")
  }

  /** Read a .nii / .nii.gz into a chunked image. `chunkShape` defaults
    * to 64 per spatial dim, 1 for t/c (capped by the image shape).
    */
  def read(spark: SparkSession, path: String,
      chunkShape: Option[Seq[Int]] = None): NiftiImage = {
    import spark.implicits._
    val hconf = Some(SerializableHadoopConf.fromActiveSession())
    // .hdr/.img dual-file pair (NIfTI-1 "ni1" magic or Analyze 7.5):
    // header in .hdr, payload in a sibling .img (or .img.gz)
    val isPair = path.toLowerCase.endsWith(".hdr")
    if (isPair) return readPair(spark, path, chunkShape)
    val store = new ZarrStore(path, hconf)
    val gz = path.toLowerCase.endsWith(".gz")

    // header is 348 (NIfTI-1) or 540 (NIfTI-2) bytes — probe the
    // sizeof_hdr field first, then read exactly that many
    val headerBytes =
      if (gz) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(store.readBytes("")))
        def readFully(buf: Array[Byte], off: Int, len: Int): Unit = {
          var got = 0
          while (got < len) {
            val n = in.read(buf, off + got, len - got)
            require(n > 0, "truncated .nii.gz header")
            got += n
          }
        }
        val probe = new Array[Byte](4)
        readFully(probe, 0, 4)
        val buf = new Array[Byte](headerSize(probe))
        System.arraycopy(probe, 0, buf, 0, 4)
        readFully(buf, 4, buf.length - 4)
        in.close()
        buf
      } else {
        val probe = store.readRange("", 0L, 4)
        store.readRange("", 0L, headerSize(probe))
      }
    val h = parseHeader(headerBytes)
    finishRead(spark, h, path, gz, hconf, chunkShape)
  }

  /** Resolve a `.hdr` header to its sibling `.img`/`.img.gz` payload
    * and read the pair; Analyze 7.5 headers (no NIfTI magic) parse
    * with the qform/sform/scl fields absent — pixdim-diagonal affine
    * only, the nibabel AnalyzeImage contract.
    */
  private def readPair(spark: SparkSession, path: String,
      chunkShape: Option[Seq[Int]]): NiftiImage = {
    val hconf = Some(SerializableHadoopConf.fromActiveSession())
    val store = new ZarrStore(path, hconf)
    val probe = store.readRange("", 0L, 4)
    val h = parseHeader(store.readRange("", 0L, headerSize(probe)), allowAnalyze = true)
    val base = path.substring(0, path.length - 4)
    val (dataPath, dataGz) =
      if (new ZarrStore(base + ".img", hconf).exists("")) (base + ".img", false)
      else if (new ZarrStore(base + ".img.gz", hconf).exists("")) (base + ".img.gz", true)
      else throw new IllegalArgumentException(
        s"$path: no sibling .img or .img.gz payload file")
    finishRead(spark, h, dataPath, dataGz, hconf, chunkShape)
  }

  private def finishRead(spark: SparkSession, h: NiftiHeader, path: String,
      gz: Boolean, hconf: Option[SerializableHadoopConf],
      chunkShape: Option[Seq[Int]]): NiftiImage = {
    val store = new ZarrStore(path, hconf)
    val dims = dimNames(h.dims.length)
    val srcDtype = dtypeName(h.datatype)
    val (slope, inter) = h.effectiveScaling
    val outDtype = if (h.needsScaling) "float32" else srcDtype
    val dec = Converters.decomposeAffine(affine(h))
    val spatial = Seq("x", "y", "z")
    val scale = dims.map(d => d ->
      (if (spatial.contains(d)) dec.scale(spatial.indexOf(d)) else 1.0)).toMap
    val translation = dims.map(d => d ->
      (if (spatial.contains(d)) dec.translation(spatial.indexOf(d)) else 0.0)).toMap

    val shape = h.dims.map(_.toLong)
    val chunks = chunkShape.getOrElse(
      dims.zip(shape).map { case (d, s) =>
        if (spatial.contains(d)) math.min(64L, s).toInt else 1 })
    val meta = ImageMeta(dims, shape, chunks, outDtype, scale, translation)

    val itemSize = h.bitpix / 8
    val chunkRows: Dataset[ChunkRow] =
      if (gz) RawVolume.scatterFortran(
        spark, decodeGz(store, h, srcDtype, itemSize), meta, slope, inter)
      else RawVolume.readDistributed(spark, path, hconf, h.voxOffset, srcDtype,
        itemSize, bigEndian = !h.littleEndian, meta, slope, inter)

    val orientations = Converters.orientationToRfc4(dec.orientation)
    val omero = omeroFromCal(h, chunkRows, meta)
    NiftiImage(meta, chunkRows, orientations, omero)
  }

  /** Stream-decode a .nii.gz payload to doubles in file (Fortran)
    * order — gzip is not splittable, so this is a single pass.
    */
  private def decodeGz(store: ZarrStore, h: NiftiHeader, srcDtype: String,
      itemSize: Int): Array[Double] = {
    val total = h.dims.map(_.toLong).product
    require(total * itemSize < Int.MaxValue,
      s".nii.gz payload is ${total * itemSize} bytes — gzip is not " +
        "splittable; convert to .nii or zarr for volumes this large")
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(store.readBytes("")))
    try {
      var toSkip = h.voxOffset
      while (toSkip > 0) {
        val n = in.skip(toSkip)
        if (n <= 0) {
          // skip returns 0 at EOF — probe with read to distinguish
          require(in.read() >= 0, s"truncated .nii.gz: EOF before vox_offset ${h.voxOffset}")
          toSkip -= 1
        } else toSkip -= n
      }
      val buf = new Array[Byte]((total * itemSize).toInt)
      var got = 0
      while (got < buf.length) {
        val n = in.read(buf, got, buf.length - got)
        require(n > 0, s"truncated .nii.gz payload at $got of ${buf.length}")
        got += n
      }
      ZarrStore.decodeToDoubles(buf, srcDtype, !h.littleEndian)
    } finally in.close()
  }

  /** OMERO window from cal_min/cal_max: start/end are the calibration
    * bounds, min/max the data extrema (a distributed agg over the
    * chunk table).
    */
  private def omeroFromCal(h: NiftiHeader, chunks: Dataset[ChunkRow],
      meta: ImageMeta): Option[Omero] = {
    val calMin = h.calMin
    val calMax = h.calMax
    if ((calMin == 0.0 && calMax == 0.0) || calMin.isNaN || calMax.isNaN) None
    else {
      val dtype = meta.dtype
      val (dataMin, dataMax) = chunks
        .map { c =>
          val vals = ZarrStore.decodeToDoubles(c.data, dtype)
          (vals.min, vals.max)
        }(org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaDouble))
        .reduce((a, b) => (math.min(a._1, b._1), math.max(a._2, b._2)))
      Some(Omero(Seq(OmeroChannel("FFFFFF",
        OmeroWindow(dataMin, dataMax, calMin.toDouble, calMax.toDouble), Some("")))))
    }
  }
}
