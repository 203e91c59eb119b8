package graft.operators

import org.apache.spark.sql.SparkSession
import graft.meta.Model.ImageMeta
import graft.ops.Multimodal
import graft.zarr.{SerializableHadoopConf, ZarrStore}

/** S10 — 2-D bitmap ingestion (.png/.jpg/.jpeg/.bmp/.gif): the
  * reference routes these through itkwasm/imageio
  * (`py/ngff_zarr/detect_cli_io_backend.py:36-68`); here they decode
  * through the same pure-JVM stack the multimodal operators use
  * ([[Multimodal.decodeImage]]: spec-parsed BMP/PPM, `javax.imageio`
  * for PNG/JPEG/GIF) and scatter into the chunk grid. A 2-D bitmap is
  * driver-decodable by nature (these codecs are not splittable and
  * the formats top out far below volume scale); the refuse-loudly cap
  * keeps a mislabeled giant from silently OOMing the driver — convert
  * anything larger to TIFF/zarr upstream for parallel ingest.
  */
object Image2dIO {

  private val MaxBytes = 256L << 20

  def read(spark: SparkSession, path: String,
      chunkShape: Option[Seq[Int]] = None): VolumeFormats.VolumeImage = {
    val store = new ZarrStore(path, Some(SerializableHadoopConf.fromActiveSession()))
    val size = store.objectSize("")
    require(size <= MaxBytes,
      s"$path is $size bytes — 2-D bitmap decode is driver-side and " +
        s"capped at $MaxBytes; convert to TIFF or zarr for parallel ingest")
    val img = Multimodal.decodeImage(store.readBytes(""))
    val dims = Seq("y", "x") ++ (if (img.channels > 1) Seq("c") else Nil)
    val shape = Seq(img.height.toLong, img.width.toLong) ++
      (if (img.channels > 1) Seq(img.channels.toLong) else Nil)
    val chunks = chunkShape.getOrElse(
      Seq(math.min(256, img.height), math.min(256, img.width)) ++
        (if (img.channels > 1) Seq(img.channels) else Nil))
    val meta = ImageMeta(dims, shape, chunks, "uint8",
      dims.map(_ -> 1.0).toMap, dims.map(_ -> 0.0).toMap)
    // decoded pixels are row-major interleaved — already C order for
    // (y, x[, c])
    val vals = new Array[Double](img.pixels.length)
    var i = 0
    while (i < vals.length) { vals(i) = img.pixels(i) & 0xff; i += 1 }
    VolumeFormats.VolumeImage(meta, ChunkOps.fromArray(spark, vals, meta))
  }
}
