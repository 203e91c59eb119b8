package graft

import org.apache.spark.sql.SparkSession
import graft.meta.Model._
import graft.meta.Converters
import graft.operators.{MultiscaleBuilder, OmeZarrIO}

/** S14 — the conversion pipeline driver app (the reference's CLI,
  * `py/ngff_zarr/cli.py:164-450`, re-expressed as a spark-submit
  * main): detect input backend → read → plan scales → downsample
  * cascade → write OME-Zarr.
  *
  * Usage:
  *   Cli <input.ome.zarr> <output.ome.zarr> [--method=itkwasm_gaussian]
  *       [--version=0.4] [--compressor=zstd] [--chunks-per-shard=2,2]
  *
  * The OME-Zarr, NIfTI, and baseline-TIFF input backends decode
  * pixels in pure JVM; the remaining formats need native codecs
  * absent here (Converters documents the boundary).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Cli <input> <output> [--method=..] [--version=..]")
    val input = args(0)
    val output = args(1)
    val opts = args.drop(2).flatMap { a =>
      a.stripPrefix("--").split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val backend = Converters.detectBackend(Seq(input),
      isZarrArrayDir = p => new java.io.File(p, ".zarray").exists())
    val base: MultiscaleBuilder.Level = backend match {
      case Converters.ConversionBackend.NgffZarr | Converters.ConversionBackend.ZarrArray =>
        OmeZarrIO.readMultiscales(spark, input,
          validate = opts.get("validate").contains("true")).levels.head
      case Converters.ConversionBackend.Nibabel =>
        val img = graft.operators.NiftiIO.read(spark, input)
        MultiscaleBuilder.Level(img.meta, img.chunks)
      case Converters.ConversionBackend.Tifffile =>
        val img = graft.operators.TiffIO.read(spark, input)
        MultiscaleBuilder.Level(img.meta, img.chunks)
      case other => throw new UnsupportedOperationException(
        s"backend $other needs native image codecs not present here; " +
          "convert to OME-Zarr, NIfTI, or TIFF upstream")
    }
    val method = opts.get("method").flatMap(Method.fromValue)
      .getOrElse(Method.ItkwasmGaussian)
    val ms = MultiscaleBuilder.toMultiscales(spark, base, method = method)
    val counts = OmeZarrIO.writeMultiscales(spark, output, ms,
      version = opts.getOrElse("version", "0.4"),
      compressor = Some(opts.getOrElse("compressor", "zstd")),
      chunksPerShard = opts.get("chunks-per-shard").map(_.split(",").map(_.toInt).toSeq))
    println(s"wrote ${counts.length} scales (${counts.sum} chunks) to $output")
    spark.stop()
  }
}
