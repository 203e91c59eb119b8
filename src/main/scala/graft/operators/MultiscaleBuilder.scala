package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.meta.Model._
import graft.meta.ScalePlanner
import ChunkOps.ChunkRow

/** The pyramid build lifecycle (SURVEY §3.1): plan scales → cascade
  * downsample steps, each level persisted + lineage-truncated so a
  * 10-deep pyramid doesn't compound task graphs (the Spark form of
  * the reference's write-then-reread discipline, C4 —
  * `py/ngff_zarr/to_ngff_zarr.py:930-979`).
  */
object MultiscaleBuilder {

  final case class Level(meta: ImageMeta, chunks: Dataset[ChunkRow])
  final case class Multiscale(levels: Seq[Level], method: Method,
      omero: Option[Omero] = None) {
    def metadata(name: String = "image", version: String = "0.4"): MultiscalesMeta = {
      val axes = levels.head.meta.dims.map { d =>
        Axis(d, axisType(d), levels.head.meta.axesUnits.get(d),
          levels.head.meta.axesOrientations.get(d))
      }
      val datasets = levels.zipWithIndex.map { case (lvl, i) =>
        DatasetMeta(s"scale$i/$name", Seq(
          ScaleT(lvl.meta.dims.map(lvl.meta.scale)),
          TranslationT(lvl.meta.dims.map(lvl.meta.translation))))
      }
      MultiscalesMeta(axes, datasets, version, Some(name),
        Some(method.value), Some(method.metadata), omero)
    }
  }

  /** Build the full pyramid. `scaleFactors`: either explicit per-level
    * absolute factor maps, or None → the A1 planner decides.
    */
  def toMultiscales(spark: SparkSession, base: Level,
      scaleFactors: Option[Seq[Map[String, Int]]] = None,
      method: Method = Method.ItkwasmGaussian,
      minLength: Option[Int] = None,
      cache: Boolean = true): Multiscale = {
    val meta = base.meta
    val outChunks = meta.dims.zip(meta.chunks).toMap
    val factors = scaleFactors.getOrElse(
      ScalePlanner.scaleFactors(meta,
        minLength.getOrElse(meta.chunks.max), outChunks))

    var previous = base
    var previousDimFactors = meta.dims.map(_ -> 1).toMap
    val levels = Seq.newBuilder[Level]
    levels += base
    factors.foreach { absolute =>
      val dimFactors = ScalePlanner.dimScaleFactors(
        meta.dims, Right(absolute), previousDimFactors)
      previousDimFactors = ScalePlanner.updatePreviousDimFactors(
        Right(absolute), meta.spatialDims, previousDimFactors)
      val (m0, ds0) = Downsample.step(spark, previous.chunks, previous.meta, dimFactors, method)
      // restore the configured output chunking: downsampling halves
      // chunk edges, the reference rechunks every level to out_chunks
      val targetChunks = m0.dims.zip(m0.shape).map { case (d, n) =>
        math.min(outChunks(d).toLong, n).toInt
      }
      val (m, ds) = ChunkOps.rechunk(spark, ds0, m0, targetChunks)
      // persist + truncate lineage: each level computes from the
      // materialized previous level, not the whole cascade (C4)
      val materialized =
        if (cache) ds.persist(StorageLevel.MEMORY_AND_DISK)
        else ds
      previous = Level(m, materialized)
      levels += previous
    }
    Multiscale(levels.result(), method)
  }
}
