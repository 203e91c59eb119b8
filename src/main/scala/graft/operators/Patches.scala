package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Dataset}
import graft.meta.Model.ImageMeta
import graft.zarr.ZarrStore

/** Fixed-size training-patch extraction from chunked volumes — the
  * imaging → ML-dataset bridge: a vision model trains on P×P tiles,
  * not on microscope-sized planes, so the corpus build re-tiles the
  * volume onto the patch grid and emits one row per patch.
  *
  * Scale shape: [[ChunkOps.rechunk]]'s single volume shuffle IS the
  * patch assignment (re-blocking to the P×P grid), and everything
  * after is partition-local per patch — no second pass, no
  * per-patch task. Ragged edges (volume not a multiple of P) emit
  * short patches rather than dropping data; integer dtypes keep all
  * stats exact, and the position-weighted checksum Σ v·(i+1) over
  * the patch's row-major order pins every voxel AND its position, so
  * an oracle catches transposed or misplaced blocks that plain sums
  * cannot see.
  */
object Patches {

  final case class PatchStats(py: Long, px: Long, h: Int, w: Int,
      n: Int, sum: Long, vmin: Long, vmax: Long, checksum: Long)

  /** 2-D patch statistics at patch size `p` (square). Output one row
    * per patch: grid position, actual shape (short at ragged edges),
    * exact integer sum/min/max and the position-weighted checksum.
    */
  def patchStats2d(spark: SparkSession, ds: Dataset[ChunkOps.ChunkRow],
      meta: ImageMeta, p: Int): DataFrame = {
    require(meta.dims == Seq("y", "x"),
      s"patchStats2d expects a (y, x) image, got ${meta.dims}")
    require(p >= 1, s"patch size $p must be >= 1")
    import spark.implicits._
    val (m2, rds) = ChunkOps.rechunk(spark, ds, meta, Seq(p, p), force = true)
    val dtype = m2.dtype
    rds.map { c =>
      val vals = ZarrStore.decodeToDoubles(c.data, dtype)
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var cs = 0L
      var i = 0
      while (i < vals.length) {
        val v = vals(i).toLong
        sum += v; cs += v * (i + 1)
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      PatchStats(c.origin(0) / p, c.origin(1) / p,
        c.shape(0), c.shape(1), vals.length, sum, mn, mx, cs)
    }.toDF()
  }
}
