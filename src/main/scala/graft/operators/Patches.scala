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

  final case class AugmentedPatch(py: Long, px: Long, aug: Int,
      h: Int, w: Int, checksum: Long)

  /** Deterministic per-patch augmentation — the flip family every
    * vision training pipeline applies, made REPRODUCIBLE: the
    * augmentation choice is md5(py:px) mod 4 (identity / horizontal
    * flip / vertical flip / rotate-180), a pure function of the patch
    * coordinate, so the same patch augments identically on any
    * cluster, any partitioning, any rerun — the [[graft.ops.Splits]]
    * determinism discipline applied to pixels.
    *
    * The kernel MATERIALIZES the augmented patch (the array a writer
    * would emit), then fingerprints it with the position-weighted
    * checksum, so an oracle that replays the index remap catches a
    * wrong or mirrored flip axis bit-exactly. Same scale shape as
    * [[patchStats2d]]: one re-block shuffle, partition-local after.
    */
  def augmentStats2d(spark: SparkSession, ds: Dataset[ChunkOps.ChunkRow],
      meta: ImageMeta, p: Int): DataFrame = {
    require(meta.dims == Seq("y", "x"),
      s"augmentStats2d expects a (y, x) image, got ${meta.dims}")
    import spark.implicits._
    val (m2, rds) = ChunkOps.rechunk(spark, ds, meta, Seq(p, p), force = true)
    val dtype = m2.dtype
    rds.map { c =>
      val vals = ZarrStore.decodeToDoubles(c.data, dtype)
      val py = c.origin(0) / p; val px = c.origin(1) / p
      val h = c.shape(0); val w = c.shape(1)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$py:$px".getBytes("UTF-8"))
      val aug = ((digest(0) & 0xff) % 4 + 4) % 4
      val out = new Array[Double](vals.length)
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < w) {
          val (ty, tx) = aug match {
            case 0 => (yy, xx)
            case 1 => (yy, w - 1 - xx)
            case 2 => (h - 1 - yy, xx)
            case _ => (h - 1 - yy, w - 1 - xx)
          }
          out(ty * w + tx) = vals(yy * w + xx)
          xx += 1
        }
        yy += 1
      }
      var cs = 0L
      var i = 0
      while (i < out.length) { cs += out(i).toLong * (i + 1); i += 1 }
      AugmentedPatch(py, px, aug, h, w, cs)
    }.toDF()
  }
}
