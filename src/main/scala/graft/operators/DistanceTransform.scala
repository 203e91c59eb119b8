package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.Model.ImageMeta

/** Exact Euclidean distance transform (squared) of a binary mask —
  * the classic post-segmentation measurement (how far is every voxel
  * from the nearest labeled structure), downstream of the CCL and
  * morphology surfaces the engine already has.
  *
  * Algorithm: the separable two-phase lower-envelope transform
  * (Felzenszwalb & Huttenlocher, "Distance Transforms of Sampled
  * Functions", Theory of Computing 2012 — public). Phase 1 computes,
  * within every ROW, the squared distance to the nearest foreground
  * pixel of that row (two linear sweeps); phase 2 computes, within
  * every COLUMN, min over y' of (phase1(y', x) + (y − y')²) via the
  * parabola lower envelope in O(H). The decomposition is exact:
  *   min_{(y',x') fg} [(y−y')² + (x−x')²]
  *     = min_{y'} [(y−y')² + min_{x' fg in row y'} (x−x')²].
  *
  * This is also WHY it distributes: each phase is embarrassingly
  * parallel over rows (then columns), so the whole transform is TWO
  * exchanges — repartition by row, repartition by column — each task
  * a linear scan, regardless of image size. An iterative stencil
  * (chamfer/jump-flood) would need O(image diameter / chunk) halo
  * rounds and is approximate; this is one pass and exact.
  *
  * All arithmetic is exact Long (squared distances of integer grid
  * coordinates), so the d88 oracle replays it as a brute-force min
  * over foreground pixels with bit-identical results. Envelope
  * intersections use doubles, which only choose WHICH parabola is
  * charged — at a crossing both parabolas agree, so the OUTPUT value
  * is exact either way.
  *
  * Pixels in an image with no foreground at all get −1 (documented
  * sentinel, asserted by the spec).
  */
object DistanceTransform {

  private val Inf = Long.MaxValue >> 2

  /** 1-D squared distance to the nearest set position: two sweeps. */
  private[operators] def rowSqDist(fg: Array[Boolean]): Array[Long] = {
    val n = fg.length
    val d = new Array[Long](n)
    var last = -1
    var i = 0
    while (i < n) {
      if (fg(i)) last = i
      d(i) = if (last < 0) Inf else (i - last).toLong
      i += 1
    }
    last = -1
    i = n - 1
    while (i >= 0) {
      if (fg(i)) last = i
      if (last >= 0) d(i) = math.min(d(i), (last - i).toLong)
      i -= 1
    }
    i = 0
    while (i < n) { if (d(i) != Inf) d(i) = d(i) * d(i); i += 1 }
    d
  }

  /** 1-D lower envelope: out(i) = min_j (f(j) + (i−j)²), O(n). */
  private[operators] def envelope(f: Array[Long]): Array[Long] = {
    val n = f.length
    val out = new Array[Long](n)
    val v = new Array[Int](n)      // parabola vertices
    val z = new Array[Double](n + 1) // envelope breakpoints
    var k = -1
    var q = 0
    while (q < n) {
      if (f(q) < Inf) {
        var pushed = false
        while (!pushed) {
          if (k < 0) {
            k = 0; v(0) = q; z(0) = Double.NegativeInfinity; z(1) = Double.PositiveInfinity
            pushed = true
          } else {
            val p = v(k)
            val s = ((f(q) + q.toLong * q) - (f(p) + p.toLong * p)).toDouble /
              (2.0 * (q - p))
            if (s <= z(k)) k -= 1 // parabola p never on the envelope past s
            else {
              k += 1; v(k) = q; z(k) = s; z(k + 1) = Double.PositiveInfinity
              pushed = true
            }
          }
        }
      }
      q += 1
    }
    if (k < 0) java.util.Arrays.fill(out, Inf)
    else {
      var j = 0
      var i = 0
      while (i < n) {
        while (z(j + 1) < i) j += 1
        val p = v(j)
        out(i) = f(p) + (i - p).toLong * (i - p)
        i += 1
      }
    }
    out
  }

  /** Squared EDT of `mask > threshold` over a 2-D (y, x) chunk table.
    * Returns one row per pixel: (y, x, fg: 0/1, dist_sq). Two
    * exchanges (rows, then columns); each task scans its line once.
    */
  def squaredEdt(spark: SparkSession, ds: Dataset[ChunkOps.ChunkRow],
      meta: ImageMeta, threshold: Double): DataFrame = {
    import spark.implicits._
    require(meta.dims == Seq("y", "x"),
      s"squaredEdt expects a 2-D (y, x) image, got ${meta.dims}")
    val h = meta.shape(0).toInt
    val w = meta.shape(1).toInt
    val px = ChunkOps.voxelView(spark, ds, meta)
      .select(col("y").cast("int"), col("x").cast("int"),
        (col("value") > threshold).as("fg"))
      .as[(Int, Int, Boolean)]

    // phase 1: per-row nearest-in-row squared distance
    val d1 = px.groupByKey(_._1).flatMapGroups { (y, it) =>
      val fg = new Array[Boolean](w)
      it.foreach { case (_, x, f) => fg(x) = f }
      val d = rowSqDist(fg)
      Iterator.tabulate(w)(x => (y, x, fg(x), d(x)))
    }
    // phase 2: per-column lower envelope over y
    d1.groupByKey(_._2).flatMapGroups { (x, it) =>
      val f = new Array[Long](h)
      val fg = new Array[Boolean](h)
      it.foreach { case (y, _, isFg, v) => f(y) = v; fg(y) = isFg }
      val d = envelope(f)
      Iterator.tabulate(h)(y =>
        (y, x, if (fg(y)) 1 else 0, if (d(y) >= Inf) -1L else d(y)))
    }.toDF("y", "x", "fg", "dist_sq")
  }
}
