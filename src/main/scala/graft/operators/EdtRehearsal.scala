package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meta.Model.ImageMeta

/** EDT-at-scale rehearsal: a 4096² binary mask (16.7M pixels, ~2.3%
  * foreground from the same splitmix64 position hash as
  * [[CclRehearsal]]) through [[DistanceTransform.squaredEdt]]'s
  * banded two-exchange path, fingerprint-checked EXACTLY against a
  * single-node run of the same separable kernels over flat arrays —
  * the at-scale proof that the row-band → column-band handover
  * (packed chunks, float64 phase-1 carriage, ∞ sentinel) loses or
  * misplaces nothing. Distances here are small (dense-enough mask)
  * but the POSITIONS are adversarial: every band boundary is crossed
  * by parabolas from other bands.
  *
  * Fingerprint: n_fg, Σ dist², max dist², and a position-weighted
  * checksum Σ dist²·((y·side+x) mod 97 + 1) — collision-resistant
  * against swapped or shifted blocks; one 4-long row reaches the
  * driver from the cluster path.
  *
  * Lives in main so [[graft.Bench]] reports wall time per round
  * (`i_edt16m`); `DistanceTransformSpec` proves brute-force parity at
  * spec sizes.
  */
object EdtRehearsal {

  def run(spark: SparkSession, side: Int = 4096, chunk: Int = 256,
      fgCut: Int = 250): Double = {
    import spark.implicits._
    require(side % chunk == 0, s"side $side must be a multiple of chunk $chunk")
    val t0 = System.nanoTime()
    val grid = side / chunk
    val meta = ImageMeta(Seq("y", "x"), Seq(side, side), Seq(chunk, chunk), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

    // distributed generation, one task per chunk (same shape as CCL)
    val ds = spark.range(grid.toLong * grid).repartition(
        math.min(grid * grid, spark.sparkContext.defaultParallelism * 2))
      .map { ci =>
        val cy = (ci / grid).toInt; val cx = (ci % grid).toInt
        val vals = new Array[Double](chunk * chunk)
        var i = 0
        while (i < vals.length) {
          val gid = (cy.toLong * chunk + i / chunk) * side + (cx.toLong * chunk + i % chunk)
          vals(i) = CclRehearsal.valueAt(gid).toDouble
          i += 1
        }
        ChunkOps.ChunkRow(Seq(cy, cx), Seq(cy.toLong * chunk, cx.toLong * chunk),
          Seq(chunk, chunk), graft.zarr.ZarrStore.encodeFromDoubles(vals, "uint8"))
      }

    val edt = DistanceTransform.squaredEdt(spark, ds, meta, threshold = fgCut.toDouble)
    val fp = edt.agg(
      sum(col("fg")).cast("long").as("n_fg"),
      sum(col("dist_sq")).as("sum_dsq"),
      max(col("dist_sq")).as("max_dsq"),
      sum(col("dist_sq") * ((col("y").cast("long") * side + col("x")) % 97 + lit(1)))
        .as("pos_check")).collect().head
    val got = (fp.getLong(0), fp.getLong(1), fp.getLong(2), fp.getLong(3))

    // single-node reference: the same separable kernels on flat arrays
    val d = Array.ofDim[Long](side * side)
    val fgRow = new Array[Boolean](side)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        fgRow(x) = CclRehearsal.valueAt(y.toLong * side + x) > fgCut
        x += 1
      }
      val r = DistanceTransform.rowSqDist(fgRow)
      System.arraycopy(r, 0, d, y * side, side)
      y += 1
    }
    var refNfg = 0L; var refSum = 0L; var refMax = Long.MinValue; var refPos = 0L
    val colF = new Array[Long](side)
    var x = 0
    while (x < side) {
      var yy = 0
      while (yy < side) { colF(yy) = d(yy * side + x); yy += 1 }
      val e = DistanceTransform.envelope(colF)
      yy = 0
      while (yy < side) {
        if (colF(yy) == 0L) refNfg += 1
        val v = if (e(yy) >= DistanceTransform.Inf) -1L else e(yy)
        refSum += v
        if (v > refMax) refMax = v
        refPos += v * ((yy.toLong * side + x) % 97 + 1)
        yy += 1
      }
      x += 1
    }

    require(got == ((refNfg, refSum, refMax, refPos)),
      s"EDT fingerprint mismatch: got $got, want ${(refNfg, refSum, refMax, refPos)}")
    (System.nanoTime() - t0) / 1e9
  }
}
