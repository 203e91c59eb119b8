package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meta.Model.ImageMeta

/** Hole-filling-at-scale rehearsal: the same 4096² supercritical
  * hash mask as [[CclRehearsal]] (16.7M voxels, 256 chunks) through
  * [[LabelComponents.fillHoles2d]] — the background is SUBcritical
  * (p ≈ 0.35, below the 0.593 site-percolation threshold), so it
  * shatters into hundreds of thousands of enclosed pockets that must
  * ALL fill, while the border-connected background lace must NOT —
  * and every one of the 256 chunk faces carries hole fragments the
  * complement-CCL must merge before the bbox border test means
  * anything.
  *
  * The check is EXACT: filled-pixel count and the positional
  * checksum Σ(y·side+x) against a single-node border flood fill over
  * the same hash. Only one 2-long row leaves the cluster path.
  *
  * Lives in main so [[graft.Bench]] reports wall time per round
  * (`i_fill16m`); `FillHolesSpec` runs the same operator at spec
  * sizes against the same reference.
  */
object FillRehearsal {

  def run(spark: SparkSession, side: Int = 4096, chunk: Int = 256,
      threshold: Double = 90.0): Double = {
    import spark.implicits._
    require(side % chunk == 0, s"side $side must be a multiple of chunk $chunk")
    val t0 = System.nanoTime()
    val grid = side / chunk
    val meta = ImageMeta(Seq("y", "x"), Seq(side, side), Seq(chunk, chunk), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

    // distributed generation: one task per chunk, no driver arrays
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

    val filled = LabelComponents.fillHoles2d(spark, ds, meta, threshold)
    val fp = filled.agg(count(lit(1)).as("n_fill"),
      sum(col("y") * side + col("x")).as("pos")).collect().head
    val gotN = fp.getLong(0)
    val gotPos = fp.getLong(1)

    // single-node reference: border flood fill over the same hash
    val n = side * side
    val fg = new Array[Boolean](n)
    var i = 0
    while (i < n) { fg(i) = CclRehearsal.valueAt(i.toLong) >= threshold; i += 1 }
    val reached = new Array[Boolean](n)
    val stack = new java.util.ArrayDeque[Integer](side * 4)
    def push(j: Int): Unit =
      if (!fg(j) && !reached(j)) { reached(j) = true; stack.push(j) }
    i = 0
    while (i < side) {
      push(i); push((side - 1) * side + i); push(i * side); push(i * side + side - 1)
      i += 1
    }
    while (!stack.isEmpty) {
      val j = stack.pop().intValue()
      val y = j / side; val x = j % side
      if (y > 0) push(j - side)
      if (y + 1 < side) push(j + side)
      if (x > 0) push(j - 1)
      if (x + 1 < side) push(j + 1)
    }
    var refN = 0L
    var refPos = 0L
    i = 0
    while (i < n) {
      if (fg(i) || !reached(i)) { refN += 1; refPos += i.toLong }
      i += 1
    }

    require(gotN == refN, s"filled count: got $gotN, want $refN")
    require(gotPos == refPos, s"filled checksum: got $gotPos, want $refPos")
    // structure sanity: holes exist (fill strictly exceeds foreground)
    var fgN = 0L
    i = 0
    while (i < n) { if (fg(i)) fgN += 1; i += 1 }
    require(gotN > fgN, s"no holes filled: fill $gotN == fg $fgN")
    (System.nanoTime() - t0) / 1e9
  }
}
