package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meta.Model.ImageMeta

/** CCL-at-scale rehearsal: a 4096² uint8 volume (16.7M voxels, 256
  * chunks of 256²) generated DISTRIBUTED from a pure position hash,
  * labeled by [[LabelComponents.componentStats2d]], and checked
  * EXACTLY against a single-node union-find over the same hash — the
  * at-scale proof that the fragment/boundary merge machinery loses or
  * duplicates nothing when a supercritical mask (p ≈ 0.65) threads
  * one giant component through every one of the 256 chunks while
  * tens of thousands of small components stay interior.
  *
  * The comparison is a full fingerprint: component count, Σ size,
  * Σ comp-id, Σ vsum, max size, and the giant component's exact size
  * — collectively a collision-resistant summary both sides compute
  * from their own labelings (the Spark side aggregates the stats
  * OUTPUT, so only one 6-long row ever reaches the driver from the
  * cluster path).
  *
  * Lives in main so [[graft.Bench]] reports wall time per round
  * (`i_ccl16m`); `LabelComponentsSpec` runs the same operator at
  * spec sizes against BFS.
  */
object CclRehearsal {

  /** splitmix64 finalizer — pure, identical on generator and
    * reference sides.
    */
  def mix(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Voxel value at global linear index gid: uint8 from the hash. */
  def valueAt(gid: Long): Int = (mix(gid) & 0xffL).toInt

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
          vals(i) = valueAt(gid).toDouble
          i += 1
        }
        ChunkOps.ChunkRow(Seq(cy, cx), Seq(cy.toLong * chunk, cx.toLong * chunk),
          Seq(chunk, chunk), graft.zarr.ZarrStore.encodeFromDoubles(vals, "uint8"))
      }

    val stats = LabelComponents.componentStats2d(spark, ds, meta, threshold)
    val fp = stats.agg(
      count(lit(1)).as("n_comp"), sum(col("size")).as("fg"),
      sum(col("comp")).as("sum_comp"), sum(col("vsum")).as("sum_v"),
      max(col("size")).as("max_size")).collect().head
    val gotNComp = fp.getLong(0)
    val gotFg = fp.getLong(1)
    val gotSumComp = fp.getLong(2)
    val gotSumV = fp.getLong(3)
    val gotMax = fp.getLong(4)

    // single-node reference: flat union-find over the same hash
    val n = side * side
    val parent = new Array[Int](n)
    java.util.Arrays.fill(parent, -1)
    var i = 0
    while (i < n) {
      if (valueAt(i.toLong) >= threshold) parent(i) = i
      i += 1
    }
    def find(x0: Int): Int = {
      var r = x0
      while (parent(r) != r) r = parent(r)
      var c = x0
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    i = 0
    while (i < n) {
      if (parent(i) >= 0) {
        if (i % side + 1 < side && parent(i + 1) >= 0) {
          val a = find(i); val b = find(i + 1)
          if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
        }
        if (i / side + 1 < side && parent(i + side) >= 0) {
          val a = find(i); val b = find(i + side)
          if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
        }
      }
      i += 1
    }
    val sizes = new java.util.HashMap[Int, Long]()
    var refFg = 0L
    var refSumV = 0L
    i = 0
    while (i < n) {
      if (parent(i) >= 0) {
        refFg += 1
        refSumV += valueAt(i.toLong).toLong
        sizes.merge(find(i), 1L, (a, b) => a + b)
      }
      i += 1
    }
    val refNComp = sizes.size.toLong
    var refSumComp = 0L
    var refMax = 0L
    val it = sizes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      refSumComp += e.getKey.toLong
      if (e.getValue > refMax) refMax = e.getValue
    }

    require(gotNComp == refNComp, s"component count: got $gotNComp, want $refNComp")
    require(gotFg == refFg, s"foreground size: got $gotFg, want $refFg")
    require(gotSumComp == refSumComp, s"Σ comp-id: got $gotSumComp, want $refSumComp")
    require(gotSumV == refSumV, s"Σ vsum: got $gotSumV, want $refSumV")
    require(gotMax == refMax, s"giant component: got $gotMax, want $refMax")
    // supercriticality sanity: the giant component must dominate
    require(gotMax > (side.toLong * side) / 2,
      s"mask not supercritical: giant $gotMax of ${side.toLong * side}")
    (System.nanoTime() - t0) / 1e9
  }
}
