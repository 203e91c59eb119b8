package graft.operators

import graft.SparkSpec
import graft.meta.Model.ImageMeta

/** RAG invariants: brute-force adjacency-count parity on random
  * labeled grids, chunking invisibility (the cross-face join must
  * neither double-count nor miss), background exclusion, and the 3D
  * form.
  */
class RegionGraphSpec extends SparkSpec {

  private def meta2(h: Int, w: Int, ch: Int, cw: Int) =
    ImageMeta(Seq("y", "x"), Seq(h, w), Seq(ch, cw), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

  private def reference2d(vals: Array[Double], h: Int, w: Int): Map[(Long, Long), Long] = {
    val m = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    for (y <- 0 until h; x <- 0 until w) {
      val v = vals(y * w + x).toLong
      if (v > 0) {
        for ((ny, nx) <- Seq((y, x + 1), (y + 1, x)) if ny < h && nx < w) {
          val u = vals(ny * w + nx).toLong
          if (u > 0 && u != v) {
            val k = (math.min(v, u), math.max(v, u))
            m(k) = m.getOrElse(k, 0L) + 1L
          }
        }
      }
    }
    m.toMap
  }

  private def run2d(vals: Array[Double], m: ImageMeta): Map[(Long, Long), Long] =
    RegionGraph.adjacency2d(spark, ChunkOps.fromArray(spark, vals, m), m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("random labeled grids: counts == brute force, any chunking") {
    val rnd = new scala.util.Random(67)
    val h = 20; val w = 24
    for (trial <- 0 until 3) {
      // labels 0..4 (0 = background) in blobby runs
      val vals = new Array[Double](h * w)
      var cur = rnd.nextInt(5)
      for (i <- vals.indices) {
        if (rnd.nextDouble() < 0.3) cur = rnd.nextInt(5)
        vals(i) = cur.toDouble
      }
      val want = reference2d(vals, h, w)
      assert(run2d(vals, meta2(h, w, 20, 24)) == want, s"trial $trial single")
      assert(run2d(vals, meta2(h, w, 8, 8)) == want, s"trial $trial multi")
      assert(run2d(vals, meta2(h, w, 7, 5)) == want, s"trial $trial ragged")
    }
  }

  test("hand case: two half-planes share exactly one row of faces; bg isolates") {
    val h = 6; val w = 6
    val halves = Array.tabulate(h * w)(i => if (i / w < 3) 1.0 else 2.0)
    assert(run2d(halves, meta2(h, w, 3, 3)) == Map((1L, 2L) -> 6L))
    // a background strip between them removes the edge entirely
    val gap = Array.tabulate(h * w) { i =>
      val y = i / w
      if (y < 2) 1.0 else if (y > 3) 2.0 else 0.0
    }
    assert(run2d(gap, meta2(h, w, 3, 3)).isEmpty)
  }

  test("labels >= 2^31 count exactly (CCL ids past 2^31 voxels)") {
    // offset-inject huge labels instead of building a giant volume:
    // CCL labels are min global voxel ids, so any volume past 2^31
    // voxels produces labels the old packed (min<<32|max) key
    // corrupted — the pair maps must carry full Longs
    val h = 12; val w = 12
    val base = (3L << 31).toDouble // 6442450944
    val vals = Array.tabulate(h * w) { i =>
      val y = i / w
      if (y < 4) base else if (y < 8) base + 1e9 else 0.0
    }
    val m = ImageMeta(Seq("y", "x"), Seq(h, w), Seq(5, 7), "float64",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val got = run2d(vals, m)
    assert(got == Map((base.toLong, base.toLong + 1000000000L) -> w.toLong))
  }

  test("regionIntensityStats: brute-force parity, grid mismatch refuses") {
    val rnd = new scala.util.Random(71)
    val h = 16; val w = 16
    val labels = Array.fill(h * w)(rnd.nextInt(4).toDouble) // 0 = bg
    val intens = Array.fill(h * w)(rnd.nextInt(256).toDouble)
    val want = labels.zip(intens).filter(_._1 > 0)
      .groupBy(_._1.toLong)
      .map { case (l, vs) =>
        l -> (vs.length.toLong, vs.map(_._2.toLong).sum,
          vs.map(_._2.toLong).min, vs.map(_._2.toLong).max)
      }
    for (chunks <- Seq((16, 16), (8, 8), (4, 8))) {
      val m = meta2(h, w, chunks._1, chunks._2)
      val got = RegionGraph.regionIntensityStats(spark,
          ChunkOps.fromArray(spark, labels, m), m,
          ChunkOps.fromArray(spark, intens, m), m)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got == want, s"chunks $chunks")
    }
    intercept[IllegalArgumentException] {
      RegionGraph.regionIntensityStats(spark,
        ChunkOps.fromArray(spark, labels, meta2(h, w, 8, 8)), meta2(h, w, 8, 8),
        ChunkOps.fromArray(spark, intens, meta2(h, w, 4, 4)), meta2(h, w, 4, 4))
    }
  }

  test("3D: two bricks meet on a full 4x4 face across the chunk boundary") {
    val n = 8
    val m3 = ImageMeta(Seq("z", "y", "x"), Seq(n, 4, 4), Seq(4, 4, 4), "uint8",
      Map("z" -> 1.0, "y" -> 1.0, "x" -> 1.0),
      Map("z" -> 0.0, "y" -> 0.0, "x" -> 0.0))
    val vals = Array.tabulate(n * 4 * 4)(i => if (i / 16 < 4) 3.0 else 9.0)
    val got = RegionGraph.adjacency3d(spark,
      ChunkOps.fromArray(spark, vals, m3), m3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the z=3|4 interface is exactly the 4x4 = 16 shared faces, and it
    // IS the chunk boundary — a double count would read 32
    assert(got == Map((3L, 9L) -> 16L))
  }
}
