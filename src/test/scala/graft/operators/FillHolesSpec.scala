package graft.operators

import graft.SparkSpec
import graft.meta.Model.ImageMeta

/** Hole-filling + area-opening invariants: reference parity against a
  * single-node border flood fill / BFS size filter on random masks,
  * chunking invisibility, and the hand shapes that pin the semantics
  * (a hole IS filled, a border-touching bay is NOT, small components
  * vanish while their equal-label survivors stay).
  */
class FillHolesSpec extends SparkSpec {

  private def meta(h: Int, w: Int, ch: Int, cw: Int) =
    ImageMeta(Seq("y", "x"), Seq(h, w), Seq(ch, cw), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

  /** Reference fill: flood the background from the border (4-conn);
    * anything not reached is fg in the output.
    */
  private def refFill(vals: Array[Double], h: Int, w: Int, thr: Double): Set[(Long, Long)] = {
    val reached = Array.fill(h * w)(false)
    val q = scala.collection.mutable.Queue.empty[Int]
    for (i <- 0 until h * w) {
      val y = i / w; val x = i % w
      if (vals(i) < thr && (y == 0 || y == h - 1 || x == 0 || x == w - 1)) {
        reached(i) = true; q.enqueue(i)
      }
    }
    while (q.nonEmpty) {
      val i = q.dequeue()
      val y = i / w; val x = i % w
      for ((ny, nx) <- Seq((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1))) {
        if (ny >= 0 && ny < h && nx >= 0 && nx < w) {
          val j = ny * w + nx
          if (vals(j) < thr && !reached(j)) { reached(j) = true; q.enqueue(j) }
        }
      }
    }
    (0 until h * w).collect {
      case i if vals(i) >= thr || !reached(i) => ((i / w).toLong, (i % w).toLong)
    }.toSet
  }

  private def runFill(vals: Array[Double], m: ImageMeta): Set[(Long, Long)] = {
    val ds = ChunkOps.fromArray(spark, vals, m)
    LabelComponents.fillHoles2d(spark, ds, m, threshold = 128.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("random masks: fill ≡ border flood fill reference, any chunking") {
    val rnd = new scala.util.Random(11)
    val h = 24; val w = 24
    for (trial <- 0 until 3) {
      // dense-ish masks so holes actually occur
      val vals = Array.fill(h * w)(if (rnd.nextDouble() < 0.6) 255.0 else 0.0)
      val want = refFill(vals, h, w, 128.0)
      assert(runFill(vals, meta(h, w, 8, 8)) == want, s"trial $trial multi-chunk")
      assert(runFill(vals, meta(h, w, 24, 24)) == want, s"trial $trial single-chunk")
      assert(runFill(vals, meta(h, w, 7, 5)) == want, s"trial $trial ragged")
    }
  }

  test("hand shapes: ring fills, border bay does not, empty mask stays empty") {
    val h = 8; val w = 8
    // ring at rows/cols 1..4 with hole at (2..3, 2..3)
    val ring = Array.fill(h * w)(0.0)
    for (y <- 1 to 4; x <- 1 to 4)
      if (y == 1 || y == 4 || x == 1 || x == 4) ring(y * w + x) = 255.0
    val filled = runFill(ring, meta(h, w, 4, 4))
    for (y <- 2 to 3; x <- 2 to 3) assert(filled((y.toLong, x.toLong)), s"hole ($y,$x)")
    assert(filled.size == 16)
    // break the top edge: the interior becomes a bay reachable from
    // the border through (1,2)-(1,3), so nothing fills
    val cShape = ring.clone(); cShape(1 * w + 2) = 0.0; cShape(1 * w + 3) = 0.0
    val bay = runFill(cShape, meta(h, w, 4, 4))
    assert(bay.size == 10) // only the remaining ring pixels, no fill
    assert(runFill(Array.fill(h * w)(0.0), meta(h, w, 4, 4)).isEmpty)
  }

  test("3D: closed shell cavity fills, punched shell leaks along z, any chunking") {
    val n = 10
    val m3 = ImageMeta(Seq("z", "y", "x"), Seq(n, n, n), Seq(4, 4, 4), "uint8",
      Map("z" -> 1.0, "y" -> 1.0, "x" -> 1.0),
      Map("z" -> 0.0, "y" -> 0.0, "x" -> 0.0))
    def shellVals(hole: Boolean): Array[Double] = Array.tabulate(n * n * n) { i =>
      val z = i / (n * n); val y = (i / n) % n; val x = i % n
      val in = z >= 2 && z <= 7 && y >= 2 && y <= 7 && x >= 2 && x <= 7 &&
        (z == 2 || z == 7 || y == 2 || y == 7 || x == 2 || x == 7)
      if (in && !(hole && z == 2 && y == 4 && x == 4)) 255.0 else 0.0
    }
    val closed = LabelComponents.fillHoles3d(spark,
      ChunkOps.fromArray(spark, shellVals(hole = false), m3), m3, 128.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cavity (3..6)^3 = 64 voxels all fill
    for (z <- 3L to 6L; y <- 3L to 6L; x <- 3L to 6L)
      assert(closed((z, y, x)), s"cavity ($z,$y,$x)")
    val shellCount = shellVals(hole = false).count(_ > 0)
    assert(closed.size == shellCount + 64)
    // one punched wall voxel: the cavity leaks to the border, nothing fills
    val leaky = LabelComponents.fillHoles3d(spark,
      ChunkOps.fromArray(spark, shellVals(hole = true), m3), m3, 128.0)
      .count()
    assert(leaky == shellCount - 1)
  }

  test("area opening drops small components, keeps large, any chunking") {
    val h = 16; val w = 16
    val vals = Array.fill(h * w)(0.0)
    // large blob: 5×5 at (1..5, 1..5) = 25 voxels
    for (y <- 1 to 5; x <- 1 to 5) vals(y * w + x) = 200.0
    // small blob: 2×2 at (10..11, 10..11) = 4 voxels
    for (y <- 10 to 11; x <- 10 to 11) vals(y * w + x) = 200.0
    for (chunks <- Seq((16, 16), (8, 8), (5, 7))) {
      val m = meta(h, w, chunks._1, chunks._2)
      val ds = ChunkOps.fromArray(spark, vals, m)
      val rows = LabelComponents.areaOpen2d(spark, ds, m, 128.0, minSize = 5L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.size == 25, s"chunks $chunks")
      assert(rows.forall { case (y, x) => y >= 1 && y <= 5 && x >= 1 && x <= 5 })
    }
  }
}
