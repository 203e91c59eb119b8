package graft.operators

import graft.SparkSpec
import graft.meta.Model.ImageMeta

/** Distributed CCL invariants: chunking must be invisible (multi-chunk
  * ≡ single-chunk on random masks), and the fragment/boundary design
  * must survive the adversarial shapes — components threading through
  * many chunks, interior-only fragments, empty masks.
  */
class LabelComponentsSpec extends SparkSpec {

  private def meta(h: Int, w: Int, ch: Int, cw: Int) =
    ImageMeta(Seq("y", "x"), Seq(h, w), Seq(ch, cw), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

  /** Reference single-node BFS labeling over the mask. */
  private def bfsStats(vals: Array[Double], h: Int, w: Int, thr: Double)
      : Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val lab = Array.fill(h * w)(-1)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    var c = 0
    for (start <- 0 until h * w if vals(start) >= thr && lab(start) < 0) {
      val q = scala.collection.mutable.Queue(start)
      lab(start) = c
      var size = 0L; var vsum = 0L
      var ymin = Long.MaxValue; var ymax = Long.MinValue
      var xmin = Long.MaxValue; var xmax = Long.MinValue
      var minId = Long.MaxValue
      while (q.nonEmpty) {
        val i = q.dequeue()
        val y = i / w; val x = i % w
        size += 1; vsum += vals(i).toLong
        minId = math.min(minId, i.toLong)
        ymin = math.min(ymin, y.toLong); ymax = math.max(ymax, y.toLong)
        xmin = math.min(xmin, x.toLong); xmax = math.max(xmax, x.toLong)
        for ((ny, nx) <- Seq((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1))) {
          if (ny >= 0 && ny < h && nx >= 0 && nx < w) {
            val j = ny * w + nx
            if (vals(j) >= thr && lab(j) < 0) { lab(j) = c; q.enqueue(j) }
          }
        }
      }
      out += ((minId, size, ymin, ymax, xmin, xmax, vsum))
      c += 1
    }
    out.sortBy(_._1).toSeq
  }

  private def run(vals: Array[Double], m: ImageMeta, thr: Double) = {
    val ds = ChunkOps.fromArray(spark, vals, m)
    LabelComponents.componentStats2d(spark, ds, m, thr)
      .orderBy("comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
  }

  test("random masks: multi-chunk ≡ single-chunk ≡ BFS reference") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val h = 40; val w = 56
      val vals = Array.fill(h * w)(if (rnd.nextDouble() < 0.55) 200.0 else 10.0)
      val expected = bfsStats(vals, h, w, 128.0)
      val multi = run(vals, meta(h, w, 16, 16), 128.0)
      val single = run(vals, meta(h, w, 40, 56), 128.0)
      assert(multi == expected, s"trial $trial multi-chunk diverged")
      assert(single == expected, s"trial $trial single-chunk diverged")
    }
  }

  test("a snake threading every chunk merges to one component") {
    // boustrophedon path through a 4×4 chunk grid: one component whose
    // fragments chain across 16 chunks — the worst merge depth
    val h = 32; val w = 32
    val vals = new Array[Double](h * w)
    for (y <- 0 until h by 4) {
      for (x <- 0 until w) vals(y * w + x) = 255.0
      if (y + 4 < h) {
        val x = if ((y / 4) % 2 == 0) w - 1 else 0
        for (yy <- y until y + 4) vals(yy * w + x) = 255.0
      }
    }
    val got = run(vals, meta(h, w, 8, 8), 128.0)
    assert(got.size == 1)
    assert(got.head._1 == 0L) // min voxel is (0,0)
    assert(got == bfsStats(vals, h, w, 128.0))
  }

  test("interior-only fragments label correctly (no boundary cells)") {
    // dots strictly inside each chunk: never touch a face
    val h = 16; val w = 16
    val vals = new Array[Double](h * w)
    for (cy <- 0 until 2; cx <- 0 until 2)
      vals((cy * 8 + 4) * w + (cx * 8 + 4)) = 255.0
    val got = run(vals, meta(h, w, 8, 8), 128.0)
    assert(got.size == 4)
    assert(got.map(_._2).forall(_ == 1L))
    assert(got == bfsStats(vals, h, w, 128.0))
  }

  test("empty mask yields zero components") {
    val h = 16; val w = 16
    assert(run(new Array[Double](h * w), meta(h, w, 8, 8), 128.0).isEmpty)
  }

  test("3D random masks: multi-chunk ≡ single-chunk ≡ BFS reference (6-conn)") {
    val rnd = new scala.util.Random(13)
    val dd = 12; val h = 10; val w = 14
    def meta3(cz: Int, cy: Int, cx: Int) =
      ImageMeta(Seq("z", "y", "x"), Seq(dd, h, w), Seq(cz, cy, cx), "uint8",
        Map("z" -> 1.0, "y" -> 1.0, "x" -> 1.0),
        Map("z" -> 0.0, "y" -> 0.0, "x" -> 0.0))
    // 3D BFS reference over (size, zmin..xmax, vsum) keyed by min gid
    def bfs3(vals: Array[Double], thr: Double): Seq[Seq[Long]] = {
      val lab = Array.fill(dd * h * w)(false)
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      for (start <- 0 until dd * h * w if vals(start) >= thr && !lab(start)) {
        val q = scala.collection.mutable.Queue(start); lab(start) = true
        var size = 0L; var vsum = 0L; var minId = Long.MaxValue
        val mins = Array.fill(3)(Long.MaxValue); val maxs = Array.fill(3)(Long.MinValue)
        while (q.nonEmpty) {
          val i = q.dequeue()
          val z = i / (h * w); val y = i / w % h; val x = i % w
          size += 1; vsum += vals(i).toLong; minId = math.min(minId, i.toLong)
          for ((p, d) <- Seq(z, y, x).zipWithIndex) {
            mins(d) = math.min(mins(d), p.toLong); maxs(d) = math.max(maxs(d), p.toLong)
          }
          for ((dz, dy, dx) <- Seq((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1))) {
            val (nz, ny, nx) = (z + dz, y + dy, x + dx)
            if (nz >= 0 && nz < dd && ny >= 0 && ny < h && nx >= 0 && nx < w) {
              val j = (nz * h + ny) * w + nx
              if (vals(j) >= thr && !lab(j)) { lab(j) = true; q.enqueue(j) }
            }
          }
        }
        out += Seq(minId, size, mins(0), maxs(0), mins(1), maxs(1), mins(2), maxs(2), vsum)
      }
      out.sortBy(_.head).toSeq
    }
    for (trial <- 0 until 3) {
      val vals = Array.fill(dd * h * w)(if (rnd.nextDouble() < 0.4) 200.0 else 10.0)
      val expected = bfs3(vals, 128.0)
      def run3(m: ImageMeta) = {
        val ds = ChunkOps.fromArray(spark, vals, m)
        LabelComponents.componentStats3d(spark, ds, m, 128.0)
          .orderBy("comp").collect()
          .map(r => (0 until 9).map(r.getLong(_)).toSeq).toSeq
      }
      assert(run3(meta3(4, 4, 4)) == expected, s"trial $trial multi-chunk 3D diverged")
      assert(run3(meta3(12, 10, 14)) == expected, s"trial $trial single-chunk 3D diverged")
    }
  }

  test("componentMoments2d: exact moments, centroids, and the central-moment identity") {
    val h = 8; val w = 10
    // component A: 2x3 box at (1..2, 1..3); component B: L at rows 5..6
    val vals = Array.fill(h * w)(0.0)
    for (y <- 1 to 2; x <- 1 to 3) vals(y * w + x) = 200.0
    for (x <- 6 to 8) vals(5 * w + x) = 200.0
    vals(6 * w + 6) = 200.0
    // 2x2 chunk grid: labeling correctness is proven elsewhere; this
    // test pins the MOMENT sums and centroid floors
    val m = meta(h, w, 4, 5)
    val out = LabelComponents.componentMoments2d(spark,
      ChunkOps.fromArray(spark, vals, m), m, threshold = 128.0)
      .orderBy("comp").collect()
    assert(out.length == 2)
    val a = out.head
    // A: ys {1,1,1,2,2,2}, xs {1,2,3,1,2,3}
    assert(a.getAs[Long]("size") == 6L)
    assert(a.getAs[Long]("sum_y") == 9L && a.getAs[Long]("sum_x") == 12L)
    assert(a.getAs[Long]("sum_yy") == 15L && a.getAs[Long]("sum_xx") == 28L)
    assert(a.getAs[Long]("sum_yx") == 18L)
    assert(a.getAs[Long]("cy_micro") == 1500000L)
    assert(a.getAs[Long]("cx_micro") == 2000000L)
    // central-moment identity the doc promises: n·mu20 = n·sum_yy − sum_y²
    assert(6 * 15 - 9 * 9 == 9) // = n·mu20 for rows {1,2}×3 → mu20 = 1.5
    val b = out(1)
    // B: cells (5,6)(5,7)(5,8)(6,6)
    assert(b.getAs[Long]("size") == 4L)
    assert(b.getAs[Long]("sum_y") == 21L && b.getAs[Long]("sum_x") == 27L)
    assert(b.getAs[Long]("sum_yx") == 5 * 6 + 5 * 7 + 5 * 8 + 6 * 6)
    assert(b.getAs[Long]("cx_micro") == 27L * 1000000 / 4)
  }

  test("componentPerimeter2d: hand shapes + random chunking invariance") {
    def runPerim(vals: Array[Double], m: ImageMeta, thr: Double): Seq[(Long, Long, Long)] =
      LabelComponents.componentPerimeter2d(spark,
          ChunkOps.fromArray(spark, vals, m), m, thr)
        .orderBy("comp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 2×2 square: perimeter 8; plus an isolated pixel: perimeter 4
    val h = 6; val w = 8
    val a = Array.fill(h * w)(0.0)
    for (y <- 1 to 2; x <- 1 to 2) a(y * w + x) = 255.0
    a(4 * w + 6) = 255.0
    assert(runPerim(a, meta(h, w, h, w), 128.0) ==
      Seq((1L * w + 1, 4L, 8L), (4L * w + 6, 1L, 4L)))
    // L-shape touching the image border still counts border edges
    val b = Array.fill(h * w)(0.0)
    for (x <- 0 to 2) b(x) = 255.0       // top row run of 3
    b(w) = 255.0                          // one below the first
    // size 4, adjacencies 3 → perimeter 4*4-2*3 = 10
    assert(runPerim(b, meta(h, w, h, w), 128.0) == Seq((0L, 4L, 10L)))
    // random mask: multi-chunk ≡ single-chunk (incl. ragged grid)
    val rnd = new scala.util.Random(7)
    val big = Array.fill(24 * 20)(if (rnd.nextBoolean()) 255.0 else 0.0)
    val single = runPerim(big, meta(24, 20, 24, 20), 128.0)
    assert(runPerim(big, meta(24, 20, 8, 8), 128.0) == single)
    assert(runPerim(big, meta(24, 20, 7, 5), 128.0) == single)
  }

  test("per-voxel labels agree with the stats pass on a random mask") {
    val rnd = new scala.util.Random(7)
    val h = 24; val w = 24
    val vals = Array.fill(h * w)(if (rnd.nextDouble() < 0.5) 200.0 else 10.0)
    val m = meta(h, w, 8, 8)
    val ds = ChunkOps.fromArray(spark, vals, m)
    val perVoxel = LabelComponents.componentLabels2d(spark, ds, m, 128.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // derive stats from the per-voxel view; must equal the stats pass
    val derived = perVoxel.groupBy(_._3).map { case (compId, vs) =>
      (compId, vs.length.toLong,
        vs.map(_._1).min, vs.map(_._1).max, vs.map(_._2).min, vs.map(_._2).max,
        vs.map { case (y, x, _) => vals((y * w + x).toInt).toLong }.sum)
    }.toSeq.sortBy(_._1)
    assert(derived == run(vals, m, 128.0))
  }
}
