package graft.operators

import graft.SparkSpec
import graft.meta.Model.ImageMeta

/** Exact squared EDT (DistanceTransform.scala) — pinned against an
  * in-test brute force, chunking-invariant, with the no-foreground
  * sentinel and the 1-D kernels checked directly.
  */
class DistanceTransformSpec extends SparkSpec {

  private def meta(h: Int, w: Int, cy: Int, cx: Int) =
    ImageMeta(Seq("y", "x"), Seq(h, w), Seq(cy, cx), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

  test("matches brute force on a sparse mask; chunking-invariant") {
    val h = 9; val w = 13
    val fgPts = Seq((1, 2), (4, 11), (7, 5))
    val vals = Array.tabulate(h * w) { i =>
      if (fgPts.contains((i / w, i % w))) 255.0 else 10.0
    }
    def run(cy: Int, cx: Int): Map[(Int, Int), Long] =
      DistanceTransform.squaredEdt(spark,
        ChunkOps.fromArray(spark, vals, meta(h, w, cy, cx)), meta(h, w, cy, cx),
        threshold = 100.0)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
    val got = run(4, 4)
    assert(got == run(9, 13), "chunk layout changed the transform")
    for (y <- 0 until h; x <- 0 until w) {
      val want = fgPts.map { case (fy, fx) =>
        (y - fy).toLong * (y - fy) + (x - fx).toLong * (x - fx)
      }.min
      assert(got((y, x)) == want, s"($y,$x)")
    }
  }

  test("fg pixels are 0; an image with no foreground yields the -1 sentinel") {
    val h = 4; val w = 5
    val empty = DistanceTransform.squaredEdt(spark,
      ChunkOps.fromArray(spark, Array.fill(h * w)(1.0), meta(h, w, 4, 5)),
      meta(h, w, 4, 5), threshold = 100.0).collect()
    assert(empty.forall(_.getLong(3) == -1L))
    val one = Array.fill(h * w)(1.0); one(2 * w + 3) = 255.0
    val out = DistanceTransform.squaredEdt(spark,
      ChunkOps.fromArray(spark, one, meta(h, w, 2, 3)), meta(h, w, 2, 3),
      threshold = 100.0)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getInt(2), r.getLong(3))).toMap
    assert(out((2, 3)) == ((1, 0L)))
    assert(out((0, 0)) == ((0, 13L))) // 2² + 3²
  }

  test("1-D kernels: sweeps and lower envelope, including infinite rows") {
    val d = DistanceTransform.rowSqDist(Array(false, true, false, false, true))
    assert(d.toSeq == Seq(1L, 0L, 1L, 1L, 0L))
    val none = DistanceTransform.rowSqDist(Array(false, false))
    assert(none.forall(_ > (1L << 60)))
    // envelope of f = [0, INF, INF, 0] -> [0, 1, 1, 0]
    val inf = Long.MaxValue >> 2
    val env = DistanceTransform.envelope(Array(0L, inf, inf, 0L))
    assert(env.toSeq == Seq(0L, 1L, 1L, 0L))
    assert(DistanceTransform.envelope(Array(inf, inf)).forall(_ >= inf))
    // mixed finite costs: f = [4, 0, 9] -> [1, 0, 1]
    assert(DistanceTransform.envelope(Array(4L, 0L, 9L)).toSeq == Seq(1L, 0L, 1L))
  }
}
