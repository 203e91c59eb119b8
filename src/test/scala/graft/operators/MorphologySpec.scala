package graft.operators

import graft.SparkSpec
import graft.meta.Model.ImageMeta

/** Morphology invariants: chunking invisibility, pointwise ordering,
  * border rule, identity at radius 0.
  */
class MorphologySpec extends SparkSpec {

  private def meta(h: Int, w: Int, ch: Int, cw: Int) =
    ImageMeta(Seq("y", "x"), Seq(h, w), Seq(ch, cw), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

  private def run(vals: Array[Double], m: ImageMeta, r: Int, dilate: Boolean): Seq[Double] = {
    val (om, out) = Downsample.morphology(spark,
      ChunkOps.fromArray(spark, vals, m), m, Array(r, r), dilate)
    ChunkOps.toArray(out, om).toSeq
  }

  private def reference(vals: Array[Double], h: Int, w: Int, r: Int,
      dilate: Boolean): Seq[Double] =
    (0 until h * w).map { i =>
      val y = i / w; val x = i % w
      val window = for {
        ny <- math.max(0, y - r) to math.min(h - 1, y + r)
        nx <- math.max(0, x - r) to math.min(w - 1, x + r)
      } yield vals(ny * w + nx)
      if (dilate) window.max else window.min
    }

  test("random images: multi-chunk ≡ single-chunk ≡ reference, r=1 and r=2") {
    val rnd = new scala.util.Random(17)
    for (r <- Seq(1, 2)) {
      val h = 20; val w = 28
      val vals = Array.fill(h * w)(rnd.nextInt(256).toDouble)
      val want = reference(vals, h, w, r, dilate = false)
      assert(run(vals, meta(h, w, 8, 8), r, dilate = false) == want)
      assert(run(vals, meta(h, w, 20, 28), r, dilate = false) == want)
      val wantD = reference(vals, h, w, r, dilate = true)
      assert(run(vals, meta(h, w, 8, 8), r, dilate = true) == wantD)
    }
  }

  test("upsample: nearest ×k then nearest-downsample ×k is the identity; chunking-invariant") {
    val rnd = new scala.util.Random(29)
    val h = 24; val w = 16
    val vals = Array.fill(h * w)(rnd.nextInt(256).toDouble)
    for ((ch, cw) <- Seq((8, 8), (24, 16))) {
      val m = meta(h, w, ch, cw)
      val ds = ChunkOps.fromArray(spark, vals, m)
      val (um, up) = Downsample.upsampleNearest(spark, ds, m, Map("y" -> 2, "x" -> 3))
      assert(um.shape == Seq(48L, 48L) && um.chunks == Seq(ch * 2, cw * 3))
      assert(um.scale("y") == 0.5 && um.scale("x") == 1.0 / 3.0)
      val arr = ChunkOps.toArray(up, um)
      // voxel law out[y][x] = in[y/2][x/3]
      for (y <- 0 until 48; x <- 0 until 48)
        assert(arr(y * 48 + x) == vals((y / 2) * w + (x / 3)), s"($y,$x)")
      // nearest-downsample inverts it exactly
      val (dm, down) = Downsample.step(spark, up, um,
        Map("y" -> 2, "x" -> 3), graft.meta.Model.Method.DaskImageNearest)
      assert(dm.shape == Seq(h.toLong, w.toLong))
      assert(ChunkOps.toArray(down, dm).toSeq == vals.toSeq)
    }
  }

  test("pointwise ordering: erosion ≤ original ≤ dilation; radius 0 is identity") {
    val rnd = new scala.util.Random(23)
    val h = 16; val w = 16
    val vals = Array.fill(h * w)(rnd.nextInt(256).toDouble)
    val m = meta(h, w, 8, 8)
    val ero = run(vals, m, 1, dilate = false)
    val dil = run(vals, m, 1, dilate = true)
    (0 until h * w).foreach { i =>
      assert(ero(i) <= vals(i) && vals(i) <= dil(i), s"ordering broken at $i")
    }
    assert(run(vals, m, 0, dilate = false) == vals.toSeq)
    assert(run(vals, m, 0, dilate = true) == vals.toSeq)
  }
}
