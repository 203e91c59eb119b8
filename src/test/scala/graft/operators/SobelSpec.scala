package graft.operators

import graft.SparkSpec
import graft.meta.Model.ImageMeta

/** Sobel invariants: reference parity on random images, chunking
  * invisibility (halo strips carry true neighbors), the zero-border
  * rule, and the int32 widening.
  */
class SobelSpec extends SparkSpec {

  private def meta(h: Int, w: Int, ch: Int, cw: Int) =
    ImageMeta(Seq("y", "x"), Seq(h, w), Seq(ch, cw), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

  private def run(vals: Array[Double], m: ImageMeta): Seq[Double] = {
    val (om, out) = Downsample.sobelSq(spark,
      ChunkOps.fromArray(spark, vals, m), m)
    assert(om.dtype == "int32")
    ChunkOps.toArray(out, om).toSeq
  }

  private def reference(vals: Array[Double], h: Int, w: Int): Seq[Double] =
    (0 until h * w).map { i =>
      val y = i / w; val x = i % w
      if (y == 0 || y == h - 1 || x == 0 || x == w - 1) 0.0
      else {
        def v(dy: Int, dx: Int) = vals((y + dy) * w + (x + dx))
        val gx = (v(-1, 1) + 2 * v(0, 1) + v(1, 1)) -
          (v(-1, -1) + 2 * v(0, -1) + v(1, -1))
        val gy = (v(1, -1) + 2 * v(1, 0) + v(1, 1)) -
          (v(-1, -1) + 2 * v(-1, 0) + v(-1, 1))
        gx * gx + gy * gy
      }
    }

  test("random image: multi-chunk ≡ single-chunk ≡ reference; borders zero") {
    val rnd = new scala.util.Random(31)
    val h = 20; val w = 28
    val vals = Array.fill(h * w)(rnd.nextInt(256).toDouble)
    val want = reference(vals, h, w)
    assert(run(vals, meta(h, w, 8, 8)) == want)
    assert(run(vals, meta(h, w, 20, 28)) == want)
    assert(run(vals, meta(h, w, 7, 5)) == want) // ragged grid
  }

  test("hand case: vertical step edge has gx=±4·step on the seam, gy=0") {
    // 3 wide columns: 0 | 100 | 100 — seam gradient from the kernel sum
    val h = 4; val w = 6
    val vals = Array.tabulate(h * w)(i => if (i % w < 2) 0.0 else 100.0)
    val got = run(vals, meta(h, w, h, w))
    // interior pixel at x=1: right column all 100, left all 0 → gx=400
    for (y <- 1 to 2) {
      assert(got(y * w + 1) == 400.0 * 400.0, s"seam at y=$y")
      assert(got(y * w + 3) == 0.0, s"flat interior at y=$y")
    }
    assert(got.take(w).forall(_ == 0.0)) // top border row
    // float input refuses (exactness contract)
    intercept[IllegalArgumentException] {
      val m = meta(h, w, h, w).copy(dtype = "float32")
      Downsample.sobelSq(spark, ChunkOps.fromArray(spark, vals, m), m)
    }
  }
}
