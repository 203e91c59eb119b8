package graft.operators

import graft.SparkSpec
import graft.meta.Model.ImageMeta

/** Median-filter invariants: reference parity on random images,
  * chunking invisibility (1-halo strips carry true neighbors), the
  * border pass-through rule, dtype preservation, and impulse removal
  * (the operator's actual job).
  */
class MedianFilterSpec extends SparkSpec {

  private def meta(h: Int, w: Int, ch: Int, cw: Int) =
    ImageMeta(Seq("y", "x"), Seq(h, w), Seq(ch, cw), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))

  private def run(vals: Array[Double], m: ImageMeta): Seq[Double] = {
    val (om, out) = Downsample.medianFilter(spark,
      ChunkOps.fromArray(spark, vals, m), m)
    assert(om.dtype == m.dtype) // median of ints is one of them
    ChunkOps.toArray(out, om).toSeq
  }

  private def reference(vals: Array[Double], h: Int, w: Int): Seq[Double] =
    (0 until h * w).map { i =>
      val y = i / w; val x = i % w
      if (y == 0 || y == h - 1 || x == 0 || x == w - 1) vals(i)
      else {
        val win = for (dy <- -1 to 1; dx <- -1 to 1)
          yield vals((y + dy) * w + (x + dx))
        win.sorted.apply(4)
      }
    }

  test("random image: multi-chunk ≡ single-chunk ≡ reference; borders pass") {
    val rnd = new scala.util.Random(47)
    val h = 20; val w = 28
    val vals = Array.fill(h * w)(rnd.nextInt(256).toDouble)
    val want = reference(vals, h, w)
    assert(run(vals, meta(h, w, 8, 8)) == want)
    assert(run(vals, meta(h, w, 20, 28)) == want)
    assert(run(vals, meta(h, w, 7, 5)) == want) // ragged grid
  }

  test("salt-and-pepper impulses vanish; flat field is a fixed point") {
    val h = 8; val w = 8
    val flat = Array.fill(h * w)(100.0)
    val noisy = flat.clone()
    noisy(2 * w + 3) = 255.0 // salt
    noisy(5 * w + 5) = 0.0   // pepper
    val got = run(noisy, meta(h, w, 4, 4))
    // interior impulses are outvoted by their 8 flat neighbors
    assert(got(2 * w + 3) == 100.0)
    assert(got(5 * w + 5) == 100.0)
    // flat input is unchanged everywhere
    assert(run(flat, meta(h, w, 4, 4)) == flat.toSeq)
    // float input refuses (exactness contract)
    intercept[IllegalArgumentException] {
      val m = meta(h, w, h, w).copy(dtype = "float32")
      Downsample.medianFilter(spark, ChunkOps.fromArray(spark, noisy, m), m)
    }
  }
}
