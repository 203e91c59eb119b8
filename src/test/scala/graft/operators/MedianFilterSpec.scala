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

  test("3D: 27-point reference parity, chunking invariance, impulse removal") {
    val rnd = new scala.util.Random(53)
    val n = 12
    def m3(cz: Int, cy: Int, cx: Int) =
      ImageMeta(Seq("z", "y", "x"), Seq(n, n, n), Seq(cz, cy, cx), "uint8",
        Map("z" -> 1.0, "y" -> 1.0, "x" -> 1.0),
        Map("z" -> 0.0, "y" -> 0.0, "x" -> 0.0))
    val vals = Array.fill(n * n * n)(rnd.nextInt(256).toDouble)
    val want = (0 until n * n * n).map { i =>
      val z = i / (n * n); val y = (i / n) % n; val x = i % n
      if (z == 0 || z == n - 1 || y == 0 || y == n - 1 || x == 0 || x == n - 1)
        vals(i)
      else {
        val win = for (dz <- -1 to 1; dy <- -1 to 1; dx <- -1 to 1)
          yield vals(((z + dz) * n + y + dy) * n + x + dx)
        win.sorted.apply(13)
      }
    }
    for (chunks <- Seq((12, 12, 12), (6, 6, 6), (5, 7, 4))) {
      val m = m3(chunks._1, chunks._2, chunks._3)
      val (om, out) = Downsample.medianFilter(spark,
        ChunkOps.fromArray(spark, vals, m), m)
      assert(om.dtype == "uint8")
      assert(ChunkOps.toArray(out, om).toSeq == want, s"chunks $chunks")
    }
    // an interior impulse in a flat volume vanishes
    val flat = Array.fill(n * n * n)(50.0)
    flat((5 * n + 5) * n + 5) = 255.0
    val m = m3(6, 6, 6)
    val (om, out) = Downsample.medianFilter(spark,
      ChunkOps.fromArray(spark, flat, m), m)
    assert(ChunkOps.toArray(out, om)((5 * n + 5) * n + 5) == 50.0)
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
