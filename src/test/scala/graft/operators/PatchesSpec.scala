package graft.operators

import graft.SparkSpec
import graft.meta.Model.ImageMeta

/** Patch extraction semantics: re-tiled stats equal a local reference
  * on a ragged, chunk-straddling configuration.
  */
class PatchesSpec extends SparkSpec {

  test("patchStats2d: ragged 10x7 image at p=4, stats match local reference") {
    val h = 10; val w = 7
    val meta = ImageMeta(Seq("y", "x"), Seq(h, w), Seq(5, 5), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val vals = Array.tabulate(h * w)(i => ((i * 13 + 3) % 256).toDouble)
    val ds = ChunkOps.fromArray(spark, vals, meta)
    val got = Patches.patchStats2d(spark, ds, meta, p = 4).collect()
      .map(r => (r.getAs[Long]("py"), r.getAs[Long]("px")) -> r).toMap
    assert(got.size == 3 * 2, "ceil(10/4) x ceil(7/4) patches")
    for (py <- 0L until 3L; px <- 0L until 2L) {
      val ph = math.min(4, h - py * 4).toInt
      val pw = math.min(4, w - px * 4).toInt
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var cs = 0L
      for (yy <- 0 until ph; xx <- 0 until pw) {
        val v = vals(((py * 4 + yy) * w + (px * 4 + xx)).toInt).toLong
        sum += v; cs += v * (yy * pw + xx + 1)
        mn = math.min(mn, v); mx = math.max(mx, v)
      }
      val r = got((py, px))
      assert(r.getAs[Int]("h") == ph && r.getAs[Int]("w") == pw, s"($py,$px) shape")
      assert(r.getAs[Int]("n") == ph * pw)
      assert(r.getAs[Long]("sum") == sum && r.getAs[Long]("vmin") == mn &&
        r.getAs[Long]("vmax") == mx, s"($py,$px) stats")
      assert(r.getAs[Long]("checksum") == cs, s"($py,$px) checksum")
    }
  }

  test("augmentStats2d: every flip family checked against a local remap") {
    val h = 8; val w = 6
    val meta = ImageMeta(Seq("y", "x"), Seq(h, w), Seq(4, 4), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val vals = Array.tabulate(h * w)(i => ((i * 7 + 1) % 256).toDouble)
    val ds = ChunkOps.fromArray(spark, vals, meta)
    val got = Patches.augmentStats2d(spark, ds, meta, p = 4).collect()
      .map(r => (r.getAs[Long]("py"), r.getAs[Long]("px")) -> r).toMap
    assert(got.size == 2 * 2)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (py <- 0L until 2L; px <- 0L until 2L) {
      val ph = math.min(4, h - py * 4).toInt
      val pw = math.min(4, w - px * 4).toInt
      val aug = (md.digest(s"$py:$px".getBytes("UTF-8"))(0) & 0xff) % 4
      var cs = 0L
      for (yy <- 0 until ph; xx <- 0 until pw) {
        val v = vals(((py * 4 + yy) * w + (px * 4 + xx)).toInt).toLong
        val (ty, tx) = aug match {
          case 0 => (yy, xx)
          case 1 => (yy, pw - 1 - xx)
          case 2 => (ph - 1 - yy, xx)
          case _ => (ph - 1 - yy, pw - 1 - xx)
        }
        cs += v * (ty * pw + tx + 1)
      }
      val r = got((py, px))
      assert(r.getAs[Int]("aug") == aug, s"($py,$px) aug pick")
      assert(r.getAs[Long]("checksum") == cs, s"($py,$px) augmented checksum")
    }
    // all four families appear across a bigger grid (md5 spreads them)
    val big = ImageMeta(Seq("y", "x"), Seq(32, 32), Seq(8, 8), "uint8",
      Map("y" -> 1.0, "x" -> 1.0), Map("y" -> 0.0, "x" -> 0.0))
    val bigDs = ChunkOps.fromArray(spark,
      Array.tabulate(32 * 32)(i => (i % 256).toDouble), big)
    val augs = Patches.augmentStats2d(spark, bigDs, big, p = 8).collect()
      .map(_.getAs[Int]("aug")).toSet
    assert(augs == Set(0, 1, 2, 3), s"flip families seen: $augs")
  }
}
