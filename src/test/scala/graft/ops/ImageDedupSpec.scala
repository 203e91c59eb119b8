package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageDedupSpec extends SparkSpec {

  /** Independent reference dHash: exact rational cell-average compare
    * via BigInt cross-multiplication over the same 9×8 source boxes.
    */
  private def refDHash(img: Multimodal.DecodedImage): Long = {
    val w = img.width; val h = img.height; val ch = img.channels
    val lw = if (ch == 1) Array(1000) else Array(299, 587, 114).padTo(ch, 0)
    def cell(r: Int, c: Int): (BigInt, BigInt) = {
      val y0 = r * h / 8; val y1 = math.max(y0 + 1, (r + 1) * h / 8)
      val x0 = c * w / 9; val x1 = math.max(x0 + 1, (c + 1) * w / 9)
      var s = BigInt(0)
      for (y <- y0 until y1; x <- x0 until x1) {
        val base = (y * w + x) * ch
        s += (0 until ch).map(k => (img.pixels(base + k) & 0xff) * lw(k)).sum
      }
      (s, BigInt((y1 - y0) * (x1 - x0)))
    }
    var hash = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      val (sl, nl) = cell(r, c); val (sr, nr) = cell(r, c + 1)
      if (sl * nr < sr * nl) hash |= 1L << (r * 8 + c)
    }
    hash
  }

  private def gray(w: Int, h: Int, f: (Int, Int) => Int): Multimodal.DecodedImage =
    Multimodal.DecodedImage(w, h, 1,
      Array.tabulate[Byte](w * h)(i => f(i % w, i / w).toByte))

  test("dHash matches the closed form on a cell-constant 36x32 image") {
    // Variant of the m60 fixture: cell (cr,cc) holds v = (cc*7+cr*13)%200
    val img = gray(36, 32, (x, y) => ((x / 4) * 7 + (y / 4) * 13) % 200)
    var expected = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      def v(cc: Int) = (cc * 7 + r * 13) % 200
      if (v(c) < v(c + 1)) expected |= 1L << (r * 8 + c)
    }
    assert(ImageDedup.dHash(img) === expected)
    assert(refDHash(img) === expected)
  }

  test("dHash agrees with the exact-rational reference on awkward sizes") {
    // sizes that don't divide the 9x8 grid, incl. degenerate tiny ones
    for ((w, h) <- Seq((17, 11), (9, 8), (64, 64), (7, 5), (100, 3))) {
      val img = gray(w, h, (x, y) => (x * 31 + y * 17 + w + h) % 251)
      assert(ImageDedup.dHash(img) === refDHash(img), s"size ${w}x$h")
    }
    // RGB path: luma weights must enter the comparison
    val rgb = Multimodal.DecodedImage(12, 10, 3,
      Array.tabulate[Byte](12 * 10 * 3)(i => ((i * 53 + 7) % 256).toByte))
    assert(ImageDedup.dHash(rgb) === refDHash(rgb))
  }

  test("banded near-dup join equals brute-force Hamming <= 3") {
    import spark.implicits._
    // 80 hashes: 20 bases, each with 3 perturbed variants flipping 1-6 bits
    val rnd = new scala.util.Random(42)
    val rows = (0 until 20).flatMap { g =>
      val base = rnd.nextLong()
      val variants = (1 to 3).map { t =>
        var v = base
        (0 until rnd.nextInt(6) + 1).foreach(_ => v ^= 1L << rnd.nextInt(64))
        (g * 4L + t, v)
      }
      (g * 4L, base) +: variants
    }
    val df = rows.toDF("doc_id", "dhash")
    val got = ImageDedup.nearDupPairs(df, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === brute)
    assert(brute.nonEmpty) // the planted <=3-bit variants must appear
  }

  test("recall precondition is enforced") {
    import spark.implicits._
    val df = Seq((1L, 0L)).toDF("doc_id", "dhash")
    intercept[IllegalArgumentException] {
      ImageDedup.nearDupPairs(df, maxHamming = 4, bands = 4)
    }
  }

  test("collapsed dupClusters partitions identically to the direct path") {
    import spark.implicits._
    // 60 hashes with planted zero-XOR cliques: ids 0-9 share hash A,
    // 10-14 share hash B (1 bit from A), the rest scatter
    val rnd = new scala.util.Random(7)
    val a = rnd.nextLong()
    val rows = (0L until 10L).map(i => (i, a)) ++
      (10L until 15L).map(i => (i, a ^ 1L)) ++
      (15L until 60L).map(i => (i, rnd.nextLong()))
    val df = rows.toDF("doc_id", "dhash")
    val collapsed = ImageDedup.dupClusters(df, maxHamming = 3)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    // direct path: full pair graph -> CC
    val direct = TextDedup.connectedComponents(
        ImageDedup.nearDupPairs(df, maxHamming = 3).select("doc_a", "doc_b"),
        df.select("doc_id"))
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(collapsed === direct)
    // the two cliques are 1 bit apart -> one merged cluster labeled 0
    assert((0L until 15L).forall(collapsed(_) == 0L))
  }

  test("end-to-end: decode -> hash -> pairs on the PPM-cells fixture") {
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    val h = ImageDedup.hashes(spark, Multimodal.syntheticPpmCells(docs))
    assert(h.count() === 120)
    // group-0 variants (doc 0, 40, 80) differ in <= 2 cells => <= 4 bits;
    // compute the true pair set and check the banded join reproduces it
    val hs = h.as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b)).toSet
    val got = ImageDedup.nearDupPairs(h, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === brute)
  }
}
