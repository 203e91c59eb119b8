package graft.operators

import graft.SparkSpec
import graft.meta.Model._
import ChunkOps._

class DownsampleSpec extends SparkSpec {

  private def meta(shape: Seq[Long], dims: Seq[String], chunks: Seq[Int],
      dtype: String = "float64"): ImageMeta =
    ImageMeta(dims, shape, chunks, dtype,
      dims.map(_ -> 1.0).toMap, dims.map(_ -> 0.0).toMap)

  private def randArray(n: Int, seed: Int = 42): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)((r.nextInt(256)).toDouble)
  }

  /** Naive single-threaded bin-shrink for oracle comparison. */
  private def naiveBinShrink2d(in: Array[Double], h: Int, w: Int, k: Int): Array[Double] = {
    val oh = h / k; val ow = w / k
    Array.tabulate(oh * ow) { f =>
      val oy = f / ow; val ox = f % ow
      var s = 0.0
      for (dy <- 0 until k; dx <- 0 until k) s += in((oy * k + dy) * w + (ox * k + dx))
      s / (k * k)
    }
  }

  test("bin-shrink matches naive reference on 2D, fractional means preserved") {
    val m = meta(Seq(64, 64), Seq("y", "x"), Seq(16, 16))
    val vals = randArray(64 * 64)
    val ds = ChunkOps.fromArray(spark, vals, m)
    val (om, ods) = Downsample.step(spark, ds, m, Map("y" -> 2, "x" -> 2), Method.ItkwasmBinShrink)
    assert(om.shape == Seq(32L, 32L))
    assert(om.scale == Map("y" -> 2.0, "x" -> 2.0))
    assert(om.translation == Map("y" -> 0.5, "x" -> 0.5))
    assert(ChunkOps.toArray(ods, om).toSeq == naiveBinShrink2d(vals, 64, 64, 2).toSeq)
  }

  test("integer dtype bin-shrink rounds half up (ITK accumulate-and-cast)") {
    val m = meta(Seq(2, 2), Seq("y", "x"), Seq(2, 2), "uint8")
    val ds = ChunkOps.fromArray(spark, Array(1.0, 2.0, 2.0, 2.0), m) // mean 1.75 → 2
    val (om, ods) = Downsample.step(spark, ds, m, Map("y" -> 2, "x" -> 2), Method.ItkwasmBinShrink)
    assert(ChunkOps.toArray(ods, om).toSeq == Seq(2.0))
    val ds2 = ChunkOps.fromArray(spark, Array(1.0, 1.0, 1.0, 2.0), m) // mean 1.25 → 1
    val (om2, ods2) = Downsample.step(spark, ds2, m, Map("y" -> 2, "x" -> 2), Method.ItkwasmBinShrink)
    assert(ChunkOps.toArray(ods2, om2).toSeq == Seq(1.0))
  }

  test("nearest picks every k-th voxel starting at 0") {
    val m = meta(Seq(8, 8), Seq("y", "x"), Seq(4, 4))
    val vals = Array.tabulate(64)(_.toDouble)
    val ds = ChunkOps.fromArray(spark, vals, m)
    val (om, ods) = Downsample.step(spark, ds, m, Map("y" -> 2, "x" -> 2), Method.DaskImageNearest)
    val expected = for (y <- 0 until 4; x <- 0 until 4) yield vals(y * 2 * 8 + x * 2)
    assert(ChunkOps.toArray(ods, om).toSeq == expected)
  }

  test("mode uses centered window with nearest boundary, ties → smallest") {
    // 4×4, k=2: output (0,0) window = rows/cols [-1..0] clamped → all = in[0..0 area]
    val m = meta(Seq(4, 4), Seq("y", "x"), Seq(4, 4), "uint8")
    val vals = Array[Double](
      5, 5, 1, 2,
      5, 9, 1, 1,
      3, 3, 7, 8,
      3, 4, 7, 7)
    val ds = ChunkOps.fromArray(spark, vals, m)
    val (om, ods) = Downsample.step(spark, ds, m, Map("y" -> 2, "x" -> 2), Method.DaskImageMode)
    // output j maps to centered window at (2j): out(0,0) ← window rows -1..0 cols -1..0 (clamped) = {5}
    // out(0,1) ← rows -1..0, cols 1..2 = {5,1,5,1}… tie 5 vs 1 → 1
    val got = ChunkOps.toArray(ods, om)
    assert(om.shape == Seq(2L, 2L))
    assert(got(0) == 5.0)
    assert(got(1) == 1.0) // tie {1,5} → smallest
  }

  test("every method: multi-chunk result equals single-chunk result") {
    val vals = randArray(48 * 48, seed = 7)
    for (method <- Seq(Method.ItkwasmBinShrink, Method.DaskImageNearest,
        Method.DaskImageMode, Method.ItkwasmGaussian, Method.ItkwasmLabelImage)) {
      val mSingle = meta(Seq(48, 48), Seq("y", "x"), Seq(48, 48), "uint8")
      val mMulti = meta(Seq(48, 48), Seq("y", "x"), Seq(16, 16), "uint8")
      val (omS, dsS) = Downsample.step(spark,
        ChunkOps.fromArray(spark, vals, mSingle), mSingle, Map("y" -> 2, "x" -> 2), method)
      val (omM, dsM) = Downsample.step(spark,
        ChunkOps.fromArray(spark, vals, mMulti), mMulti, Map("y" -> 2, "x" -> 2), method)
      assert(omS.shape == omM.shape)
      assert(ChunkOps.toArray(dsS, omS).toSeq == ChunkOps.toArray(dsM, omM).toSeq,
        s"single vs multi chunk diverged for $method")
    }
  }

  test("edge chunks: non-divisible shape, multi-chunk equals single-chunk (all methods)") {
    // 50×70 with 32-chunks → ragged edge chunks (18 and 6 wide); the
    // halo machinery must clip and still match the one-chunk result
    val vals = randArray(50 * 70, seed = 13)
    for (method <- Seq(Method.ItkwasmBinShrink, Method.DaskImageNearest,
        Method.DaskImageMode, Method.ItkwasmGaussian, Method.ItkwasmLabelImage)) {
      val mOne = meta(Seq(50, 70), Seq("y", "x"), Seq(50, 70), "uint8")
      val mMany = meta(Seq(50, 70), Seq("y", "x"), Seq(32, 32), "uint8")
      val (omS, dsS) = Downsample.step(spark,
        ChunkOps.fromArray(spark, vals, mOne), mOne, Map("y" -> 2, "x" -> 2), method)
      val (omM, dsM) = Downsample.step(spark,
        ChunkOps.fromArray(spark, vals, mMany), mMany, Map("y" -> 2, "x" -> 2), method)
      assert(omS.shape == Seq(25L, 35L) && omM.shape == Seq(25L, 35L))
      assert(ChunkOps.toArray(dsS, omS).toSeq == ChunkOps.toArray(dsM, omM).toSeq,
        s"edge-chunk divergence for $method")
    }
  }

  test("tiny ragged edge chunk (65x65, 64-chunks): halo still exact") {
    // last chunk is 1 voxel wide — smaller than the gaussian radius;
    // the chunk plan must fold it in rather than truncate the kernel
    val vals = randArray(65 * 65, seed = 23)
    val mOne = meta(Seq(65, 65), Seq("y", "x"), Seq(65, 65), "uint8")
    val mMany = meta(Seq(65, 65), Seq("y", "x"), Seq(64, 64), "uint8")
    for (method <- Seq(Method.ItkwasmGaussian, Method.DaskImageMode)) {
      val (omS, dsS) = Downsample.step(spark,
        ChunkOps.fromArray(spark, vals, mOne), mOne, Map("y" -> 2, "x" -> 2), method)
      val (omM, dsM) = Downsample.step(spark,
        ChunkOps.fromArray(spark, vals, mMany), mMany, Map("y" -> 2, "x" -> 2), method)
      assert(ChunkOps.toArray(dsS, omS).toSeq == ChunkOps.toArray(dsM, omM).toSeq,
        s"ragged-edge divergence for $method")
    }
  }

  test("3D multi-chunk gaussian equals single-chunk (corner halos)") {
    val vals = randArray(24 * 24 * 24, seed = 17)
    val mOne = meta(Seq(24, 24, 24), Seq("z", "y", "x"), Seq(24, 24, 24), "uint8")
    val mMany = meta(Seq(24, 24, 24), Seq("z", "y", "x"), Seq(8, 8, 8), "uint8")
    val f = Map("z" -> 2, "y" -> 2, "x" -> 2)
    val (omS, dsS) = Downsample.step(spark,
      ChunkOps.fromArray(spark, vals, mOne), mOne, f, Method.ItkwasmGaussian)
    val (omM, dsM) = Downsample.step(spark,
      ChunkOps.fromArray(spark, vals, mMany), mMany, f, Method.ItkwasmGaussian)
    assert(ChunkOps.toArray(dsS, omS).toSeq == ChunkOps.toArray(dsM, omM).toSeq)
  }

  test("gaussian preserves constant fields exactly and stays in range") {
    val m = meta(Seq(32, 32), Seq("y", "x"), Seq(16, 16))
    val ds = ChunkOps.fromArray(spark, Array.fill(32 * 32)(7.0), m)
    val (om, ods) = Downsample.step(spark, ds, m, Map("y" -> 2, "x" -> 2), Method.ItkwasmGaussian)
    val got = ChunkOps.toArray(ods, om)
    assert(got.forall(v => math.abs(v - 7.0) < 1e-9))
  }

  test("anisotropic factors: z stays, y/x shrink") {
    val m = meta(Seq(4, 16, 16), Seq("z", "y", "x"), Seq(4, 8, 8), "uint8")
    val ds = ChunkOps.fromArray(spark, randArray(4 * 16 * 16, 3), m)
    val (om, ods) = Downsample.step(spark, ds, m,
      Map("z" -> 1, "y" -> 2, "x" -> 2), Method.ItkwasmBinShrink)
    assert(om.shape == Seq(4L, 8L, 8L))
    assert(om.scale == Map("z" -> 1.0, "y" -> 2.0, "x" -> 2.0))
    assert(ChunkOps.toArray(ods, om).length == 4 * 8 * 8)
  }

  test("misaligned chunks trigger rechunk and still match single-chunk") {
    val vals = randArray(30 * 30, 11)
    val mOdd = meta(Seq(30, 30), Seq("y", "x"), Seq(7, 7), "uint8") // 7 % 2 != 0
    val mOne = meta(Seq(30, 30), Seq("y", "x"), Seq(30, 30), "uint8")
    val (omA, dsA) = Downsample.step(spark,
      ChunkOps.fromArray(spark, vals, mOdd), mOdd, Map("y" -> 2, "x" -> 2), Method.ItkwasmBinShrink)
    val (omB, dsB) = Downsample.step(spark,
      ChunkOps.fromArray(spark, vals, mOne), mOne, Map("y" -> 2, "x" -> 2), Method.ItkwasmBinShrink)
    assert(omA.shape == Seq(15L, 15L))
    assert(ChunkOps.toArray(dsA, omA).toSeq == ChunkOps.toArray(dsB, omB).toSeq)
  }

  test("pyramid integrity: every level spans the same physical extent (all methods)") {
    // (512,512) scale 0.25, factors 2,4,8,16,32 — test_pyramid_integrity.py:7-36
    val m = ImageMeta(Seq("y", "x"), Seq(512, 512), Seq(128, 128), "float32",
      Map("y" -> 0.25, "x" -> 0.25), Map("y" -> 0.0, "x" -> 0.0))
    val base = MultiscaleBuilder.Level(m, ChunkOps.fromArray(spark, new Array[Double](512 * 512), m))
    for (method <- Method.all) { // all 8 registered methods (test_pyramid_integrity parity)
      val ms = MultiscaleBuilder.toMultiscales(spark, base,
        Some(Seq(2, 4, 8, 16, 32).map(k => Map("y" -> k, "x" -> k))), method, cache = false)
      assert(ms.levels.length == 6)
      ms.levels.foreach { lvl =>
        val spans = lvl.meta.dims.zip(lvl.meta.shape).map { case (d, n) => n * lvl.meta.scale(d) }
        assert(spans == Seq(128.0, 128.0), s"extent drifted for $method at ${lvl.meta.shape}")
      }
      assert(ms.levels.map(_.meta.shape.head) == Seq(512L, 256L, 128L, 64L, 32L, 16L))
    }
  }

  test("stencil shuffle moves halo bytes, not the volume as doubles") {
    // 256x256 uint8, 64-chunks: volume is 64 KiB encoded / 512 KiB as
    // doubles. The old groupByKey halo exchange shipped every chunk's
    // full payload as a double-array Piece (> 512 KiB + halos); the
    // pinned form moves the uint8-encoded volume once plus
    // dtype-encoded halo strips (~80 KiB total). Assert the whole
    // gaussian step (incl. the pin) shuffles less than half the
    // volume-as-doubles bound, which the old plan always exceeded.
    val m = meta(Seq(256, 256), Seq("y", "x"), Seq(64, 64), "uint8")
    val vals = randArray(256 * 256)
    val ds = ChunkOps.fromArray(spark, vals, m)
    ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()

    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (om, ods) = Downsample.step(spark, ds, m, Map("y" -> 2, "x" -> 2),
        Method.ItkwasmGaussian)
      val n = ods.count()
      assert(n > 0 && om.shape == Seq(128L, 128L))
      // listener events are async: poll until the byte count stabilizes
      var last = -1L
      var waited = 0
      while (bytes.get() != last && waited < 10000) {
        last = bytes.get(); Thread.sleep(300); waited += 300
      }
      val shuffled = bytes.get()
      val volumeAsDoubles = 256L * 256 * 8
      info(s"stencil step shuffled $shuffled bytes (volume-as-doubles bound $volumeAsDoubles)")
      assert(shuffled > 0, "expected a shuffle to have happened")
      assert(shuffled < volumeAsDoubles / 2,
        s"stencil step shuffled $shuffled bytes — halo-only exchange should stay " +
          s"far below the $volumeAsDoubles-byte volume-as-doubles bound")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      ds.unpersist()
    }
  }

  test("voxel view explodes chunks to coordinates") {
    import org.apache.spark.sql.functions._
    val m = meta(Seq(4, 4), Seq("y", "x"), Seq(2, 2), "uint8")
    val vals = Array.tabulate(16)(_.toDouble)
    val vv = ChunkOps.voxelView(spark, ChunkOps.fromArray(spark, vals, m), m)
    assert(vv.count() == 16)
    val r = vv.filter(col("y") === 3 && col("x") === 1).select("value").head.getDouble(0)
    assert(r == 13.0)
    assert(vv.agg(sum("value")).head.getDouble(0) == (0 until 16).sum.toDouble)
  }
}
