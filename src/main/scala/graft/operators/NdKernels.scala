package graft.operators

/** Pure JVM nD kernels over C-order flat double arrays. These run
  * inside executor tasks (mapGroups / mapPartitions over the chunk
  * table) — the Spark analogue of the reference's per-chunk
  * map_blocks/map_overlap callables (SURVEY §2.8).
  *
  * Semantics mirror dask_image/ITK behavior:
  *  - binShrink: mean over aligned k-blocks, output floor(n/k)
  *    (`py/ngff_zarr/methods/_itkwasm.py:63-81`); integer dtypes
  *    round half up like ITK's accumulate-and-cast.
  *  - nearest: sample at exactly j·k (affine order=0,
  *    `py/ngff_zarr/methods/_dask_image.py:167-168`).
  *  - mode: most frequent value in the size-k window CENTERED at j·k
  *    (generic_filter semantics: [c−k/2, c+(k−1)/2], nearest
  *    boundary), ties → smallest value (np.unique order)
  *    (`py/ngff_zarr/methods/_dask_image.py:153-166`).
  *  - gaussian: separable sampled-Gaussian blur (nearest boundary)
  *    then sample at j·k (affine order=1 lands on-grid)
  *    (`py/ngff_zarr/methods/_dask_image.py:180-186`).
  *  - labelGaussian: Gaussian-weighted label votes in the radius
  *    window (itkwasm downsample_label_image's weighted mode,
  *    `py/ngff_zarr/methods/_itkwasm.py:49-55`).
  */
object NdKernels {

  /** C-order strides for a shape. */
  def strides(shape: Array[Int]): Array[Int] = {
    val s = new Array[Int](shape.length)
    var acc = 1
    var i = shape.length - 1
    while (i >= 0) { s(i) = acc; acc *= shape(i); i -= 1 }
    s
  }

  /** C-order nD transpose of a flat buffer: out = transpose(in, perm),
    * i.e. out dim d has extent inShape(perm(d)) and out[idx] reads
    * in[k] with k(perm(d)) = idx(d) — numpy.transpose / zarr v3
    * `transpose` codec semantics. Inverse: permuteFlat(out, outShape,
    * inversePerm(perm)).
    */
  def permuteFlat(in: Array[Double], inShape: Array[Int], perm: Array[Int]): Array[Double] = {
    val outShape = perm.map(inShape)
    val inStr = strides(inShape)
    val permStr = perm.map(inStr)
    val out = new Array[Double](in.length)
    val pos = new Array[Int](outShape.length)
    var flat = 0
    while (flat < out.length) {
      var src = 0
      var d = 0
      while (d < pos.length) { src += pos(d) * permStr(d); d += 1 }
      out(flat) = in(src)
      var dd = pos.length - 1
      var carry = true
      while (carry && dd >= 0) {
        pos(dd) += 1
        if (pos(dd) == outShape(dd)) { pos(dd) = 0; dd -= 1 } else carry = false
      }
      flat += 1
    }
    out
  }

  /** Inverse permutation: inversePerm(p)(p(i)) == i. */
  def inversePerm(perm: Array[Int]): Array[Int] = {
    val inv = new Array[Int](perm.length)
    var i = 0
    while (i < perm.length) { inv(perm(i)) = i; i += 1 }
    inv
  }

  def size(shape: Array[Int]): Int = shape.product

  /** Iterate all nD positions of `shape`, calling f(flatIndex, pos). */
  private def foreachPos(shape: Array[Int])(f: (Int, Array[Int]) => Unit): Unit = {
    val nd = shape.length
    val pos = new Array[Int](nd)
    val n = size(shape)
    var flat = 0
    while (flat < n) {
      f(flat, pos)
      var d = nd - 1
      var carry = true
      while (carry && d >= 0) {
        pos(d) += 1
        if (pos(d) == shape(d)) { pos(d) = 0; d -= 1 } else carry = false
      }
      flat += 1
    }
  }

  /** Nearest-neighbor upsample by integer factors: out[p] = in[p ÷ k]
    * per dim — the label-mask zoom (projecting a low-res segmentation
    * back onto full resolution). Pure per-block; no neighbor data
    * needed.
    */
  def upsampleNearest(in: Array[Double], shape: Array[Int],
      factors: Array[Int]): Array[Double] = {
    val nd = shape.length
    val outShape = Array.tabulate(nd)(d => shape(d) * factors(d))
    val inStrides = strides(shape)
    val out = new Array[Double](size(outShape))
    foreachPos(outShape) { (flat, pos) =>
      var src = 0
      var d = 0
      while (d < nd) { src += (pos(d) / factors(d)) * inStrides(d); d += 1 }
      out(flat) = in(src)
    }
    out
  }

  /** Morphological min (erosion) / max (dilation) filter over an
    * axis-aligned box of ±radius per dim, evaluated on a halo-
    * extended block: `centerOff` maps output position j to ext
    * position centerOff + j. The window clips to the ext bounds —
    * at TRUE image borders that equals neighborhood∩image (the
    * standard border rule); at interior chunk boundaries the halo
    * always spans the radius, so clipping never bites there.
    */
  def minMaxFilter(ext: Array[Double], extShape: Array[Int], radius: Array[Int],
      outShape: Array[Int], centerOff: Array[Int], dilate: Boolean): Array[Double] = {
    val nd = extShape.length
    val st = strides(extShape)
    val out = new Array[Double](size(outShape))
    val lo = new Array[Int](nd)
    val hi = new Array[Int](nd)
    val cur = new Array[Int](nd)
    foreachPos(outShape) { (flat, pos) =>
      var d = 0
      while (d < nd) {
        lo(d) = math.max(0, centerOff(d) + pos(d) - radius(d))
        hi(d) = math.min(extShape(d) - 1, centerOff(d) + pos(d) + radius(d))
        cur(d) = lo(d)
        d += 1
      }
      var best = if (dilate) Double.NegativeInfinity else Double.PositiveInfinity
      var done = false
      while (!done) {
        var off = 0
        d = 0
        while (d < nd) { off += cur(d) * st(d); d += 1 }
        val v = ext(off)
        if (if (dilate) v > best else v < best) best = v
        var dd = nd - 1
        var carry = true
        while (carry && dd >= 0) {
          cur(dd) += 1
          if (cur(dd) > hi(dd)) { cur(dd) = lo(dd); dd -= 1 } else carry = false
        }
        if (dd < 0) done = true
      }
      out(flat) = best
    }
    out
  }

  /** Squared Sobel gradient magnitude over a 2-D extended block:
    * gx = [[-1,0,1],[-2,0,2],[-1,0,1]], gy = gxᵀ, out = gx² + gy² —
    * exact integers for integral inputs (≤ 2·(4·255)² for uint8, so
    * int32 holds it). Pixels on the TRUE image border emit 0: the
    * 3×3 support doesn't exist there, and a clamp/zero-pad rule
    * would bake an arbitrary choice into the hash surface. Interior
    * chunk faces always carry a 1-halo, so "no halo on a side" is
    * exactly "image border on that side".
    */
  def sobelSq2d(ext: Array[Double], extShape: Array[Int],
      outShape: Array[Int], centerOff: Array[Int]): Array[Double] = {
    require(extShape.length == 2, "sobelSq2d is a 2-D kernel")
    val w = extShape(1)
    val out = new Array[Double](outShape(0) * outShape(1))
    var yy = 0
    while (yy < outShape(0)) {
      var xx = 0
      while (xx < outShape(1)) {
        val ey = centerOff(0) + yy
        val ex = centerOff(1) + xx
        out(yy * outShape(1) + xx) =
          if (ey < 1 || ey + 1 >= extShape(0) || ex < 1 || ex + 1 >= extShape(1)) 0.0
          else {
            val b = (ey - 1) * w + ex
            val m = ey * w + ex
            val t = (ey + 1) * w + ex
            val gx = (ext(b + 1) + 2 * ext(m + 1) + ext(t + 1)) -
              (ext(b - 1) + 2 * ext(m - 1) + ext(t - 1))
            val gy = (ext(t - 1) + 2 * ext(t) + ext(t + 1)) -
              (ext(b - 1) + 2 * ext(b) + ext(b + 1))
            gx * gx + gy * gy
          }
        xx += 1
      }
      yy += 1
    }
    out
  }

  /** 3×3 median filter over a 2-D extended block — the classic
    * salt-and-pepper denoise pass (scipy.ndimage.median_filter /
    * ITK MedianImageFilter). Median of 9 integral values is one of
    * the 9 values, so the output is exact and keeps the input dtype.
    * Pixels on the TRUE image border (no full 3×3 support) pass
    * through unchanged — median filtering's conventional edge
    * policy, and unlike a clamp it adds nothing to the hash surface.
    * Interior chunk faces always carry a 1-halo, so "no halo on a
    * side" is exactly "image border on that side".
    */
  /** [[medianFilter2d]] generalized over dimensionality: the 3^nd
    * Chebyshev-1 neighborhood median (9 in 2D, 27 in 3D), border
    * pass-through where the full window lacks support. Same
    * exactness argument: an odd count of integral values has an
    * integral median that IS one of them.
    */
  def medianFilterNd(ext: Array[Double], extShape: Array[Int],
      outShape: Array[Int], centerOff: Array[Int]): Array[Double] = {
    val nd = extShape.length
    if (nd == 2) return medianFilter2d(ext, extShape, outShape, centerOff)
    require(nd == 3, s"medianFilterNd supports 2D/3D, got $nd dims")
    val ew = extShape(2); val eh = extShape(1); val ed = extShape(0)
    val out = new Array[Double](outShape.product)
    val win = new Array[Double](27)
    var zz = 0
    while (zz < outShape(0)) {
      var yy = 0
      while (yy < outShape(1)) {
        var xx = 0
        while (xx < outShape(2)) {
          val ez = centerOff(0) + zz
          val ey = centerOff(1) + yy
          val ex = centerOff(2) + xx
          out((zz * outShape(1) + yy) * outShape(2) + xx) =
            if (ez < 1 || ez + 1 >= ed || ey < 1 || ey + 1 >= eh ||
                ex < 1 || ex + 1 >= ew)
              ext((ez * eh + ey) * ew + ex)
            else {
              var k = 0
              var dz = -1
              while (dz <= 1) {
                var dy = -1
                while (dy <= 1) {
                  var dx = -1
                  while (dx <= 1) {
                    win(k) = ext(((ez + dz) * eh + ey + dy) * ew + ex + dx)
                    k += 1; dx += 1
                  }
                  dy += 1
                }
                dz += 1
              }
              java.util.Arrays.sort(win)
              win(13)
            }
          xx += 1
        }
        yy += 1
      }
      zz += 1
    }
    out
  }

  def medianFilter2d(ext: Array[Double], extShape: Array[Int],
      outShape: Array[Int], centerOff: Array[Int]): Array[Double] = {
    require(extShape.length == 2, "medianFilter2d is a 2-D kernel")
    val w = extShape(1)
    val out = new Array[Double](outShape(0) * outShape(1))
    val win = new Array[Double](9)
    var yy = 0
    while (yy < outShape(0)) {
      var xx = 0
      while (xx < outShape(1)) {
        val ey = centerOff(0) + yy
        val ex = centerOff(1) + xx
        out(yy * outShape(1) + xx) =
          if (ey < 1 || ey + 1 >= extShape(0) || ex < 1 || ex + 1 >= extShape(1))
            ext(ey * w + ex)
          else {
            var k = 0
            var dy = -1
            while (dy <= 1) {
              var dx = -1
              while (dx <= 1) {
                win(k) = ext((ey + dy) * w + ex + dx); k += 1
                dx += 1
              }
              dy += 1
            }
            java.util.Arrays.sort(win)
            win(4)
          }
        xx += 1
      }
      yy += 1
    }
    out
  }

  /** Adaptive local-mean threshold over a 2-D extended block: output
    * is 1 iff (v + c) · n > s where (n, s) are the count and sum of
    * the (2r+1)² window CLIPPED to the available extent — interior
    * chunk faces always carry an r-halo, so clipping is exactly the
    * true image border, where the window renormalizes to the pixels
    * that exist (partial-window semantics). Exact integer compare;
    * the local mean is never a float. Row-sliding window sums keep
    * the kernel O(r) per pixel, not O(r²).
    */
  def adaptiveThreshold2d(ext: Array[Double], extShape: Array[Int],
      outShape: Array[Int], centerOff: Array[Int], r: Int, c: Long): Array[Double] = {
    require(extShape.length == 2, "adaptiveThreshold2d is a 2-D kernel")
    val eh = extShape(0); val ew = extShape(1)
    val out = new Array[Double](outShape(0) * outShape(1))
    var yy = 0
    while (yy < outShape(0)) {
      val ey = centerOff(0) + yy
      val y0 = math.max(0, ey - r); val y1 = math.min(eh - 1, ey + r)
      // initialize the window sum/count at xx = 0, then slide
      val ex0 = centerOff(1)
      var s = 0L
      var x0 = math.max(0, ex0 - r); var x1 = math.min(ew - 1, ex0 + r)
      var yv = y0
      while (yv <= y1) {
        var xv = x0
        while (xv <= x1) { s += ext(yv * ew + xv).toLong; xv += 1 }
        yv += 1
      }
      var xx = 0
      while (xx < outShape(1)) {
        val ex = centerOff(1) + xx
        val n = (y1 - y0 + 1).toLong * (x1 - x0 + 1).toLong
        val v = ext(ey * ew + ex).toLong
        out(yy * outShape(1) + xx) = if ((v + c) * n > s) 1.0 else 0.0
        // slide the window one column right for the next xx
        val nx0 = math.max(0, ex + 1 - r); val nx1 = math.min(ew - 1, ex + 1 + r)
        if (xx + 1 < outShape(1)) {
          var y2 = y0
          while (y2 <= y1) {
            if (nx1 > x1) s += ext(y2 * ew + nx1).toLong
            if (nx0 > x0) s -= ext(y2 * ew + x0).toLong
            y2 += 1
          }
          x0 = nx0; x1 = nx1
        }
        xx += 1
      }
      yy += 1
    }
    out
  }

  /** Mean over aligned k-blocks. Output shape floor(in/k) per dim
    * (factors of 1 on non-spatial dims pass through).
    */
  def binShrink(in: Array[Double], shape: Array[Int], factors: Array[Int],
      roundInt: Boolean): (Array[Double], Array[Int]) = {
    val nd = shape.length
    val outShape = Array.tabulate(nd)(d => shape(d) / factors(d))
    val inStr = strides(shape)
    val out = new Array[Double](size(outShape))
    val blockN = factors.product
    val blockShape = factors
    foreachPos(outShape) { (flat, pos) =>
      var sum = 0.0
      foreachPos(blockShape) { (_, off) =>
        var idx = 0
        var d = 0
        while (d < nd) { idx += (pos(d) * factors(d) + off(d)) * inStr(d); d += 1 }
        sum += in(idx)
      }
      val mean = sum / blockN
      out(flat) = if (roundInt) math.floor(mean + 0.5) else mean
    }
    (out, outShape)
  }

  /** Strided pick at j·k per dim. */
  def nearest(in: Array[Double], shape: Array[Int], factors: Array[Int])
      : (Array[Double], Array[Int]) = {
    val nd = shape.length
    val outShape = Array.tabulate(nd)(d => shape(d) / factors(d))
    val inStr = strides(shape)
    val out = new Array[Double](size(outShape))
    foreachPos(outShape) { (flat, pos) =>
      var idx = 0
      var d = 0
      while (d < nd) { idx += pos(d) * factors(d) * inStr(d); d += 1 }
      out(flat) = in(idx)
    }
    (out, outShape)
  }

  /** Centered-window mode with nearest boundary clamping inside the
    * (possibly halo-extended) input. `centerOff` is the input-space
    * position of output sample (0,…) — callers pass the halo width so
    * sample j maps to input centerOff(d) + j·k.
    */
  def modeCentered(in: Array[Double], shape: Array[Int], factors: Array[Int],
      outShape: Array[Int], centerOff: Array[Int]): Array[Double] = {
    val nd = shape.length
    val inStr = strides(shape)
    val out = new Array[Double](size(outShape))
    val winShape = factors.map(k => k)
    foreachPos(outShape) { (flat, pos) =>
      // collect window values
      val vals = new scala.collection.mutable.ArrayBuffer[Double](winShape.product)
      foreachPos(winShape) { (_, off) =>
        var idx = 0
        var d = 0
        while (d < nd) {
          val k = factors(d)
          var p = centerOff(d) + pos(d) * k + off(d) - k / 2 // centered window
          if (p < 0) p = 0
          if (p >= shape(d)) p = shape(d) - 1
          idx += p * inStr(d)
          d += 1
        }
        vals += in(idx)
      }
      out(flat) = smallestMode(vals)
    }
    out
  }

  /** Most frequent value; ties → smallest (np.unique + argmax order). */
  def smallestMode(vals: scala.collection.Seq[Double]): Double = {
    val counts = scala.collection.mutable.HashMap.empty[Double, Int]
    vals.foreach(v => counts.update(v, counts.getOrElse(v, 0) + 1))
    var best = Double.NaN
    var bestN = -1
    counts.foreach { case (v, n) =>
      if (n > bestN || (n == bestN && v < best)) { best = v; bestN = n }
    }
    best
  }

  /** Sampled, normalized 1-D Gaussian kernel of radius r. */
  def gaussianKernel(sigma: Double, radius: Int): Array[Double] = {
    if (radius == 0 || sigma <= 0) return Array(1.0)
    val k = new Array[Double](2 * radius + 1)
    var i = -radius
    var sum = 0.0
    while (i <= radius) {
      val v = math.exp(-0.5 * i * i / (sigma * sigma))
      k(i + radius) = v; sum += v; i += 1
    }
    var j = 0
    while (j < k.length) { k(j) /= sum; j += 1 }
    k
  }

  /** Separable convolution along `dim` with edge clamping; returns a
    * new array of the same shape. Iterates whole lines along the
    * convolved dim with pure primitive index arithmetic (a per-voxel
    * closure here costs ~8× on large blocks), and splits the interior
    * from the clamped borders so the hot loop has no branches.
    */
  def convolve1d(in: Array[Double], shape: Array[Int], dim: Int,
      kernel: Array[Double]): Array[Double] = {
    val str = strides(shape)
    val n = shape(dim)
    val r = (kernel.length - 1) / 2
    val out = new Array[Double](in.length)
    val lineStride = str(dim)
    val innerCount = lineStride // product of dims after `dim` (C-order)
    val totalLines = in.length / n
    var line = 0
    while (line < totalLines) {
      val base = (line / innerCount) * n * lineStride + (line % innerCount)
      // clamped left border
      var i = 0
      val lo = math.min(r, n)
      while (i < lo) {
        var acc = 0.0
        var t = -r
        while (t <= r) {
          var p = i + t
          if (p < 0) p = 0
          if (p >= n) p = n - 1
          acc += kernel(t + r) * in(base + p * lineStride)
          t += 1
        }
        out(base + i * lineStride) = acc
        i += 1
      }
      // branch-free interior
      i = r
      val hi = n - r
      while (i < hi) {
        var acc = 0.0
        var t = -r
        val b0 = base + (i - r) * lineStride
        while (t <= r) {
          acc += kernel(t + r) * in(b0 + t * lineStride + r * lineStride)
          t += 1
        }
        out(base + i * lineStride) = acc
        i += 1
      }
      // clamped right border
      i = math.max(hi, lo)
      while (i < n) {
        var acc = 0.0
        var t = -r
        while (t <= r) {
          var p = i + t
          if (p < 0) p = 0
          if (p >= n) p = n - 1
          acc += kernel(t + r) * in(base + p * lineStride)
          t += 1
        }
        out(base + i * lineStride) = acc
        i += 1
      }
      line += 1
    }
    out
  }

  /** Separable Gaussian blur (nearest boundary) then stride sampling:
    * output j = blurred(centerOff + j·k).
    */
  def gaussianDownsample(in: Array[Double], shape: Array[Int], factors: Array[Int],
      sigma: Array[Double], radius: Array[Int], outShape: Array[Int],
      centerOff: Array[Int], roundInt: Boolean): Array[Double] = {
    var cur = in
    var d = 0
    while (d < shape.length) {
      if (radius(d) > 0 && sigma(d) > 0) {
        cur = convolve1d(cur, shape, d, gaussianKernel(sigma(d), radius(d)))
      }
      d += 1
    }
    val inStr = strides(shape)
    val out = new Array[Double](size(outShape))
    foreachPos(outShape) { (flat, pos) =>
      var idx = 0
      var dd = 0
      while (dd < shape.length) {
        idx += (centerOff(dd) + pos(dd) * factors(dd)) * inStr(dd); dd += 1
      }
      out(flat) = if (roundInt) math.floor(cur(idx) + 0.5) else cur(idx)
    }
    out
  }

  /** Gaussian-weighted label mode: at each sample center, labels in
    * the radius window vote with separable Gaussian weights; argmax
    * wins, ties → smallest label.
    */
  def labelGaussianDownsample(in: Array[Double], shape: Array[Int], factors: Array[Int],
      sigma: Array[Double], radius: Array[Int], outShape: Array[Int],
      centerOff: Array[Int]): Array[Double] = {
    val nd = shape.length
    val inStr = strides(shape)
    val kernels = Array.tabulate(nd)(d =>
      if (radius(d) > 0 && sigma(d) > 0) gaussianKernel(sigma(d), radius(d)) else Array(1.0))
    val winShape = Array.tabulate(nd)(d => kernels(d).length)
    val out = new Array[Double](size(outShape))
    foreachPos(outShape) { (flat, pos) =>
      val votes = scala.collection.mutable.HashMap.empty[Double, Double]
      foreachPos(winShape) { (_, off) =>
        var idx = 0
        var w = 1.0
        var d = 0
        while (d < nd) {
          val r = (kernels(d).length - 1) / 2
          var p = centerOff(d) + pos(d) * factors(d) + off(d) - r
          if (p < 0) p = 0
          if (p >= shape(d)) p = shape(d) - 1
          idx += p * inStr(d)
          w *= kernels(d)(off(d))
          d += 1
        }
        val v = in(idx)
        votes.update(v, votes.getOrElse(v, 0.0) + w)
      }
      var best = Double.NaN
      var bestW = -1.0
      votes.foreach { case (v, w) =>
        if (w > bestW + 1e-12 || (math.abs(w - bestW) <= 1e-12 && v < best)) {
          best = v; bestW = math.max(bestW, w)
        }
      }
      out(flat) = best
    }
    out
  }
}
