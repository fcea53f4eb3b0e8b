package graft.analysis

/** 2D FFT notch filtering for periodic detector artifacts — reference
  * `fftfilter2d` (`fprocessing.py:3487-3518`): transform, suppress
  * Gaussian-shaped neighborhoods of the artifact peaks in the shifted
  * frequency plane, inverse-transform, take the magnitude.
  *
  * Self-contained complex FFT: iterative radix-2 Cooley-Tukey for
  * power-of-two lengths, direct DFT otherwise (grids are small by
  * construction — O(n²) per line on a 512-wide grid is milliseconds on
  * the driver; the 100 TB work produced the grid upstream).
  */
object FftFilter {
  import GridOps.Grid

  /** In-place complex FFT of (re, im); `inverse` applies the 1/n scale. */
  def fft1d(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    require(im.length == n)
    if (n <= 1) return
    if ((n & (n - 1)) == 0) fftRadix2(re, im, inverse)
    else dftNaive(re, im, inverse)
    if (inverse) {
      var i = 0
      while (i < n) { re(i) /= n; im(i) /= n; i += 1 }
    }
  }

  private def fftRadix2(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    val sign = if (inverse) 1.0 else -1.0
    var len = 2
    while (len <= n) {
      val ang = sign * 2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cwr - im(base + k + len / 2) * cwi
          val vi = re(base + k + len / 2) * cwi + im(base + k + len / 2) * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  private def dftNaive(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    val sign = if (inverse) 1.0 else -1.0
    val or = new Array[Double](n)
    val oi = new Array[Double](n)
    var k = 0
    while (k < n) {
      var t = 0
      var ar = 0.0; var ai = 0.0
      while (t < n) {
        val ang = sign * 2.0 * math.Pi * k * t / n
        val c = math.cos(ang); val s = math.sin(ang)
        ar += re(t) * c - im(t) * s
        ai += re(t) * s + im(t) * c
        t += 1
      }
      or(k) = ar; oi(k) = ai
      k += 1
    }
    System.arraycopy(or, 0, re, 0, n)
    System.arraycopy(oi, 0, im, 0, n)
  }

  /** 2D FFT: 1D transforms over rows then columns. Returns (re, im). */
  def fft2d(re: Array[Array[Double]], im: Array[Array[Double]],
            inverse: Boolean): (Array[Array[Double]], Array[Array[Double]]) = {
    val rows = re.length; val cols = re(0).length
    val rr = re.map(_.clone()); val ri = im.map(_.clone())
    var i = 0
    while (i < rows) { fft1d(rr(i), ri(i), inverse); i += 1 }
    var jj = 0
    while (jj < cols) {
      val cr = Array.tabulate(rows)(r => rr(r)(jj))
      val ci = Array.tabulate(rows)(r => ri(r)(jj))
      fft1d(cr, ci, inverse)
      var r = 0
      while (r < rows) { rr(r)(jj) = cr(r); ri(r)(jj) = ci(r); r += 1 }
      jj += 1
    }
    (rr, ri)
  }

  /** Notch-filter `img`: in the fftshifted frequency plane, attenuate by
    * (1 − Σ Gaussians) centered on `centers` (coordinates relative to
    * the DC bin at the plane center, i.e. (u, v) with u ∈ [−r/2, r/2)),
    * then inverse-transform and return magnitudes — exactly the
    * reference's mask construction with caller-chosen peak positions.
    */
  def notchFilter2d(img: Grid, centers: Seq[(Double, Double)],
                    sx: Double, sy: Double): Grid = {
    val rows = img.length; val cols = img(0).length
    val zero = Array.ofDim[Double](rows, cols)
    val (fr, fi) = fft2d(img, zero, inverse = false)
    // apply the shifted-plane mask without materializing the shift:
    // the shifted coordinate of unshifted bin i is ((i + r/2) mod r) - r/2
    val hr = rows / 2; val hc = cols / 2
    var i = 0
    while (i < rows) {
      val u = (i + hr) % rows - hr
      var j = 0
      while (j < cols) {
        val v = (j + hc) % cols - hc
        var zm = 0.0
        centers.foreach { case (uc, vc) =>
          zm += math.exp(-(u - uc) * (u - uc) / (2 * sx * sx) -
            (v - vc) * (v - vc) / (2 * sy * sy))
        }
        val g = 1.0 - zm
        fr(i)(j) *= g
        fi(i)(j) *= g
        j += 1
      }
      i += 1
    }
    val (br, bi) = fft2d(fr, fi, inverse = true)
    Array.tabulate(rows, cols)((r, c) => math.hypot(br(r)(c), bi(r)(c)))
  }

  /** The reference's fixed artifact geometry (`fprocessing.py:3496-3510`):
    * a base peak at (x0, y0) replicated by the rotation set
    * {0, 2α, 2(α+β), −2β} with α = atan(r/c), β = atan(c/r), plus the
    * four midpoints, masked with σx = 10/(2·ln2), σy = 10·(c/r)/(2·ln2).
    *
    * Intentional orientation deviation for NON-SQUARE grids: the
    * reference transforms `img.T` and returns the (cols, rows)-shaped
    * result of that transposed plane; this implementation keeps the
    * input orientation — output is (rows, cols) with σx acting on the
    * row-frequency axis. On square grids the two conventions coincide
    * up to the (symmetric) peak set. The (rows, cols) convention is
    * pinned by a non-square fixture in DetectFilterSpec.
    */
  def fftfilter2d(img: Grid, x0: Double = -80.0, y0: Double = -108.0): Grid = {
    val r = img.length; val c = img(0).length
    val rgaus = 2.0 * math.log(2.0)
    val sx = 10.0 / rgaus
    val sy = 10.0 * (c.toDouble / r) / rgaus
    val alf = math.atan(r.toDouble / c)
    val bet = math.atan(c.toDouble / r)
    val rots = Seq(0.0, 2 * alf, 2 * (alf + bet), -2 * bet)
    val base = rots.map { th =>
      (math.cos(th) * x0 - math.sin(th) * y0, math.sin(th) * x0 + math.cos(th) * y0)
    }
    val mids = (0 until 4).map { n =>
      val a = base(n % 4); val b = base((n + 3) % 4)
      ((a._1 + b._1) / 2, (a._2 + b._2) / 2)
    }
    notchFilter2d(img, base ++ mids, sx, sy)
  }
}
