package graft.analysis

/** Driver-side analysis operators over collected spectra/grids —
  * SURVEY.md §2.10. These consume the (small) binned volume the cluster
  * produced; they are deliberately plain-Scala/Breeze, not distributed.
  *
  * Reimplemented from the reference's published semantics (not copied):
  *  - Shirley background: `/root/reference/mpes/analysis.py:58-155`
  *    (Proctor & Sherwood, Anal. Chem. 54, 13 (1982))
  *  - peak detection: `analysis.py:308-427` (Billauer peakdet scheme)
  *  - Savitzky-Golay smoothing: `fprocessing.py:216-229`
  *  - spectrum normalization `normspec`: `utils.py:152-188`
  *  - nearest index `find_nearest`: `utils.py:15-30`
  */
object Analysis {

  /** Iterative Shirley-Proctor-Sherwood background for one (x, y)
    * spectrum. Returns the background array (same length as y).
    */
  def shirley(x0: Array[Double], y0: Array[Double], tol: Double = 1e-5,
              maxIter: Int = 20): Array[Double] = {
    require(x0.length == y0.length && x0.length > 2)
    // energies in decreasing order
    val reversed = x0.head < x0.last
    val x = if (reversed) x0.reverse else x0
    val y = if (reversed) y0.reverse else y0
    val n = y.length

    val maxIdx = y.indices.maxBy(y(_))
    if (maxIdx == 0 || maxIdx >= n - 1) return new Array[Double](n)

    val lmIdx = (0 until maxIdx).minBy(y(_))
    val rmIdx = (maxIdx until n).minBy(y(_))
    val yl = y(lmIdx); val yr = y(rmIdx)
    val iMax = rmIdx - 1

    // background shape B; total background S = yr + B
    var b = new Array[Double](n)
    java.util.Arrays.fill(b, 0, lmIdx, yl - yr)

    // trapezoid of the background-subtracted signal between i and i+1
    def seg(i: Int, bb: Array[Double]): Double =
      (x(i) - x(i + 1)) * 0.5 * (y(i) + y(i + 1) - 2 * yr - bb(i) - bb(i + 1))

    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      var kSum = 0.0
      var i = lmIdx
      while (i < iMax) { kSum += seg(i, b); i += 1 }
      val k = (yl - yr) / kSum

      val bNew = b.clone()
      i = lmIdx
      while (i < rmIdx) {
        var ySum = 0.0
        var j = i
        while (j < iMax) { ySum += seg(j, b); j += 1 }
        bNew(i) = k * ySum
        i += 1
      }
      val diff = math.sqrt(b.zip(bNew).map { case (u, v) => (u - v) * (u - v) }.sum)
      b = bNew
      if (diff < tol) done = true
      iter += 1
    }
    val s = b.map(_ + yr)
    if (reversed) s.reverse else s
  }

  final case class Peak(pos: Double, height: Double)

  /** Lookahead local max/min detection (Billauer scheme): a candidate
    * maximum is confirmed when the signal drops below it by `delta` and
    * no higher value appears within `lookahead` samples.
    * Returns (maxima, minima).
    */
  def peakDetect1d(y: Array[Double], x: Array[Double] = null,
                   lookahead: Int = 200, delta: Double = 0.0): (Seq[Peak], Seq[Peak]) = {
    require(lookahead >= 1)
    require(delta >= 0)
    val xs = if (x == null) Array.tabulate(y.length)(_.toDouble) else x
    require(xs.length == y.length)
    val n = y.length
    val maxPeaks = Seq.newBuilder[Peak]
    val minPeaks = Seq.newBuilder[Peak]
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var mxPos = 0.0
    var mnPos = 0.0
    var index = 0
    var break = false
    while (index < n - lookahead && !break) {
      val yy = y(index)
      if (yy > mx) { mx = yy; mxPos = xs(index) }
      if (yy < mn) { mn = yy; mnPos = xs(index) }

      var continue = false
      if (yy < mx - delta && !mx.isPosInfinity) {
        val ahead = y.slice(index, index + lookahead).max
        if (ahead < mx) {
          maxPeaks += Peak(mxPos, mx)
          mx = Double.PositiveInfinity
          mn = Double.PositiveInfinity
          if (index + lookahead >= n) break = true
          continue = true
        }
      }
      if (!continue && !break && yy > mn + delta && !mn.isNegInfinity) {
        val ahead = y.slice(index, index + lookahead).min
        if (ahead > mn) {
          minPeaks += Peak(mnPos, mn)
          mn = Double.NegativeInfinity
          mx = Double.NegativeInfinity
          if (index + lookahead >= n) break = true
        }
      }
      index += 1
    }
    (maxPeaks.result(), minPeaks.result())
  }

  /** Savitzky-Golay smoothing: least-squares polynomial of `polyOrder`
    * over a centered window of `window` (odd) points, evaluated at the
    * center. Edges use polynomial extrapolation of the terminal windows
    * (scipy 'interp' mode equivalent).
    */
  def savitzkyGolay(y: Array[Double], window: Int, polyOrder: Int): Array[Double] = {
    require(window % 2 == 1 && window > polyOrder)
    val half = window / 2
    val coeffs = sgCoeffs(window, polyOrder, 0)
    val n = y.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (i >= half && i < n - half) {
        var acc = 0.0
        var j = 0
        while (j < window) { acc += coeffs(j) * y(i - half + j); j += 1 }
        out(i) = acc
      } else {
        // fit the terminal window, evaluate the polynomial at the edge point
        val base = if (i < half) 0 else n - window
        val p = polyFit(Array.tabulate(window)(k => (base + k).toDouble),
          y.slice(base, base + window), polyOrder)
        out(i) = polyEval(p, i.toDouble)
      }
      i += 1
    }
    out
  }

  /** Convolution coefficients for the SG filter via normal equations. */
  private def sgCoeffs(window: Int, polyOrder: Int, deriv: Int): Array[Double] = {
    import breeze.linalg._
    val half = window / 2
    val a = DenseMatrix.tabulate(window, polyOrder + 1) { (i, j) =>
      math.pow(i - half, j)
    }
    // pinv row `deriv` gives the coefficients (times deriv!)
    val p = pinv(a)
    Array.tabulate(window)(i => p(deriv, i))
  }

  /** Least-squares polynomial fit (ascending coefficient order). */
  def polyFit(x: Array[Double], y: Array[Double], order: Int): Array[Double] = {
    import breeze.linalg._
    val a = DenseMatrix.tabulate(x.length, order + 1) { (i, j) => math.pow(x(i), j) }
    val sol = pinv(a) * DenseVector(y)
    sol.toArray
  }

  def polyEval(coeffs: Array[Double], x: Double): Double = {
    var acc = 0.0
    var i = coeffs.length - 1
    while (i >= 0) { acc = acc * x + coeffs(i); i -= 1 }
    acc
  }

  /** Spectrum normalization (reference `normspec`): smooth optionally,
    * then scale each trace to unit max. */
  def normSpec(traces: Array[Array[Double]], smooth: Boolean = false,
               window: Int = 15, polyOrder: Int = 1): Array[Array[Double]] =
    traces.map { t =>
      val s = if (smooth) savitzkyGolay(t, window, polyOrder) else t
      val m = s.max
      if (m == 0) s else s.map(_ / m)
    }

  /** Index of the array element nearest to `v` (reference `find_nearest`). */
  def findNearest(v: Double, arr: Array[Double]): Int =
    arr.indices.minBy(i => math.abs(arr(i) - v))

  /** Segment-wise Shirley background (reference `shirley_piecewise`,
    * `analysis.py:158-190`): Shirley per contiguous segment,
    * concatenated; if the segments don't cover the spectrum, the
    * remaining tail is filled with the Savitzky-Golay-smoothed raw
    * signal (the reference's savgol tail). */
  def shirleyPiecewise(x: Array[Double], y: Array[Double],
                       segRanges: Seq[(Int, Int)], tol: Double = 1e-5,
                       maxIter: Int = 20, smoothWindow: Int = 5,
                       smoothOrder: Int = 1): Array[Double] = {
    val segs = segRanges.map { case (from, until) =>
      shirley(x.slice(from, until), y.slice(from, until), tol, maxIter)
    }
    val covered = segRanges.map { case (f, u) => u - f }.sum
    val tail =
      if (covered >= y.length) Array.empty[Double]
      else savitzkyGolay(y.slice(covered, y.length), smoothWindow, smoothOrder)
    (segs :+ tail).toArray.flatten
  }

  /** Igor-style binary search (reference `legacy.binarysearch`,
    * `legacy.py:16-26`): `searchsorted(side='left') - 1` semantics with
    * automatic sort-order detection — for ascending arrays, the largest
    * i with arr(i) < v (exact matches return i-1, Igor convention);
    * descending arrays are handled by symmetry. */
  def binarySearch(arr: Array[Double], v: Double): Int = {
    require(arr.nonEmpty, "binarySearch on empty array")
    val ascending = arr.length < 2 || arr(0) <= arr(arr.length - 1)
    if (ascending) {
      // leftmost insertion point, minus one
      var lo = 0
      var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < v) lo = mid + 1 else hi = mid
      }
      lo - 1
    } else {
      val rev = arr.reverse
      var lo = 0
      var hi = rev.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (rev(mid) < v) lo = mid + 1 else hi = mid
      }
      arr.length - lo - 1
    }
  }

  /** Row-wise Shirley background over an EDC matrix (reference
    * `shirley2d`, `analysis.py:193-285`: vectorized row-wise variant). */
  def shirley2d(x: Array[Double], ys: Array[Array[Double]],
                tol: Double = 1e-5, maxIter: Int = 20): Array[Array[Double]] =
    ys.map(shirley(x, _, tol, maxIter))

  /** Vertices of a rotationally symmetric polygon (reference
    * `vertexGenerator`, `analysis.py:1965-2038`): `nSide` points at
    * `radius` from `center`, starting at `rot0` radians. */
  def vertexGenerator(center: (Double, Double), radius: Double, nSide: Int,
                      rot0: Double = 0.0): Seq[(Double, Double)] =
    (0 until nSide).map { k =>
      val a = rot0 + 2 * math.Pi * k / nSide
      (center._1 + radius * math.cos(a), center._2 + radius * math.sin(a))
    }

  /** n-fold rotational-symmetry intensity average of a 2D grid about a
    * center (reference `MomentumCorrector.rotational average`,
    * `analysis.py:2661-2682`): mean of the grid rotated by each
    * symmetry angle (bilinear sampling). */
  def symmetryAverage(g: Array[Array[Double]], cr: Double, cc: Double,
                      nFold: Int): Array[Array[Double]] = {
    val rows = g.length; val cols = g(0).length
    Array.tabulate(rows, cols) { (i, j) =>
      var acc = 0.0
      var k = 0
      while (k < nFold) {
        val a = 2 * math.Pi * k / nFold
        val (ca, sa) = (math.cos(a), math.sin(a))
        val dr = i - cr; val dc = j - cc
        val rr = cr + ca * dr - sa * dc
        val rc = cc + sa * dr + ca * dc
        acc += (if (rr >= 0 && rr <= rows - 1 && rc >= 0 && rc <= cols - 1)
          Analysis2D.bilinear(g, rr, rc) else 0.0)
        k += 1
      }
      acc / nFold
    }
  }
}
