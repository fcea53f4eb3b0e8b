package graft.analysis

/** Calibration fitting — driver-side solves over small landmark sets
  * (SURVEY.md §2.10): polynomial ToF→energy calibration via the
  * differential T-matrix least squares (`/root/reference/mpes/
  * analysis.py:694-805`), the d/(t-t0)² model fit (`analysis.py:618-691`),
  * and 2-point momentum calibration (`analysis.py:486-566`).
  */
object Calibrate {

  /** Polynomial energy calibration: solve T·a = b where row i of T is
    * the differential monomial vector [t_ref^p - t_i^p] (p = order..1)
    * and b_i the bias difference, then E(t) = Σ a_p t^p + E0.
    *
    * @param pos  landmark ToF positions, one per EDC trace
    * @param vals bias voltage per trace
    * @return polynomial coefficients a, highest power first (length = order)
    */
  def calibrateE(pos: Array[Double], vals: Array[Double], order: Int = 3,
                 refId: Int = 0): Array[Double] = {
    import breeze.linalg._
    require(pos.length == vals.length && pos.length > 1)
    require(refId >= 0 && refId < vals.length)
    val others = pos.indices.filter(_ != refId)
    val powers = (order to 1 by -1).toArray
    val t = DenseMatrix.tabulate(others.length, order) { (i, j) =>
      math.pow(pos(refId), powers(j)) - math.pow(pos(others(i)), powers(j))
    }
    val b = DenseVector(others.map(i => vals(refId) - vals(i)).toArray)
    (pinv(t) * b).toArray
  }

  /** Evaluate the calibrated polynomial (coefficients highest-first, as
    * returned by [[calibrateE]]) at drift time t with offset E0 —
    * matches `tof2evpoly` semantics. */
  def energyOf(coeffs: Array[Double], e0: Double, t: Double): Double = {
    // E = sum_i coeffs[i] * t^(order - i), i.e. Horner on descending powers
    var acc = 0.0
    var i = 0
    while (i < coeffs.length) { acc = acc * t + coeffs(i); i += 1 }
    acc * t + e0
  }

  /** Fit the physical model E = c (d / (t·bw·2^bin − t0))² + E0 to
    * (t, E) landmark pairs by Gauss-Newton on (d, t0, E0).
    * Reference: lmfit least-squares of the same model
    * (`analysis.py:618-691`). Returns (d, t0, e0).
    */
  def fitEnergyCalibration(t: Array[Double], e: Array[Double],
                           binwidth: Double = 4.125e-12, binning: Int = 1): (Double, Double, Double) = {
    val c = 2.84281e-12
    val scale = binwidth * math.pow(2.0, binning)
    // For fixed t0 the model E = (c·d²)·(1/(t·scale − t0)²) + E0 is LINEAR
    // in (c·d², E0) — profile those out by ordinary least squares and
    // 1-D search t0 (d and t0 are near-degenerate, so a full nonlinear
    // solver crawls; the profiled search is robust and exact).
    val tsMin = t.map(_ * scale).min
    def sse(t0: Double): (Double, Double, Double) = {
      // simple 2-var OLS on basis (w_i = 1/denom_i², 1)
      val w = t.map(ti => { val d = ti * scale - t0; 1.0 / (d * d) })
      val n = t.length
      val sw = w.sum; val sww = w.map(x => x * x).sum
      val se = e.sum; val swe = w.zip(e).map { case (a, b) => a * b }.sum
      val det = n * sww - sw * sw
      val cd2 = (n * swe - sw * se) / det
      val e0 = (se - cd2 * sw) / n
      val err = t.indices.map { i => val r = e(i) - (cd2 * w(i) + e0); r * r }.sum
      (err, cd2, e0)
    }
    // coarse grid on t0 ∈ (−tsMin, tsMin·0.999], then golden refine
    var best = Double.PositiveInfinity
    var bestT0 = 0.0
    var k = 0
    val lo = -tsMin; val hi = tsMin * 0.999
    while (k < 4000) {
      val t0 = lo + (hi - lo) * k / 3999.0
      val (err, cd2, _) = sse(t0)
      if (err < best && cd2 > 0) { best = err; bestT0 = t0 }
      k += 1
    }
    var (a0, b0) = (bestT0 - (hi - lo) / 3999.0, bestT0 + (hi - lo) / 3999.0)
    val phi = (math.sqrt(5.0) - 1) / 2
    var it = 0
    while (it < 200 && (b0 - a0) > 1e-18 + 1e-12 * math.abs(bestT0)) {
      val c1 = b0 - phi * (b0 - a0); val c2 = a0 + phi * (b0 - a0)
      if (sse(c1)._1 < sse(c2)._1) b0 = c2 else a0 = c1
      it += 1
    }
    val t0 = (a0 + b0) / 2
    val (_, cd2, e0) = sse(t0)
    (math.sqrt(cd2 / c), t0, e0)
  }

  /** Two-point momentum calibration (`calibrateK`): given the pixel
    * coordinates of two symmetry points and their known k-space distance,
    * return the linear pixel→k scale and the k-space offsets of the
    * reference point. */
  def calibrateK(pixA: (Double, Double), pixB: (Double, Double),
                 kDistAB: Double): Double = {
    val dr = math.hypot(pixB._1 - pixA._1, pixB._2 - pixA._2)
    require(dr > 0)
    kDistAB / dr
  }
}
