package graft.warp

/** Distortion-correction machinery — SURVEY.md §2.10 `MomentumCorrector`
  * family, driver-side solves feeding distributed column transforms:
  *
  *  - thin-plate-spline (TPS) coefficient solve + evaluation
  *    (reference `dask_tps.py:42-97`: U(r) = r² log r kernel, L-matrix)
  *  - homography estimation from point pairs (DLT;
  *    `analysis.py:2297-2340` uses cv2.findHomography)
  *  - parametric coordinate transforms: translation/rotation/scaling/
  *    shearing as 3×3 matrices (`analysis.py:2594-2659`)
  *  - inverse deformation-field generation on a pixel grid
  *    (`base.py:541-576`), to be broadcast for the distributed
  *    tps_matrix column correction (`base.py:530-539`)
  */
object Warp {

  /** U(r²) = r² log r = 0.5 r² log r² (guarded at r = 0). */
  @inline private def kernelR2(r2: Double): Double =
    if (r2 <= 0.0) 0.0 else 0.5 * r2 * math.log(r2)

  /** Thin-plate spline through control points (src → dst displacements).
    * Solves the standard L·w = v system per output dimension:
    * L = [[K, P], [Pᵀ, 0]], K_ij = U(|c_i − c_j|), P_i = (1, x_i, y_i).
    */
  final case class Tps(ctrl: Array[(Double, Double)],
                       wx: Array[Double], wy: Array[Double]) {
    /** Evaluate the warp at (x, y) → (x', y'). */
    def apply(x: Double, y: Double): (Double, Double) = {
      val n = ctrl.length
      var sx = wx(n) + wx(n + 1) * x + wx(n + 2) * y
      var sy = wy(n) + wy(n + 1) * x + wy(n + 2) * y
      var i = 0
      while (i < n) {
        val dx = x - ctrl(i)._1
        val dy = y - ctrl(i)._2
        val u = kernelR2(dx * dx + dy * dy)
        sx += wx(i) * u
        sy += wy(i) * u
        i += 1
      }
      (sx, sy)
    }
  }

  /** Fit a TPS mapping src control points onto dst control points. */
  def tpsFit(src: Array[(Double, Double)], dst: Array[(Double, Double)],
             regularization: Double = 0.0): Tps = {
    import breeze.linalg._
    val n = src.length
    require(n >= 3 && dst.length == n)
    val l = DenseMatrix.zeros[Double](n + 3, n + 3)
    for (i <- 0 until n; j <- 0 until n) {
      val dx = src(i)._1 - src(j)._1
      val dy = src(i)._2 - src(j)._2
      l(i, j) = kernelR2(dx * dx + dy * dy) + (if (i == j) regularization else 0.0)
    }
    for (i <- 0 until n) {
      l(i, n) = 1.0; l(i, n + 1) = src(i)._1; l(i, n + 2) = src(i)._2
      l(n, i) = 1.0; l(n + 1, i) = src(i)._1; l(n + 2, i) = src(i)._2
    }
    val vx = DenseVector.zeros[Double](n + 3)
    val vy = DenseVector.zeros[Double](n + 3)
    for (i <- 0 until n) { vx(i) = dst(i)._1; vy(i) = dst(i)._2 }
    val wx = l \ vx
    val wy = l \ vy
    Tps(src, wx.toArray, wy.toArray)
  }

  /** Homography from ≥4 point pairs by normalized DLT (solve A·h = 0 via
    * SVD, h = last right-singular vector), h22 normalized to 1. */
  def findHomography(src: Array[(Double, Double)],
                     dst: Array[(Double, Double)]): Array[Array[Double]] = {
    import breeze.linalg._
    val n = src.length
    require(n >= 4 && dst.length == n)
    val a = DenseMatrix.zeros[Double](2 * n, 9)
    for (i <- 0 until n) {
      val (x, y) = src(i); val (u, v) = dst(i)
      a(2 * i, 0) = -x; a(2 * i, 1) = -y; a(2 * i, 2) = -1.0
      a(2 * i, 6) = u * x; a(2 * i, 7) = u * y; a(2 * i, 8) = u
      a(2 * i + 1, 3) = -x; a(2 * i + 1, 4) = -y; a(2 * i + 1, 5) = -1.0
      a(2 * i + 1, 6) = v * x; a(2 * i + 1, 7) = v * y; a(2 * i + 1, 8) = v
    }
    val svd.SVD(_, _, vt) = svd(a)
    val h = vt(8, ::).t
    val s = h(8)
    Array(
      Array(h(0) / s, h(1) / s, h(2) / s),
      Array(h(3) / s, h(4) / s, h(5) / s),
      Array(h(6) / s, h(7) / s, 1.0))
  }

  /** Parametric 3×3 coordinate transform generators (about a center). */
  def translation(dx: Double, dy: Double): Array[Array[Double]] =
    Array(Array(1, 0, dx), Array(0, 1, dy), Array(0, 0, 1))

  def rotation(angleRad: Double, cx: Double = 0, cy: Double = 0): Array[Array[Double]] = {
    val c = math.cos(angleRad); val s = math.sin(angleRad)
    compose(translation(cx, cy),
      Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0)),
      translation(-cx, -cy))
  }

  def scaling(sx: Double, sy: Double, cx: Double = 0, cy: Double = 0): Array[Array[Double]] =
    compose(translation(cx, cy),
      Array(Array(sx, 0.0, 0.0), Array(0.0, sy, 0.0), Array(0.0, 0.0, 1.0)),
      translation(-cx, -cy))

  def shearing(shx: Double, shy: Double): Array[Array[Double]] =
    Array(Array(1.0, shx, 0.0), Array(shy, 1.0, 0.0), Array(0.0, 0.0, 1.0))

  /** Matrix product of 3×3 transforms (applied right-to-left). */
  def compose(ms: Array[Array[Double]]*): Array[Array[Double]] =
    ms.reduce { (a, b) =>
      Array.tabulate(3, 3)((i, j) => (0 until 3).map(k => a(i)(k) * b(k)(j)).sum)
    }

  def applyH(m: Array[Array[Double]], x: Double, y: Double): (Double, Double) = {
    val w = m(2)(0) * x + m(2)(1) * y + m(2)(2)
    ((m(0)(0) * x + m(0)(1) * y + m(0)(2)) / w,
      (m(1)(0) * x + m(1)(1) * y + m(1)(2)) / w)
  }

  /** Sample a warp onto an n×n integer pixel grid → deformation field
    * dfield(0)(x)(y) = x', dfield(1)(x)(y) = y' (float32 to halve the
    * broadcast payload, matching the reference's int16-indexed lookup). */
  def deformationField(n: Int, warp: (Double, Double) => (Double, Double)): Array[Array[Array[Float]]] = {
    val f = Array.ofDim[Float](2, n, n)
    var x = 0
    while (x < n) {
      var y = 0
      while (y < n) {
        val (xp, yp) = warp(x.toDouble, y.toDouble)
        f(0)(x)(y) = xp.toFloat
        f(1)(x)(y) = yp.toFloat
        y += 1
      }
      x += 1
    }
    f
  }
}
