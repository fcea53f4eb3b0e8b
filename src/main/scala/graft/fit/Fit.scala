package graft.fit

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed per-trace curve fitting — the engine's replacement for the
  * reference's sequential `bootstrapfit` loop (`analysis.py:3034-3163`):
  * per-pixel / per-trace fits are independent, so they distribute as
  * `Dataset[Trace].map(fit)` across the cluster (SURVEY.md §2.10 note);
  * only the optional row-to-row parameter propagation stays sequential.
  *
  * Lineshapes per `analysis.py:2893-2964` (gaussian; voigt via the
  * pseudo-Voigt approximation rather than the complex wofz).
  */
object Fit {

  final case class Trace(key: String, xs: Array[Double], ys: Array[Double])
  final case class GaussFit(key: String, amp: Double, center: Double,
                            sigma: Double, sse: Double, iters: Int)

  @inline def gaussian(amp: Double, ctr: Double, sig: Double, x: Double): Double =
    amp * math.exp(-(x - ctr) * (x - ctr) / (2 * sig * sig))

  /** Pseudo-Voigt profile: η·Lorentzian + (1−η)·Gaussian of common FWHM. */
  def pseudoVoigt(amp: Double, ctr: Double, fwhm: Double, eta: Double, x: Double): Double = {
    val g = math.exp(-4 * math.log(2) * (x - ctr) * (x - ctr) / (fwhm * fwhm))
    val l = 1.0 / (1.0 + 4 * (x - ctr) * (x - ctr) / (fwhm * fwhm))
    amp * (eta * l + (1 - eta) * g)
  }

  /** Error function via the classic Chebyshev-fitted erfc approximation
    * (Numerical Recipes §6.2 form; |fractional error| < 1.2e-7 —
    * far below lineshape-fit noise). */
  def erf(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val erfc = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 +
      t * (0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (-1.13520398 +
        t * (1.48851587 + t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) 1.0 - erfc else erfc - 1.0
  }

  /** Skewed Gaussian lineshape (O'Hagan & Leonard, Biometrika 63, 201
    * (1976)) per reference `analysis.py:2942-2966`:
    * (amp/2)·exp(−(x−ctr)²/(2σ²))·(1+erf(α·(x−ctr))). α=0 recovers the
    * symmetric Gaussian at half amplitude (the model's own convention).
    */
  @inline def skewedGaussian(amp: Double, ctr: Double, sig: Double, alph: Double, x: Double): Double =
    (amp / 2) * math.exp(-(x - ctr) * (x - ctr) / (2 * sig * sig)) * (1 + erf(alph * (x - ctr)))

  /** Damped Gauss-Newton gaussian fit of one trace. Start values from
    * moments (max, centroid, rms width). Finite-guarded: a step that
    * does not reduce SSE raises the damping instead of diverging.
    */
  def fitGaussian(xs: Array[Double], ys: Array[Double], maxIter: Int = 100,
                  start: Option[(Double, Double, Double)] = None): (Double, Double, Double, Double, Int) = {
    val n = xs.length
    require(n >= 3)
    // start values: caller-provided (warm start / propagation) or moments
    var (amp, ctr, sig) = start.getOrElse {
      val a0 = ys.max
      val ysum = ys.sum
      val c0 = if (ysum > 0) xs.zip(ys).map { case (x, y) => x * y }.sum / ysum else xs(n / 2)
      val v = if (ysum > 0) xs.zip(ys).map { case (x, y) => y * (x - c0) * (x - c0) }.sum / ysum else 1.0
      (a0, c0, math.max(math.sqrt(math.max(v, 1e-12)), 1e-6))
    }
    def sse(a: Double, c: Double, s: Double): Double = {
      var acc = 0.0
      var i = 0
      while (i < n) { val r = ys(i) - gaussian(a, c, s, xs(i)); acc += r * r; i += 1 }
      acc
    }
    var cost = sse(amp, ctr, sig)
    var lambda = 1e-3
    var it = 0
    var converged = false
    while (it < maxIter && !converged && lambda < 1e10) {
      // J^T J (3×3) and J^T r accumulated in one pass
      val jtj = Array.ofDim[Double](3, 3)
      val jtr = new Array[Double](3)
      var i = 0
      while (i < n) {
        val x = xs(i)
        val ex = math.exp(-(x - ctr) * (x - ctr) / (2 * sig * sig))
        val f = amp * ex
        val r = ys(i) - f
        val ja = ex
        val jc = f * (x - ctr) / (sig * sig)
        val js = f * (x - ctr) * (x - ctr) / (sig * sig * sig)
        val jv = Array(ja, jc, js)
        var p = 0
        while (p < 3) {
          jtr(p) += jv(p) * r
          var q = 0
          while (q < 3) { jtj(p)(q) += jv(p) * jv(q); q += 1 }
          p += 1
        }
        i += 1
      }
      // damped 3×3 solve (Cramer on JTJ + λ·diag)
      val m = Array.tabulate(3, 3)((p, q) =>
        jtj(p)(q) + (if (p == q) lambda * (1 + jtj(p)(p)) else 0.0))
      val det =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
          m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
          m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      if (det == 0 || !java.lang.Double.isFinite(det)) {
        lambda *= 10
      } else {
        def solve(k: Int): Double = {
          val mm = m.map(_.clone())
          for (p <- 0 until 3) mm(p)(k) = jtr(p)
          (mm(0)(0) * (mm(1)(1) * mm(2)(2) - mm(1)(2) * mm(2)(1)) -
            mm(0)(1) * (mm(1)(0) * mm(2)(2) - mm(1)(2) * mm(2)(0)) +
            mm(0)(2) * (mm(1)(0) * mm(2)(1) - mm(1)(1) * mm(2)(0))) / det
        }
        val (da, dc, ds) = (solve(0), solve(1), solve(2))
        val (na, nc, ns) = (amp + da, ctr + dc, math.max(math.abs(sig + ds), 1e-9))
        val nCost = sse(na, nc, ns)
        if (java.lang.Double.isFinite(nCost) && nCost < cost) {
          val rel = (cost - nCost) / math.max(cost, 1e-300)
          amp = na; ctr = nc; sig = ns; cost = nCost
          lambda = math.max(lambda / 3, 1e-12)
          if (rel < 1e-12) converged = true
        } else lambda *= 10
      }
      it += 1
    }
    (amp, ctr, sig, cost, it)
  }

  /** Fit every trace in parallel across the cluster. */
  def fitTraces(traces: Dataset[Trace]): Dataset[GaussFit] = {
    import traces.sparkSession.implicits._
    traces.map { t =>
      val (a, c, s, sse, it) = fitGaussian(t.xs, t.ys)
      GaussFit(t.key, a, c, s, sse, it)
    }
  }

  /** Sequential bootstrap fitting with forward parameter propagation
    * (reference `bootstrapfit` with `pbar=True`, `analysis.py:3132-3139`):
    * trace i+1 starts from trace i's fitted parameters. Inherently
    * sequential, so driver-side by design; use [[fitTraces]] when
    * propagation is not needed.
    */
  def bootstrapFit(traces: Seq[Trace]): Seq[GaussFit] = {
    var prev: Option[(Double, Double, Double)] = None
    traces.map { t =>
      val (a, c, s, sse, it) = prev match {
        case Some((pa, pc, ps)) => fitGaussianFrom(t.xs, t.ys, pa, pc, ps)
        case None => fitGaussian(t.xs, t.ys)
      }
      prev = Some((a, c, s))
      GaussFit(t.key, a, c, s, sse, it)
    }
  }

  /** [[fitGaussian]] warm-started from propagated parameters: the
    * Gauss-Newton iteration runs from (a0, c0, s0) directly, which is
    * the reference's bootstrapfit semantics — the propagated start keeps
    * the chain in the drifting peak's basin even when another feature
    * would give a globally lower SSE, and costs one fit per trace. */
  def fitGaussianFrom(xs: Array[Double], ys: Array[Double],
                      a0: Double, c0: Double, s0: Double,
                      maxIter: Int = 100): (Double, Double, Double, Double, Int) =
    fitGaussian(xs, ys, maxIter, Some((a0, c0, math.max(math.abs(s0), 1e-9))))

  /** Per-parameter time-dependence tensor (reference
    * `build_dynamic_matrix`, `analysis.py:3243-3282`): for each fitted
    * parameter and each time step, (value, Δ from t0, Δ/I0).
    * Rows: (param name, step index, value, delta, deltaNorm). */
  def buildDynamicMatrix(fits: Seq[GaussFit]): Seq[(String, Int, Double, Double, Double)] = {
    require(fits.nonEmpty)
    val params: Seq[(String, GaussFit => Double)] =
      Seq("amp" -> (_.amp), "center" -> (_.center), "sigma" -> (_.sigma))
    params.flatMap { case (name, get) =>
      val v0 = get(fits.head)
      fits.zipWithIndex.map { case (f, i) =>
        val v = get(f)
        (name, i, v, v - v0, if (v0 != 0) (v - v0) / v0 else 0.0)
      }
    }
  }

  /** Build per-key traces from a binned histogram table: one trace per
    * `keyCol`, (bin, cnt) pairs sorted by bin. */
  def tracesFromHistogram(spark: SparkSession,
                          hist: org.apache.spark.sql.DataFrame,
                          keyCol: String, binCol: String, cntCol: String): Dataset[Trace] = {
    import spark.implicits._
    hist.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(binCol), col(cntCol)))).as("pts"))
      .select(col(keyCol).cast("string").as("key"),
        expr("transform(pts, p -> CAST(p." + binCol + " AS DOUBLE))").as("xs"),
        expr("transform(pts, p -> CAST(p." + cntCol + " AS DOUBLE))").as("ys"))
      .as[Trace]
  }
}
