package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-wise calibration / correction transforms — the reference's §2.2
  * operator family re-expressed as pure Catalyst `Column` arithmetic (no
  * UDFs, fully codegen'd, pushdown-transparent).
  *
  * Every function returns a `Column`, so transforms compose with filters
  * and binning inside one whole-stage-codegen span; at 100 TB these are
  * free riders on the scan.
  *
  * Reference formulas (reimplemented, not copied):
  *  - `tof2ev` / `tof2evpoly`: `/root/reference/mpes/base.py:406-458`
  *  - `imxy2kxy`/`detxy2kxy`/`imrc2krc`/`detrc2krc`: `base.py:461-527`
  *  - energy corrections: `fprocessing.py:2286-2343`
  *  - `perspectiveTransform`: `base.py:650-668`
  *  - `multithresh`: `utils.py:406-420`
  *  - jitter: `fprocessing.py:1849-1870`
  */
object Calib {

  /** Time-of-flight → energy, d/(t-t0)² model (`base.py:435-458`):
    * E = 2.84281e-12 * (d / (t*binwidth*2^binning - t0))² + E0.
    * Written as c*u*u (not pow) so the oracle SQL can reproduce the exact
    * IEEE evaluation order. */
  def tof2ev(t: Column, d: Double, t0: Double, e0: Double,
             binwidth: Double = 4.125e-12, binning: Int = 1): Column = {
    val scale = binwidth * math.pow(2.0, binning)
    val u = lit(d) / (t * lit(scale) - lit(t0))
    lit(2.84281e-12) * u * u + lit(e0)
  }

  /** SQL twin of [[tof2ev]] (same evaluation order). */
  def tof2evSql(t: String, d: Double, t0: Double, e0: Double,
                binwidth: Double = 4.125e-12, binning: Int = 1): String = {
    val scale = binwidth * math.pow(2.0, binning)
    val u = s"($d / ($t * $scale - $t0))"
    s"(2.84281E-12 * $u * $u + $e0)"
  }

  /** Polynomial ToF → energy (`base.py:406-432`): E = Σ a_i t^(i+1) + E0,
    * evaluated lowest-power-first by repeated multiplication (matches the
    * reference's accumulation order; avoids pow() cross-engine drift). */
  def tof2evpoly(t: Column, coeffs: Seq[Double], e0: Double): Column = {
    // reference iterates a reversed: a[last] * t^1 + ... + a[0] * t^n
    val rev = coeffs.reverse
    var tp: Column = t // t^1
    var acc: Column = lit(rev.head) * tp
    for (a <- rev.tail) {
      tp = tp * t
      acc = acc + lit(a) * tp
    }
    acc + lit(e0)
  }

  def tof2evpolySql(t: String, coeffs: Seq[Double], e0: Double): String = {
    val rev = coeffs.reverse
    var tp = s"$t"
    var acc = s"${rev.head} * $tp"
    for (a <- rev.tail) {
      tp = s"$tp * $t"
      acc = s"$acc + $a * ($tp)"
    }
    s"($acc + $e0)"
  }

  /** Detector row/col → momentum (`detrc2krc`, `base.py:517-527`):
    * kr = fr * ((rdet - (rstart + rstep*r0)) / rstep). */
  def detrc2krc(rdet: Column, rstart: Double, r0: Double, fr: Double,
                rstep: Double): Column = {
    val rdet0 = rstart + rstep * r0
    lit(fr) * ((rdet - lit(rdet0)) / lit(rstep))
  }

  def detrc2krcSql(rdet: String, rstart: Double, r0: Double, fr: Double,
                   rstep: Double): String = {
    val rdet0 = rstart + rstep * r0
    s"($fr * (($rdet - $rdet0) / $rstep))"
  }

  /** Binned-image x/y → momentum (`imxy2kxy`, `base.py:461-478`). */
  def imxy2kxy(x: Column, x0: Double, fx: Double): Column = lit(fx) * (x - lit(x0))

  /** Spherical (wavefront) TOF correction term (`fprocessing.py:2320-2322`):
    * (sqrt(1 + ((X-xc)² + (Y-yc)²)/d²) - 1) * t0 * amplitude.
    * Add to the TOF column. */
  def eCorrectionSpherical(x: Column, y: Column, xc: Double, yc: Double,
                           d: Double, t0: Double, amplitude: Double): Column = {
    val r2 = (x - lit(xc)) * (x - lit(xc)) + (y - lit(yc)) * (y - lit(yc))
    (sqrt(lit(1.0) + r2 / lit(d * d)) - lit(1.0)) * lit(t0) * lit(amplitude)
  }

  def eCorrectionSphericalSql(x: String, y: String, xc: Double, yc: Double,
                              d: Double, t0: Double, amplitude: Double): String = {
    val r2 = s"(($x - $xc) * ($x - $xc) + ($y - $yc) * ($y - $yc))"
    s"((sqrt(1.0 + $r2 / ${d * d}) - 1.0) * $t0 * $amplitude)"
  }

  /** 2D Lorentzian TOF correction (`fprocessing.py:2324-2326`):
    * amplitude/(gam*pi) * gam² / ((X-xc)² + (Y-yc)² + gam²). */
  def eCorrectionLorentzian(x: Column, y: Column, xc: Double, yc: Double,
                            gam: Double, amplitude: Double): Column = {
    val r2 = (x - lit(xc)) * (x - lit(xc)) + (y - lit(yc)) * (y - lit(yc))
    lit(amplitude / (gam * math.Pi)) * (lit(gam * gam) / (r2 + lit(gam * gam)))
  }

  def eCorrectionLorentzianSql(x: String, y: String, xc: Double, yc: Double,
                               gam: Double, amplitude: Double): String = {
    val r2 = s"(($x - $xc) * ($x - $xc) + ($y - $yc) * ($y - $yc))"
    s"(${amplitude / (gam * math.Pi)} * (${gam * gam} / ($r2 + ${gam * gam})))"
  }

  /** 2D Gaussian TOF correction (`fprocessing.py:2328-2331`):
    * amplitude/sqrt(2*pi*sig²) * exp(-r²/(2 sig²)). */
  def eCorrectionGaussian(x: Column, y: Column, xc: Double, yc: Double,
                          sig: Double, amplitude: Double): Column = {
    val r2 = (x - lit(xc)) * (x - lit(xc)) + (y - lit(yc)) * (y - lit(yc))
    lit(amplitude / math.sqrt(2 * math.Pi * sig * sig)) * exp(-r2 / lit(2 * sig * sig))
  }

  def eCorrectionGaussianSql(x: String, y: String, xc: Double, yc: Double,
                             sig: Double, amplitude: Double): String = {
    val r2 = s"(($x - $xc) * ($x - $xc) + ($y - $yc) * ($y - $yc))"
    s"(${amplitude / math.sqrt(2 * math.Pi * sig * sig)} * exp(-($r2) / ${2 * sig * sig}))"
  }

  /** Perspective (homography) transform of (x, y) with a 3×3 matrix M
    * (`base.py:650-668`): x' = (M00 x + M01 y + M02)/(M20 x + M21 y + M22).
    * Returns (x', y'). */
  def perspectiveTransform(x: Column, y: Column, m: Array[Array[Double]]): (Column, Column) = {
    val den = lit(m(2)(0)) * x + lit(m(2)(1)) * y + lit(m(2)(2))
    val xp = (lit(m(0)(0)) * x + lit(m(0)(1)) * y + lit(m(0)(2))) / den
    val yp = (lit(m(1)(0)) * x + lit(m(1)(1)) * y + lit(m(1)(2))) / den
    (xp, yp)
  }

  def perspectiveTransformSql(x: String, y: String, m: Array[Array[Double]]): (String, String) = {
    val den = s"(${m(2)(0)} * $x + ${m(2)(1)} * $y + ${m(2)(2)})"
    (s"((${m(0)(0)} * $x + ${m(0)(1)} * $y + ${m(0)(2)}) / $den)",
     s"((${m(1)(0)} * $x + ${m(1)(1)} * $y + ${m(1)(2)}) / $den)")
  }

  /** Multilevel thresholding (`utils.multithresh`, `utils.py:406-420`):
    * first (lb, ub, th) whose strict bounds contain the value wins; else
    * null-safe default. Used by `appendMarker` (`fprocessing.py:2435-2445`). */
  def multithresh(c: Column, levels: Seq[(Double, Double, Double)],
                  default: Double = -1.0): Column =
    levels.foldRight(lit(default): Column) { case ((lb, ub, th), acc) =>
      when(c > lit(lb) && c < lit(ub), lit(th)).otherwise(acc)
    }

  def multithreshSql(c: String, levels: Seq[(Double, Double, Double)],
                     default: Double = -1.0): String = {
    val whens = levels.map { case (lb, ub, th) =>
      s"WHEN ($c > $lb AND $c < $ub) THEN CAST($th AS DOUBLE)"
    }.mkString(" ")
    s"(CASE $whens ELSE CAST($default AS DOUBLE) END)"
  }

  /** Pre-binning dither (`applyJitter`, `fprocessing.py:1849-1870`):
    * uniform: col + amp*step*(rand-0.5)*2 ; normal: col + amp*step*randn.
    * Seeded for reproducibility; nondeterministic by nature, so queries
    * using it carry no SQL oracle (rows-only check). */
  def jitterUniform(c: Column, amp: Double, step: Double, seed: Long): Column =
    c + lit(amp * step) * (rand(seed) - lit(0.5)) * lit(2.0)

  def jitterNormal(c: Column, amp: Double, step: Double, seed: Long): Column =
    c + lit(amp * step) * randn(seed)
}
