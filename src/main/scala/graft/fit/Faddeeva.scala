package graft.fit

/** Faddeeva function w(z) = e^(−z²)·erfc(−iz) on the closed upper
  * half-plane — the complex kernel of the reference's true Voigt
  * lineshape (`analysis.py:2917-2941` evaluates
  * `wofz((x−ctr+iγ)/(σ√2))`), self-contained (no SciPy/libcerf).
  *
  * Algorithm: Weideman's single rational expansion (J.A.C. Weideman,
  * "Computation of the complex error function", SIAM J. Numer. Anal.
  * 31, 1497-1518 (1994)): with L = √(N/√2) and Z = (L+iz)/(L−iz),
  *
  *   w(z) ≈ 2/(L−iz)² · Σₙ aₙ Zⁿ⁻¹  +  (1/√π)/(L−iz),
  *
  * where the aₙ are Fourier coefficients of e^(−t²)(L²+t²) sampled on
  * the tangent grid — computed here ONCE at class init from the
  * defining DFT (graft's own FFT), not from hardcoded tables. At N=48
  * the relative accuracy is ~1e-13 across Im z ≥ 0 (degrading only
  * toward the real-axis region where Re w underflows), far beyond the
  * 1e-6 gate pinned in WarpFitSpec. Chosen over Humlíček's w4 — the
  * usual wofz fallback — because w4's documented ~1e-4 maximum relative
  * error fails that gate.
  */
object Faddeeva {

  private val N = 48
  private val L = math.sqrt(N / math.sqrt(2.0))

  /** Polynomial coefficients, highest degree first (Horner order). */
  private val coeffs: Array[Double] = {
    val M = 2 * N
    // f = [0; e^(−t²)(L²+t²)] over t = L·tan(kπ/2M), k = −M+1 … M−1
    val f = new Array[Double](2 * M)
    var k = -M + 1
    var idx = 1
    while (k <= M - 1) {
      val t = L * math.tan(k * math.Pi / (2.0 * M))
      f(idx) = math.exp(-t * t) * (L * L + t * t)
      idx += 1
      k += 1
    }
    // fftshift (even length = swap halves), forward DFT, real part / 2M
    val re = new Array[Double](2 * M)
    System.arraycopy(f, M, re, 0, M)
    System.arraycopy(f, 0, re, M, M)
    val im = new Array[Double](2 * M)
    graft.analysis.FftFilter.fft1d(re, im, inverse = false)
    // a = flipud(real(fft)[2..N+1]/2M) → index j holds degree N−1−j
    Array.tabulate(N)(j => re(N - j) / (2.0 * M))
  }

  /** w(z) for Im z ≥ 0, as (Re w, Im w). */
  def wofz(zRe: Double, zIm: Double): (Double, Double) = {
    require(zIm >= 0.0, s"wofz is defined here for Im z >= 0, got $zIm")
    // d = L − iz = (L + Im z) − i·Re z ;  n = L + iz = (L − Im z) + i·Re z
    val dRe = L + zIm; val dIm = -zRe
    val nRe = L - zIm; val nIm = zRe
    val den = dRe * dRe + dIm * dIm
    val zzRe = (nRe * dRe + nIm * dIm) / den // Z = n/d
    val zzIm = (nIm * dRe - nRe * dIm) / den
    var pRe = 0.0; var pIm = 0.0
    var j = 0
    while (j < N) { // Horner: p = Σ aₙ Z^(n−1)
      val t = pRe * zzRe - pIm * zzIm + coeffs(j)
      pIm = pRe * zzIm + pIm * zzRe
      pRe = t
      j += 1
    }
    // w = 2p/d² + (1/√π)/d
    val d2Re = dRe * dRe - dIm * dIm
    val d2Im = 2.0 * dRe * dIm
    val den2 = d2Re * d2Re + d2Im * d2Im
    val wRe = 2.0 * (pRe * d2Re + pIm * d2Im) / den2
    val wIm = 2.0 * (pIm * d2Re - pRe * d2Im) / den2
    val c = 1.0 / math.sqrt(math.Pi)
    (wRe + c * dRe / den, wIm - c * dIm / den)
  }

  /** Re w(z) — the part the Voigt profile uses. */
  def wofzRe(zRe: Double, zIm: Double): Double = wofz(zRe, zIm)._1
}
