package graft.analysis

/** DAOStarFinder-style matched-filter 2D peak detection — the second
  * backend of the reference's `peakdetect2d` (`analysis.py:430-479`,
  * `method='daofind'`; the `maxlist` backend lives in
  * [[Analysis2D.peakDetect2d]]). The reference delegates to
  * astropy/photutils; this is the same DAOFIND recipe (Stetson, PASP 99,
  * 191 (1987)) self-contained: sigma-clipped background statistics, a
  * zero-sum Gaussian convolution kernel ("density enhancement"), local
  * maxima of the enhanced image above `threshfactor·σ_clipped`, and
  * kernel-window center-of-mass centroids.
  *
  * Driver-side by design: detection runs on binned grids, which are
  * small by construction (SURVEY §2.10); the 100 TB work is producing
  * the grid, not scanning it.
  */
object Detect {
  import GridOps.Grid

  /** Iterative sigma-clipped (mean, median, std) — the
    * `astropy.stats.sigma_clipped_stats` analogue used by the reference
    * to estimate background level and noise: clip around the median at
    * `sigma` standard deviations until convergence (or `maxIters`).
    */
  def sigmaClippedStats(img: Grid, sigma: Double = 5.0, maxIters: Int = 5): (Double, Double, Double) = {
    var vals = img.flatten
    var it = 0
    var changed = true
    while (changed && it < maxIters && vals.length > 1) {
      val m = median(vals)
      val sd = std(vals)
      val keep = vals.filter(v => math.abs(v - m) <= sigma * sd)
      // a clip that would empty the sample cannot make progress — stop
      changed = keep.nonEmpty && keep.length != vals.length
      if (keep.nonEmpty) vals = keep
      it += 1
    }
    (vals.sum / vals.length, median(vals), std(vals))
  }

  private def median(a: Array[Double]): Double = {
    val s = a.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def std(a: Array[Double]): Double = {
    val m = a.sum / a.length
    math.sqrt(a.map(v => (v - m) * (v - m)).sum / a.length)
  }

  /** Matched-filter peak detection. Returns (row, col) centroids sorted
    * by enhanced-image response, strongest first.
    *
    * @param fwhm         FWHM of the Gaussian matched-filter kernel
    * @param sigma        clipping width for the background statistics
    * @param threshfactor detection threshold in units of clipped σ
    */
  def peakDetect2dDao(img: Grid, fwhm: Double = 3.0, sigma: Double = 5.0,
                      threshfactor: Double = 8.0): Array[(Double, Double)] = {
    val rows = img.length
    val cols = img(0).length
    val ksig = fwhm / (2.0 * math.sqrt(2.0 * math.log(2.0)))
    val rad = math.max(2, math.ceil(2.0 * ksig).toInt)

    // zero-sum normalized Gaussian kernel: correlating with it measures
    // "density enhancement" (peak-shaped excess over local background),
    // which is what makes DAOFIND robust to smooth gradients
    val raw = Array.tabulate(2 * rad + 1, 2 * rad + 1) { (u, v) =>
      val du = u - rad; val dv = v - rad
      math.exp(-(du * du + dv * dv) / (2 * ksig * ksig))
    }
    val kmean = raw.flatten.sum / raw.flatten.length
    val kern = raw.map(_.map(_ - kmean))
    val knorm = kern.flatten.map(k => k * k).sum

    val (_, bgMedian, bgStd) = sigmaClippedStats(img, sigma)
    val thresh = threshfactor * bgStd

    // enhanced image h = (img ⋆ kern) / Σkern² (valid region only)
    val h = Array.ofDim[Double](rows, cols)
    var i = rad
    while (i < rows - rad) {
      var j = rad
      while (j < cols - rad) {
        var acc = 0.0
        var u = -rad
        while (u <= rad) {
          var v = -rad
          while (v <= rad) {
            acc += kern(u + rad)(v + rad) * img(i + u)(j + v)
            v += 1
          }
          u += 1
        }
        h(i)(j) = acc / knorm
        j += 1
      }
      i += 1
    }

    val found = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
    i = rad
    while (i < rows - rad) {
      var j = rad
      while (j < cols - rad) {
        val c = h(i)(j)
        if (c > thresh) {
          // strict local maximum of the enhanced image over the kernel
          // footprint (ties broken toward the first-scanned pixel)
          var isMax = true
          var u = -rad
          while (isMax && u <= rad) {
            var v = -rad
            while (isMax && v <= rad) {
              if ((u != 0 || v != 0) &&
                  (h(i + u)(j + v) > c ||
                    (h(i + u)(j + v) == c && (u < 0 || (u == 0 && v < 0))))) isMax = false
              v += 1
            }
            u += 1
          }
          if (isMax) {
            // background-subtracted center of mass over the kernel window
            var m = 0.0; var mr = 0.0; var mc = 0.0
            var uu = -rad
            while (uu <= rad) {
              var vv = -rad
              while (vv <= rad) {
                val w = math.max(img(i + uu)(j + vv) - bgMedian, 0.0)
                m += w; mr += w * (i + uu); mc += w * (j + vv)
                vv += 1
              }
              uu += 1
            }
            if (m > 0) found += ((mr / m, mc / m, c))
            else found += ((i.toDouble, j.toDouble, c))
          }
        }
        j += 1
      }
      i += 1
    }
    found.sortBy(-_._3).map(p => (p._1, p._2)).toArray
  }

  /** Split a point set into its center (the point nearest the centroid)
    * and the surrounding vertices — the reference's
    * `pointset_center` step of `keypoint_estimate`
    * (`bandstructure.py:68-104`; delegated there to the public
    * symmetrize package). */
  def pointsetCenter(pts: Array[(Double, Double)]): ((Double, Double), Array[(Double, Double)]) = {
    require(pts.nonEmpty,
      "pointsetCenter: no peaks detected (lower threshfactor or check the plane)")
    val cr = pts.map(_._1).sum / pts.length
    val cc = pts.map(_._2).sum / pts.length
    val center = pts.minBy { case (r, c) => (r - cr) * (r - cr) + (c - cc) * (c - cc) }
    (center, pts.filterNot(_ == center))
  }

  /** Order vertices by polar angle around the center (clockwise in image
    * coordinates by default, like the reference's `order_pointset`). */
  def orderPointset(pts: Array[(Double, Double)], center: (Double, Double),
                    clockwise: Boolean = true): Array[(Double, Double)] = {
    val ordered = pts.sortBy { case (r, c) =>
      math.atan2(r - center._1, c - center._2)
    }
    if (clockwise) ordered else ordered.reverse
  }

  /** High-symmetry-point estimate over an isoenergetic plane — the
    * reference's `keypoint_estimate`: detect peaks (DAO matched filter),
    * split off the center, order the rest by angle. Returns
    * (center, orderedVertices). */
  def keypointEstimate(img: Grid, fwhm: Double = 3.0, sigma: Double = 5.0,
                       threshfactor: Double = 8.0,
                       clockwise: Boolean = true): ((Double, Double), Array[(Double, Double)]) = {
    val pks = peakDetect2dDao(img, fwhm, sigma, threshfactor)
    val (center, verts) = pointsetCenter(pks)
    (center, orderPointset(verts, center, clockwise))
  }
}
