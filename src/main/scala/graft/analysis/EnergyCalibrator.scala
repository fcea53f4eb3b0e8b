package graft.analysis

/** End-to-end energy-calibration workflow — the reference's
  * `EnergyCalibrator` class (`analysis.py:808-1147`), composed from the
  * engine's pieces: normalize traces (`normspec`), align each trace to
  * the reference trace by DTW, map a feature range through the warp
  * path (`rangeConvert`), detect the landmark peak per trace, then fit
  * the polynomial ToF→energy calibration (`calibrateE`).
  */
object EnergyCalibrator {

  final case class Calibration(peakPositions: Array[Double],
                               coeffs: Array[Double]) {
    /** Calibrated energy at drift position t with offset e0. */
    def energy(t: Double, e0: Double): Double = Calibrate.energyOf(coeffs, e0, t)
  }

  /** Run the full workflow.
    *
    * @param positions  shared axis of the traces (ToF / drift positions)
    * @param traces     one EDC per bias setting
    * @param biases     bias voltage per trace
    * @param refRange   (lo, hi) index range bracketing the landmark peak
    *                   in the FIRST (reference) trace
    * @param refId      reference trace index
    * @param order      polynomial order of the calibration
    */
  def calibrate(positions: Array[Double], traces: Array[Array[Double]],
                biases: Array[Double], refRange: (Int, Int), refId: Int = 0,
                order: Int = 2, smooth: Boolean = false): Calibration = {
    require(traces.length == biases.length && traces.nonEmpty)
    require(traces.forall(_.length == positions.length),
      "every trace must share the positions axis length")
    require(refRange._1 >= 0 && refRange._1 < refRange._2 &&
      refRange._2 <= positions.length, s"bad refRange $refRange")
    require(refId >= 0 && refId < traces.length, s"bad refId $refId")
    val norm = Analysis.normSpec(traces, smooth = smooth)
    val ref = norm(refId)

    val peakPos = norm.indices.map { i =>
      val (lo, hi) =
        if (i == refId) refRange
        else {
          // DTW correspondence ref → trace i, map the feature range through
          val (_, path) = Dtw.dtw(ref, norm(i))
          val conv = Dtw.rangeConvert(path, Seq(refRange._1, refRange._2))
          (math.min(conv(0), conv(1)), math.max(conv(0), conv(1)))
        }
      // landmark: maximum inside the (possibly warped) range
      val span = (lo until math.min(hi + 1, norm(i).length))
      val pk = span.maxBy(norm(i))
      positions(pk)
    }.toArray

    Calibration(peakPos, Calibrate.calibrateE(peakPos, biases, order, refId))
  }
}
