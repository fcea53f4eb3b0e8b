package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.transforms.Calib

/** Pure-function checks of the calibration Column expressions against
  * directly-computed expectations (formulas per SURVEY.md §2.2 / §2.8).
  */
class CalibSpec extends AnyFunSuite {
  import SparkTestSession._

  private def evalOne(c: org.apache.spark.sql.Column, t: Double): Double = {
    import spark.implicits._
    Seq((t, 42.0)).toDF("t", "y").select(c.as("r")).collect()(0).getDouble(0)
  }

  test("tof2ev matches scalar formula") {
    val t = 70000.0
    val (d, t0, e0) = (1.0, 1e-7, 20.0)
    val expected = {
      val u = d / (t * 4.125e-12 * 2.0 - t0)
      2.84281e-12 * u * u + e0
    }
    val got = evalOne(Calib.tof2ev(col("t"), d, t0, e0), t)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("tof2evpoly matches reference accumulation (reversed coeffs, ascending powers)") {
    // reference base.py:406-432: a reversed; E = a_rev[0]*t^1 + a_rev[1]*t^2 + ... + E0
    val coeffs = Seq(2.0, -3.0, 0.5) // a[0]=2 (highest), a[2]=0.5 (lowest)
    val t = 1.5
    val expected = 0.5 * t + (-3.0) * t * t + 2.0 * t * t * t + 7.0
    val got = evalOne(Calib.tof2evpoly(col("t"), coeffs, 7.0), t)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("detrc2krc affine") {
    // kr = fr * ((rdet - (rstart + rstep*r0)) / rstep)
    val got = evalOne(Calib.detrc2krc(col("t"), rstart = 10.0, r0 = 5.0, fr = 2.0, rstep = 4.0), 50.0)
    assert(got == 2.0 * ((50.0 - (10.0 + 4.0 * 5.0)) / 4.0))
  }

  test("spherical energy correction at center is zero") {
    val c = Calib.eCorrectionSpherical(col("t"), col("y"), xc = 100.0, yc = 42.0,
      d = 1.0, t0 = 0.06, amplitude = -1.0)
    assert(math.abs(evalOne(c, 100.0)) < 1e-15)
  }

  test("lorentzian peak value at center") {
    val gam = 300.0; val amp = -1.0
    val c = Calib.eCorrectionLorentzian(col("t"), col("y"), xc = 100.0, yc = 42.0,
      gam = gam, amplitude = amp)
    val expected = amp / (gam * math.Pi) // r2 = 0 → gam^2/gam^2 = 1
    assert(math.abs(evalOne(c, 100.0) - expected) < 1e-15)
  }

  test("multithresh: first matching strict interval wins, default otherwise") {
    val levels = Seq((0.0, 10.0, 1.0), (5.0, 20.0, 2.0), (20.0, 30.0, 3.0))
    def th(v: Double) = evalOne(Calib.multithresh(col("t"), levels), v)
    assert(th(5.0) == 1.0)   // in first interval
    assert(th(15.0) == 2.0)  // only second matches
    assert(th(20.0) == -1.0) // strict bounds: 20 excluded from both
    assert(th(25.0) == 3.0)
    assert(th(99.0) == -1.0) // default
  }

  test("perspective transform: identity matrix is a no-op") {
    val m = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0))
    val (xp, yp) = Calib.perspectiveTransform(col("t"), col("y"), m)
    assert(evalOne(xp, 3.25) == 3.25)
    assert(evalOne(yp, 3.25) == 42.0)
  }

  test("jitter is seeded-deterministic and bounded") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("v").repartition(4)
    def run() = df.select(Calib.jitterUniform(col("v"), 0.5, 2.0, seed = 7L).as("j"))
      .collect().map(_.getDouble(0)).toSeq
    val a = run(); val b = run()
    assert(a == b) // same seed → identical
    val deltas = df.select((Calib.jitterUniform(col("v"), 0.5, 2.0, 7L) - col("v")).as("d"))
      .collect().map(_.getDouble(0))
    assert(deltas.forall(d => math.abs(d) <= 1.0)) // amp*step = 1.0 bound
    assert(deltas.exists(d => math.abs(d) > 1e-6)) // actually jitters
  }
}
