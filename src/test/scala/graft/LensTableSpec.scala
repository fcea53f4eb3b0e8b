package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.LensTable

class LensTableSpec extends AnyFunSuite {

  private val calibText =
    """# SPECS-style calibration fixture
      |[WideAngleMode defaults for Ep]
      |detector
      |aRange = -15.0 15.0
      |eShift = -0.1 0.0 0.1
      |[WideAngleMode@1.5]
      |aInner = 10.0
      |Da1 = 0.5 2.0 1.0
      |Da3 = 0.1 0.4 0.2
      |Da5 = 0.01 0.04 0.02
      |Da7 = 0.001 0.004 0.002
      |[WideAngleMode@3.0]
      |aInner = 12.0
      |Da1 = 1.5 4.0 3.0
      |Da3 = 0.3 0.8 0.6
      |Da5 = 0.03 0.08 0.06
      |Da7 = 0.003 0.008 0.006
      |""".stripMargin

  test("parses WideAngleMode defaults and per-rr coefficient blocks") {
    val c = LensTable.parseWideAngleMode(calibText)
    assert(c.aRange.toSeq == Seq(-15.0, 15.0))
    assert(c.eShift.toSeq == Seq(-0.1, 0.0, 0.1))
    assert(c.rr.toSeq == Seq(1.5, 3.0))
    assert(c.aInner.toSeq == Seq(10.0, 12.0))
    // the leading digit in 'DaN' is the index, not a coefficient
    // (legacy.py parses Range='1:4'): the three coefficients follow it
    assert(c.da1(0).toSeq == Seq(0.5, 2.0, 1.0))
    assert(c.da3(1).toSeq == Seq(0.3, 0.8, 0.6))
    assert(c.da7(1).toSeq == Seq(0.003, 0.008, 0.006))
  }

  test("searchInterp matches Igor BinarySearchInterp on both sort orders") {
    // ascending
    assert(LensTable.searchInterp(Array(1.0, 2.0, 4.0), 3.0) == 1.5)
    assert(LensTable.searchInterp(Array(1.0, 2.0, 4.0), 2.0) == 1.0)
    // descending (Igor determines order automatically)
    assert(LensTable.searchInterp(Array(4.0, 2.0, 1.0), 3.0) == 0.5)
    // linterp agrees with a direct computation
    assert(LensTable.linterp(1, Array(10.0, 20.0, 40.0), 0.5) == 30.0)
  }

  test("zInner / zInnerDiff / mcpPositionMm reproduce the SPECS formulas") {
    // simple coefficients: poly(Da, Ek) with [a, b, c] = a*Ek^2+b*Ek+c
    val da = Array(
      Array(0.0, 1.0, 0.0), // D1: poly = Ek
      Array(0.0, 0.0, 2.0), // D3: poly = 2
      Array(0.0, 0.0, 0.0), // D5: 0
      Array(0.0, 0.0, 0.0)) // D7: 0
    val ek = 5.0
    val ang = 2.0
    // zInner = Ek*Ang + 1e-2*2*Ang^3
    val want = ek * ang + 1e-2 * 2.0 * math.pow(ang, 3)
    assert(math.abs(LensTable.zInner(ek, ang, da) - want) < 1e-12)
    // derivative: Ek + 3e-2*2*Ang^2
    val wantD = ek + 3e-2 * 2.0 * ang * ang
    assert(math.abs(LensTable.zInnerDiff(ek, ang, da) - wantD) < 1e-12)
    // inside aInner: exact; outside: first-order Taylor, odd in Ang
    val aInner = 3.0
    assert(LensTable.mcpPositionMm(ek, 2.0, aInner, da) ==
      LensTable.zInner(ek, 2.0, da))
    val beyond = LensTable.mcpPositionMm(ek, 4.0, aInner, da)
    val taylor = LensTable.zInner(ek, aInner, da) +
      1.0 * LensTable.zInnerDiff(ek, aInner, da)
    assert(math.abs(beyond - taylor) < 1e-12)
    assert(LensTable.mcpPositionMm(ek, -4.0, aInner, da) == -beyond)
  }

  test("mcpPositionCol matches the scalar mcpPositionMm row for row") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions.col
    val c = LensTable.parseWideAngleMode(LensTable.FIXTURE)
    val (aInner, da) = LensTable.atRetardationRatio(c, 2.25)
    val rows = for (ek <- Seq(0.5, 5.0, 19.7); ang <- Seq(-28.0, -9.5, 0.0, 3.2, 11.9, 27.0))
      yield (ek, ang)
    val df = spark.createDataFrame(rows).toDF("ek", "ang")
    val got = df.select(col("ek"), col("ang"),
      LensTable.mcpPositionCol(col("ek"), col("ang"), aInner, da).as("mcp"))
      .collect()
    got.foreach { r =>
      val want = LensTable.mcpPositionMm(r.getDouble(0), r.getDouble(1), aInner, da)
      assert(r.getDouble(2) == want,
        s"ek=${r.getDouble(0)} ang=${r.getDouble(1)}: col ${r.getDouble(2)} != scalar $want")
    }
  }

  test("atRetardationRatio interpolates every coefficient table") {
    val c = LensTable.parseWideAngleMode(calibText)
    // midpoint of rr [1.5, 3.0] -> plain average of the two rows
    val (aIn, da) = LensTable.atRetardationRatio(c, 2.25)
    assert(aIn == 11.0)
    assert(da(0).toSeq == c.da1(0).zip(c.da1(1)).map { case (a, b) => (a + b) / 2 }.toSeq)
    assert(da(3).toSeq == c.da7(0).zip(c.da7(1)).map { case (a, b) => (a + b) / 2 }.toSeq)
    // at a table point: exactly that row
    val (aIn0, da0) = LensTable.atRetardationRatio(c, 1.5)
    assert(aIn0 == 10.0 && da0(1).toSeq == c.da3(0).toSeq)
  }
}
