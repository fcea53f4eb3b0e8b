package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Detect, FftFilter, NnFilter}
import graft.fit.Fit

class DetectFilterSpec extends AnyFunSuite {

  test("erf matches published values to the approximation's accuracy") {
    // stdlib math.erf fixtures (correctly rounded); our approximation is
    // documented at |err| < 1.2e-7
    assert(math.abs(Fit.erf(0.5) - 0.5204998778130465) < 2e-7)
    assert(math.abs(Fit.erf(1.0) - 0.8427007929497149) < 2e-7)
    assert(math.abs(Fit.erf(2.0) - 0.9953222650189527) < 2e-7)
    assert(math.abs(Fit.erf(-1.3) - (-0.9340079449406524)) < 2e-7)
    assert(math.abs(Fit.erf(0.0)) < 2e-7) // approximation offset at 0
    assert(Fit.erf(0.7) == -Fit.erf(-0.7)) // antisymmetric by construction
  }

  test("skewed gaussian matches hand-computed fixture; alpha=0 halves the gaussian") {
    assert(math.abs(Fit.skewedGaussian(2.0, 0.0, 1.0, 3.0, 0.5) - 1.7350817019200941) < 1e-6)
    assert(math.abs(Fit.skewedGaussian(1.5, 2.0, 0.7, -1.2, 1.6) - 0.9572881508605662) < 1e-6)
    // alpha = 0: (amp/2) * gaussian, up to the erf approximation's 1.2e-7
    assert(math.abs(Fit.skewedGaussian(2.0, 0.0, 1.0, 0.0, 0.8) -
      Fit.gaussian(1.0, 0.0, 1.0, 0.8)) < 1e-6)
  }

  test("sigma-clipped stats reject outliers the plain stats keep") {
    // flat background 10 +- small ripple, a few huge outliers
    val img = Array.tabulate(20, 20) { (i, j) =>
      10.0 + 0.1 * math.sin(i * 1.7 + j * 0.3) +
        (if (i == 5 && j == 5) 500.0 else 0.0) +
        (if (i == 12 && j == 17) 300.0 else 0.0)
    }
    val (mean, med, std) = Detect.sigmaClippedStats(img, sigma = 3.0)
    assert(math.abs(mean - 10.0) < 0.1)
    assert(math.abs(med - 10.0) < 0.1)
    assert(std < 0.2) // plain std over the same image is > 10
  }

  test("DAO matched-filter finds planted gaussian peaks at their centers") {
    val centers = Seq((20.0, 30.0, 50.0), (45.0, 12.0, 30.0))
    val rnd = new scala.util.Random(7)
    val img = Array.tabulate(64, 64) { (i, j) =>
      val sig = centers.map { case (ci, cj, amp) =>
        amp * math.exp(-((i - ci) * (i - ci) + (j - cj) * (j - cj)) / (2 * 1.6 * 1.6))
      }.sum
      sig + 0.5 * rnd.nextGaussian() + 2.0 // noise + constant background
    }
    val pks = Detect.peakDetect2dDao(img, fwhm = 3.0, sigma = 5.0, threshfactor = 8.0)
    assert(pks.length == 2, s"expected 2 peaks, got ${pks.length}: ${pks.mkString(", ")}")
    // strongest first; centroids within a pixel of the planted centers
    assert(math.abs(pks(0)._1 - 20.0) < 1.0 && math.abs(pks(0)._2 - 30.0) < 1.0)
    assert(math.abs(pks(1)._1 - 45.0) < 1.0 && math.abs(pks(1)._2 - 12.0) < 1.0)
  }

  test("fft2d round-trips (both power-of-two and odd sizes)") {
    for ((r, c) <- Seq((16, 32), (12, 10))) {
      val img = Array.tabulate(r, c)((i, j) => math.sin(i * 0.7) + j * 0.1)
      val zero = Array.ofDim[Double](r, c)
      val (fr, fi) = FftFilter.fft2d(img, zero, inverse = false)
      val (br, bi) = FftFilter.fft2d(fr, fi, inverse = true)
      for (i <- 0 until r; j <- 0 until c) {
        assert(math.abs(br(i)(j) - img(i)(j)) < 1e-9)
        assert(math.abs(bi(i)(j)) < 1e-9)
      }
    }
  }

  test("notch filter kills a planted periodic artifact, preserves the smooth part") {
    val r = 64; val c = 64
    // smooth positive background + strong periodic fringe at (8, 12) cycles
    def smooth(i: Int, j: Int) =
      40.0 + 20.0 * math.exp(-((i - 32.0) * (i - 32.0) + (j - 32.0) * (j - 32.0)) / 300.0)
    val amp = 10.0
    val img = Array.tabulate(r, c) { (i, j) =>
      smooth(i, j) + amp * math.cos(2 * math.Pi * (8.0 * i / r + 12.0 * j / c))
    }
    // artifact peaks sit at shifted-plane coordinates ±(8, 12)
    val out = FftFilter.notchFilter2d(img, Seq((8.0, 12.0), (-8.0, -12.0)), 2.0, 2.0)
    var worst = 0.0
    for (i <- 0 until r; j <- 0 until c)
      worst = math.max(worst, math.abs(out(i)(j) - smooth(i, j)))
    assert(worst < amp / 10.0, s"residual $worst not < ${amp / 10.0}")
    // sanity: unfiltered deviation is the full artifact amplitude
    assert(math.abs(img(0)(0) - smooth(0, 0)) > amp * 0.9)
  }

  test("reference-geometry fftfilter2d runs and preserves total intensity scale") {
    val img = Array.tabulate(64, 64)((i, j) => 10.0 + math.sin(i * 0.3) * math.cos(j * 0.2))
    val out = FftFilter.fftfilter2d(img)
    assert(out.length == 64 && out(0).length == 64)
    val a = img.flatten.sum; val b = out.flatten.sum
    assert(math.abs(a - b) / a < 0.05) // notches remove little of this smooth image
  }

  test("non-square grids keep input orientation (rows, cols) — pinned convention") {
    // The reference returns the transposed (cols, rows) plane for
    // non-square input; this implementation intentionally keeps (rows,
    // cols) with sx on the row-frequency axis (see fftfilter2d doc).
    val r = 32; val c = 64
    def smooth(i: Int, j: Int) = 30.0 + 0.1 * i + 0.05 * j
    val amp = 8.0
    val img = Array.tabulate(r, c) { (i, j) =>
      smooth(i, j) + amp * math.cos(2 * math.Pi * (5.0 * i / r + 9.0 * j / c))
    }
    val out = FftFilter.notchFilter2d(img, Seq((5.0, 9.0), (-5.0, -9.0)), 1.5, 1.5)
    // shape preserved, not transposed
    assert(out.length == r && out(0).length == c)
    var worst = 0.0
    for (i <- 0 until r; j <- 0 until c)
      worst = math.max(worst, math.abs(out(i)(j) - smooth(i, j)))
    assert(worst < amp / 10.0, s"non-square residual $worst not < ${amp / 10.0}")
    // fixed-geometry entry point also keeps the input shape
    val out2 = FftFilter.fftfilter2d(img)
    assert(out2.length == r && out2(0).length == c)
  }

  test("keypoint estimate: center + angle-ordered high-symmetry points") {
    // planted hexagon of 6 peaks around a center peak
    val cx = 32.0; val cy = 32.0; val rad = 18.0
    val verts = (0 until 6).map { k =>
      val th = k * math.Pi / 3
      (cx + rad * math.sin(th), cy + rad * math.cos(th))
    }
    val all = verts :+ ((cx, cy))
    val rnd = new scala.util.Random(11)
    val img = Array.tabulate(64, 64) { (i, j) =>
      all.map { case (pr, pc) =>
        60.0 * math.exp(-((i - pr) * (i - pr) + (j - pc) * (j - pc)) / (2 * 1.8 * 1.8))
      }.sum + 0.4 * rnd.nextGaussian() + 1.0
    }
    val (center, hsp) = graft.analysis.Detect.keypointEstimate(img, fwhm = 3.0,
      sigma = 5.0, threshfactor = 8.0)
    assert(math.abs(center._1 - cx) < 1.0 && math.abs(center._2 - cy) < 1.0)
    assert(hsp.length == 6, s"expected 6 vertices, got ${hsp.length}")
    // angle-ordered: successive polar angles are monotone (one wrap)
    val angles = hsp.map(p => math.atan2(p._1 - center._1, p._2 - center._2))
    assert(angles.zip(angles.tail).count { case (a, b) => b < a } <= 1)
    // every planted vertex recovered within a pixel
    verts.foreach { case (pr, pc) =>
      assert(hsp.exists(p => math.abs(p._1 - pr) < 1.0 && math.abs(p._2 - pc) < 1.0),
        s"missing vertex ($pr, $pc)")
    }
  }

  test("tiff float32 sink round-trips a grid; png 16-bit sink round-trips scaled intensities") {
    import graft.io.ImageSinks
    val tmp = java.nio.file.Files.createTempDirectory("graft_img")
    val img = Array.tabulate(17, 23)((i, j) => math.sin(i * 0.4) * 50 + j * 1.5 - 10)
    val tp = tmp.resolve("h.tiff").toString
    ImageSinks.writeTiffGray32f(tp, img)
    val tback = ImageSinks.readTiffGray32f(tp)
    assert(tback.length == 17 && tback(0).length == 23)
    for (i <- 0 until 17; j <- 0 until 23)
      assert(math.abs(tback(i)(j) - img(i)(j)) < 1e-3) // float32 precision
    val pp = tmp.resolve("h.png").toString
    ImageSinks.writePng16Gray(pp, img)
    val pback = ImageSinks.readPng16Gray(pp)
    val flat = img.flatten
    val lo = flat.min; val hi = flat.max
    for (i <- 0 until 17; j <- 0 until 23) {
      val want = math.round((img(i)(j) - lo) * 65535.0 / (hi - lo)).toInt
      assert(pback(i)(j) == want, s"($i,$j): ${pback(i)(j)} vs $want")
    }
  }

  test("planarFilter matches the direct window-mean loop; edges untouched") {
    val vol = Array.tabulate(3, 8, 9)((a, i, j) => (a + 1) * (i * 9 + j) * 0.5)
    val (lsh, rsh, ush, dsh) = (1, 2, 1, 2)
    val got = NnFilter.planarFilter(vol, lsh, rsh, ush, dsh)
    for (a <- 0 until 3; i <- 0 until 8; j <- 0 until 9) {
      val expect =
        if (i < ush || i >= 8 - dsh || j < lsh || j >= 9 - rsh) vol(a)(i)(j)
        else {
          val win = for (r <- i - ush until i + dsh; c <- j - lsh until j + rsh)
            yield vol(a)(r)(c)
          win.sum / win.length
        }
      assert(math.abs(got(a)(i)(j) - expect) < 1e-12, s"($a,$i,$j)")
    }
  }

  test("3D sparse nn filter (per-plane keys) == per-plane dense driver filter") {
    import SparkTestSession._
    import spark.implicits._
    val cells = for {
      a <- 0 until 3; i <- 0 until 8; j <- 0 until 9
      if (a * 72 + i * 9 + j) % 4 != 0 // sparse holes
    } yield (a.toLong, i.toLong, j.toLong, ((a * 5 + i * 7 + j * 3) % 11 + 1).toLong)
    val df = cells.toDF("plane", "bi", "bj", "v")
    val got = NnFilter.sparse(df, "bi", "bj", "v", ni = 8, nj = 9,
        lsh = 1, rsh = 2, ush = 1, dsh = 2, planeCols = Seq("plane"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val dense = Array.ofDim[Double](3, 8, 9)
    cells.foreach { case (a, i, j, v) => dense(a.toInt)(i.toInt)(j.toInt) = v.toDouble }
    val want = NnFilter.planarFilter(dense, 1, 2, 1, 2)
    for (a <- 0 until 3; i <- 0 until 8; j <- 0 until 9) {
      val g = got.getOrElse((a.toLong, i.toLong, j.toLong), 0.0)
      assert(math.abs(g - want(a)(i)(j)) < 1e-12, s"($a,$i,$j): $g vs ${want(a)(i)(j)}")
    }
  }

  test("distributed sparse nn filter == dense driver filter on the same grid") {
    import SparkTestSession._
    import spark.implicits._
    // sparse grid with holes: only ~60% of cells present
    val cells = for {
      i <- 0 until 10; j <- 0 until 12
      if (i * 12 + j) % 5 != 0
    } yield (i.toLong, j.toLong, ((i * 7 + j * 3) % 11 + 1).toLong)
    val df = cells.toDF("bi", "bj", "v")
    val got = NnFilter.sparse(df, "bi", "bj", "v", ni = 10, nj = 12,
        lsh = 1, rsh = 2, ush = 1, dsh = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // dense reference: absent cells are zeros
    val dense = Array.ofDim[Double](10, 12)
    cells.foreach { case (i, j, v) => dense(i.toInt)(j.toInt) = v.toDouble }
    val want = NnFilter.planarFilter(Array(dense), 1, 2, 1, 2)(0)
    for (i <- 0 until 10; j <- 0 until 12) {
      val g = got.getOrElse((i.toLong, j.toLong), 0.0)
      // sparse form omits rows whose value is exactly zero with no
      // contributing neighbors — both representations mean zero
      assert(math.abs(g - want(i)(j)) < 1e-12, s"($i,$j): $g vs ${want(i)(j)}")
    }
  }
}
