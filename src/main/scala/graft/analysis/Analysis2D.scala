package graft.analysis

/** 2D / volume analysis operators — remaining SURVEY.md §2.10 rows:
  * 2D peak detection (`analysis.py:430-479`), local-threshold
  * segmentation + connected components (`segment2d`,
  * `analysis.py:1265-1297`), ridge extraction (`analysis.py:1300-1356`),
  * band-path sampling through a grid (`analysis.py:1609-1800`), and
  * hyperslice difference (`bandstructure.py:268-372`).
  */
object Analysis2D {
  import GridOps.{Grid, Mask}

  final case class Peak2D(row: Int, col: Int, height: Double)

  /** 2D local maxima: strictly greater than every neighbour within a
    * (2r+1)² window and above `minHeight` (peak_local_max semantics),
    * strongest first. */
  def peakDetect2d(g: Grid, radius: Int = 1, minHeight: Double = 0.0): Seq[Peak2D] = {
    val (rows, cols) = GridOps.shape(g)
    val out = Seq.newBuilder[Peak2D]
    for (i <- 0 until rows; j <- 0 until cols) {
      val v = g(i)(j)
      if (v > minHeight) {
        var isMax = true
        var di = -radius
        while (di <= radius && isMax) {
          var dj = -radius
          while (dj <= radius && isMax) {
            if (di != 0 || dj != 0) {
              val ii = i + di; val jj = j + dj
              if (ii >= 0 && ii < rows && jj >= 0 && jj < cols && g(ii)(jj) >= v)
                isMax = false
            }
            dj += 1
          }
          di += 1
        }
        if (isMax) out += Peak2D(i, j, v)
      }
    }
    out.result().sortBy(-_.height)
  }

  /** Local adaptive threshold: pixel > mean of its (2r+1)² block + offset
    * (segment2d's threshold_local step). */
  def localThreshold(g: Grid, radius: Int, offset: Double = 0.0): Mask = {
    val (rows, cols) = GridOps.shape(g)
    Array.tabulate(rows, cols) { (i, j) =>
      var sum = 0.0; var n = 0
      var di = -radius
      while (di <= radius) {
        var dj = -radius
        while (dj <= radius) {
          val ii = i + di; val jj = j + dj
          if (ii >= 0 && ii < rows && jj >= 0 && jj < cols) { sum += g(ii)(jj); n += 1 }
          dj += 1
        }
        di += 1
      }
      g(i)(j) > sum / n + offset
    }
  }

  /** 4-connected component labeling (two-pass union-find); 0 = background,
    * labels 1..n. */
  def labelComponents(m: Mask): (Array[Array[Int]], Int) = {
    val rows = m.length; val cols = m(0).length
    val labels = Array.ofDim[Int](rows, cols)
    val parent = scala.collection.mutable.ArrayBuffer[Int](0)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    def union(a: Int, b: Int): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    var next = 1
    for (i <- 0 until rows; j <- 0 until cols if m(i)(j)) {
      val up = if (i > 0 && m(i - 1)(j)) labels(i - 1)(j) else 0
      val left = if (j > 0 && m(i)(j - 1)) labels(i)(j - 1) else 0
      (up, left) match {
        case (0, 0) => labels(i)(j) = next; parent += next; next += 1
        case (u, 0) => labels(i)(j) = u
        case (0, l) => labels(i)(j) = l
        case (u, l) => labels(i)(j) = math.min(u, l); union(u, l)
      }
    }
    // second pass: canonicalize + compact
    val remap = scala.collection.mutable.Map[Int, Int]()
    var count = 0
    for (i <- 0 until rows; j <- 0 until cols if labels(i)(j) != 0) {
      val root = find(labels(i)(j))
      labels(i)(j) = remap.getOrElseUpdate(root, { count += 1; count })
    }
    (labels, count)
  }

  /** segment2d: local threshold then connected components. */
  def segment2d(g: Grid, radius: Int = 5, offset: Double = 0.0): (Array[Array[Int]], Int) =
    labelComponents(localThreshold(g, radius, offset))

  final case class Ridge(label: Int, col: Int, meanRow: Double, minVal: Double)

  /** ridgeDetect: per (label, column) mean row position and min value —
    * the reference's groupby(['val','x']).agg(['mean','min']). */
  def ridgeDetect(g: Grid, labels: Array[Array[Int]]): Seq[Ridge] = {
    val acc = scala.collection.mutable.Map[(Int, Int), (Double, Int, Double)]()
    for (i <- labels.indices; j <- labels(0).indices if labels(i)(j) != 0) {
      val k = (labels(i)(j), j)
      val (s, n, mn) = acc.getOrElse(k, (0.0, 0, Double.PositiveInfinity))
      acc(k) = (s + i, n + 1, math.min(mn, g(i)(j)))
    }
    acc.toSeq.map { case ((l, j), (s, n, mn)) => Ridge(l, j, s / n, mn) }
      .sortBy(r => (r.label, r.col))
  }

  /** Bilinear interpolation of a grid at fractional (row, col). */
  def bilinear(g: Grid, r: Double, c: Double): Double = {
    val (rows, cols) = GridOps.shape(g)
    val r0 = math.max(0, math.min(rows - 2, math.floor(r).toInt))
    val c0 = math.max(0, math.min(cols - 2, math.floor(c).toInt))
    val fr = r - r0; val fc = c - c0
    g(r0)(c0) * (1 - fr) * (1 - fc) + g(r0 + 1)(c0) * fr * (1 - fc) +
      g(r0)(c0 + 1) * (1 - fr) * fc + g(r0 + 1)(c0 + 1) * fr * fc
  }

  /** points2path + line sampling: equidistant points along the polyline
    * through `vertices` (rows, cols), `nPerSeg` samples per segment. */
  def pathPoints(vertices: Seq[(Double, Double)], nPerSeg: Int): Seq[(Double, Double)] =
    vertices.sliding(2).flatMap { case Seq((r0, c0), (r1, c1)) =>
      (0 until nPerSeg).map { k =>
        val t = k.toDouble / nPerSeg
        (r0 + t * (r1 - r0), c0 + t * (c1 - c0))
      }
    }.toSeq :+ vertices.last

  /** bandpath_map: sample the grid along a vertex path (band-structure
    * path cut). */
  def bandPath(g: Grid, vertices: Seq[(Double, Double)], nPerSeg: Int = 20): Array[Double] =
    pathPoints(vertices, nPerSeg).map { case (r, c) => bilinear(g, r, c) }.toArray

  /** Hyperslice difference (`slicediff`): elementwise difference of two
    * slices of a grid along the given axis indices. */
  def sliceDiff(a: Grid, b: Grid): Grid = {
    require(a.length == b.length && a(0).length == b(0).length)
    Array.tabulate(a.length, a(0).length)((i, j) => a(i)(j) - b(i)(j))
  }
}
