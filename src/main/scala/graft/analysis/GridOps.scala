package graft.analysis

/** 2D grid operators over dense driver-side volumes — SURVEY.md §2.10:
  * masks (`analysis.py:1411-1606`), gradients and 2D curvature
  * (`analysis.py:1211-1262`), block normalization (`analysis.py:1184-1208`),
  * region expansion (`analysis.py:1359-1408`).
  */
object GridOps {

  type Grid = Array[Array[Double]]
  type Mask = Array[Array[Boolean]]

  def shape(g: Grid): (Int, Int) = (g.length, g(0).length)

  /** Circular mask (reference `circmask`). */
  def circMask(rows: Int, cols: Int, cr: Double, cc: Double, radius: Double): Mask =
    Array.tabulate(rows, cols) { (i, j) =>
      val dr = i - cr; val dc = j - cc
      dr * dr + dc * dc <= radius * radius
    }

  /** Rectangular mask (reference `rectmask`). */
  def rectMask(rows: Int, cols: Int, r0: Int, r1: Int, c0: Int, c1: Int): Mask =
    Array.tabulate(rows, cols)((i, j) => i >= r0 && i < r1 && j >= c0 && j < c1)

  /** Mask algebra (reference `BoundedArea.__and__/__or__/__invert__`). */
  def and(a: Mask, b: Mask): Mask =
    Array.tabulate(a.length, a(0).length)((i, j) => a(i)(j) && b(i)(j))
  def or(a: Mask, b: Mask): Mask =
    Array.tabulate(a.length, a(0).length)((i, j) => a(i)(j) || b(i)(j))
  def invert(a: Mask): Mask =
    Array.tabulate(a.length, a(0).length)((i, j) => !a(i)(j))

  /** Apply a mask (zero outside) — reference `apply_mask_along`. */
  def applyMask(g: Grid, m: Mask): Grid =
    Array.tabulate(g.length, g(0).length)((i, j) => if (m(i)(j)) g(i)(j) else 0.0)

  /** Binary dilation by `iters` 4-neighbourhood steps (reference
    * `regionExpand` mask dilation). */
  def dilate(m: Mask, iters: Int = 1): Mask = {
    var cur = m
    for (_ <- 0 until iters) {
      val (r, c) = (cur.length, cur(0).length)
      cur = Array.tabulate(r, c) { (i, j) =>
        cur(i)(j) ||
          (i > 0 && cur(i - 1)(j)) || (i < r - 1 && cur(i + 1)(j)) ||
          (j > 0 && cur(i)(j - 1)) || (j < c - 1 && cur(i)(j + 1))
      }
    }
    cur
  }

  /** Central-difference gradients (∂row, ∂col), one-sided at edges;
    * zero along any axis of length 1. */
  def grad(g: Grid): (Grid, Grid) = {
    val (r, c) = shape(g)
    val gr = Array.tabulate(r, c) { (i, j) =>
      if (r == 1) 0.0
      else if (i == 0) g(1)(j) - g(0)(j)
      else if (i == r - 1) g(r - 1)(j) - g(r - 2)(j)
      else (g(i + 1)(j) - g(i - 1)(j)) / 2.0
    }
    val gc = Array.tabulate(r, c) { (i, j) =>
      if (c == 1) 0.0
      else if (j == 0) g(i)(1) - g(i)(0)
      else if (j == c - 1) g(i)(c - 1) - g(i)(c - 2)
      else (g(i)(j + 1) - g(i)(j - 1)) / 2.0
    }
    (gr, gc)
  }

  /** 2D curvature for band sharpening (reference `curvature2d`,
    * `analysis.py:1241-1262`):
    * C = [(1+Cx·fx²)·Cy·fyy − 2·Cx·Cy·fx·fy·fxy + (1+Cy·fy²)·Cx·fxx]
    *     / (1 + Cx·fx² + Cy·fy²)^1.5
    */
  def curvature2d(g: Grid, cx: Double = 1.0, cy: Double = 1.0): Grid = {
    val (fx, fy) = grad(g)
    val (fxx, fxy) = grad(fx)
    val (_, fyy) = grad(fy)
    Array.tabulate(g.length, g(0).length) { (i, j) =>
      val gx = fx(i)(j); val gy = fy(i)(j)
      val num = (1 + cx * gx * gx) * cy * fyy(i)(j) -
        2 * cx * cy * gx * gy * fxy(i)(j) +
        (1 + cy * gy * gy) * cx * fxx(i)(j)
      num / math.pow(1 + cx * gx * gx + cy * gy * gy, 1.5)
    }
  }

  /** Moving-block max normalization (reference `blocknorm`): divide each
    * element of a 1D trace by the max over the forward block. */
  def blockNorm(y: Array[Double], blockWidth: Int): Array[Double] =
    y.indices.map { i =>
      val m = y.slice(i, math.min(i + blockWidth, y.length)).max
      if (m == 0) 0.0 else y(i) / m
    }.toArray
}
