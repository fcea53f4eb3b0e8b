package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nearest-neighbor planar (spatial) averaging — reference
  * `planarfilter`/`nnmean` (`beamtime.py:50-109`): every interior pixel
  * of each plane becomes the mean of its `[i−ush, i+dsh) × [j−lsh,
  * j+rsh)` window; pixels whose window would leave the plane keep their
  * original value.
  *
  * Two forms: the faithful driver-side 3D loop for in-memory volumes
  * (companion to volume alignment, like the reference), and the
  * distributed sparse-grid form for histogram DataFrames — each source
  * cell explodes to the targets whose window contains it and an
  * aggregate sums the contributions, so the filter is one shuffle on the
  * grid keys instead of a dense volume on one machine (absent sparse
  * cells are true zero counts, so dividing by the full window size W
  * reproduces the dense semantics exactly).
  */
object NnFilter {
  import GridOps.Grid

  /** Faithful 3D form: volume indexed [plane][row][col]. */
  def planarFilter(vol: Array[Grid], lsh: Int = 0, rsh: Int = 1,
                   ush: Int = 0, dsh: Int = 1): Array[Grid] = {
    require(lsh >= 0 && rsh >= 1 && ush >= 0 && dsh >= 1)
    val x = vol(0).length
    val y = vol(0)(0).length
    vol.map { plane =>
      Array.tabulate(x, y) { (i, j) =>
        if (i < ush || i >= x - dsh || j < lsh || j >= y - rsh) plane(i)(j)
        else {
          var acc = 0.0
          var n = 0
          var r = i - ush
          while (r < i + dsh) {
            var c = j - lsh
            while (c < j + rsh) { acc += plane(r)(c); n += 1; c += 1 }
            r += 1
          }
          acc / n
        }
      }
    }
  }

  /** Distributed sparse-grid form over (iCol, jCol, vCol) rows of an
    * (ni × nj) grid. Interior cells → window mean (missing cells count
    * as zero); edge cells → original value (as DOUBLE `f`).
    *
    * `planeCols` carries optional leading plane-key columns through the
    * aggregation untouched — the full 3D/ND `planarfilter` semantics
    * (spatial averaging within each plane, planes independent), with
    * the shuffle keyed by (plane, cell) so every plane filters in
    * parallel.
    */
  def sparse(grid: DataFrame, iCol: String, jCol: String, vCol: String,
             ni: Int, nj: Int, lsh: Int = 0, rsh: Int = 1,
             ush: Int = 0, dsh: Int = 1,
             planeCols: Seq[String] = Seq.empty): DataFrame = {
    require(lsh >= 0 && rsh >= 1 && ush >= 0 && dsh >= 1)
    val w = (ush + dsh) * (lsh + rsh)
    val planes = planeCols.map(col)
    // source (r, c) contributes to targets i ∈ [r−dsh+1, r+ush],
    // j ∈ [c−rsh+1, c+lsh] (the inverse of the window relation)
    val contrib = grid.select(planes :+
        explode(sequence(col(iCol) - lit(dsh - 1), col(iCol) + lit(ush))).as("_ti") :+
        col(jCol) :+ col(vCol): _*)
      .select(planes :+ col("_ti") :+
        explode(sequence(col(jCol) - lit(rsh - 1), col(jCol) + lit(lsh))).as("_tj") :+
        col(vCol): _*)
    val interior = contrib
      .filter(col("_ti") >= ush && col("_ti") < ni - dsh &&
        col("_tj") >= lsh && col("_tj") < nj - rsh)
      .groupBy(planes :+ col("_ti") :+ col("_tj"): _*)
      .agg((sum(col(vCol)).cast("double") / lit(w)).as("f"))
      .select(planes :+ col("_ti").as(iCol) :+ col("_tj").as(jCol) :+ col("f"): _*)
    val edges = grid
      .filter(col(iCol) < ush || col(iCol) >= ni - dsh ||
        col(jCol) < lsh || col(jCol) >= nj - rsh)
      .select(planes :+ col(iCol) :+ col(jCol) :+ col(vCol).cast("double").as("f"): _*)
    interior.unionByName(edges)
  }
}
