package graft.io

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Igor-exported ARPES .txt reader — parity for the reference's
  * `readARPEStxt` (`fprocessing.py:354-379`): tab-separated matrix where
  * row 0 carries the angle coordinates (offset by one cell), column 0 of
  * the remaining rows carries the energy coordinates, and the rest is
  * the intensity matrix.
  */
object ArpesTxt {

  final case class ArpesData(matrix: Array[Array[Double]],
                             energies: Array[Double],
                             angles: Array[Double])

  def read(path: String, withCoords: Boolean = true): ArpesData = {
    // split with limit -1: Java's default split drops trailing empty
    // cells, which would silently shorten rows ending in tabs
    val rows = Files.readAllLines(Paths.get(path)).asScala
      .filter(_.trim.nonEmpty)
      .map(_.split("\t", -1).map(s => if (s.trim.isEmpty) Double.NaN else s.trim.toDouble))
      .toArray
    require(rows.length >= 2, s"ARPES txt $path has no data rows")
    if (withCoords) {
      val angles = rows(0).drop(1)
      val energies = rows.drop(1).map(_(0))
      val matrix = rows.drop(1).map(_.drop(1))
      ArpesData(matrix, energies, angles)
    } else {
      ArpesData(rows.drop(1), Array.empty, Array.empty)
    }
  }

  def write(path: String, d: ArpesData): Unit = {
    val sb = new StringBuilder
    sb.append("\t").append(d.angles.mkString("\t")).append("\n")
    d.energies.zip(d.matrix).foreach { case (e, row) =>
      sb.append(e).append("\t").append(row.mkString("\t")).append("\n")
    }
    Files.writeString(Paths.get(path), sb.toString)
  }
}
