package graft.binning

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-resident dense N-D histogram volume — the engine's analogue of
  * the reference's "histdict" / xarray containers (SURVEY.md §1.1 B/C:
  * `fprocessing.py:1199-1210`, `bandstructure.py:22-57`): a flat
  * row-major count array plus one axis-coordinate vector (midpoints) per
  * dimension and a name per axis.
  *
  * Grids are small relative to the event table (≤ ~1e8 cells) — the
  * cluster reduces 100 TB of events to this; analysis then runs on the
  * driver (§2.10 ops).
  */
case class BinnedGrid(data: Array[Long], axes: Seq[BinAxis]) {
  val shape: Seq[Int] = axes.map(_.nbins)
  private val strides: Seq[Long] = shape.indices.map(i => shape.drop(i + 1).product.toLong)
  require(data.length == shape.product, s"data ${data.length} != ${shape.product}")

  def apply(idx: Int*): Long = {
    require(idx.length == axes.length)
    data(idx.zip(strides).map { case (i, s) => i * s }.sum.toInt)
  }

  def totalCount: Long = data.sum

  /** Axis coordinate vectors (midpoints, reference `utils.calcax`). */
  def axisValues: Seq[Array[Double]] = axes.map(_.midpoints)

  /** Crop by per-axis index ranges [from, until) — reference
    * `updateHistogram` slicing (`fprocessing.py:3263-3290`). */
  def slice(ranges: Seq[(Int, Int)]): BinnedGrid = {
    require(ranges.length == axes.length)
    val newAxes = axes.zip(ranges).map { case (a, (f, u)) =>
      require(f >= 0 && u <= a.nbins && f < u, s"bad slice ($f,$u) on ${a.name}")
      BinAxis(a.name, u - f, a.lo + f * a.step, a.lo + u * a.step)
    }
    val newShape = ranges.map { case (f, u) => u - f }
    val out = new Array[Long](newShape.product)
    val newStrides = newShape.indices.map(i => newShape.drop(i + 1).product)
    def walk(dim: Int, srcBase: Long, dstBase: Int): Unit =
      if (dim == axes.length) out(dstBase) = data(srcBase.toInt)
      else {
        val (f, u) = ranges(dim)
        var i = f
        while (i < u) {
          walk(dim + 1, srcBase + i * strides(dim), dstBase + (i - f) * newStrides(dim))
          i += 1
        }
      }
    walk(0, 0L, 0)
    BinnedGrid(out, newAxes)
  }

  /** Block-sum rebin by integer factors (reference `utils.arraybin`,
    * `utils.py:295-333`; counts conserved). Axis length must divide. */
  def rebin(factors: Seq[Int]): BinnedGrid = {
    require(factors.length == axes.length)
    axes.zip(factors).foreach { case (a, f) =>
      require(a.nbins % f == 0, s"${a.name}: ${a.nbins} % $f != 0")
    }
    val newAxes = axes.zip(factors).map { case (a, f) => BinAxis(a.name, a.nbins / f, a.lo, a.hi) }
    val newShape = newAxes.map(_.nbins)
    val newStrides = newShape.indices.map(i => newShape.drop(i + 1).product)
    val out = new Array[Long](newShape.product)
    var flat = 0
    while (flat < data.length) {
      var rem = flat.toLong
      var dst = 0
      var d = 0
      while (d < axes.length) {
        val i = (rem / strides(d)).toInt
        rem %= strides(d)
        dst += (i / factors(d)) * newStrides(d)
        d += 1
      }
      out(dst) += data(flat)
      flat += 1
    }
    BinnedGrid(out, newAxes)
  }

  /** Roll `cutAxis` to the front and return one (N−1)-D grid per index
    * along it — the reference's 4D→3D sliced-export cut (`saveDict`,
    * `fprocessing.py:931-955`: `np.rollaxis(data, cutaxis)`, slice i
    * saved as `V{i}`). Slice i's cell (c₀…ĉ…c₋₁) equals this grid's
    * cell with `i` re-inserted at `cutAxis`; remaining axes keep their
    * relative order.
    */
  def sliceAlong(cutAxis: Int): Seq[BinnedGrid] = {
    require(axes.length >= 2 && cutAxis >= 0 && cutAxis < axes.length,
      s"sliceAlong($cutAxis) on a ${axes.length}D grid")
    val restAxes = axes.patch(cutAxis, Nil, 1)
    val restLen = restAxes.map(_.nbins).product
    val n = shape(cutAxis)
    val out = Array.fill(n)(new Array[Long](restLen))
    val dst = new Array[Int](n)
    // one row-major pass: with one coordinate fixed, lexicographic order
    // over the full tuple restricts to lexicographic order over the rest
    var flat = 0
    while (flat < data.length) {
      val ci = ((flat / strides(cutAxis)) % n).toInt
      out(ci)(dst(ci)) = data(flat)
      dst(ci) += 1
      flat += 1
    }
    out.toSeq.map(BinnedGrid(_, restAxes))
  }

  /** 1D profile along `axis`, summing all other axes (EDC/MDC extraction
    * shape). */
  def profile(axis: Int): Array[Long] = {
    val out = new Array[Long](shape(axis))
    var flat = 0
    while (flat < data.length) {
      out(((flat / strides(axis)) % shape(axis)).toInt) += data(flat)
      flat += 1
    }
    out
  }

  /** Back to the sparse relational layout for further distributed work. */
  def toDF(spark: SparkSession): DataFrame = {
    val rows = data.zipWithIndex.collect { case (c, flat) if c > 0 =>
      val idx = axes.indices.map(d => (flat / strides(d)) % shape(d))
      Row.fromSeq(idx :+ c)
    }
    val schema = org.apache.spark.sql.types.StructType(
      axes.map(a => org.apache.spark.sql.types.StructField(s"bin_${a.name}",
        org.apache.spark.sql.types.LongType)) :+
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}

object BinnedGrid {

  /** Physical-units registry (reference `default_units`,
    * `fprocessing.py:195-210`): column → unit string. */
  val defaultUnits: Map[String, String] = Map(
    "X" -> "step", "Y" -> "step", "t" -> "step", "ADC" -> "step",
    "kx" -> "1/A", "ky" -> "1/A", "E" -> "eV", "delay" -> "ps",
    "value" -> "a.u.", "user" -> "id", "hour" -> "h")

  /** Densify a sparse relational histogram (bin_*..., cnt) produced by
    * [[Binning.histogramNd]] into a driver grid. */
  def collect(hist: DataFrame, axes: Seq[BinAxis]): BinnedGrid = {
    val strides = axes.indices.map(i => axes.drop(i + 1).map(_.nbins).product.toLong)
    val data = new Array[Long](axes.map(_.nbins).product)
    hist.select(axes.map(a => col(s"bin_${a.name}")) :+ col("cnt"): _*)
      .collect().foreach { r =>
        val flat = axes.indices.map(d => r.getLong(d) * strides(d)).sum
        data(flat.toInt) = r.getLong(axes.length)
      }
    BinnedGrid(data, axes)
  }

  /** Persist as a parquet of sparse cells plus a JSON axes sidecar —
    * the engine's equivalent of the reference's `binned/ + axes/` HDF5
    * layout (`xarray_to_h5`, `fprocessing.py:3354-3416`).
    *
    * `meta` carries the reference's NESTED metadata tree (the
    * `gather_metadata` dict written group-by-group by the recursive
    * `xarray_to_h5` writer, `fprocessing.py:3392-3415`) — assemble it
    * with [[MetaTree.gather]] and read it back with [[loadMeta]]. When
    * `meta` is absent the legacy flat `metadata` map is written instead
    * (still readable by [[loadMetadata]] and [[loadMeta]]); either way
    * `metadata`'s `unit_<axis>` entries override the axis units in
    * `axes.json`. */
  def save(grid: BinnedGrid, spark: SparkSession, path: String,
           metadata: Map[String, String] = Map.empty,
           meta: Option[MetaNode.MObj] = None): Unit = {
    grid.toDF(spark).coalesce(1).write.mode("overwrite").parquet(s"$path/binned")
    def q(x: String) = "\"" + x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val axesJson = grid.axes.map { a =>
      val unit = metadata.getOrElse(s"unit_${a.name}",
        defaultUnits.getOrElse(a.name, "a.u."))
      s"""{"name":"${a.name}","nbins":${a.nbins},"lo":${a.lo},"hi":${a.hi},"unit":${q(unit)}}"""
    }.mkString("[", ",", "]")
    val metaJson = meta match {
      case Some(tree) => MetaTree.render(tree)
      case None => metadata.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/axes.json"), axesJson)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/metadata.json"), metaJson)
  }

  /** Persist a ≥2-D grid as separated per-slice datasets `V0..Vn` along
    * `cutAxis` — the reference's 4D export layout (`saveDict` h5 branch,
    * `fprocessing.py:931-955`: 4D data is rolled on `cutaxis` (default
    * 3, the delay axis) and written as 3D datasets `binned/V{i}`, with
    * every original axis vector under `axes/`). Here: one sparse parquet
    * per slice at `path/binned/<sliceName><i>`, the FULL original axes
    * in `axes.json`, and the cut parameters in `sliced.json`.
    */
  def saveSliced(grid: BinnedGrid, spark: SparkSession, path: String,
                 cutAxis: Int = 3, sliceName: String = "V",
                 metadata: Map[String, String] = Map.empty): Unit = {
    val slices = grid.sliceAlong(cutAxis)
    slices.zipWithIndex.foreach { case (g, i) =>
      g.toDF(spark).coalesce(1).write.mode("overwrite")
        .parquet(s"$path/binned/$sliceName$i")
    }
    val axesJson = grid.axes.map { a =>
      val unit = metadata.getOrElse(s"unit_${a.name}",
        defaultUnits.getOrElse(a.name, "a.u."))
      s"""{"name":"${a.name}","nbins":${a.nbins},"lo":${a.lo},"hi":${a.hi},"unit":"$unit"}"""
    }.mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/axes.json"), axesJson)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/sliced.json"),
      s"""{"cutAxis":$cutAxis,"sliceName":"$sliceName","n":${slices.length}}""")
  }

  /** Load a [[saveSliced]] layout back into the full N-D grid (slices
    * re-stacked at the recorded cut axis). */
  def loadSliced(spark: SparkSession, path: String): BinnedGrid = {
    val axesJson = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$path/axes.json"))
    val axes = """\{"name":"([^"]+)","nbins":(\d+),"lo":([-0-9.eE]+),"hi":([-0-9.eE]+)""".r
      .findAllMatchIn(axesJson).map { m =>
        BinAxis(m.group(1), m.group(2).toInt, m.group(3).toDouble, m.group(4).toDouble)
      }.toSeq
    val sliced = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$path/sliced.json"))
    val cutAxis = """"cutAxis":(\d+)""".r.findFirstMatchIn(sliced).get.group(1).toInt
    val sliceName = """"sliceName":"([^"]+)"""".r.findFirstMatchIn(sliced).get.group(1)
    val n = """"n":(\d+)""".r.findFirstMatchIn(sliced).get.group(1).toInt
    require(n == axes(cutAxis).nbins, s"slice count $n != axis ${axes(cutAxis).name}")
    val restAxes = axes.patch(cutAxis, Nil, 1)
    val slices = (0 until n).map { i =>
      collect(spark.read.parquet(s"$path/binned/$sliceName$i"), restAxes)
    }
    // inverse of sliceAlong's single row-major pass
    val shape = axes.map(_.nbins)
    val strides = shape.indices.map(i => shape.drop(i + 1).product.toLong)
    val data = new Array[Long](shape.product)
    val src = new Array[Int](n)
    var flat = 0
    while (flat < data.length) {
      val ci = ((flat / strides(cutAxis)) % n).toInt
      data(flat) = slices(ci).data(src(ci))
      src(ci) += 1
      flat += 1
    }
    BinnedGrid(data, axes)
  }

  /** Export a 2D grid as a float32 TIFF or 16-bit PNG image — the
    * reference's `saveDict(form='tiff'/'png')` branches
    * (`fprocessing.py:859-980`); codecs are not needed, see
    * [[graft.io.ImageSinks]]. Higher-rank grids export one image per
    * leading-axis slice elsewhere (slice first, then export). */
  def saveImage(grid: BinnedGrid, path: String): Unit = {
    require(grid.axes.length == 2, s"image export needs a 2D grid, got ${grid.axes.length}D")
    val img = Array.tabulate(grid.shape(0), grid.shape(1))((i, j) => grid(i, j).toDouble)
    path.toLowerCase match {
      case p if p.endsWith(".png") => graft.io.ImageSinks.writePng16Gray(path, img)
      case p if p.endsWith(".tif") || p.endsWith(".tiff") =>
        graft.io.ImageSinks.writeTiffGray32f(path, img)
      case _ => throw new IllegalArgumentException(
        s"saveImage: unsupported extension in '$path' (use .tiff/.tif or .png)")
    }
  }

  def load(spark: SparkSession, path: String): BinnedGrid = {
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$path/axes.json"))
    val axes = """\{"name":"([^"]+)","nbins":(\d+),"lo":([-0-9.eE]+),"hi":([-0-9.eE]+)""".r
      .findAllMatchIn(json).map { m =>
        BinAxis(m.group(1), m.group(2).toInt, m.group(3).toDouble, m.group(4).toDouble)
      }.toSeq
    collect(spark.read.parquet(s"$path/binned"), axes)
  }

  /** Load the metadata sidecar written by [[save]] as the full nested
    * tree — the round-trip of the recursive `xarray_to_h5` metadata
    * layout. Parses both the nested-tree and legacy flat-map forms
    * (a flat map is just a one-level tree of string leaves). */
  def loadMeta(path: String): Option[MetaNode.MObj] = {
    val p = java.nio.file.Paths.get(s"$path/metadata.json")
    if (!java.nio.file.Files.exists(p)) None
    else MetaTree.parse(java.nio.file.Files.readString(p)) match {
      case o: MetaNode.MObj => Some(o)
      case other => throw new IllegalArgumentException(
        s"metadata.json root must be an object, got $other")
    }
  }

  /** Load the metadata sidecar written by [[save]]. */
  def loadMetadata(path: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(s"$path/metadata.json")
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val json = java.nio.file.Files.readString(p)
    """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(json).map { m =>
        def un(x: String) = x.replace("\\\"", "\"").replace("\\\\", "\\")
        un(m.group(1)) -> un(m.group(2))
      }.toMap
  }
}
