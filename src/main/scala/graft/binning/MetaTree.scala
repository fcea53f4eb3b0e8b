package graft.binning

/** Nested metadata tree — the engine's analogue of the reference's
  * metadata dict assembled by `gather_metadata` (`fprocessing.py:
  * 2488-2689`) and written recursively group-by-group by
  * `xarray_to_h5` (`fprocessing.py:3392-3415`): dict → HDF5 group,
  * leaf → dataset. Here the same tree is one nested JSON document in
  * the `metadata.json` sidecar next to the binned parquet, written by
  * [[BinnedGrid.save]] and round-tripped by [[BinnedGrid.loadMeta]].
  *
  * Leaves keep their type through the round trip (string / integer /
  * float / bool / array), matching the reference's typed HDF5 datasets;
  * field order is insertion order, matching the reference's dict-order
  * groups. Non-finite doubles render as quoted strings ("NaN",
  * "Infinity") because JSON has no literal for them — the reference
  * stores `np.nan` natively in HDF5; the string form is the documented
  * JSON equivalent.
  */
sealed trait MetaNode

object MetaNode {
  final case class MStr(v: String) extends MetaNode
  final case class MInt(v: Long) extends MetaNode
  final case class MNum(v: Double) extends MetaNode
  final case class MBool(v: Boolean) extends MetaNode
  case object MNull extends MetaNode
  final case class MArr(items: Seq[MetaNode]) extends MetaNode
  final case class MObj(fields: Seq[(String, MetaNode)]) extends MetaNode {
    def get(key: String): Option[MetaNode] = fields.collectFirst { case (`key`, v) => v }
    def apply(key: String): MetaNode = get(key).getOrElse(
      throw new NoSuchElementException(s"metadata key '$key' (have ${fields.map(_._1).mkString(", ")})"))
    /** Descend into a nested group. */
    def obj(key: String): MObj = apply(key).asInstanceOf[MObj]
    def str(key: String): String = apply(key).asInstanceOf[MStr].v
    def int(key: String): Long = apply(key).asInstanceOf[MInt].v
    def num(key: String): Double = apply(key) match {
      case MNum(v) => v
      case MInt(v) => v.toDouble
      // render() writes non-finite doubles as their toString in quotes;
      // recover all three, not just NaN
      case MStr("NaN") => Double.NaN
      case MStr("Infinity") => Double.PositiveInfinity
      case MStr("-Infinity") => Double.NegativeInfinity
      case other => throw new IllegalArgumentException(s"'$key' is not numeric: $other")
    }
  }
  object MObj { def of(fields: (String, MetaNode)*): MObj = MObj(fields.toVector) }
}

object MetaTree {
  import MetaNode._

  // ---------------------------------------------------------------- render

  def render(n: MetaNode): String = {
    val sb = new StringBuilder
    write(n, sb)
    sb.toString
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private def write(n: MetaNode, sb: StringBuilder): Unit = n match {
    case MStr(v) => writeString(v, sb)
    case MInt(v) => sb.append(v)
    case MNum(v) =>
      if (java.lang.Double.isFinite(v)) sb.append(v) else writeString(v.toString, sb)
    case MBool(v) => sb.append(v)
    case MNull => sb.append("null")
    case MArr(items) =>
      sb.append('[')
      items.zipWithIndex.foreach { case (it, i) =>
        if (i > 0) sb.append(','); write(it, sb)
      }
      sb.append(']')
    case MObj(fields) =>
      sb.append('{')
      fields.zipWithIndex.foreach { case ((k, v), i) =>
        if (i > 0) sb.append(',')
        writeString(k, sb); sb.append(':'); write(v, sb)
      }
      sb.append('}')
  }

  // ----------------------------------------------------------------- parse

  /** Recursive-descent JSON parser for the sidecar (strings, integers,
    * floats, bools, null, arrays, objects). Integer literals come back
    * as [[MNode.MInt]], everything with a '.'/exponent as [[MNode.MNum]]
    * — so render∘parse is the identity on trees this module writes. */
  def parse(s: String): MetaNode = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"metadata JSON parse error at offset $i: $msg")
    def ws(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        s.charAt(i) match {
          case '\\' =>
            i += 1
            if (i >= s.length) fail("dangling escape")
            s.charAt(i) match {
              case '"' => sb.append('"'); case '\\' => sb.append('\\')
              case '/' => sb.append('/'); case 'n' => sb.append('\n')
              case 'r' => sb.append('\r'); case 't' => sb.append('\t')
              case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
              case 'u' =>
                if (i + 4 >= s.length) fail("truncated \\u escape")
                sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
                i += 4
              case c => fail(s"bad escape \\$c")
            }
            i += 1
          case c => sb.append(c); i += 1
        }
      }
      expect('"')
      sb.toString
    }
    def lit(text: String, node: MetaNode): MetaNode = {
      if (!s.startsWith(text, i)) fail(s"expected $text")
      i += text.length
      node
    }
    def num(): MetaNode = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      val t = s.substring(start, i)
      if (t.isEmpty) fail("expected a value")
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) MNum(t.toDouble) else MInt(t.toLong)
    }
    def arr(): MArr = {
      expect('[')
      val items = Vector.newBuilder[MetaNode]
      ws()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return MArr(items.result()) }
      var done = false
      while (!done) {
        items += value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      MArr(items.result())
    }
    def obj(): MObj = {
      expect('{')
      val fields = Vector.newBuilder[(String, MetaNode)]
      ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return MObj(fields.result()) }
      var done = false
      while (!done) {
        ws()
        val k = str()
        expect(':')
        fields += k -> value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      MObj(fields.result())
    }
    def value(): MetaNode = {
      ws()
      if (i >= s.length) fail("empty input")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => MStr(str())
        case 't' => lit("true", MBool(true))
        case 'f' => lit("false", MBool(false))
        case 'n' => lit("null", MNull)
        case _ => num()
      }
    }
    val v = value()
    ws()
    if (i != s.length) fail("trailing content")
    v
  }

  // ---------------------------------------------------------------- gather

  private val isoUtc = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME

  private def isoStamp(epochSec: Long): String =
    java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(epochSec), java.time.ZoneOffset.UTC)
      .format(isoUtc) + "+00:00"

  /** The 16 lens electrode names, in the reference's `lens_list` order
    * (`fprocessing.py:2648-2653`); attr key = `KTOF:Lens:<name>:V`. */
  val lensList: Seq[String] = Seq("Extr", "UCA", "UFA", "Z1", "Z2",
    "A", "B", "C", "D", "E", "F", "G", "H", "I", "TOF", "MCPfront")

  private def numAttr(attrs: Seq[(String, MetaNode)], key: String): Option[Double] =
    attrs.collectFirst {
      case (`key`, MNum(v)) => v
      case (`key`, MInt(v)) => v.toDouble
    }

  /** Pick the aperture-config validity epoch in force at `startEpochSec`
    * — the reference's sorted-stamps previous-entry selection
    * (`fprocessing.py:2605-2608`): the latest `valid_from` at or before
    * the acquisition start (earliest epoch if the start predates all). */
  def apertureEpochAsOf(startEpochSec: Long): String = {
    val stamps = graft.config.InstrumentConfig.apertureRows.map(_._1).distinct.sorted
    def epoch(ts: String) = java.time.LocalDateTime.parse(ts).toEpochSecond(java.time.ZoneOffset.UTC)
    stamps.filter(epoch(_) <= startEpochSec).lastOption.getOrElse(stamps.head)
  }

  /** Assemble the nested metadata tree the reference gathers before
    * export (`gather_metadata`, `fprocessing.py:2488-2689`), from
    * driver-side facts this engine already has:
    *
    *  - `timing`: acquisition start/stop ISO stamps, integer duration,
    *    float collection time (`fprocessing.py:2510-2514`);
    *  - `file`: source-file attributes verbatim, with the reference's
    *    `VSet` → `V` key rename (`fprocessing.py:2520-2523`);
    *  - `entry_identifier` (`fprocessing.py:2525`);
    *  - `binning`: axis names / bin counts / ranges plus the full
    *    per-axis spec with units (the binning-state dump,
    *    `fprocessing.py:2595-2601`);
    *  - `instrument.analyzer`: field/contrast aperture size-or-shape
    *    resolved from the motor positions in `file` against the
    *    [[graft.config.InstrumentConfig.apertureRows]] epoch valid
    *    as-of the acquisition start (`fprocessing.py:2603-2641`), the
    *    lens mode matched from the 16 electrode voltages at 0.5%
    *    relative tolerance (`fprocessing.py:2644-2662`), and the
    *    real/reciprocal projection inferred from the mode name
    *    (`fprocessing.py:2664-2676`).
    *
    * `userMeta` entries (the reference's manual `metadata_dict` input)
    * are placed first and are never overwritten, matching the
    * reference's update-if-absent behavior.
    */
  def gather(acquisitionStartEpochSec: Long,
             acquisitionStopEpochSec: Long,
             fileAttrs: Seq[(String, MetaNode)],
             entryIdentifier: String,
             axes: Seq[BinAxis],
             userMeta: Seq[(String, MetaNode)] = Nil): MObj = {
    val timing = MObj.of(
      "acquisition_start" -> MStr(isoStamp(acquisitionStartEpochSec)),
      "acquisition_stop" -> MStr(isoStamp(acquisitionStopEpochSec)),
      "acquisition_duration" -> MInt(acquisitionStopEpochSec - acquisitionStartEpochSec),
      "collection_time" -> MNum((acquisitionStopEpochSec - acquisitionStartEpochSec).toDouble))

    val file = MObj(fileAttrs.map { case (k, v) => k.replace("VSet", "V") -> v })

    val binning = MObj.of(
      "binaxes" -> MArr(axes.map(a => MStr(a.name))),
      "nbins" -> MArr(axes.map(a => MInt(a.nbins))),
      "ranges" -> MArr(axes.map(a => MArr(Seq(MNum(a.lo), MNum(a.hi))))),
      "axes" -> MArr(axes.map(a => MObj.of(
        "name" -> MStr(a.name), "nbins" -> MInt(a.nbins),
        "lo" -> MNum(a.lo), "hi" -> MNum(a.hi),
        "unit" -> MStr(BinnedGrid.defaultUnits.getOrElse(a.name, "a.u."))))))

    // ---- instrument.analyzer: aperture resolution (as-of epoch) ----
    val epoch = apertureEpochAsOf(acquisitionStartEpochSec)
    val epochRows = graft.config.InstrumentConfig.apertureRows.filter(_._1 == epoch)
    var faShape: MetaNode = MStr("circle")
    var caShape: MetaNode = MStr("circle")
    var faSize: MetaNode = MNum(Double.NaN)
    var caSize: MetaNode = MNum(Double.NaN)
    for (faIn <- numAttr(file.fields, "KTOF:Apertures:m1.RBV");
         faHor <- numAttr(file.fields, "KTOF:Apertures:m2.RBV")) {
      epochRows.collectFirst {
        case (_, "fa", label, xl, xh, Some(yl), Some(yh))
          if xl < faIn && faIn < xh && yl < faHor && faHor < yh => label
      }.foreach { label =>
        label.toDoubleOption match {
          case Some(d) => faSize = MNum(d)
          case None => faShape = MStr(label)
        }
      }
    }
    numAttr(file.fields, "KTOF:Apertures:m3.RBV").foreach { ca =>
      // window kept in the reference's dict order (lo, hi as stored):
      // the lookup is strictly v[0] < ca < v[1], exactly as
      // `fprocessing.py:2630-2641` — including its inverted ca windows
      epochRows.collectFirst {
        case (_, "ca", label, xl, xh, _, _) if xl < ca && ca < xh => label
      }.foreach { label =>
        label.toDoubleOption match {
          case Some(d) => caSize = MNum(d)
          case None => caShape = MStr(label)
        }
      }
    }

    // ---- lens mode from the 16 electrode voltages, 0.5% rtol ----
    val volts = lensList.map(l => numAttr(file.fields, s"KTOF:Lens:$l:V"))
    val lensMode: Option[String] =
      if (volts.exists(_.isEmpty)) None
      else {
        val vs = volts.map(_.get)
        graft.config.InstrumentConfig.lensModeRows.collectFirst {
          case (mode, cfg) if vs.zip(cfg).forall { case (a, b) =>
            math.abs(a - b) <= 1e-8 + 0.005 * math.abs(b) } => mode
        }
      }
    val projection: Option[String] = lensMode.flatMap { mode =>
      mode.split("_").lift(1).map(tok =>
        if (tok.contains("spatial")) "real" else "reciprocal")
    }

    val analyzer = MObj(Vector[(String, MetaNode)](
      "fa_shape" -> faShape, "ca_shape" -> caShape,
      "fa_size" -> faSize, "ca_size" -> caSize) ++
      lensMode.map("lens_mode" -> MStr(_)) ++
      projection.map("projection" -> MStr(_)))

    val gathered = Vector[(String, MetaNode)](
      "timing" -> timing,
      "file" -> file,
      "entry_identifier" -> MStr(entryIdentifier),
      "binning" -> binning,
      "instrument" -> MObj.of("analyzer" -> analyzer))
    val userKeys = userMeta.map(_._1).toSet
    MObj(userMeta.toVector ++ gathered.filterNot { case (k, _) => userKeys(k) })
  }
}
