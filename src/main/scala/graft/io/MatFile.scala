package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Minimal MATLAB Level-5 MAT-file reader/writer — driver-side parity
  * for the reference's calibration-fixture loading
  * (`EnergyCalibrator.read(form='mat')`, `analysis.py:866-892`;
  * `saveClassAttributes` mat sink, `base.py:348-403`). Implemented from
  * the public MAT-File Format documentation: 128-byte header, tagged
  * data elements, miMATRIX with array flags / dimensions / name /
  * numeric data subelements.
  *
  * Scope: uncompressed little-endian files holding real double
  * (mxDOUBLE_CLASS) N-D arrays — the shape of the reference's
  * `ECalib_EDCs.mat` style fixtures. Compression, cells, structs,
  * complex and text arrays are out of scope.
  */
object MatFile {

  final case class MatArray(data: Array[Double], shape: Seq[Int]) {
    require(data.length == shape.product)
    /** Element access in MATLAB's column-major order. */
    def apply(idx: Int*): Double = {
      var flat = 0
      var mult = 1
      idx.indices.foreach { d => flat += idx(d) * mult; mult *= shape(d) }
      data(flat)
    }
  }

  private val MI_INT8 = 1
  private val MI_INT32 = 5
  private val MI_UINT32 = 6
  private val MI_DOUBLE = 9
  private val MI_MATRIX = 14
  private val MX_DOUBLE_CLASS = 6

  def read(path: String): Map[String, MatArray] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length > 128, "not a MAT-file: too short")
    val endianTag = new String(bytes.slice(126, 128), "ISO-8859-1")
    require(endianTag == "IM", s"only little-endian MAT-files supported (tag $endianTag)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = mutable.LinkedHashMap[String, MatArray]()
    var pos = 128
    while (pos + 8 <= bytes.length) {
      val dtype = bb.getInt(pos)
      val dsize = bb.getInt(pos + 4)
      require(dsize >= 0, s"corrupt MAT element size $dsize at offset $pos")
      if (dtype == MI_MATRIX) {
        parseMatrix(bb, pos + 8, dsize).foreach { case (n, a) => out(n) = a }
      } // skip compressed (15) and other top-level elements
      pos += 8 + pad8(dsize)
    }
    out.toMap
  }

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  /** One sub-element: returns (type, payloadOffset, payloadSize, nextOffset).
    * Handles the small-data-element format (type and size packed in 4 bytes). */
  private def subElement(bb: ByteBuffer, pos: Int): (Int, Int, Int, Int) = {
    val first = bb.getInt(pos)
    if ((first >>> 16) != 0) { // small data element: upper 16 bits = size
      val typ = first & 0xffff
      val size = first >>> 16
      (typ, pos + 4, size, pos + 8)
    } else {
      val size = bb.getInt(pos + 4)
      (first, pos + 8, size, pos + 8 + pad8(size))
    }
  }

  private def parseMatrix(bb: ByteBuffer, start: Int, size: Int): Option[(String, MatArray)] = {
    // array flags
    val (t1, p1, _, n1) = subElement(bb, start)
    require(t1 == MI_UINT32, s"expected array-flags, got type $t1")
    val mxClass = bb.getInt(p1) & 0xff
    if (mxClass != MX_DOUBLE_CLASS) return None // unsupported class: skip
    // dimensions
    val (t2, p2, s2, n2) = subElement(bb, n1)
    require(t2 == MI_INT32)
    val shape = (0 until s2 / 4).map(d => bb.getInt(p2 + 4 * d))
    // name
    val (t3, p3, s3, n3) = subElement(bb, n2)
    require(t3 == MI_INT8)
    val name = {
      val nb = new Array[Byte](s3)
      (0 until s3).foreach(i => nb(i) = bb.get(p3 + i))
      new String(nb, "ISO-8859-1")
    }
    // real data: MATLAB stores double-class arrays with the most compact
    // element type the values fit in (miUINT8 for small ints, etc.)
    val (t4, p4, s4, _) = subElement(bb, n3)
    val data = t4 match {
      case MI_DOUBLE => Array.tabulate(s4 / 8)(i => bb.getDouble(p4 + 8 * i))
      case 7 /*miSINGLE*/ => Array.tabulate(s4 / 4)(i => bb.getFloat(p4 + 4 * i).toDouble)
      case 1 /*miINT8*/ => Array.tabulate(s4)(i => bb.get(p4 + i).toDouble)
      case 2 /*miUINT8*/ => Array.tabulate(s4)(i => (bb.get(p4 + i) & 0xff).toDouble)
      case 3 /*miINT16*/ => Array.tabulate(s4 / 2)(i => bb.getShort(p4 + 2 * i).toDouble)
      case 4 /*miUINT16*/ => Array.tabulate(s4 / 2)(i => (bb.getShort(p4 + 2 * i) & 0xffff).toDouble)
      case 5 /*miINT32*/ => Array.tabulate(s4 / 4)(i => bb.getInt(p4 + 4 * i).toDouble)
      case 6 /*miUINT32*/ => Array.tabulate(s4 / 4)(i => (bb.getInt(p4 + 4 * i) & 0xffffffffL).toDouble)
      case other => throw new IllegalArgumentException(s"unsupported mi data type $other")
    }
    Some(name -> MatArray(data, shape))
  }

  /** Write a map of named double arrays as an uncompressed Level-5 file. */
  def write(path: String, arrays: Map[String, MatArray]): Unit = {
    def matrixElement(name: String, a: MatArray): Array[Byte] = {
      val nameBytes = name.getBytes("ISO-8859-1")
      val dimBytes = a.shape.length * 4
      val bodySize = 16 /*flags*/ + 8 + pad8(dimBytes) + 8 + pad8(nameBytes.length) +
        8 + a.data.length * 8
      val buf = ByteBuffer.allocate(8 + bodySize).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(MI_MATRIX); buf.putInt(bodySize)
      buf.putInt(MI_UINT32); buf.putInt(8); buf.putInt(MX_DOUBLE_CLASS); buf.putInt(0)
      buf.putInt(MI_INT32); buf.putInt(dimBytes)
      a.shape.foreach(buf.putInt)
      (dimBytes until pad8(dimBytes)).foreach(_ => buf.put(0.toByte))
      buf.putInt(MI_INT8); buf.putInt(nameBytes.length)
      buf.put(nameBytes)
      (nameBytes.length until pad8(nameBytes.length)).foreach(_ => buf.put(0.toByte))
      buf.putInt(MI_DOUBLE); buf.putInt(a.data.length * 8)
      a.data.foreach(buf.putDouble)
      buf.array()
    }
    val header = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    val text = "MATLAB 5.0 MAT-file, written by graft".getBytes("ISO-8859-1")
    header.put(text)
    (text.length until 116).foreach(i => header.put(i, ' '.toByte))
    header.putShort(124, 0x0100.toShort) // version
    header.put(126, 'I'.toByte); header.put(127, 'M'.toByte)
    val body = arrays.toSeq.flatMap { case (n, a) => matrixElement(n, a) }
    Files.write(Paths.get(path), header.array() ++ body)
  }
}
