package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal Igor Binary Wave (version 5) reader/writer — driver-side
  * parity for the reference's `igoribw.loadibw` (`igoribw.py:413-549`)
  * and the ibw histogram sink (`saveDict(form='ibw')`,
  * `fprocessing.py:859-980`). Implemented from the public Igor Pro
  * Technical Note TN003 file-format description: 64-byte BinHeader5 +
  * 320-byte WaveHeader5 (wData tail at offset 384), int16-sum checksum
  * over the headers.
  *
  * Scope: numeric waves (float32/float64/int8/int16/int32), 1–4
  * dimensions, little-endian v5 files — the shape the reference's own
  * tutorials produce. Text waves and v1–v3 are out of scope.
  */
object IgorIbw {

  final case class Wave(name: String, data: Array[Double], shape: Seq[Int],
                        sfA: Seq[Double], sfB: Seq[Double]) {
    require(data.length == shape.product)
    /** Dimension axis values: x_p = sfA(d) * p + sfB(d) (Igor scaling). */
    def axis(d: Int): Array[Double] =
      Array.tabulate(shape(d))(p => sfA(d) * p + sfB(d))
  }

  private val BIN_HEADER_SIZE = 64
  private val WAVE_HEADER_SIZE = 320 // up to (not including) the wData tail
  private val DATA_OFFSET = BIN_HEADER_SIZE + WAVE_HEADER_SIZE

  // Igor numeric type codes (NT_*)
  private val TYPE_BYTES = Map(2 -> 4, 4 -> 8, 8 -> 1, 0x10 -> 2, 0x20 -> 4)

  def read(path: String): Wave = fromBytes(Files.readAllBytes(Paths.get(path)))

  /** Parse a v5 wave from raw bytes — shared by the standalone .ibw
    * reader and the .pxp container walker ([[IgorPxp]]), whose wave
    * records embed exactly this image. */
  def fromBytes(bytes: Array[Byte]): Wave = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val version = bb.getShort(0)
    require(version == 5, s"only ibw version 5 supported, got $version")
    // checksum: int16 sum of the first 384 bytes must be 0
    var sum = 0
    var i = 0
    while (i < DATA_OFFSET) { sum += bb.getShort(i); i += 2 }
    require((sum & 0xffff) == 0, s"ibw checksum mismatch (${sum & 0xffff})")

    val npnts = bb.getInt(BIN_HEADER_SIZE + 12)
    val typ = bb.getShort(BIN_HEADER_SIZE + 16).toInt
    require(TYPE_BYTES.contains(typ), s"unsupported ibw numeric type $typ (text wave?)")
    val nameBytes = new Array[Byte](32)
    bb.position(BIN_HEADER_SIZE + 28); bb.get(nameBytes); bb.position(0)
    val name = new String(nameBytes.takeWhile(_ != 0), "ISO-8859-1")
    val nDim = (0 until 4).map(d => bb.getInt(BIN_HEADER_SIZE + 68 + 4 * d))
    val shape = nDim.filter(_ > 0)
    require(shape.product == npnts, s"shape $shape != npnts $npnts")
    val sfA = (0 until 4).map(d => bb.getDouble(BIN_HEADER_SIZE + 84 + 8 * d))
    val sfB = (0 until 4).map(d => bb.getDouble(BIN_HEADER_SIZE + 116 + 8 * d))

    val data = new Array[Double](npnts)
    var off = DATA_OFFSET
    val w = TYPE_BYTES(typ)
    require(bytes.length >= DATA_OFFSET + npnts.toLong * w,
      s"ibw file truncated: need ${DATA_OFFSET + npnts.toLong * w} bytes, have ${bytes.length}")
    i = 0
    while (i < npnts) {
      data(i) = typ match {
        case 2 => bb.getFloat(off).toDouble
        case 4 => bb.getDouble(off)
        case 8 => bb.get(off).toDouble
        case 0x10 => bb.getShort(off).toDouble
        case 0x20 => bb.getInt(off).toDouble
      }
      off += w
      i += 1
    }
    Wave(name, data, shape, sfA.take(shape.length), sfB.take(shape.length))
  }

  /** Write a float32 v5 wave (column-major data as produced by Igor —
    * the caller provides data already in Igor's storage order, matching
    * what [[read]] returns). */
  def write(path: String, wave: Wave): Unit =
    Files.write(Paths.get(path), toBytes(wave))

  /** Serialize a float32 v5 wave image (the byte content of an .ibw
    * file, also embeddable as a .pxp wave record). */
  def toBytes(wave: Wave): Array[Byte] = {
    val npnts = wave.data.length
    val dataSize = npnts * 4
    val out = ByteBuffer.allocate(DATA_OFFSET + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    // BinHeader5
    out.putShort(0, 5) // version
    out.putInt(4, WAVE_HEADER_SIZE + dataSize) // wfmSize (header tail + data)
    // WaveHeader5
    out.putInt(BIN_HEADER_SIZE + 12, npnts)
    out.putShort(BIN_HEADER_SIZE + 16, 2) // NT_FP32
    val nameBytes = wave.name.getBytes("ISO-8859-1").take(31)
    var i = 0
    while (i < nameBytes.length) { out.put(BIN_HEADER_SIZE + 28 + i, nameBytes(i)); i += 1 }
    wave.shape.zipWithIndex.foreach { case (n, d) => out.putInt(BIN_HEADER_SIZE + 68 + 4 * d, n) }
    (0 until 4).foreach { d =>
      out.putDouble(BIN_HEADER_SIZE + 84 + 8 * d, if (d < wave.sfA.length) wave.sfA(d) else 1.0)
      out.putDouble(BIN_HEADER_SIZE + 116 + 8 * d, if (d < wave.sfB.length) wave.sfB(d) else 0.0)
    }
    // data
    i = 0
    while (i < npnts) { out.putFloat(DATA_OFFSET + 4 * i, wave.data(i).toFloat); i += 1 }
    // checksum: set so the int16 sum of the first 384 bytes is 0
    var sum = 0
    i = 0
    while (i < DATA_OFFSET) { sum += out.getShort(i); i += 2 }
    out.putShort(2, (-sum & 0xffff).toShort)
    out.array()
  }
}
